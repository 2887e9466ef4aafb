package graft.queries

import graft.SparkEntry

import org.scalatest.funsuite.AnyFunSuite

/** PLANS.md staleness gate (VERDICT r11 item 2, the DegeneracySpec
  * pattern applied to the plan artifact): PLANS.md is what the
  * per-round plan audit reads, so a query registered after the last
  * `graft.tools.PlanReport` run ships UNAUDITED — r11 caught q58 and
  * e157 exactly this way. This spec fails the build when any
  * registered non-composite query is missing a static-table row, and
  * fails again when PLANS.md carries a row for a query that no longer
  * exists (a stale row audits nothing).
  *
  * "Non-composite" = everything except PlanReport's own skip set
  * (g1_mock_batch / p1_pipeline_e2e drive multi-statement pipelines —
  * there is no single plan to report). Keep that set in sync with
  * PlanReport.skip; this spec duplicates it deliberately so that
  * widening the skip set is a visible two-site decision, not a silent
  * coverage hole.
  */
class PlansCoverageSpec extends AnyFunSuite {

  private val skip = Set("g1_mock_batch", "p1_pipeline_e2e")

  test("PLANS.md carries a static-plan row for every registered " +
    "non-composite query, and no stale rows") {
    val path = java.nio.file.Paths.get("PLANS.md")
    assert(java.nio.file.Files.exists(path),
      "PLANS.md missing — run `graft.tools.PlanReport` to generate it")
    val lines = java.nio.file.Files.readAllLines(path)
    import scala.jdk.CollectionConverters._
    // Static-table rows look like `| <name> | 1 (0 pushed) | ...` —
    // take the first cell of every table row whose name matches a
    // query-ish token; the AQE table repeats the same names, so a
    // set union over both tables is exactly "what PLANS.md covers".
    val covered = lines.asScala
      .filter(l => l.startsWith("| ") && l.count(_ == '|') >= 3)
      .map(_.split("\\|")(1).trim)
      .filter(n => n.nonEmpty && n != "Query" && !n.startsWith("-"))
      .toSet
    val registered = SparkEntry.queries.keySet -- skip

    val missing = (registered -- covered).toSeq.sorted
    assert(missing.isEmpty,
      s"queries registered but absent from PLANS.md (their plans ship " +
        s"unaudited): ${missing.mkString(", ")} — re-run " +
        "`graft.tools.PlanReport` after adding queries")

    val stale = (covered -- registered -- skip).toSeq.sorted
    assert(stale.isEmpty,
      s"PLANS.md rows for unregistered queries (stale artifact): " +
        s"${stale.mkString(", ")} — re-run `graft.tools.PlanReport`")
  }
}
