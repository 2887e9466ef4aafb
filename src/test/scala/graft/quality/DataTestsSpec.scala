package graft.quality

import org.apache.spark.sql.DataFrame

import graft.SparkSpecBase
import graft.quality.DataTests._

/** The test COMPILER itself: each of the four dbt test types must flag
  * exactly the injected violations (negative tests — the pipeline specs
  * cover the all-green path).
  */
class DataTestsSpec extends SparkSpecBase {

  private def resolve(m: Map[String, DataFrame])(t: String): DataFrame = m(t)

  test("not_null flags nulls only") {
    import spark.implicits._
    val df = Seq(Some("a"), None, Some("b"), None).toDF("id")
    val r = DataTests.run(Seq(TestCase("t", NotNull("id"))), resolve(Map("t" -> df)))
    assert(r.head.failingRows === 2 && !r.head.passed)
    val ok = DataTests.run(Seq(TestCase("t", NotNull("id"))),
      resolve(Map("t" -> Seq("a", "b").toDF("id"))))
    assert(ok.head.passed)
  }

  test("unique flags duplicated keys (one failing row per dup key)") {
    import spark.implicits._
    val df = Seq("a", "b", "a", "c", "a", "b").toDF("id")
    val r = DataTests.run(Seq(TestCase("t", Unique("id"))), resolve(Map("t" -> df)))
    assert(r.head.failingRows === 2) // keys a and b
  }

  test("accepted_values: NULLs pass (dbt semantics), others must match") {
    import spark.implicits._
    val df = Seq(Some("Male"), Some("Female"), None, Some("Other"))
      .toDF("customer_gender")
    val r = DataTests.run(
      Seq(TestCase("t", AcceptedValues("customer_gender",
        Seq("Male", "Female", "Non-binary")))),
      resolve(Map("t" -> df)))
    assert(r.head.failingRows === 1) // only "Other"; NULL passes
  }

  test("relationships: non-null orphans flagged, null FKs pass") {
    import spark.implicits._
    val child = Seq(Some("p1"), Some("p9"), None).toDF("product_id")
    val parent = Seq("p1", "p2").toDF("id")
    val r = DataTests.run(
      Seq(TestCase("child", Relationships("product_id", "parent", "id"))),
      resolve(Map("child" -> child, "parent" -> parent)))
    assert(r.head.failingRows === 1) // p9 only
  }

  test("runBatched (one job) returns the same results as per-test run") {
    import spark.implicits._
    val child = Seq(("a", Some("p1")), ("b", Some("p9")), ("b", None),
      (null.asInstanceOf[String], Some("p1"))).toDF("id", "fk")
    val parent = Seq("p1", "p2").toDF("pid")
    val tests = Seq(
      TestCase("c", NotNull("id")),
      TestCase("c", Unique("id")),
      TestCase("c", AcceptedValues("id", Seq("a", "b"))),
      TestCase("c", Relationships("fk", "p", "pid")))
    val m = Map("c" -> child, "p" -> parent)
    val sequential = DataTests.run(tests, resolve(m))
    val batched = DataTests.runBatched(tests, resolve(m))
    assert(batched === sequential)
    assert(batched.map(_.failingRows) === Seq(1L, 1L, 0L, 1L))
  }

  test("declared suite covers every YAML instance") {
    assert(sourceTests.size === 15)
    assert(stagingTests.size === 1)
    assert(martTests.size === 4)
    assert(allDeclared.map(_.name).distinct.size === allDeclared.size)
  }
}
