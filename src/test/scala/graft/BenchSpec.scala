package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench's artifact-integrity contracts (r15 verdict #7 + ADVICE): the
  * round derivation must FAIL SAFE (field omitted, line still written)
  * on any header it cannot read, and the calibration flag must trip
  * exactly when a run's worst probe exceeds the demonstrated-idle
  * floor's band. Pure-function tests — no SparkSession.
  */
class BenchSpec extends AnyFunSuite {

  test("deriveRound: well-formed header → previous round + 1") {
    assert(Bench.deriveRound(Some("# VERDICT — round 15")) === Some(16))
  }

  test("deriveRound: case-insensitive (capitalized 'Round N' headers)") {
    assert(Bench.deriveRound(Some("# Verdict — Round 7")) === Some(8))
    assert(Bench.deriveRound(Some("ROUND 3 judgment")) === Some(4))
  }

  test("deriveRound: garbage, zero-led, and empty headers fail safe") {
    assert(Bench.deriveRound(Some("no digits here")) === None)
    assert(Bench.deriveRound(Some("round zero")) === None)
    assert(Bench.deriveRound(Some("")) === None)
    assert(Bench.deriveRound(None) === None)
    // a leading zero never parses as the round (canonical ints only);
    // the regex skips to the first canonical match instead
    assert(Bench.deriveRound(Some("round 007")) === None)
  }

  test("deriveRoundFromFile: missing file and unreadable content → None") {
    val missing = java.nio.file.Paths.get(
      "/nonexistent-graft-bench-spec/VERDICT.md")
    assert(Bench.deriveRoundFromFile(missing) === None)
    val tmp = java.nio.file.Files.createTempFile("graft_bench", ".md")
    java.nio.file.Files.writeString(tmp, "reformatted header, no marker\n")
    assert(Bench.deriveRoundFromFile(tmp) === None)
    java.nio.file.Files.writeString(tmp, "# VERDICT — round 12\nbody\n")
    assert(Bench.deriveRoundFromFile(tmp) === Some(13))
    // empty file: no first line, still safe
    java.nio.file.Files.writeString(tmp, "")
    assert(Bench.deriveRoundFromFile(tmp) === None)
  }

  test("calibFlagged: trips on 1.5× the position floor, not before") {
    // clean run on a historically idle machine
    assert(!Bench.calibFlagged(Seq(1.1), Seq(1.0, 1.2)))
    // loaded run against an idle history
    assert(Bench.calibFlagged(Seq(2.0), Seq(1.0)))
    // no history: the probe is its own floor — never flags alone
    assert(!Bench.calibFlagged(Seq(1.6), Seq.empty))
    // boundary: exactly 1.5× is not flagged (strict >)
    assert(!Bench.calibFlagged(Seq(1.5), Seq(1.0)))
    assert(!Bench.calibFlagged(Seq.empty, Seq(1.0)))
    // P10 floor (r16 ADVICE): one anomalously fast historical probe
    // must not ratchet the floor down and flag every healthy run
    assert(!Bench.calibFlagged(Seq(1.4),
      Seq(0.2, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)))
    // ...but a genuinely loaded probe still flags against that floor
    assert(Bench.calibFlagged(Seq(1.6),
      Seq(0.2, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)))
  }

  test("priorCalibs: position-matched fields, tolerates junk — a " +
    "JIT-cold start probe must never be floored by warm end probes") {
    val tmp = java.nio.file.Files.createTempFile("graft_hist", ".jsonl")
    java.nio.file.Files.writeString(tmp,
      """{"calib_s":1.2345,"calib_end_s":0.7,"value":9}""" + "\n" +
        "not json at all\n" +
        """{"calib_s":1.1,"no_end":true}""" + "\n")
    assert(Bench.priorCalibs(tmp.toString, "calib_s").sorted
      === Seq(1.1, 1.2345))
    assert(Bench.priorCalibs(tmp.toString, "calib_end_s")
      === Seq(0.7))
    assert(Bench.priorCalibs("/nonexistent/h.jsonl", "calib_s")
      === Seq.empty)
    // the r16 regression this split fixes: start probes ~1.1 on an
    // idle machine, end probes ~0.7 (same machine, warm JVM) — pooled,
    // every start probe would flag; position-matched, neither does
    assert(!Bench.calibFlagged(Seq(1.11),
      Bench.priorCalibs(tmp.toString, "calib_s")))
    assert(!Bench.calibFlagged(Seq(0.79),
      Bench.priorCalibs(tmp.toString, "calib_end_s")))
  }
}
