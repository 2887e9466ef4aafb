package graft.queries

import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** e143 computes Page's CUSUM via the prefix-sum closed form
  * S_t = P_t − min(0, min_{j<t} P_j). Pin that identity against the
  * textbook recursion S_t = max(0, S_{t−1} + d_t) run driver-side over
  * the same daily counts, including the argmax date and its
  * tie-to-earliest rule.
  */
class E143CusumSpec extends SparkSpecBase {

  test("closed form equals the textbook recursion at sf0.01") {
    val dir = "/root/testdata/sf0.01"
    val out = AnalysisQueries.all.find(_.name == "e143_cusum").get
      .run(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDate(5).toLocalDate, r.getInt(6))).toMap
    assert(out.size >= 2)

    val daily = graft.sources.Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate) -> r.getLong(2))
      .toMap
    val d0 = daily.keys.map(_._2).min
    val d1 = daily.keys.map(_._2).max
    val days = Iterator.iterate(d0)(_.plusDays(1))
      .takeWhile(!_.isAfter(d1)).toVector
    val nd = days.length.toLong

    daily.keys.map(_._1).toSeq.distinct.foreach { t =>
      val xs = days.map(d => daily.getOrElse((t, d), 0L))
      val tot = xs.sum
      var s = 0L; var best = 0L; var bestDay = days.head
      days.zip(xs).foreach { case (d, x) =>
        s = math.max(0L, s + (nd * x - tot))
        if (s > best) { best = s; bestDay = d } // strict > = earliest tie
      }
      val (gNd, gTot, gMax, gBp, gDay, gAlarm) = out(t)
      assert(gNd === nd, t)
      assert(gTot === tot, t)
      assert(gMax === best, t)
      assert(gDay === bestDay, t)
      assert(gBp === best * 10000 / tot, t)
      assert(gAlarm === (if (best * 10000 / tot > 10000) 1 else 0), t)
    }
  }
}
