package graft.tools

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Dev check: does an Observation complete when the observed plan is
  * materialized by localCheckpoint(eager=true)? (The r17 loop-count
  * optimization depends on it.)
  */
object ObsCheck {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val obs = new Observation("t")
    val df = s.range(0, 1000).toDF("id")
      .observe(obs, count(lit(1)).as("n"), sum(col("id")).as("s"))
      .filter(col("id") % 2 === 0)
      .localCheckpoint(true)
    // bounded wait so a non-firing observation doesn't hang the check
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    def probe(o: Observation): String =
      try Await.result(Future(o.get), 5.seconds).toString
      catch { case _: Throwable => "TIMEOUT (did not fire)" }
    println(s"after checkpoint: ${probe(obs)} rows=${df.count()}")
    // and mid-plan (observe below another operator + checkpoint)
    val obs2 = new Observation("t2")
    val base = s.range(0, 500).toDF("id")
      .observe(obs2, count(lit(1)).as("n"))
    val joined = base.join(s.range(0, 500).toDF("id"), "id")
      .localCheckpoint(true)
    println(s"mid-plan: ${probe(obs2)} rows=${joined.count()}")
    s.stop()
  }
}
