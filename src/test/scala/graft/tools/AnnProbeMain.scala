package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.F
import graft.queries.ExtensionQueries.cosineTopkExact
import graft.sources.{Layout, Tables}

/** ANN scale probe (dev only, not registered): measures the exact-vs-
  * indexed PROBE cost split that justifies e64's persisted IVF layout,
  * on replicated embedding corpora (`/tmp/annprobe{100x,1000x}`,
  * pyarrow id-offset replicas of sf0.1 — duplicate VALUES, distinct
  * ids: cost is value-independent, so replication measures scan/join
  * volume honestly even though recall would be meaningless here).
  *
  * Phases, each timed after a JVM warmup pass:
  *  - build: broadcast-codebook assignment (≈ corpus × √n dots) + the
  *    list_id-partitioned index write — the ONE-OFF cost the layout
  *    amortizes across probe workloads;
  *  - exact probe: a FIXED 100-query set against the raw corpus via
  *    [[cosineTopkExact]] (linear in corpus size per workload);
  *  - indexed probe: the same 100 queries against the persisted index
  *    with dynamic partition pruning (reads only probed cells' files).
  */
object AnnProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("ANN_PROBE_DIR", "/tmp/annprobe100x")
    val cells = sys.env.getOrElse("ANN_PROBE_CELLS", "512").toInt

    val embD = col("embedding").cast("array<double>")
    def base = Tables.embeddings(spark, dir)
      .select(col("vec_id"), embD.as("emb"))
      .withColumn("nrm", sqrt(F.array_dot(col("emb"), col("emb"))))
      .filter(col("vec_id").isNotNull)
    val n = base.count()
    val m = math.max(n / cells, 1L) // vec_id % m == 3 -> ~`cells` centroids
    // fixed probe workload: 100 queries from the FIRST replica only, so
    // the workload does not grow with corpus replication
    val origN = 2000L
    def queries = base.filter(col("vec_id") < origN && col("vec_id") % 20 === 5)

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"== $label%-14s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    // warmup: JIT/codegen + page cache for the corpus file
    base.agg(sum(col("nrm"))).collect()

    // ---- build: assignment + cell-partitioned write ------------------
    val path = s"/tmp/graft_annprobe_idx_${n}_$cells"
    val cent = base.filter(col("vec_id") % m === 3)
      .select(col("vec_id").as("cid"), col("emb").as("cemb"),
        col("nrm").as("cnrm"))
    val assign = base.crossJoin(broadcast(cent))
      .select(col("vec_id"),
        (F.array_dot(col("emb"), col("cemb")) / (col("nrm") * col("cnrm")))
          .as("cs"), col("cid"))
      .groupBy("vec_id")
      .agg(max(struct(col("cs"), (-col("cid")).as("nc"))).as("x"))
      .select(col("vec_id"), (-col("x.nc")).as("list_id"))
    timed("build") {
      Layout.writePartitionedIfStale(
        base.join(assign, "vec_id"), path, Seq("list_id"),
        Layout.scanFingerprint(Tables.embeddings(spark, dir)) + s"_$cells")
    }

    // ---- exact probe: 100 queries x full corpus ----------------------
    val k = 3
    def exact() = cosineTopkExact(
      queries.select(col("vec_id").as("query_id"), col("emb").as("qe")),
      base.select(col("vec_id").as("neighbor_id"), col("emb").as("ce")),
      k).count()
    exact() // warmup
    timed("exact-probe")(exact())

    // ---- indexed probe: same queries, DPP over probed cells ----------
    def indexed() = {
      val idx = spark.read.parquet(path)
      val probe = idx
        .filter(col("vec_id") < origN && col("vec_id") % 20 === 5)
        .select(col("vec_id").as("query_id"), col("emb").as("qemb"),
          col("nrm").as("qnrm"), col("list_id").as("qlist"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      probe.as("q")
        .join(idx.as("i"),
          col("qlist") === col("i.list_id") &&
            col("query_id") =!= col("i.vec_id"))
        .select(col("query_id"), col("i.vec_id").as("neighbor_id"),
          round(F.array_dot(col("qemb"), col("i.emb")) /
            (col("qnrm") * col("i.nrm")), 4).as("cosine"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k)
        .count()
    }
    indexed() // warmup
    timed("indexed-probe")(indexed())

    println(s"n=$n cells=$cells centroids~${n / m}")
    spark.stop()
  }
}
