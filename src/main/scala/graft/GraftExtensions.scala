package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions._

/** SparkSessionExtensions entry point: registers the custom hash /
  * similarity expressions as SQL functions, so
  * `spark.sql("SELECT shingle_hashes(text) ...")` works next to the
  * Column API in [[graft.functions.F]]. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, clazz: Class[_]) =
    new ExpressionInfo(clazz.getName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("word_hashes"), info("word_hashes", classOf[WordHashes]),
      (args: Seq[Expression]) => WordHashes(args.head)))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"), info("shingle_hashes", classOf[ShingleHashes]),
      (args: Seq[Expression]) => ShingleHashes(args.head)))
    ext.injectFunction((
      FunctionIdentifier("poly_hash"), info("poly_hash", classOf[PolyHash]),
      (args: Seq[Expression]) => PolyHash(args.head)))
    ext.injectFunction((
      FunctionIdentifier("sim_hash"), info("sim_hash", classOf[SimHash]),
      (args: Seq[Expression]) => SimHash(args.head)))
    ext.injectFunction((
      FunctionIdentifier("min_hashes"), info("min_hashes", classOf[MinHashes]),
      (args: Seq[Expression]) => MinHashes(args.head)))
    ext.injectFunction((
      FunctionIdentifier("array_dot"), info("array_dot", classOf[ArrayDot]),
      (args: Seq[Expression]) => ArrayDot(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("morton2"), info("morton2", classOf[Morton2]),
      (args: Seq[Expression]) => args match {
        case Seq(x, y) => Morton2(x, y)
        case Seq(x, y,
            org.apache.spark.sql.catalyst.expressions.Literal(b: Int, _)) =>
          Morton2(x, y, b)
        case Seq(_, _, other) => throw new IllegalArgumentException(
          s"morton2(x, y, bits): bits must be an integer literal, got $other")
        case _ => throw new IllegalArgumentException(
          s"morton2 expects 2 or 3 arguments, got ${args.size}")
      }))
    ext.injectFunction((
      FunctionIdentifier("avg_hash64"), info("avg_hash64", classOf[AvgHash64]),
      (args: Seq[Expression]) => AvgHash64(args.head)))
    ext.injectFunction((
      FunctionIdentifier("int8_scale"), info("int8_scale", classOf[Int8Scale]),
      (args: Seq[Expression]) => Int8Scale(args.head)))
    ext.injectFunction((
      FunctionIdentifier("int8_pack"), info("int8_pack", classOf[Int8Pack]),
      (args: Seq[Expression]) => Int8Pack(args.head)))
    ext.injectFunction((
      FunctionIdentifier("int8_dot"), info("int8_dot", classOf[Int8Dot]),
      (args: Seq[Expression]) => Int8Dot(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("misra_gries"),
      info("misra_gries", classOf[graft.functions.sketches.MisraGriesAgg]),
      (args: Seq[Expression]) => {
        val k = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"misra_gries(keys, k): k must be an integer literal, got $other")
        }
        graft.functions.sketches.MisraGriesAgg(args.head, k)
      }))
    ext.injectFunction((
      FunctionIdentifier("min_k"),
      info("min_k", classOf[graft.functions.sketches.MinKAgg]),
      (args: Seq[Expression]) => {
        val k = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"min_k(values, k): k must be an integer literal, got $other")
        }
        graft.functions.sketches.MinKAgg(args.head, k)
      }))
    ext.injectFunction((
      FunctionIdentifier("kmv_sketch"),
      info("kmv_sketch", classOf[graft.functions.sketches.KmvAgg]),
      (args: Seq[Expression]) => {
        val k = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"kmv_sketch(values, k): k must be an integer literal, got $other")
        }
        graft.functions.sketches.KmvAgg(args.head, k)
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_bitmap"),
      info("bloom_bitmap", classOf[graft.functions.sketches.BloomAgg]),
      (args: Seq[Expression]) => {
        def intLit(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"bloom_bitmap(keys, mBits, kHashes): $what must be an" +
              s" integer literal, got $other")
        }
        graft.functions.sketches.BloomAgg(
          args.head, intLit(args(1), "mBits"), intLit(args(2), "kHashes"))
      }))
    ext.injectFunction((
      FunctionIdentifier("cms_sketch"),
      info("cms_sketch", classOf[graft.functions.sketches.CmsAgg]),
      (args: Seq[Expression]) => {
        def intLit(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"cms_sketch(keys, depth, width): $what must be an" +
              s" integer literal, got $other")
        }
        graft.functions.sketches.CmsAgg(
          args.head, intLit(args(1), "depth"), intLit(args(2), "width"))
      }))
  }
}
