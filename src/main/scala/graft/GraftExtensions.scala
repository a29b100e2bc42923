package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.functions.{MinShingleHash, VectorDot, WordShingles}
import graft.operators.Params

/** SQL-surface registration of the library's native expressions, so
  * `spark.sql("SELECT word_shingles(text, 3) …")` works like any built-in:
  *
  *  - cluster-wide / config-driven:
  *    `--conf spark.sql.extensions=graft.GraftExtensions`
  *  - per-session: `GraftExtensions.register(spark)` on a live session.
  *
  * Functions:
  *  - `word_shingles(text[, n])` — lowercase-alpha word n-gram shingles
  *    (default n = [[Params.ShingleN]]).
  *  - `min_shingle_hash(text[, n])` — min md5-hex over the n-shingles
  *    (1-permutation MinHash fingerprint); NULL below n tokens.
  *  - `vector_dot(a, b)` — ordered dot product over float/double arrays
  *    (codegen'd; ≡ DuckDB `list_dot_product`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    // users write aggregate(zip_with(...)); plans run the native VectorDot
    ext.injectOptimizerRule(_ => graft.plans.RewriteHofDotProduct)
    // SELECT * FROM graft_lookup(dir, keys) — relation-valued point
    // reads through the same index-nested-loop tier as CALL lookup
    ext.injectTableFunction((graft.plans.GraftLookupTvf.ident,
      graft.plans.GraftLookupTvf.info, graft.plans.GraftLookupTvf.build))
    // broadcast-small-side key equi-joins against sstable relations plan
    // as index-nested-loop probes (zero table scan, zero shuffle)
    ext.injectPlannerStrategy(_ =>
      graft.sources.sstable.spark.SSTableLookupJoinStrategy)
  }
}

object GraftExtensions {
  private def intLiteral(e: Expression, name: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name: shingle width must be an integer literal, got $other")
  }

  private[graft] val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      {
        case Seq(text) => WordShingles(text, Params.ShingleN)
        case Seq(text, n) => WordShingles(text, intLiteral(n, "word_shingles"))
        case args => throw new IllegalArgumentException(
          s"word_shingles expects (text[, n]), got ${args.length} arguments")
      }),
    (FunctionIdentifier("min_shingle_hash"),
      new ExpressionInfo(classOf[MinShingleHash].getName, "min_shingle_hash"),
      {
        case Seq(text) => MinShingleHash(text, Params.ShingleN)
        case Seq(text, n) => MinShingleHash(text, intLiteral(n, "min_shingle_hash"))
        case args => throw new IllegalArgumentException(
          s"min_shingle_hash expects (text[, n]), got ${args.length} arguments")
      }),
    (FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      {
        case Seq(a, b) => VectorDot(a, b)
        case args => throw new IllegalArgumentException(
          s"vector_dot expects (a, b), got ${args.length} arguments")
      }))

  /** Register on an already-running session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.GraftFunctionRegistrar.register(spark, functions)
    org.apache.spark.sql.GraftFunctionRegistrar.registerTable(spark,
      graft.plans.GraftLookupTvf.ident, graft.plans.GraftLookupTvf.info,
      graft.plans.GraftLookupTvf.build)
    graft.sources.sstable.spark.SSTableLookupJoin.install(spark)
  }
}
