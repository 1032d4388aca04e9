package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point (SURVEY.md §2 custom-operator path (c)):
  * registers the engine's native expressions into the SQL function registry
  * so `spark.sql("SELECT cosine_sim(a, b) ...")` works alongside the Column
  * API. Wire with:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // programmatic, or
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** A structural int parameter (shingle width, band count …) must be a
    * foldable literal at registration time — it shapes the expression
    * itself, not a per-row input. */
  private def intLit(e: Expression, fn: String, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
    case _ => throw new IllegalArgumentException(
      s"$fn: $what must be an integer literal, got $e")
  }

  private def register(ext: SparkSessionExtensions, name: String,
                       clazz: Class[_], arity: Int)
                      (build: Seq[Expression] => Expression): Unit =
    ext.injectFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      (args: Seq[Expression]) => {
        require(args.length == arity, s"$name takes exactly $arity arguments")
        build(args)
      }))

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "cosine_sim", classOf[CosineSimilarity], 2)(a =>
      CosineSimilarity(a(0), a(1)))
    register(ext, "dot_product", classOf[DotProduct], 2)(a =>
      DotProduct(a(0), a(1)))
    register(ext, "sorted_intersect_count", classOf[SortedIntersectCount], 2)(
      a => SortedIntersectCount(a(0), a(1)))
    register(ext, "shingle_hashes", classOf[ShingleHashes], 2)(a =>
      ShingleHashes(a(0), intLit(a(1), "shingle_hashes", "shingle width")))
    register(ext, "ngram_stats", classOf[NGramStats], 2)(a =>
      NGramStats(a(0), intLit(a(1), "ngram_stats", "n-gram width")))
    register(ext, "minhash_bands", classOf[MinHashBands], 3)(a =>
      MinHashBands(a(0), intLit(a(1), "minhash_bands", "numHashes"),
        intLit(a(2), "minhash_bands", "bands")))
    register(ext, "winnow_fingerprints", classOf[WinnowFingerprints], 2)(a =>
      WinnowFingerprints(a(0),
        intLit(a(1), "winnow_fingerprints", "window")))
    // aggregate: the analyzer wraps a bare AggregateFunction returned
    // from a registry builder into its AggregateExpression
    register(ext, "misra_gries_sketch", classOf[MisraGriesSketch], 2)(a =>
      MisraGriesSketch(a(0), intLit(a(1), "misra_gries_sketch", "k")))
    register(ext, "top_k_by", classOf[TopKByAggregate], 3)(a =>
      TopKByAggregate(a(0), a(1), intLit(a(2), "top_k_by", "k")))
    register(ext, "bottom_k_by", classOf[BottomKByAggregate], 3)(a =>
      BottomKByAggregate(a(0), a(1), intLit(a(2), "bottom_k_by", "k")))
    // rewrite HOF dot products into the fused native expression (path (c):
    // Rule[LogicalPlan] via injectOptimizerRule)
    ext.injectOptimizerRule(_ => FuseDotProduct)
  }
}
