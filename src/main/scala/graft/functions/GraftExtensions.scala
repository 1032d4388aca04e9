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
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim takes exactly 2 arguments")
        CosineSimilarity(args(0), args(1))
      }))
    // rewrite HOF dot products into the fused native expression (path (c):
    // Rule[LogicalPlan] via injectOptimizerRule)
    ext.injectOptimizerRule(_ => FuseDotProduct)
  }
}
