package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Occurrence count of the most frequent space-token of a document — the
  * Gopher repetition signal (most-frequent-token share numerator, Rae et
  * al. 2021 §A1.1), computed scan-local in ONE linear pass.
  *
  * The declarative spelling
  * `array_max(transform(array_distinct(tok), d -> size(filter(tok, t ->
  * t = d))))` re-filters the whole token array once per DISTINCT token —
  * O(L·D) per document, quadratic on long low-repetition documents, which
  * is exactly the shape a 100 TB quality sweep cannot afford. Here a
  * single hash-count pass is O(L).
  *
  * Identical results by construction (exact integer counts over the same
  * `split(text, " ")` tokenization, trailing empties kept — asserted
  * against the HOF spelling on random corpora in
  * FusedExprPropertiesSpec). Empty documents (`""` splits to one empty
  * token) return 1, matching the HOF form.
  */
case class TopTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected string input, got ${child.dataType}")

  def topCount(u: UTF8String): Long = {
    // -1 limit matches Spark's split(text, " "): trailing empties kept
    val parts = u.toString.split(" ", -1)
    val counts = new java.util.HashMap[String, Long](parts.length * 2)
    var best = 0L
    var i = 0
    while (i < parts.length) {
      val c = counts.merge(parts(i), 1L, java.lang.Long.sum)
      if (c > best) best = c
      i += 1
    }
    best
  }

  override def nullSafeEval(input: Any): Any =
    topCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("topTokenCount", this,
      classOf[TopTokenCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.topCount($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): TopTokenCount = copy(child = newChild)
}

object TopTokenCount {
  def topTokenCount(text: Column): Column =
    ExprBridge.column(TopTokenCount(ExprBridge.expression(text)))
}
