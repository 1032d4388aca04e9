package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-profile character-trigram hit counts in ONE scan-local pass — the
  * fused spelling of the language-ID n-gram mechanism (q72). The
  * generator-based formulation explodes ~`length(text)` rows per document
  * and shuffles them into an aggregation; this expression slides the
  * 3-codepoint window inside the row, looks each trigram up in one shared
  * trigram→profile-bitmask table, and returns `array<bigint>` of hit
  * counts, one per profile — zero extra rows, zero shuffle, O(chars) with
  * one hash probe per position.
  *
  * Windowing is by codepoint (matching `substr`'s and the oracle's
  * SUBSTRING semantics, not UTF-16 code units); profiles are query
  * constants, checked at analysis time to be 3 codepoints each.
  */
case class TrigramProfileHits(child: Expression, profiles: Seq[Seq[String]])
    extends UnaryExpression {

  require(profiles.nonEmpty && profiles.size <= 32,
    "1..32 profiles (bitmask-packed)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"expected string input, got ${child.dataType}")
    else if (!profiles.forall(_.forall(t =>
        t.codePointCount(0, t.length) == 3)))
      TypeCheckResult.TypeCheckFailure(
        "every profile trigram must be exactly 3 codepoints")
    else TypeCheckResult.TypeCheckSuccess

  /** trigram → bitmask of profiles containing it; rebuilt lazily per
    * executor (the expression ships `profiles`, not the map). */
  @transient private lazy val mask: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    profiles.zipWithIndex.foreach { case (p, i) =>
      p.foreach { t =>
        m.merge(t, Int.box(1 << i), (a, b) => Int.box(a | b))
      }
    }
    m
  }

  /** Shared by eval and codegen (the generated code makes one virtual call
    * per row; the string walk dominates it). */
  def countHits(u: UTF8String): ArrayData = {
    val s = u.toString
    val counts = new Array[Long](profiles.size)
    val n = s.length
    if (n >= 3) {
      // rolling codepoint start-offsets: i0..i2 bound the current trigram
      var i0 = 0
      var i1 = s.offsetByCodePoints(i0, 1)
      var i2 = if (i1 < n) s.offsetByCodePoints(i1, 1) else n
      while (i2 < n) {
        val i3 = s.offsetByCodePoints(i2, 1)
        val m = mask.get(s.substring(i0, i3))
        if (m != null) {
          var bits = m.intValue()
          while (bits != 0) {
            counts(Integer.numberOfTrailingZeros(bits)) += 1
            bits &= bits - 1
          }
        }
        i0 = i1; i1 = i2; i2 = i3
      }
    }
    new GenericArrayData(counts)
  }

  override def nullSafeEval(input: Any): Any =
    countHits(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("trigramHits", this,
      classOf[TrigramProfileHits].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.countHits($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): TrigramProfileHits = copy(child = newChild)
}

object TrigramProfileHits {
  def trigramProfileHits(text: Column, profiles: Seq[Seq[String]]): Column =
    ExprBridge.column(
      TrigramProfileHits(ExprBridge.expression(text), profiles))
}
