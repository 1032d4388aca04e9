package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructType}

/** Exact weighted-intersection mass of two SORTED weighted token arrays —
  * the q131 (IDF-weighted Jaccard) kernel, fused into one codegen'd
  * two-pointer merge.
  *
  * Each element is `struct<h: long, ip: long, fr: long>`: token hash, then
  * the token's weight as an EXACT DECIMAL(·,18) split into integer part
  * `ip` and fractional part `fr` in 1e-18 units (`0 <= fr < 1e18`). The
  * walk accumulates (ip, fr) with carry — pure long arithmetic, exact at
  * any corpus scale (a double or decimal accumulator would either lose
  * order-independence or round the 18th digit under Spark's decimal-add
  * widening) — and only the final (intSum, fracSum) pair is converted
  * through `java.math.BigDecimal` to the same double a DECIMAL(38,18)
  * column sum + double cast produces. That makes the result bit-identical
  * to the DuckDB oracle's `CAST(SUM(CAST(w AS DECIMAL(38,18))) AS DOUBLE)`
  * regardless of row order on either engine.
  *
  * Applied to `(wt, wt)` every element matches itself, so the same kernel
  * yields a document's TOTAL weight mass — the denominator terms ride the
  * same codegen.
  *
  * Precondition: both arrays ascending-sorted by `h` with distinct hashes
  * (`array_sort(collect_list(struct(h, ...)))` — struct ordering is
  * field-lexicographic, so distinct leading hashes give a total order).
  */
case class SortedWeightedIntersectSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def okElement(dt: DataType): Boolean = dt match {
    case StructType(fs) =>
      fs.length == 3 && fs.forall(_.dataType == LongType)
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _)) if okElement(a) && okElement(b) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"expected two array<struct<h: bigint, ip: bigint, fr: bigint>>, " +
          s"got (${left.dataType}, ${right.dataType})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0
    var ipAcc = 0L; var frAcc = 0L
    while (i < x.numElements() && j < y.numElements()) {
      val xr = x.getStruct(i, 3)
      val yr = y.getStruct(j, 3)
      val xh = xr.getLong(0); val yh = yr.getLong(0)
      if (xh == yh) {
        ipAcc += xr.getLong(1)
        frAcc += xr.getLong(2)
        if (frAcc >= 1000000000000000000L) {
          frAcc -= 1000000000000000000L; ipAcc += 1L
        }
        i += 1; j += 1
      } else if (xh < yh) i += 1
      else j += 1
    }
    SortedWeightedIntersectSum.toDouble(ipAcc, frAcc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val xr = ctx.freshName("xr")
      val yr = ctx.freshName("yr")
      val xh = ctx.freshName("xh")
      val yh = ctx.freshName("yh")
      val ip = ctx.freshName("ipAcc")
      val fr = ctx.freshName("frAcc")
      s"""
         |int $i = 0; int $j = 0;
         |long $ip = 0L; long $fr = 0L;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  org.apache.spark.sql.catalyst.InternalRow $xr = $a.getStruct($i, 3);
         |  org.apache.spark.sql.catalyst.InternalRow $yr = $b.getStruct($j, 3);
         |  long $xh = $xr.getLong(0);
         |  long $yh = $yr.getLong(0);
         |  if ($xh == $yh) {
         |    $ip += $xr.getLong(1);
         |    $fr += $xr.getLong(2);
         |    if ($fr >= 1000000000000000000L) {
         |      $fr -= 1000000000000000000L; $ip += 1L;
         |    }
         |    $i++; $j++;
         |  } else if ($xh < $yh) { $i++; } else { $j++; }
         |}
         |${ev.value} =
         |  graft.functions.SortedWeightedIntersectSum.toDouble($ip, $fr);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedWeightedIntersectSum =
    copy(left = newLeft, right = newRight)
}

object SortedWeightedIntersectSum {
  /** Exact (intPart + frac·1e-18) → double, via BigDecimal so the rounding
    * is the decimal→double cast both engines perform. Static and
    * Java-callable — the generated code invokes it once per row.
    */
  def toDouble(ipAcc: Long, frAcc: Long): Double =
    java.math.BigDecimal.valueOf(ipAcc)
      .add(java.math.BigDecimal.valueOf(frAcc, 18)).doubleValue()

  def weightedIntersectSum(a: Column, b: Column): Column =
    ExprBridge.column(SortedWeightedIntersectSum(
      ExprBridge.expression(a), ExprBridge.expression(b)))
}
