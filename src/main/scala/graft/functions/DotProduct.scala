package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate,
  BinaryExpression, Expression, LambdaFunction, Literal, Multiply,
  NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Fused dot product over two double-array columns — one codegen'd loop.
  *
  * The HOF spelling `aggregate(zip_with(a, b, (x, y) -> x * y), 0D,
  * (acc, x) -> acc + x)` materializes the zipped intermediate array and
  * walks it a second time; this expression is allocation-free. Semantics
  * are identical INCLUDING the degenerate cases: `zip_with` pads the
  * shorter array with nulls and the folded `+` propagates them, so
  * mismatched lengths and null elements both yield NULL — as here.
  * Accumulation is sequential left-to-right from +0.0, so results are
  * bit-identical to the fold.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"expected (array<double>, array<double>), got " +
          s"(${left.dataType}, ${right.dataType})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getDouble(i) * y.getDouble(i); i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $dot += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $dot; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule (SURVEY.md §2 custom-operator path (c), the
  * `injectOptimizerRule` tier): rewrites the exact HOF dot-product pattern
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, x) -> acc + x)`
  * into the fused [[DotProduct]]. Declarative call sites keep the readable
  * HOF spelling (e.g. the LSH bucketer's plane projections) and the
  * physical plan still gets the single-loop form — the rewrite is safe
  * because the two are bit-identical by construction (see DotProduct docs).
  *
  * The match is deliberately strict: double arrays only, zero literal
  * +0.0, each lambda body referencing exactly its own variables, identity
  * finish — anything else is left untouched.
  */
object FuseDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(
                x: NamedLambdaVariable, y: NamedLambdaVariable, _),
                Seq(xa: NamedLambdaVariable, ya: NamedLambdaVariable), _)),
            Literal(zero, DoubleType),
            LambdaFunction(Add(
              acc: NamedLambdaVariable, el: NamedLambdaVariable, _),
              Seq(acca: NamedLambdaVariable, ela: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable,
              Seq(fina: NamedLambdaVariable), _))
          if isDoubleArray(a) && isDoubleArray(b) &&
            zero != null &&
            java.lang.Double.compare(zero.asInstanceOf[Double], 0.0) == 0 &&
            x.exprId == xa.exprId && y.exprId == ya.exprId &&
            acc.exprId == acca.exprId && el.exprId == ela.exprId &&
            fin.exprId == fina.exprId =>
        DotProduct(a, b)
    }
}
