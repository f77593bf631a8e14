package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.DotProduct

/** Optimizer rule: rewrite the interpreted higher-order-function
  * sum-of-squares pattern
  *
  * {{{ aggregate(arr, 0.0D, (acc, x) -> acc + CAST(x) * CAST(x)) }}}
  *
  * into the fused whole-stage-codegen kernel `DotProduct(arr, arr)`.
  *
  * Semantics are preserved exactly: both fold left-to-right in
  * double; a null element poisons both to null; an empty array yields
  * 0.0 in both. Scope is deliberately tight — only float arrays, only
  * the literal-0.0 zero, only an identity finish lambda — so the
  * rewrite can never change types or null behavior. Registered via
  * [[GraftExtensions]] (`injectOptimizerRule`), completing the
  * extension ladder: custom Expression -> Rule[LogicalPlan] ->
  * SparkSessionExtensions.
  */
object FuseDotProduct extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case c: Cast if c.dataType == DoubleType => sameVar(c.child, v)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(arg, Literal(0.0, DoubleType),
          LambdaFunction(add: Add,
            Seq(acc: NamedLambdaVariable, x: NamedLambdaVariable), _),
          LambdaFunction(finishBody, Seq(facc: NamedLambdaVariable), _))
          if arg.dataType.isInstanceOf[ArrayType] &&
            arg.dataType.asInstanceOf[ArrayType].elementType == FloatType &&
            sameVar(finishBody, facc) &&
            (add match {
              case Add(l, Multiply(m1, m2, _), _) =>
                sameVar(l, acc) && sameVar(m1, x) && sameVar(m2, x)
              case _ => false
            }) =>
        val _ = agg
        DotProduct(arg, arg)
    }
}
