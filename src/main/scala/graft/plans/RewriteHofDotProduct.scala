package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.VectorDot

/** Optimizer rule: rewrite the declarative dot-product idiom
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, x) => acc + x) }}}
  * into the native codegen'd [[graft.functions.VectorDot]].
  *
  * Users keep writing the composable HOF form; plans run the fused
  * primitive loop — the SparkSessionExtensions `Rule[LogicalPlan]` tier
  * of SURVEY §1.3's extension ladder, applied to the one pattern this
  * library measured as worth it. Injected by [[graft.GraftExtensions]]
  * (config `spark.sql.extensions=graft.GraftExtensions`) or per-session
  * via `spark.experimental.extraOptimizations`.
  *
  * The rewrite is observation-equivalent, not just value-equivalent on
  * the happy path: VectorDot deliberately reproduces the HOF corner
  * semantics (unequal lengths → null, null element → null, same
  * element-order summation). Only double-element arrays match — float
  * arrays would change the multiply precision (`float*float` vs the
  * promoted `double*double`). */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** Both operands are exactly the lambda's two variables (either order —
    * double * and + are bitwise commutative). */
  private def usesBothVars(l: Expression, r: Expression,
                           args: Seq[NamedExpression]): Boolean = {
    val vars = args.collect { case v: NamedLambdaVariable => v.exprId }.toSet
    (l, r) match {
      case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
        vars.size == 2 && Set(a.exprId, b.exprId) == vars
      case _ => false
    }
  }

  private def isIdentity(f: Expression, args: Seq[NamedExpression]): Boolean =
    (f, args) match {
      case (v: NamedLambdaVariable, Seq(a: NamedLambdaVariable)) => v.exprId == a.exprId
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b, LambdaFunction(m: Multiply, margs, _)),
        Literal(0.0, DoubleType),
        LambdaFunction(ad: Add, aargs, _),
        LambdaFunction(fin, fargs, _))
      if isDoubleArray(a) && isDoubleArray(b) &&
        usesBothVars(m.left, m.right, margs) &&
        usesBothVars(ad.left, ad.right, aargs) &&
        isIdentity(fin, fargs) =>
      VectorDot(a, b)
  }
}
