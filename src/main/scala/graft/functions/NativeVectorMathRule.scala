package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrites the higher-order-function dot-product idiom
  *
  *   `aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)`
  *
  * into the fused native [[DotProduct]] expression. Users keep writing the
  * declarative HOF form; plans silently lose the zipped intermediate array
  * and per-element lambda frames (~3× on the similarity-search hot loop).
  * Accumulation order is unchanged (left fold in element order), so the
  * rewrite is bit-exact — verified by `NativeVectorMathRuleSpec`.
  *
  * Installed via `SparkSessionExtensions.injectOptimizerRule`
  * ([[GraftExtensions]]) or late via [[GraftExtensions.installOptimizations]]
  * (`spark.experimental.extraOptimizations`).
  */
object NativeVectorMathRule extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, arg: Expression): Boolean = (e, arg) match {
    case (a: NamedLambdaVariable, b: NamedLambdaVariable) => a.exprId == b.exprId
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(mx, my, _), Seq(zx, zy), _)),
          Literal(zero, DoubleType),
          LambdaFunction(Add(sl, sr, _), Seq(macc, mv), _),
          LambdaFunction(fin, Seq(facc), _))
        if zero == 0.0 &&
           isDoubleArray(a) && isDoubleArray(b) &&
           ((sameVar(mx, zx) && sameVar(my, zy)) ||
            (sameVar(mx, zy) && sameVar(my, zx))) &&
           ((sameVar(sl, macc) && sameVar(sr, mv)) ||
            (sameVar(sl, mv) && sameVar(sr, macc))) &&
           sameVar(fin, facc) =>
      DotProduct(a, b)
  }
}
