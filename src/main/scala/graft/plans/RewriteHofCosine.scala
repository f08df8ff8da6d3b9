package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the declarative higher-order-function cosine
  * pattern to the fused single-pass [[CosineSimilarity]] expression.
  *
  * Users (and this engine's own operators) write cosine the composable way —
  * `aggregate(zip_with(a, b, (x,y) => x*y), 0d, (s,v) => s+v)` over the two
  * self-dots — which materializes three intermediate arrays per row and
  * folds each. This rule recognizes exactly that shape,
  *
  * {{{ dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))) }}}
  *
  * and substitutes the native expression: one fused loop, no intermediate
  * ArrayData, same WholeStageCodegen stage. The substitution is
  * unconditional because [[CosineSimilarity]] is result-identical on every
  * input class (null arrays, null elements, length mismatch — see its
  * Scaladoc). The declarative form stays the API; the optimizer owns the
  * physical choice — the Catalyst-native way to ship a kernel.
  *
  * Activated via [[GraftExtensions]] (`spark.sql.extensions`) or
  * `spark.experimental.extraOptimizations`. */
object RewriteHofCosine extends Rule[LogicalPlan] {

  /** Matches `aggregate(zip_with(l, r, (x,y) => x*y), 0.0, (s,v) => s+v)`
    * (with the identity finish lambda the `aggregate` API supplies) and
    * yields the two zipped array expressions.
    *
    * Each binary op's operands are pinned BY exprId to the enclosing
    * lambda's own two parameters, in order: `(x, y) => x * x`,
    * `(s, v) => v + v`, or a multiply referencing an outer lambda's
    * variable are all genuinely different folds and must NOT match —
    * `_: NamedLambdaVariable` wildcards alone would rewrite them into a
    * cosine and silently change results. */
  private object Dot {
    private def isParams(a: Expression, b: Expression,
                         args: Seq[NamedLambdaVariable]): Boolean =
      args.length == 2 && ((a, b) match {
        case (x: NamedLambdaVariable, y: NamedLambdaVariable) =>
          x.exprId == args.head.exprId && y.exprId == args(1).exprId
        case _ => false
      })

    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(l, r,
              LambdaFunction(Multiply(mx, my, _), zipArgs, _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(ax, ay, _), aggArgs, _),
            LambdaFunction(fin: NamedLambdaVariable, finArgs, _))
          if isParams(mx, my, zipArgs.collect { case v: NamedLambdaVariable => v }) &&
             isParams(ax, ay, aggArgs.collect { case v: NamedLambdaVariable => v }) &&
             finArgs.collect { case v: NamedLambdaVariable => v }
               .headOption.exists(_.exprId == fin.exprId) =>
        Some((l, r))
      case _ => None
    }
  }

  /** Strips `transform(arr, x -> cast(x as double))` over an
    * `array<float>` feeding the kernel: [[CosineSimilarity]] performs the
    * identical exact widening at read, so the per-row cast array is a pure
    * allocation. Null semantics match (null array → null either way; a
    * null element survives the transform as a null element and poisons the
    * kernel the same as it poisoned the fold). */
  private def unwrapFloatCast(e: Expression): Expression = e match {
    case ArrayTransform(arr,
          LambdaFunction(Cast(v: NamedLambdaVariable, DoubleType, _, _),
                         Seq(arg: NamedLambdaVariable), _))
        if v.exprId == arg.exprId &&
           (arr.dataType match {
             case ArrayType(FloatType, _) => true
             case _ => false
           }) =>
      arr
    case _ => e
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(Dot(a, b),
                  Multiply(Sqrt(Dot(a1, a2)), Sqrt(Dot(b1, b2)), _), _)
          if a.semanticEquals(a1) && a.semanticEquals(a2) &&
             b.semanticEquals(b1) && b.semanticEquals(b2) =>
        CosineSimilarity(unwrapFloatCast(a), unwrapFloatCast(b))
      case CosineSimilarity(a, b)
          if (unwrapFloatCast(a) ne a) || (unwrapFloatCast(b) ne b) =>
        CosineSimilarity(unwrapFloatCast(a), unwrapFloatCast(b))
    }
}
