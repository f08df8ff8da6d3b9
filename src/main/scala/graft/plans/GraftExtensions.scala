package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: makes the engine's native expressions
  * available in ANY session via configuration, with no code call —
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions ...
  * }}}
  *
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`. The
  * per-session [[CosineSimilarity.register]] remains for sessions created
  * by other code (e.g. the driver harness). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))))
    // declarative HOF cosine → fused native kernel, chosen by the optimizer
    ext.injectOptimizerRule(_ => RewriteHofCosine)
  }
}
