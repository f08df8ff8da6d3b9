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
    def fn(name: String, clazz: Class[_])(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        builder))
    fn("graft_cosine_sim", classOf[CosineSimilarity])(
      exprs => CosineSimilarity(exprs.head, exprs(1)))
    fn("graft_l2_normalize", classOf[NormalizeVector])(
      exprs => NormalizeVector(exprs.head))
    fn("graft_sign_lsh_bits", classOf[SignLshBits])(SignLshBits.builder)
    fn("graft_nearest_centroid", classOf[NearestCentroid])(NearestCentroid.builder)
    fn("graft_edit_distance", classOf[EditDistanceCapped])(EditDistanceCapped.builder)
    fn("graft_approx_topk", classOf[ApproxTopK])(ApproxTopK.builder)
    fn("graft_collect_capped_long", classOf[CollectCappedLong])(CollectCappedLong.builder)
    fn("graft_bottomk", classOf[BottomK])(BottomK.builder)
    fn("graft_hash60", classOf[Hash60])(Hash60.builder)
    fn("graft_ngram_hash60", classOf[NgramHash60])(NgramHash60.builder)
    fn("graft_winnow_hash60", classOf[WinnowHash60])(WinnowHash60.builder)
    fn("graft_simhash60", classOf[SimHash60])(SimHash60.builder)
    fn("graft_tokens", classOf[Tokenize])(Tokenize.builder)
    fn("graft_quality_counts", classOf[CharClassCounts]) {
      case Seq(c) => CharClassCounts(c)
      case exprs => throw new IllegalArgumentException(
        s"graft_quality_counts(col) takes one argument, got ${exprs.size}")
    }
    fn("graft_bpe_encode_len", classOf[BpeEncodeLen])(BpeEncodeLen.builder)
    // bloom pruning pair (SQL users get the same codegen'd predicates the
    // BloomJoin operator uses)
    fn("graft_bloom_agg",
       classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate])(
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs.head, exprs(1), exprs(2)))
    fn("graft_bloom_contains",
       classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain])(
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs.head, exprs(1)))
    // declarative HOF cosine → fused native kernel, chosen by the optimizer
    ext.injectOptimizerRule(_ => RewriteHofCosine)
  }
}
