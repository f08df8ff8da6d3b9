package graft.plans

import org.apache.spark.sql.SparkSession

/** One-call registration of the native kernel family an operator entry
  * point needs (idempotent; the per-kernel `register` calls remain for
  * single-kernel users). Keeping registration at OPERATOR entries — not a
  * global init — preserves the library property that any session handed a
  * DataFrame works without setup; sessions configured with
  * [[GraftExtensions]] get all of these (and more) via conf instead. */
object Kernels {
  def registerText(spark: SparkSession): Unit = {
    Tokenize.register(spark)
    Hash60.register(spark)
    NgramHash60.register(spark)
    WinnowHash60.register(spark)
    SimHash60.register(spark)
  }
}
