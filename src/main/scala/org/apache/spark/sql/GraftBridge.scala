package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the package-private Column ↔ catalyst-Expression
  * converters (org.apache.spark.sql.classic.ExpressionUtils, Spark
  * 4.x). Custom Catalyst expressions need this to surface as public
  * `Column`s; confined to this one file. */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly checkpoint `df` WITHOUT `Dataset.checkpoint`'s
    * stats-and-constraints rewrite (`LogicalRDD.fromDataset` copies the
    * origin plan's `sizeInBytes`/`rowCount` into the checkpoint leaf).
    * That rewrite is quadratic-multiplicative across CHAINED
    * checkpoints: a maintained-state loop whose batch-k plan joins the
    * batch-(k−1) checkpoint more than once squares the inherited
    * BigInt size estimate every batch, so by a few dozen batches the
    * driver spends MINUTES multiplying million-digit BigIntegers
    * inside SizeInBytesOnlyStatsPlanVisitor (observed live: Toom-Cook-3
    * frames under `Dataset.localCheckpoint` at batch ~14 of a 17-batch
    * absorb loop). The returned frame carries default leaf statistics
    * instead — correct for the absorb loop, whose hydration/label/
    * census joins all use EXPLICIT broadcast() hints and never rely on
    * estimated sizes.
    *
    * `reliable = true` writes a fault-tolerant RDD checkpoint to the
    * SparkContext checkpoint dir (set by the caller) instead of the
    * executor-memory localCheckpoint. */
  def eagerNoStats(df: Dataset[Row], reliable: Boolean = false): Dataset[Row] = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    // UnsafeRow buffers are reused per partition: copy before caching
    val rdd = df.queryExecution.toRdd.map(_.copy())
    if (reliable) {
      rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      rdd.checkpoint()
    } else rdd.localCheckpoint()
    rdd.count() // materialize now (eager semantics)
    spark.internalCreateDataFrame(rdd, df.schema, isStreaming = false)
  }
}
