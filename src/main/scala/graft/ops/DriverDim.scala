package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Shared tail of the size-switched dim operators ([[Closure]],
  * [[Fixpoint]], graft.scale.Dedup.connectedComponents): parallelize
  * driver-computed rows back out at ~10k rows per partition.
  * Parallelize ships each partition's rows INSIDE its task binary, so
  * the batch size is really a task-size knob: 100k small rows made
  * ~12 MB tasks (Spark warns above 1 MB); 10k keeps tasks near the
  * recommended size, and at the dim scale this path is gated to
  * (driver-switch thresholds, ≤2M rows) the extra task count is noise.
  */
private[graft] object DriverDim {
  def toDF(spark: SparkSession, rows: Seq[Row], schema: StructType): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.size / 10000 + 1)),
      schema)
}
