package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Shared tail of the size-switched dim operators ([[Closure]],
  * [[Fixpoint]], graft.scale.Dedup.connectedComponents): parallelize
  * driver-computed rows back out at ~100k rows per partition.
  */
private[graft] object DriverDim {
  def toDF(spark: SparkSession, rows: Seq[Row], schema: StructType): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.size / 100000 + 1)),
      schema)
}
