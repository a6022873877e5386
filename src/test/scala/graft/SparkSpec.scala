package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for operator specs. One session per JVM
  * (tests fork once); small shuffle partition count keeps tiny-data
  * tests fast.
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSpec.session

  def rows(df: DataFrame): Set[Row] = df.collect().toSet

  def rowSeqs(df: DataFrame): Set[Seq[Any]] =
    df.collect().toSet[Row].map(_.toSeq)
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      // driver-generated events.parquet uses TIMESTAMP(NANOS) (pandas ns)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // sort-based shuffle writer (see Bench) — avoids the bypass
      // writer's O(M·R) tiny-file storm on the suite's many small jobs
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      // codegen class cache sized for the full suite (see Bench) —
      // avoids Janino/C2 recompilation of repeated generated sources
      .config("spark.sql.codegen.cache.maxEntries", "20000")
      // AQE coalescing floor (see Bench) — suite runs the same session
      // shape the bench measures
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64KB")
      // allow shuffled-hash joins (see Bench)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
