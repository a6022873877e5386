package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Corpus-scale IO helpers: JSONL ingestion with per-line corruption
  * tolerance (the lingua franca format of LLM training data) and the
  * partitioned + sorted parquet layout the curated output should land
  * in so every later scan prunes.
  */
object CorpusIO {

  val CorruptCol = "_corrupt_record"

  /** Read JSONL with an EXPLICIT schema (schema inference is an extra
    * full pass over the data — never at 100 TB) in PERMISSIVE mode:
    * malformed lines land whole in [[CorruptCol]] instead of failing
    * the job or silently dropping. NB Spark refuses raw-scan queries
    * that reference ONLY the corrupt column — persist the frame before
    * splitting it with [[goodRecords]]/[[corruptRecords]].
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  def goodRecords(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** The raw text of every malformed line, for quarantine/repair. */
  def corruptRecords(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw_line"))

  /** S1's Spark analog (SURVEY §2.1; reference `Downloader.java:15-24`
    * keeps date-stamped local copies of each fetched release and
    * re-reads only if new). The FETCH stays out of engine scope
    * (driver-side curl/cron); the LANDING CONVENTION is engine-side:
    * each fetched release lands under `<root>/<yyyy-MM-dd>/…` (any
    * lexicographically ordered stamp works, e.g. yyyy-MM-ddTHH-mm) and
    * readers resolve the newest dated subdirectory. Pure namenode/
    * object-store LISTing via the Hadoop FileSystem API — works on
    * HDFS/S3/local alike, no data scan, no driver collect of anything
    * row-shaped. A daily LoadMain run does
    * `latestSnapshot(spark, root).map(spark.read.parquet(_))` and
    * re-reads only when a new date directory appeared.
    */
  def latestSnapshot(spark: SparkSession, root: String): Option[String] = {
    val path = new org.apache.hadoop.fs.Path(root)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) None
    else {
      val dated = fs.listStatus(path)
        .filter(_.isDirectory)
        .map(_.getPath)
        .filter(_.getName.matches("""\d{4}-\d{2}-\d{2}.*"""))
      if (dated.isEmpty) None
      else Some(dated.maxBy(_.getName).toString)
    }
  }

  /** Land a curated corpus as partition-pruned, rowgroup-sorted parquet:
    * `partitionCols` become directory partitions (scans with equality
    * predicates read only their directories) and `sortCols` order rows
    * within each file so parquet min/max rowgroup stats prune range
    * predicates. The repartition keeps one task per output partition
    * value set instead of every task writing every directory (the
    * small-files explosion).
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      sortCols: Seq[String]): Unit =
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)
}
