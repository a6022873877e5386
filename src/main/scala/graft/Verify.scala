package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query names (local iteration)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // older testdata vintages wrote events.ts as TIMESTAMP(NANOS); the
      // flag makes those surface as LongType, and SparkEntry.t() maps the
      // current timestamp[us] vintage to the same long-nanos contract
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // r20: sort-based shuffle writer (see Bench) — results identical,
      // the 192-query sweep just spends less time creating tiny files
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      // r21: codegen class cache sized for the 192-query sweep (see
      // Bench) — results identical, the sweep just stops recompiling
      .config("spark.sql.codegen.cache.maxEntries", "20000")
      // r21: AQE coalescing floor for compute-dense tiny-byte shuffles
      // (see Bench) — results identical, partitioning-invariance law
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64KB")
      // r21: allow shuffled-hash joins (see Bench) — strategy-only,
      // results identical
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // A query that throws must leave a LOUD artifact: a swallowed
    // exception just removes the row from the correctness record, which
    // reads as green (this silently hid two regressed queries in round 9).
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // repartition(1), not coalesce(1): a narrow coalesce would fold a
      // shuffle-less query's whole upstream into ONE task (single-thread
      // compute, and for parallelized dims a task binary carrying all
      // the data); the shuffle keeps upstream parallel and the single
      // output file is all the DuckDB compare needs
      try fn(spark, sfDir).repartition(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failures(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // operator-internal caches are per-query; don't accumulate across
      // the 95-query sweep
      graft.ops.CacheScope.releaseAll()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // always written (empty object when clean) so "file absent" can never
    // be confused with "nothing failed"
    val failJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/failures.json"), failJson)
    if (failures.nonEmpty)
      println(s"VERIFY FAILURES: ${failures.size} -> ${failures.keys.mkString(",")}")
    spark.stop()
  }
}
