package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary profiling / demo harness (not part of the library surface). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    if (args.headOption.contains("ext")) {
      // the config-route surface: a session built with
      // spark.sql.extensions=graft.GraftExtensions resolves the SQL names
      val s2 = SparkSession.builder()
        .master(s"local[4]")
        .config("spark.sql.extensions", "graft.GraftExtensions")
        .appName("ext-demo")
        .getOrCreate()
      val row = s2.sql(
        "SELECT trim_utf8_bytes(repeat('x', 50), 12) AS t, " +
          "dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
          "word_shingles(split('a b c d', ' '), 2) AS sh").head()
      println(s"[demo] ext trim=${row.get(0)} dot=${row.get(1)} shingles=${row.get(2)}")
      s2.stop()
      return
    }

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (args.headOption.contains("streaming")) {
      // drive StreamingOps over the real events table as a FILE STREAM:
      // same parquet layout, readStream instead of read (ts is NANOS ->
      // surface as long; rebuild a timestamp column for the watermark)
      // file streaming sources watch a DIRECTORY; stage the table file
      val dir = java.nio.file.Files.createTempDirectory("events_stream")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sfDir/events.parquet"),
        dir.resolve("events.parquet"))
      val batchSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
      val stream = spark.readStream
        .schema(batchSchema)
        .parquet(dir.toString)
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      val q = graft.streaming.StreamingOps
        .windowedCounts(stream, "1 hour", "10 minutes")
        .writeStream.format("memory").queryName("stream_demo")
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
      val n = spark.table("stream_demo").count()
      val sample = spark.table("stream_demo").orderBy(desc("n")).limit(3)
        .selectExpr("window.start", "event_type", "n").collect()
      println(s"[demo] streaming windowedCounts closed-window rows=$n")
      sample.foreach(r => println(s"[demo] ${r.get(0)} ${r.get(1)} n=${r.get(2)}"))
      // sessionization over the same file stream
      import spark.implicits._
      val evStream = stream.selectExpr("event_id AS eventId", "ts", "user_id AS userId",
        "event_type AS eventType", "value").as[graft.streaming.StreamingOps.Event]
      val q2 = graft.streaming.StreamingOps.sessionize(evStream, gapMs = 6 * 3600 * 1000L)
        .writeStream.format("memory").queryName("sess_demo").outputMode("append").start()
      q2.processAllAvailable()
      q2.stop()
      println(s"[demo] streaming sessionize closed sessions=${spark.table("sess_demo").count()}")
      spark.stop()
      return
    }

    if (args.headOption.contains("scale23")) {
      // scaling behavior of the MinHash-LSH pipeline: same operator at
      // 1x and 10x the doc count (ids offset so copies are exact dups
      // of distinct docs — candidate pairs grow ~linearly x copies^2
      // within buckets of identical docs)
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      Seq(1, 10).foreach { copies =>
        val scaled = (0 until copies)
          .map(c => docs.select((col("doc_id") + lit(c * 1000000)).as("doc_id"), col("text")))
          .reduce(_.unionByName(_))
          .repartition(spark.sparkContext.defaultParallelism)
        val t0 = System.nanoTime()
        val n = graft.scale.Dedup
          .minhashPairsExact(scaled, "doc_id", "text", 3, 16, 8, 0.2)
          .count()
        println(f"[demo] scale23 copies=$copies docs=${5000 * copies} pairs=$n t=${(System.nanoTime() - t0) / 1e9}%.1fs")
      }
      spark.stop()
      return
    }

    if (args.headOption.contains("plancounts")) {
      // static-plan Exchange / nested-loop census per query (AQE off so
      // the shape is deterministic) — feeds PlanGuardSpec's budgets
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      SparkEntry.queries.keys.toSeq.sorted.foreach { q =>
        val p = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").queryExecution.executedPlan
        var ex = 0; var bnlj = 0
        p.foreach { n =>
          if (n.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange]) ex += 1
          if (n.nodeName.contains("BroadcastNestedLoop") ||
            n.nodeName.contains("CartesianProduct")) bnlj += 1
        }
        println(s"[plan] $q exchanges=$ex bnlj=$bnlj")
      }
      spark.stop()
      return
    }

    if (args.headOption.contains("entry")) {
      val n = SparkEntry.entry(spark).count()
      println(s"[demo] entry rows=$n")
      spark.stop()
      return
    }

    if (args.headOption.contains("explain")) {
      args.drop(1).foreach { name =>
        println(s"===== $name =====")
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      }
      spark.stop()
      return
    }

    spark.range(1000000).selectExpr("sum(id)").collect()
    val names = if (args.isEmpty) Seq("q23_lsh_pairs") else args.toSeq
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[profile] $name run$i rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
