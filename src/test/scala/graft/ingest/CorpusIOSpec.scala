package graft.ingest

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CorpusIOSpec extends graft.SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  test("readJsonl: good lines parse, malformed lines quarantine whole") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toFile
    java.nio.file.Files.writeString(
      new java.io.File(dir, "part.jsonl").toPath,
      """{"doc_id": 1, "text": "hello world"}
        |{"doc_id": 2 "text": "BROKEN no comma"}
        |{"doc_id": 3, "text": "fine again"}
        |""".stripMargin)
    val df = CorpusIO.readJsonl(spark, dir.getAbsolutePath, schema).persist()
    val good = CorpusIO.goodRecords(df)
    assert(good.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 3L))
    val bad = CorpusIO.corruptRecords(df).as[String].collect()
    assert(bad.length === 1 && bad.head.contains("BROKEN"))
    df.unpersist()
  }

  test("latestSnapshot: newest dated subdir wins; undated dirs and files ignored (S1)") {
    val root = java.nio.file.Files.createTempDirectory("landing").toFile
    Seq("2026-01-05", "2026-02-03", "scratch").foreach(d =>
      new java.io.File(root, d).mkdir())
    java.nio.file.Files.writeString(
      new java.io.File(root, "2026-09-09").toPath, "a FILE, not a snapshot dir")
    val got = CorpusIO.latestSnapshot(spark, root.getAbsolutePath)
    assert(got.isDefined && got.get.endsWith("2026-02-03"), s"got $got")
    // empty / absent roots resolve to None, not an exception
    val empty = java.nio.file.Files.createTempDirectory("landing2").toFile
    assert(CorpusIO.latestSnapshot(spark, empty.getAbsolutePath).isEmpty)
    assert(CorpusIO.latestSnapshot(spark, empty.getAbsolutePath + "/nope").isEmpty)
  }

  test("writePartitioned: directory partitions + equality scans prune") {
    val out = java.nio.file.Files.createTempDirectory("pq").toFile.getAbsolutePath
    val docs = Seq(
      (1L, "en", "aa"), (2L, "en", "bb"), (3L, "fr", "cc"), (4L, "de", "dd"))
      .toDF("doc_id", "lang", "text")
    CorpusIO.writePartitioned(docs, out, Seq("lang"), Seq("doc_id"))
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(dirs.toSeq === Seq("lang=de", "lang=en", "lang=fr"))
    val back = spark.read.parquet(out).filter(col("lang") === "en")
    assert(back.count() === 2)
    // partition pruning is visible in the scan's partition filters
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"))
  }
}
