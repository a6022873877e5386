package graft.pipelines

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationMainIntegrationSpec extends SparkSpec {

  test("curate -> export: shard-partitioned parquet matches the q87 assignment") {
    val dir = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files.createTempDirectory("curation").toFile.getAbsolutePath
    val docsPath = s"$tmp/train.parquet"
    val holdPath = s"$tmp/holdout.parquet"
    val outDir = s"$tmp/export"
    val all = spark.read.parquet(s"$dir/documents.parquet")
    all.filter(col("doc_id") % 11 =!= 0).write.parquet(docsPath)
    all.filter(col("doc_id") % 11 === 0).write.parquet(holdPath)

    val r = CurationMain.run(spark, docsPath, holdPath, outDir)
    assert(r.nIn === all.filter(col("doc_id") % 11 =!= 0).count())
    assert(r.nKept > 0 && r.nKept < r.nIn) // every stage drops something
    assert(r.nShards >= 1)

    // the export's shard assignment equals the operator's (same curate
    // call, independent run — determinism through the export path)
    val exported = spark.read.parquet(outDir)
      .select("doc_id", "n_tokens", "shard")
    val direct = graft.scale.Curation.curate(
      spark.read.parquet(docsPath), spark.read.parquet(holdPath), "doc_id", "text")
    assert(rows(exported) === rows(direct))

    // layout: one directory per shard (the training-reader contract),
    // text riding along
    val shardDirs = new java.io.File(outDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.length.toLong === r.nShards)
    assert(spark.read.parquet(outDir).filter(col("text").isNull).count() === 0)

    // re-run lands the identical export (mode overwrite, deterministic
    // assignment)
    val r2 = CurationMain.run(spark, docsPath, holdPath, outDir)
    assert(r2 === r)
  }
}
