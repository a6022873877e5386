package graft.pipelines

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ingest.CorpusIO
import graft.scale.Curation

/** CLI for the corpus-curation export (the q87 chain as a runnable):
  * `runMain graft.pipelines.CurationMain <docs-parquet> <holdout-parquet> <out-dir>`.
  *
  * Curates `<docs-parquet>` (quality gate → exact dedup → holdout
  * decontamination → token-budget shard packing, `Curation.curate`),
  * joins the shard assignment back to the document text, and lands the
  * export as shard-partitioned, id-sorted parquet
  * (`CorpusIO.writePartitioned`) — the directory layout a training
  * reader consumes (one dir per shard, deterministic order within).
  * Prints the K7-style run counters: docs in, survivors, shards,
  * token total.
  *
  * The text join is the one step q87 does not gate (the gate compares
  * assignments; the export needs the bytes): an id-equi join between
  * the slim assignment frame and the corpus scan — at 100 TB both
  * sides shuffle on id once, or zero times when the corpus store is
  * id-bucketed (the SnapshotStore layout).
  */
object CurationMain {

  final case class Result(nIn: Long, nKept: Long, nShards: Long, totalTokens: Long)

  def run(
      spark: SparkSession,
      docsPath: String,
      holdoutPath: String,
      outDir: String,
      minTokens: Int = 20,
      shardBudget: Long = 2000L): Result = {
    val docs = spark.read.parquet(docsPath)
    val holdout = spark.read.parquet(holdoutPath)
    val packed = Curation.curate(
      docs, holdout, "doc_id", "text",
      minTokens = minTokens, shardBudget = shardBudget)
    val export = packed.join(docs.select("doc_id", "text"), Seq("doc_id"))
    CorpusIO.writePartitioned(export, outDir,
      partitionCols = Seq("shard"), sortCols = Seq("doc_id"))
    val stats = spark.read.parquet(outDir)
      .agg(count(lit(1)).as("n"), countDistinct(col("shard")).as("s"),
        sum(col("n_tokens")).as("tok"))
      .collect().head
    Result(docs.count(), stats.getLong(0), stats.getLong(1), stats.getLong(2))
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: CurationMain <docs-parquet> <holdout-parquet> <out-dir> [minTokens] [shardBudget]")
    val spark = SparkSession.builder()
      .appName("graft-curation")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    try {
      val r = run(spark, args(0), args(1), args(2),
        if (args.length > 3) args(3).toInt else 20,
        if (args.length > 4) args(4).toLong else 2000L)
      println(s"[curation] docs_in=${r.nIn} kept=${r.nKept} " +
        s"shards=${r.nShards} total_tokens=${r.totalTokens}")
    } finally spark.stop()
  }
}
