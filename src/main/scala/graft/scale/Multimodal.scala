package graft.scale

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines at 100 TB: media
  * payloads are opaque `binary` columns with typed metadata structs;
  * decode / feature-extract / thumbnail / frame-sample run as BATCHED
  * per-partition transforms so a vectorized decoder amortizes its setup
  * across a batch (the Scala analog of `mapInPandas`).
  *
  * The DECODERS here are deliberate STUBS — this container has no
  * image/audio codecs — producing deterministic fake outputs derived
  * from the payload bytes. Everything AROUND the stub is real and
  * load-bearing: the schema contract, the partition-batched execution
  * shape, null/corrupt handling, and the column plumbing. Swapping a
  * real decoder in changes only the function body marked STUB.
  */
object Multimodal {

  /** Typed row for a media asset: the binary payload plus metadata.
    * (`binaryFile` source produces path/length/content — see [[readDir]]).
    */
  final case class Asset(
      assetId: Long,
      modality: String, // "image" | "audio" | "video"
      content: Array[Byte],
      declaredFormat: String)

  final case class ImageFeatures(
      assetId: Long,
      width: Int,
      height: Int,
      format: String,
      ok: Boolean,
      embedding: Array[Float])

  /** Read a directory of media files as (path, length, binary content)
    * — Spark's binaryFile source; filter pushdown applies to path glob
    * and file size, and content is NOT materialized until the row is
    * consumed.
    */
  def readDir(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        col("path"),
        col("length"),
        col("content"))

  /** Number of assets decoded per inner batch inside a partition. Real
    * decoders amortize model/codec setup per batch; the stub keeps the
    * same loop structure so the execution shape is tested.
    */
  val DecodeBatchSize = 64

  /** STUB decode: a real implementation binds an image codec here
    * (JPEG/PNG header parse + pixel decode). The fake derives
    * deterministic dimensions and an embedding from the payload bytes,
    * and flags empty payloads as corrupt (`ok = false`) the way a real
    * decoder surfaces codec errors — callers must handle both.
    */
  private[scale] def decodeImageBatchStub(batch: Seq[Asset]): Seq[ImageFeatures] =
    batch.map { a =>
      if (a.content == null || a.content.isEmpty) {
        ImageFeatures(a.assetId, 0, 0, a.declaredFormat, ok = false, Array.empty)
      } else {
        var h = 1125899906842597L // deterministic FNV-ish fold of the payload
        a.content.foreach(b => h = h * 31 + (b & 0xff))
        val width = 64 + math.floorMod(h, 512).toInt
        val height = 64 + math.floorMod(h >> 16, 512).toInt
        val emb = Array.tabulate(8) { i =>
          (math.floorMod(h >> (i * 7), 2048) / 1024.0f) - 1.0f
        }
        ImageFeatures(a.assetId, width, height, a.declaredFormat, ok = true, emb)
      }
    }

  /** Decode + feature-extract over a distributed asset set: one pass,
    * partition-batched. The output is a columnar features table ready
    * for the similarity/dedup operators (embedding column feeds
    * [[Similarity]]).
    */
  def imageFeatures(assets: Dataset[Asset]): Dataset[ImageFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(batch => decodeImageBatchStub(batch.toSeq))
    }
  }

  /** Frame sampling for video payloads: emit `n` evenly-spaced virtual
    * frame offsets per asset (explode — one output row per frame). The
    * frame EXTRACTION at each offset is the same STUB boundary as
    * decode; the row multiplication and offset arithmetic are real.
    */
  def sampleFrames(assets: DataFrame, n: Int, durationCol: String): DataFrame =
    assets
      .withColumn("frame_idx", explode(sequence(lit(0), lit(n - 1))))
      .withColumn(
        "frame_offset_ms",
        (col(durationCol) * col("frame_idx") / n).cast("long"))
}
