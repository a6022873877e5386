package graft.scale

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines at 100 TB: media
  * payloads are opaque `binary` columns with typed metadata structs;
  * decode / feature-extract / thumbnail / frame-sample run as BATCHED
  * per-partition transforms so a vectorized decoder amortizes its setup
  * across a batch (the Scala analog of `mapInPandas`).
  *
  * Image decode is REAL end-to-end: PPM (binary netpbm) through the
  * hand-rolled parser ([[decodePpm]]), JPEG / PNG / BMP / GIF / TIFF
  * through the JDK's `javax.imageio` readers ([[decodeJavaImage]]) —
  * no external jars. Audio decode is REAL for every container the
  * JDK's `javax.sound.sampled` registry reads (WAV / AIFF / AU):
  * [[decodeAudio]] converts to signed 16-bit PCM, mixes down to mono,
  * and [[audioWindowStats]] computes per-window RMS / peak over the
  * ACTUAL samples. Payloads no reader accepts flag corrupt
  * (`ok = false`), never fake features. Only VIDEO frame extraction
  * remains a stub boundary (no video codec ships with the JDK):
  * [[sampleFrames]] computes the real offset arithmetic and leaves
  * per-frame decode to a bound codec.
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

  /** REAL decoder for binary netpbm (PPM "P6") payloads — a codec-free
    * format this container can parse end-to-end: ASCII header
    * `P6 <width> <height> <maxval>` (whitespace-separated, `#` comments
    * allowed) followed by `width*height` RGB samples (1 byte/channel for
    * maxval < 256, 2 big-endian bytes otherwise). The 8-dim embedding is
    * mean R/G/B, mean luma, the two horizontal-half lumas, and the two
    * vertical-half lumas — deterministic pixel statistics a similarity
    * pass can consume directly.
    *
    * Returns None when the payload is not a well-formed P6 (caller
    * falls through to the stub or flags corrupt).
    */
  private[scale] def decodePpm(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] =
    decodePpmParsed(bytes).map { case (w, h, sample) =>
      (w, h, statsEmbedding(w, h) { p =>
        (sample(p * 3), sample(p * 3 + 1), sample(p * 3 + 2))
      })
    }

  /** The shared 8-dim pixel-statistics embedding over any decoded
    * raster: mean R/G/B, mean luma, and the left/right/top/bottom half
    * lumas — identical whether the pixels came from the PPM parser or a
    * `javax.imageio` reader, so mixed-format corpora embed into ONE
    * comparable space. `rgb` maps flat pixel index `y*w + x` to
    * maxval-normalized channel values in [0, 1].
    */
  private def statsEmbedding(w: Int, h: Int)(rgb: Int => (Double, Double, Double)): Array[Float] = {
    val sums = new Array[Double](3)       // per-channel
    val halves = new Array[Double](4)     // left/right/top/bottom luma
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = rgb(y * w + x)
        sums(0) += r; sums(1) += g; sums(2) += b
        val luma = 0.299 * r + 0.587 * g + 0.114 * b
        halves(if (x * 2 < w) 0 else 1) += luma
        halves(if (y * 2 < h) 2 else 3) += luma
        x += 1
      }
      y += 1
    }
    val n = w.toDouble * h
    val meanLuma = 0.299 * sums(0) / n + 0.587 * sums(1) / n + 0.114 * sums(2) / n
    Array(
      (sums(0) / n).toFloat, (sums(1) / n).toFloat, (sums(2) / n).toFloat,
      meanLuma.toFloat,
      (halves(0) / n * 2).toFloat, (halves(1) / n * 2).toFloat,
      (halves(2) / n * 2).toFloat, (halves(3) / n * 2).toFloat)
  }

  /** REAL decoder for every format the JDK's `javax.imageio` registry
    * ships a reader for — JPEG, PNG, BMP, GIF, WBMP, TIFF (`java.desktop`
    * module; no external jars). Returns (width, height, reader format
    * name, embedding) or None when no registered reader accepts the
    * payload / the stream is truncated — the caller flags corrupt, it
    * never fabricates features. One `getRGB` bulk grab per image keeps
    * the per-pixel loop off the BufferedImage accessor path.
    */
  private[scale] def decodeJavaImage(bytes: Array[Byte]): Option[(Int, Int, String, Array[Float])] =
    decodeJavaImageRaw(bytes).collect { case (img, fmt) if img.getWidth > 0 && img.getHeight > 0 =>
      val w = img.getWidth; val h = img.getHeight
      val px = img.getRGB(0, 0, w, h, null, 0, w) // one bulk grab, not per-pixel accessor calls
      val emb = statsEmbedding(w, h) { p =>
        val v = px(p)
        (((v >> 16) & 0xff) / 255.0, ((v >> 8) & 0xff) / 255.0, (v & 0xff) / 255.0)
      }
      (w, h, fmt, emb)
    }

  /** P6 header + raster parse: (width, height, maxval-normalized sample
    * accessor over the flat RGB index space). None unless well-formed
    * with a complete raster.
    */
  private def decodePpmParsed(bytes: Array[Byte]): Option[(Int, Int, Int => Double)] = {
    if (bytes == null || bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    var pos = 2
    def skipSeparators(): Unit = {
      var more = true
      while (more && pos < bytes.length) {
        val c = bytes(pos)
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pos += 1
        else if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else more = false
      }
    }
    def readInt(): Option[Int] = {
      skipSeparators()
      var v = 0L
      var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); any = true; pos += 1
      }
      if (any && v <= Int.MaxValue) Some(v.toInt) else None
    }
    for {
      w <- readInt()
      h <- readInt()
      maxval <- readInt()
      if w > 0 && h > 0 && maxval > 0 && maxval < 65536
      bytesPerSample = if (maxval < 256) 1 else 2
      // exactly ONE whitespace byte separates header from raster
      if pos < bytes.length &&
        (bytes(pos) == ' ' || bytes(pos) == '\t' || bytes(pos) == '\n' || bytes(pos) == '\r') &&
        { pos += 1; true }
      if bytes.length - pos >= w.toLong * h * 3 * bytesPerSample
    } yield {
      val start = pos
      val sample: Int => Double = { i =>
        val off = start + i * bytesPerSample
        val raw =
          if (bytesPerSample == 1) bytes(off) & 0xff
          else ((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)
        raw.toDouble / maxval
      }
      (w, h, sample)
    }
  }

  /** REAL nearest-neighbor resize for P6 payloads: re-emits a valid PPM
    * at (targetW, targetH) with 1-byte samples. None for malformed
    * input — same contract as [[decodePpm]]. Thumbnailing at ingest is
    * how a 100 TB image corpus shrinks before the expensive model pass.
    */
  private[scale] def resizePpm(bytes: Array[Byte], targetW: Int, targetH: Int): Option[Array[Byte]] = {
    if (targetW <= 0 || targetH <= 0) return None
    decodePpmParsed(bytes).map { case (w, h, sample) =>
      val header = s"P6\n$targetW $targetH\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + targetW * targetH * 3)
      System.arraycopy(header, 0, out, 0, header.length)
      var ty = 0
      while (ty < targetH) {
        val sy = ty * h / targetH
        var tx = 0
        while (tx < targetW) {
          val sx = tx * w / targetW
          val sp = (sy * w + sx) * 3
          val tp = header.length + (ty * targetW + tx) * 3
          out(tp) = (sample(sp) * 255.0).round.toByte
          out(tp + 1) = (sample(sp + 1) * 255.0).round.toByte
          out(tp + 2) = (sample(sp + 2) * 255.0).round.toByte
          tx += 1
        }
        ty += 1
      }
      out
    }
  }

  /** Batched decode — REAL for every image format this JVM can read:
    * PPM through [[decodePpm]], everything else through the
    * `javax.imageio` registry ([[decodeJavaImage]]: JPEG/PNG/BMP/GIF/
    * TIFF). Empty, truncated, or reader-less payloads flag corrupt
    * (`ok = false`, empty embedding) the way a production decoder
    * surfaces codec errors — callers must handle both. The batch loop
    * is where a vectorized/model decoder would amortize per-batch
    * setup; `javax.imageio` needs none, so the body is a plain map.
    */
  private[scale] def decodeImageBatch(batch: Seq[Asset]): Seq[ImageFeatures] =
    batch.map { a =>
      if (a.content == null || a.content.isEmpty) {
        ImageFeatures(a.assetId, 0, 0, a.declaredFormat, ok = false, Array.empty)
      } else if (a.declaredFormat == "ppm" ||
        (a.content.length >= 2 && a.content(0) == 'P' && a.content(1) == '6')) {
        decodePpm(a.content) match {
          case Some((w, h, emb)) => ImageFeatures(a.assetId, w, h, "ppm", ok = true, emb)
          case None => ImageFeatures(a.assetId, 0, 0, "ppm", ok = false, Array.empty)
        }
      } else {
        decodeJavaImage(a.content) match {
          case Some((w, h, fmt, emb)) => ImageFeatures(a.assetId, w, h, fmt, ok = true, emb)
          case None => ImageFeatures(a.assetId, 0, 0, a.declaredFormat, ok = false, Array.empty)
        }
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
      it.grouped(DecodeBatchSize).flatMap(batch => decodeImageBatch(batch.toSeq))
    }
  }

  /** JOINT image-text pair curation — dedup of an (image, caption)
    * corpus where a duplicate needs BOTH modalities to agree: two rows
    * are an edge iff their captions are MinHash-LSH near-dups
    * ([[graft.scale.Dedup.minhashPairsExact]]) AND their images are
    * compatible — the SAME image payload (content identity) or an
    * embedding near-dup pair ([[graft.scale.Similarity.cosineNearDupPairs]]
    * over the decoded stats embeddings, inheriting its bucket-cap
    * contract). Clusters resolve by connected components and keep the
    * (priority, id)-argmin survivor ([[graft.scale.Dedup.dedupByClusterPriority]]).
    *
    * `images` is the DISTINCT image space — (imgCol, embedding, ok),
    * e.g. [[imageFeatures]] over a content-addressed store — decoded
    * ONCE; at 100 TB you embed distinct payloads, never per-row
    * re-decodes, and `assign` (idCol → imgCol) is the row-to-payload
    * mapping. Corrupt payloads (ok = false) carry no embedding and can
    * only match by content identity — a decoder failure must not
    * manufacture similarity. Identity compatibility derives from the
    * ASSIGNMENT side, so same-payload dedup holds even for keys a
    * caller never decoded into `images` (a missing embedding degrades
    * to identity-only matching, never to silent under-dedup). The compatibility relation is image-space
    * sized and broadcasts into the caption-pair probe: the corpus-sized
    * side never shuffles for the image gate.
    *
    * One modality alone never merges (law, spec-pinned): same caption
    * with incompatible images stays, same image with unrelated captions
    * stays.
    *
    * @return `docs` rows (idCol, priorityCol) of the kept survivors
    */
  def imageTextPairDedup(
      docs: DataFrame,
      assign: DataFrame,
      images: DataFrame,
      idCol: String,
      textCol: String,
      priorityCol: String,
      imgCol: String,
      cosineThreshold: Double = 0.999,
      dims: Int = 8,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      bands: Int = 8,
      jaccardThreshold: Double = 0.2): DataFrame =
    jointPairDedup(docs, assign, images, idCol, textCol, priorityCol,
      imgCol, "imageTextPairDedup", cosineThreshold, dims, shingleSize,
      numHashes, bands, jaccardThreshold)

  /** [[imageTextPairDedup]]'s AUDIO twin — joint dedup of an
    * (audio, caption) corpus over the SAME compatibility lattice
    * (identity ∪ embedding near-dup, × caption near-dup), with
    * [[audioStatsEmbedding]]'s segment-RMS envelope in place of the
    * image stats embedding: `audio` is the DISTINCT clip space
    * (keyCol, embedding, ok) decoded ONCE, corrupt payloads match by
    * content identity only, and one modality alone never merges (law,
    * spec-pinned, both directions). All the image operator's contracts
    * — assign coverage + uniqueness, identity-from-the-assignment-side,
    * the broadcast compatibility probe — apply verbatim.
    *
    * @return `docs` rows (idCol, priorityCol) of the kept survivors
    */
  def audioTextPairDedup(
      docs: DataFrame,
      assign: DataFrame,
      audio: DataFrame,
      idCol: String,
      textCol: String,
      priorityCol: String,
      audioCol: String,
      cosineThreshold: Double = 0.999,
      dims: Int = 8,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      bands: Int = 8,
      jaccardThreshold: Double = 0.2): DataFrame =
    jointPairDedup(docs, assign, audio, idCol, textCol, priorityCol,
      audioCol, "audioTextPairDedup", cosineThreshold, dims, shingleSize,
      numHashes, bands, jaccardThreshold)

  /** The shared two-modality joint-dedup core: the lattice is
    * modality-agnostic once the distinct payload space arrives as
    * (keyCol, embedding, ok) — image stats and audio envelopes run the
    * same plan.
    */
  private def jointPairDedup(
      docs: DataFrame,
      assign: DataFrame,
      modal: DataFrame,
      idCol: String,
      textCol: String,
      priorityCol: String,
      keyCol: String,
      opName: String,
      cosineThreshold: Double,
      dims: Int,
      shingleSize: Int,
      numHashes: Int,
      bands: Int,
      jaccardThreshold: Double): DataFrame = {
    import org.apache.spark.sql.functions._
    val emb = modal.filter(col("ok"))
      .select(col(keyCol).as("id"), col("embedding"))
    val modPairs = Similarity.cosineNearDupPairs(
      emb, "id", "embedding", cosineThreshold, dims = dims)
      .select(col("id_a").as("key_a"), col("id_b").as("key_b"))
    // identity compatibility comes from the ASSIGNMENT side, not the
    // payload frame: content identity (same payload key) needs no
    // decode, and deriving it from `modal` would silently disable
    // same-payload dedup for any assigned key missing from the decoded
    // frame (e.g. a caller that only embeds decodable payloads) — the
    // silent-under-dedup class. The distinct-key agg is payload-space-
    // sized after its map-side partial merge.
    val compat = modPairs
      .unionByName(modPairs.select(col("key_b").as("key_a"), col("key_a").as("key_b")))
      .unionByName(assign.select(col(keyCol)).distinct()
        .select(col(keyCol).as("key_a"), col(keyCol).as("key_b")))
    // LINEAGE-CUT: the caption pairs feed the join chain AND the
    // coverage guard branch below
    val capPairs = graft.ops.CacheScope.cut(Dedup.minhashPairsExact(
      docs, idCol, textCol, shingleSize, numHashes, bands, jaccardThreshold))
    def side(tag: String) = assign.select(
      col(idCol).as(s"id_$tag"), col(keyCol).as(s"key_$tag"))
    // COVERAGE as a UNION BRANCH, not an in-plan assert on the join
    // output: a guard column anywhere under the compat semi-join is
    // skippable — with an EMPTY compatibility side AQE's
    // empty-relation propagation replans the join away without ever
    // executing the projection that carries the assert (the exact
    // class EagerContracts documents as unguardable in-plan). A union
    // child always executes: this branch anti-joins the pair docs
    // against the assignment and emits one ASSERTING row per uncovered
    // doc — zero rows (a no-op union) whenever coverage holds.
    val idType = docs.schema(idCol).dataType
    val pairDocs = capPairs.select(col("id_a").as("__id"))
      .unionByName(capPairs.select(col("id_b").as("__id")))
      .distinct()
    val uncovered = pairDocs
      .join(assign.select(col(idCol).as("__id")), Seq("__id"), "left_anti")
      .select(
        (coalesce(
          assert_true(lit(false),
            lit(s"$opName: a caption-pair doc has no row in the " +
              "assignment frame — its pair would silently drop from " +
              "the joint edge set")).cast("long"),
          lit(0L)).cast(idType)).as("id_a"),
        col("__id").cast(idType).as("id_b"))
    // assign must be ONE payload key per doc: a duplicate doc id would
    // fan every caption pair out per copy AND make the doc's identity
    // edge ambiguous; a null id can never join a pair and would hide a
    // missing assignment. Checked as a second asserting UNION BRANCH
    // (the `uncovered` pattern — a union child always executes, so
    // unlike an eager EagerContracts job this costs NOTHING when the
    // composed plan is never run, and unlike an in-plan assert on the
    // join output it cannot be planned away by AQE's empty-relation
    // propagation). The branch is one hash agg over assign's two slim
    // columns; zero rows (a no-op union) whenever the contract holds.
    val badAssign = assign.groupBy(col(idCol))
      .agg(count(lit(1)).as("__c"))
      .filter(col(idCol).isNull || col("__c") > 1L)
      .select(
        coalesce(
          assert_true(lit(false),
            when(col(idCol).isNull,
              lit(s"$opName: the assignment frame has a null doc key — " +
                "it can never join a caption pair and hides a missing " +
                "assignment"))
              .otherwise(
                lit(s"$opName: the assignment frame has a duplicate doc " +
                  "key — each copy would fan its caption pairs out per " +
                  "copy and make its payload identity ambiguous")))
            .cast("long"),
          lit(0L)).cast(idType).as("id_a"),
        col(idCol).cast(idType).as("id_b"))
    val joint = capPairs
      .join(side("a"), Seq("id_a"))
      .join(side("b"), Seq("id_b"))
      .join(broadcast(compat), Seq("key_a", "key_b"), "left_semi")
      .select(col("id_a"), col("id_b"))
      .unionByName(uncovered)
      .unionByName(badAssign)
    Dedup.dedupByClusterPriority(
      docs.select(col(idCol), col(priorityCol)), joint, idCol, priorityCol)
  }

  /** The INTERLEAVED MULTIMODAL TOKEN STREAM — the missing composition
    * between a text token stream and a payload assignment: the
    * multimodal-pretraining loader contract wants ONE positional
    * stream per document where a reserved PLACEHOLDER token marks the
    * payload's position and a parallel long channel carries the
    * payload KEY to resolve at load time (the trainer mmaps token ids;
    * the loader fetches payload bytes by key from the content store —
    * bytes never ride the token tensor). This operator emits that
    * stream: for every assigned document a placeholder row at position
    * 0 (`token_id = placeholderId`, `payload_key` = the assignment's
    * key) with the text tokens shifted one position right; unassigned
    * documents pass through untouched; an assignment whose document
    * has NO text rows still emits its placeholder (a payload-only
    * sample — an image with an empty caption is data, not an error).
    * Text rows carry `payload_key = −1`.
    *
    * Feed [[graft.scale.ShardPack.materializeSequencesWithChannels]]
    * (channel `payload_key`) for the packed artifact: keys then ride
    * exactly the placeholder positions of each sequence (spec-pinned),
    * and the export satisfies the split-layout fsck
    * ([[graft.scale.ShardPack.checkSplitManifest]]) unchanged.
    *
    * CONTRACTS, all fail-loud: `placeholderId` must be negative (piece
    * vocabulary ids are nonnegative by the
    * [[graft.scale.Bpe.pieceVocab]] rank contract — a colliding id
    * would make a real token unresolvable from a placeholder);
    * duplicate, null, or NEGATIVE assignment keys refuse IN-PLAN by
    * name (a duplicate would emit two placeholders at position 0 and
    * corrupt every downstream offset; a negative key collides with
    * the −1 no-payload sentinel). The guard rides a union branch's
    * FILTER PREDICATE — zero eager cost, and unlike a
    * projection-borne assert it survives column pruning for ANY
    * consumer, including a bare count().
    *
    * Conservation laws (spec-pinned): output rows == text rows +
    * assignment rows; placeholder rows == assignment rows; per-doc
    * positions stay dense 0-based.
    *
    * Scale shape: ONE left join of the corpus-sized stream against the
    * doc-count-sized assignment (key columns only) + a union of slim
    * projections; no shuffle beyond the join, no windows, no collects.
    *
    * @param tokenStream (idCol, tok_idx, token_id) — tok_idx densely
    *                    0-based per doc, e.g.
    *                    [[graft.scale.Bpe.encodeIndexedIds]]
    * @param assign      (idCol, keyCol) — at most one payload per doc
    * @return (idCol, tok_idx, token_id, payload_key)
    */
  def interleavedTokenStream(
      tokenStream: DataFrame,
      assign: DataFrame,
      idCol: String,
      keyCol: String,
      placeholderId: Long = -2L): DataFrame = {
    import org.apache.spark.sql.functions._
    require(placeholderId < 0,
      s"interleavedTokenStream: placeholderId must be negative (vocab ids " +
        s"are nonnegative by the pieceVocab contract), got $placeholderId")
    val idType = tokenStream.schema(idCol).dataType
    val a = assign.select(col(idCol).cast(idType).as(idCol),
      col(keyCol).cast("long").as("__key"))
    // the asserting union branch: one hash agg over the slim
    // assignment. The assert lives in the FILTER PREDICATE, not an
    // output column — a projection-borne assert is deleted by column
    // pruning for any consumer that drops that column (the r19
    // self-review finding), while a filter predicate must evaluate for
    // every aggregated row no matter which columns (or none — a bare
    // count()) the consumer reads. Negative keys are violations too:
    // −1 is the text rows' no-payload sentinel, and any negative key
    // would silently break the keys-ride-placeholder-positions law.
    val violation = col(idCol).isNull || col("__c") > 1L ||
      col("__ck") < col("__c") || col("__min") < 0L
    val bad = a.groupBy(col(idCol))
      .agg(count(lit(1)).as("__c"), count(col("__key")).as("__ck"),
        min(col("__key")).as("__min"))
      .filter(
        when(violation,
          assert_true(lit(false),
            when(col(idCol).isNull,
              lit("interleavedTokenStream: null doc id in the assignment " +
                "frame — its placeholder has no document to anchor"))
              .when(col("__c") > 1L,
                lit("interleavedTokenStream: duplicate assignment — the " +
                  "doc would emit two placeholders at position 0 and " +
                  "corrupt every downstream offset"))
              .when(col("__ck") < col("__c"),
                lit("interleavedTokenStream: null payload key — a " +
                  "placeholder with no payload to reference"))
              .otherwise(
                lit("interleavedTokenStream: negative payload key — it " +
                  "collides with the −1 no-payload sentinel on text rows")))
            .cast("boolean"))
          .otherwise(lit(false)))
      .select(col(idCol), lit(0L).as("tok_idx"),
        lit(placeholderId).as("token_id"), lit(-1L).as("payload_key"))
    val placeholders = a.select(col(idCol), lit(0L).as("tok_idx"),
      lit(placeholderId).as("token_id"), col("__key").as("payload_key"))
    val text = tokenStream
      .join(a.select(col(idCol), lit(true).as("__has")), Seq(idCol), "left")
      .select(col(idCol),
        (col("tok_idx").cast("long") +
          when(col("__has"), 1L).otherwise(0L)).as("tok_idx"),
        col("token_id").cast("long").as("token_id"),
        lit(-1L).as("payload_key"))
    placeholders.unionByName(text).unionByName(bad)
  }

  /** REAL resize for `javax.imageio`-readable payloads: decode, scale
    * through a Graphics2D draw (bilinear), re-encode in the SAME
    * container format so the thumbnail stays a valid JPEG/PNG/BMP/GIF.
    * None when no reader accepts the payload or the format's writer
    * refuses the frame — same contract as [[resizePpm]].
    */
  private[scale] def resizeJavaImage(bytes: Array[Byte], targetW: Int, targetH: Int): Option[Array[Byte]] = {
    if (targetW <= 0 || targetH <= 0) return None
    try {
      decodeJavaImageRaw(bytes).flatMap { case (img, fmt) =>
        // alpha-capable container + alpha source → ARGB canvas so the
        // thumbnail keeps its transparency; otherwise composite onto
        // WHITE (not the uninitialized-black default) like a viewer would
        val keepAlpha = img.getColorModel.hasAlpha && (fmt == "png" || fmt == "gif")
        val out = new java.awt.image.BufferedImage(
          targetW, targetH,
          if (keepAlpha) java.awt.image.BufferedImage.TYPE_INT_ARGB
          else java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          if (keepAlpha) g.drawImage(img, 0, 0, targetW, targetH, null)
          else g.drawImage(img, 0, 0, targetW, targetH, java.awt.Color.WHITE, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        if (javax.imageio.ImageIO.write(out, fmt, bos)) Some(bos.toByteArray) else None
      }
    } catch { case _: Exception => None }
  }

  /** Raster-size ceiling enforced BEFORE `reader.read(0)`. A
    * decompression bomb (or merely huge frame — 30000x30000 PNG is a
    * ~3.6 GB int raster plus a second int[] copy in getRGB) would throw
    * OutOfMemoryError, which no `catch Exception` sees: the executor
    * JVM dies and every task retry hits the same poison row. The
    * header-only getWidth/getHeight probe is cheap, so oversized
    * payloads flag corrupt without ever allocating the raster.
    * 64 MPix ≈ 256 MB raster — comfortably inside an executor share.
    */
  val MaxDecodePixels: Long = 64L * 1024 * 1024

  /** Shared reader front-end: the decoded frame + the reader's format
    * name, or None for payloads no registered reader accepts or whose
    * declared dimensions exceed [[MaxDecodePixels]].
    */
  private def decodeJavaImageRaw(bytes: Array[Byte]): Option[(java.awt.image.BufferedImage, String)] = {
    val in = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(in, true, true)
        // header-only dimension probe — no raster allocated yet
        val w = reader.getWidth(0).toLong
        val h = reader.getHeight(0).toLong
        if (w <= 0 || h <= 0 || w * h > MaxDecodePixels) None
        else Some((reader.read(0), reader.getFormatName.toLowerCase))
      } finally reader.dispose()
    } catch {
      case _: Exception => None
    } finally if (in != null) in.close()
  }

  /** Thumbnail pass over a distributed asset set: PPM payloads resize
    * through the netpbm path, `javax.imageio` formats through
    * [[resizeJavaImage]] (re-encoded in their own container);
    * undecodable payloads pass through unchanged so a mixed corpus
    * never loses rows. Thumbnailing at ingest is how a 100 TB image
    * corpus shrinks before the expensive model pass.
    */
  def thumbnails(assets: Dataset[Asset], targetW: Int, targetH: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    // per-element map — unlike the decode path there is no batch setup
    // to amortize, so no grouped() buffering of payloads
    assets.mapPartitions { it =>
      it.map { a =>
        resizePpm(a.content, targetW, targetH)
          .orElse(resizeJavaImage(a.content, targetW, targetH)) match {
          case Some(resized) => a.copy(content = resized)
          case None => a
        }
      }
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

  /** Fixed-length windowing from DECLARED duration metadata: one row
    * per `windowMs`-sized window covering the clip (last window may be
    * short). This is the payload-free path — segmentation planning over
    * a catalog where audio bytes are not staged. When payloads ARE
    * present, [[audioWindowStats]] decodes the real samples and this
    * arithmetic is subsumed by measured window bounds.
    */
  def audioWindows(assets: DataFrame, windowMs: Long, durationCol: String): DataFrame =
    assets
      .withColumn(
        "window_idx",
        explode(sequence(
          lit(0L),
          greatest(
            expr(s"($durationCol + ${windowMs - 1}) div $windowMs") - 1,
            lit(0L)))))
      .withColumn("window_start_ms", col("window_idx") * windowMs)
      .withColumn(
        "window_end_ms",
        least(col("window_start_ms") + windowMs, col(durationCol)))

  // ---------------------------------------------------------------- audio

  /** Clip-level metadata from a REAL decode. `durationMs` and
    * `numSamples` are measured from the decoded PCM, not declared.
    */
  final case class AudioFeatures(
      assetId: Long,
      sampleRate: Int,
      channels: Int,
      bitsPerSample: Int,
      numSamples: Long,
      durationMs: Long,
      ok: Boolean)

  /** One fixed-length window of REAL decoded samples: RMS and absolute
    * peak over the mono mixdown — the segmentation + level-stats shape
    * an ASR / audio-embedding batch pass consumes.
    */
  final case class AudioWindowStats(
      assetId: Long,
      windowIdx: Long,
      windowStartMs: Long,
      windowEndMs: Long,
      numSamples: Long,
      rms: Double,
      peak: Double)

  /** Decoded clip: source format metadata plus the mono mixdown in
    * [-1, 1] floats (channel average per frame).
    */
  private[scale] final case class AudioClip(
      sampleRate: Int,
      channels: Int,
      bitsPerSample: Int,
      mono: Array[Float])

  /** Total-sample ceiling enforced from the header frame count BEFORE
    * any PCM is read — the audio twin of [[MaxDecodePixels]]. A
    * malformed header declaring hours of audio would otherwise allocate
    * an unbounded float buffer and OOM the executor on every retry.
    * 64 M samples ≈ 256 MB of mono floats (≈ 22 min at 48 kHz).
    */
  val MaxDecodeSamples: Long = 64L * 1024 * 1024

  /** REAL decoder for every container the JDK's `javax.sound.sampled`
    * registry ships a reader for — WAV, AIFF, AU (`java.desktop`
    * module; no external jars). The source stream is converted to
    * signed 16-bit little-endian PCM at its own sample rate (the JDK
    * converts from unsigned 8-bit, big-endian 16-bit, μ-law/a-law),
    * then mixed down to mono by per-frame channel average. Returns None
    * when no reader accepts the payload, the header is malformed, or
    * the declared frame count exceeds [[MaxDecodeSamples]] — the caller
    * flags corrupt, it never fabricates samples.
    */
  private[scale] def decodeAudio(bytes: Array[Byte]): Option[AudioClip] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    if (bytes == null || bytes.isEmpty) return None
    try {
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val src = in.getFormat
        val channels = src.getChannels
        val frames = in.getFrameLength
        if (channels <= 0 || frames <= 0 || frames * channels > MaxDecodeSamples) return None
        val target = new AudioFormat(
          AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, channels, channels * 2, src.getSampleRate,
          /* bigEndian = */ false)
        val pcm = AudioSystem.getAudioInputStream(target, in)
        try {
          val data = pcm.readAllBytes()
          val nFrames = data.length / (channels * 2)
          val mono = new Array[Float](nFrames)
          var f = 0
          while (f < nFrames) {
            var c = 0
            var acc = 0.0
            while (c < channels) {
              val i = (f * channels + c) * 2
              val s = (((data(i) & 0xff) | (data(i + 1) << 8))).toShort
              acc += s / 32768.0
              c += 1
            }
            mono(f) = (acc / channels).toFloat
            f += 1
          }
          Some(AudioClip(
            math.round(src.getSampleRate), channels,
            src.getSampleSizeInBits, mono))
        } finally pcm.close()
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** Clip-level decode pass over a distributed asset set: REAL sample
    * counts and measured duration per asset; undecodable payloads flag
    * `ok = false` with zeroed metadata so a mixed corpus never loses
    * rows.
    */
  def audioFeatures(assets: Dataset[Asset]): Dataset[AudioFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        decodeAudio(a.content) match {
          case Some(c) =>
            val durMs =
              if (c.sampleRate > 0) c.mono.length.toLong * 1000 / c.sampleRate else 0L
            AudioFeatures(
              a.assetId, c.sampleRate, c.channels, c.bitsPerSample,
              c.mono.length.toLong, durMs, ok = true)
          case None =>
            AudioFeatures(a.assetId, 0, 0, 0, 0L, 0L, ok = false)
        }
      }
    }
  }

  /** Fixed-dimension segment-RMS EMBEDDING per clip — the audio twin
    * of the image stats embedding: the mono mixdown splits into `dims`
    * equal time segments and each contributes its RMS level, so the
    * vector is the clip's loudness ENVELOPE (duration- and
    * frequency-invariant enough that one clip re-containered — WAV vs
    * AU of the same samples — embeds identically, while clips with
    * different envelopes do not; [[audioTextPairDedup]]'s similarity
    * gate). Undecodable or empty payloads emit ok = false with an
    * empty embedding — they can never manufacture similarity, the
    * [[imageFeatures]] corrupt contract.
    *
    * @return (assetId, embedding[dims], ok)
    */
  final case class AudioEmbedding(
      assetId: Long,
      embedding: Array[Float],
      ok: Boolean)

  def audioStatsEmbedding(assets: Dataset[Asset], dims: Int = 8): Dataset[AudioEmbedding] = {
    require(dims >= 1, s"dims must be >= 1, got $dims")
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        decodeAudio(a.content) match {
          case Some(c) if c.mono.nonEmpty =>
            val n = c.mono.length
            val emb = new Array[Float](dims)
            var d = 0
            while (d < dims) {
              // segment d covers [d·n/dims, (d+1)·n/dims) — exact long
              // arithmetic so the segments tile the clip
              val s = (d.toLong * n / dims).toInt
              val e = ((d.toLong + 1) * n / dims).toInt
              var i = s
              var sq = 0.0
              while (i < e) { val v = c.mono(i); sq += v.toDouble * v; i += 1 }
              emb(d) = if (e > s) math.sqrt(sq / (e - s)).toFloat else 0f
              d += 1
            }
            AudioEmbedding(a.assetId, emb, ok = true)
          case _ => AudioEmbedding(a.assetId, Array.empty, ok = false)
        }
      }
    }
  }

  /** Per-window level stats over REAL decoded samples: fixed
    * `windowMs` windows (last clamped to the measured clip end), RMS
    * and absolute peak of the mono mixdown per window. Undecodable
    * payloads contribute no rows — pair with [[audioFeatures]] to
    * account for them. One output row per window (explode), computed
    * inside the partition so only slim stat rows shuffle.
    */
  def audioWindowStats(assets: Dataset[Asset], windowMs: Long): Dataset[AudioWindowStats] = {
    require(windowMs > 0, s"windowMs must be positive, got $windowMs")
    import assets.sparkSession.implicits._
    assets.flatMap { a =>
      decodeAudio(a.content) match {
        case Some(c) if c.sampleRate > 0 && c.mono.nonEmpty =>
          val perWin = math.max(1L, windowMs * c.sampleRate / 1000).toInt
          val nWin = (c.mono.length + perWin - 1) / perWin
          (0 until nWin).map { w =>
            val s = w * perWin
            val e = math.min(s + perWin, c.mono.length)
            var i = s
            var sq = 0.0
            var peak = 0.0
            while (i < e) {
              val v = c.mono(i)
              sq += v.toDouble * v
              val av = math.abs(v.toDouble)
              if (av > peak) peak = av
              i += 1
            }
            val n = e - s
            AudioWindowStats(
              a.assetId, w.toLong,
              s.toLong * 1000 / c.sampleRate,
              e.toLong * 1000 / c.sampleRate,
              n.toLong, math.sqrt(sq / n), peak)
          }
        case _ => Seq.empty
      }
    }
  }
}
