package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      graft.SparkEntry.fixturePath(s"data/fixtures/multimodal/$name")))

  // committed real-codec fixtures: 12x8, left half black, right half
  // pure red — same pattern as the PPM test, so the embedding
  // expectations are exact for the lossless format
  private def assets = Seq(
    Multimodal.Asset(1L, "image", fixture("halfred.png"), "png"),
    Multimodal.Asset(2L, "image", fixture("halfred.jpg"), "jpeg"),
    Multimodal.Asset(3L, "image", Array.empty[Byte], "png"),          // corrupt: empty
    Multimodal.Asset(4L, "image", "not an image at all".getBytes, "jpeg") // corrupt: no reader
  ).toDS()

  test("imageFeatures: REAL JPEG/PNG decode via javax.imageio, corrupt payloads flagged") {
    val f = Multimodal.imageFeatures(assets).collect().map(r => r.assetId -> r).toMap
    assert(!f(3L).ok && !f(4L).ok && f(3L).embedding.isEmpty && f(4L).embedding.isEmpty)
    // exact dimensions + reader-reported formats from the real decode
    assert(f(1L).ok && f(1L).width === 12 && f(1L).height === 8 && f(1L).format === "png")
    assert(f(2L).ok && f(2L).width === 12 && f(2L).height === 8 &&
      (f(2L).format == "jpeg" || f(2L).format == "jpg"))
    // PNG is lossless: half-red pattern embeds exactly like its PPM twin
    val e = f(1L).embedding
    assert(e.length === 8)
    assert(math.abs(e(0) - 0.5f) < 1e-6 && e(1) === 0.0f && e(2) === 0.0f) // mean RGB
    assert(math.abs(e(4)) < 1e-6)                 // left-half luma = 0
    assert(math.abs(e(5) - 0.299f) < 1e-4)        // right-half luma = R weight
    // JPEG is lossy: same image within codec tolerance, same 8-dim space
    val j = f(2L).embedding
    (0 until 8).foreach(i => assert(math.abs(j(i) - e(i)) < 0.05, s"dim $i: ${j(i)} vs ${e(i)}"))
  }

  test("thumbnails: JPEG/PNG resize re-encodes in the same container") {
    val out = Multimodal.thumbnails(assets, 4, 4).collect().map(a => a.assetId -> a).toMap
    val png = Multimodal.decodeJavaImage(out(1L).content).get
    assert((png._1, png._2, png._3) === ((4, 4, "png")))
    val jpg = Multimodal.decodeJavaImage(out(2L).content).get
    assert((jpg._1, jpg._2) === ((4, 4)))
    // undecodable payloads pass through untouched
    assert(new String(out(4L).content) === "not an image at all")
  }

  test("PPM decode is REAL: exact dimensions + pixel-statistics embedding") {
    // 4x3 P6, maxval 255, with a header comment; left half black, right
    // half pure red
    val header = "P6\n# fixture\n4 3\n255\n".getBytes("US-ASCII")
    val pixels = (0 until 3).flatMap { _ =>
      Array[Byte](0, 0, 0) ++ Array[Byte](0, 0, 0) ++                // x=0,1 black
        Array[Byte](255.toByte, 0, 0) ++ Array[Byte](255.toByte, 0, 0) // x=2,3 red
    }.toArray
    val ppm = Multimodal.Asset(7L, "image", header ++ pixels, "ppm")
    val f = Multimodal.imageFeatures(Seq(ppm).toDS()).collect().head
    assert(f.ok && f.width === 4 && f.height === 3 && f.format === "ppm")
    val emb = f.embedding
    assert(math.abs(emb(0) - 0.5f) < 1e-6)  // mean R: half the pixels full red
    assert(emb(1) === 0.0f && emb(2) === 0.0f)
    assert(math.abs(emb(4)) < 1e-6)                  // left-half luma = 0
    assert(math.abs(emb(5) - 0.299f) < 1e-4)         // right-half luma = R weight
    // truncated raster -> corrupt, not garbage
    val bad = Multimodal.Asset(8L, "image", header ++ pixels.take(10), "ppm")
    assert(!Multimodal.imageFeatures(Seq(bad).toDS()).collect().head.ok)
  }

  test("PPM resize is REAL: nearest-neighbor thumbnail re-decodes at target size") {
    val header = "P6\n4 2\n255\n".getBytes("US-ASCII")
    // top row black..black|red red, bottom row green green|blue blue
    val px = Array[Byte](
      0, 0, 0, 0, 0, 0, 255.toByte, 0, 0, 255.toByte, 0, 0,
      0, 255.toByte, 0, 0, 255.toByte, 0, 0, 0, 255.toByte, 0, 0, 255.toByte)
    val thumb = Multimodal.resizePpm(header ++ px, 2, 1).get
    // 2x1 nearest-neighbor picks (0,0) black and (2,0) red
    val (w, h, emb) = Multimodal.decodePpm(thumb).get
    assert((w, h) === ((2, 1)))
    assert(emb(0) === 0.5f && emb(1) === 0.0f && emb(2) === 0.0f) // mean R over {black, red}
    // Dataset-level pass keeps undecodable payloads untouched
    val mixed = Seq(
      Multimodal.Asset(1L, "image", header ++ px, "ppm"),
      Multimodal.Asset(2L, "image", "not an image".getBytes, "jpeg")).toDS()
    val out = Multimodal.thumbnails(mixed, 2, 1).collect().map(a => a.assetId -> a).toMap
    assert(Multimodal.decodePpm(out(1L).content).get._1 === 2)
    assert(new String(out(2L).content) === "not an image")
  }

  test("decode cap: declared-dimension bomb flags corrupt before any raster allocates") {
    // minimal BMP header declaring 100000x100000 = 1e10 px (>> 64 MPix
    // cap). The header-only probe must reject it BEFORE read(0), which
    // would otherwise attempt a ~40 GB raster -> uncatchable OOME.
    val bb = java.nio.ByteBuffer.allocate(54).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54).putInt(0).putInt(54)
    bb.putInt(40).putInt(100000).putInt(100000).putShort(1).putShort(24)
    bb.putInt(0).putInt(0).putInt(2835).putInt(2835).putInt(0).putInt(0)
    val bomb = bb.array()
    assert(Multimodal.decodeJavaImage(bomb).isEmpty)
    val f = Multimodal.imageFeatures(
      Seq(Multimodal.Asset(9L, "image", bomb, "bmp")).toDS()).collect().head
    assert(!f.ok && f.embedding.isEmpty)
  }

  test("thumbnails keep PNG alpha instead of compositing onto black") {
    val src = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    src.setRGB(0, 0, 0xffff0000) // one opaque red pixel, rest fully transparent
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(src, "png", bos)
    val resized = Multimodal.resizeJavaImage(bos.toByteArray, 2, 2).get
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized))
    assert(img.getColorModel.hasAlpha)
    // bottom-right quadrant was all-transparent source: must stay
    // transparent, not become opaque black
    assert(((img.getRGB(1, 1) >>> 24) & 0xff) === 0)
  }

  test("thumbnails keep GIF alpha: ARGB frame survives the JDK GIF writer round-trip") {
    // resizeJavaImage keeps an ARGB canvas for gif (keepAlpha) and
    // re-encodes with the JDK GIF writer — pin that the writer accepts
    // the ARGB frame and the transparent region survives (it maps to the
    // GIF transparent palette index)
    val src = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    src.setRGB(0, 0, 0xffff0000) // one opaque red pixel, rest transparent
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(src, "gif", bos)
    val resized = Multimodal.resizeJavaImage(bos.toByteArray, 2, 2)
    assert(resized.isDefined, "JDK GIF writer rejected the ARGB thumbnail frame")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized.get))
    assert(img.getColorModel.hasAlpha)
    assert(((img.getRGB(1, 1) >>> 24) & 0xff) === 0) // transparent quadrant stays transparent
  }

  test("features feed the similarity operators (schema contract)") {
    val feats = Multimodal.imageFeatures(assets).filter(_.ok).toDF()
    val top = Similarity.bruteForceTopK(feats, feats.limit(1), "assetId", "embedding", 1)
    assert(top.count() === 1)
  }

  test("sampleFrames: n evenly spaced offsets per asset") {
    val vids = Seq((10L, 10000L), (11L, 4000L)).toDF("asset_id", "duration_ms")
    val frames = Multimodal.sampleFrames(vids, 4, "duration_ms")
    assert(frames.count() === 8)
    val offs = frames.filter($"asset_id" === 10L)
      .select("frame_offset_ms").as[Long].collect().sorted.toSeq
    assert(offs === Seq(0L, 2500L, 5000L, 7500L))
  }

  test("audioWindows: fixed windows cover the clip, last one clamped") {
    val clips = Seq((1L, 2500L), (2L, 900L)).toDF("asset_id", "duration_ms")
    val w = Multimodal.audioWindows(clips, 1000L, "duration_ms")
      .select("asset_id", "window_idx", "window_start_ms", "window_end_ms")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(w === Seq(
      (1L, 0L, 0L, 1000L), (1L, 1L, 1000L, 2000L), (1L, 2L, 2000L, 2500L),
      (2L, 0L, 0L, 900L)))
  }

  /** Synthesize a real RIFF/WAVE payload: interleaved [-1,1] float
    * samples packed as signed 16-bit little-endian PCM and written
    * through the JDK's own WAV writer.
    */
  private def wavBytes(samples: Array[Float], sampleRate: Float, channels: Int): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(sampleRate, 16, channels, true, false)
    val data = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      val v = math.max(-32768, math.min(32767, math.round(s * 32767f)))
      data(i * 2) = (v & 0xff).toByte
      data(i * 2 + 1) = ((v >> 8) & 0xff).toByte
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length / channels)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audio decode is REAL: WAV sine -> measured rate/samples/duration + window RMS/peak") {
    val sr = 8000
    val amp = 0.5f
    val sine = Array.tabulate(4000)(i => (amp * math.sin(2 * math.Pi * 440 * i / sr)).toFloat)
    val clip = Multimodal.Asset(20L, "audio", wavBytes(sine, sr, 1), "wav")
    val f = Multimodal.audioFeatures(Seq(clip).toDS()).collect().head
    assert(f.ok && f.sampleRate === 8000 && f.channels === 1 &&
      f.bitsPerSample === 16 && f.numSamples === 4000L && f.durationMs === 500L)
    val w = Multimodal.audioWindowStats(Seq(clip).toDS(), 100L).collect().sortBy(_.windowIdx)
    assert(w.length === 5) // 5 x 100 ms over the measured 500 ms
    assert(w.forall(_.numSamples === 800L))
    assert(w.head.windowStartMs === 0L && w.last.windowEndMs === 500L)
    // level stats from the ACTUAL samples: sine of amplitude A has
    // RMS A/sqrt(2) and peak A
    w.foreach { s =>
      assert(math.abs(s.rms - amp / math.sqrt(2)) < 0.01, s"rms ${s.rms}")
      assert(math.abs(s.peak - amp) < 0.01, s"peak ${s.peak}")
    }
  }

  test("audio mixdown: stereo opposing channels cancel to silence") {
    val inter = Array.tabulate(1600)(i => if (i % 2 == 0) 0.5f else -0.5f) // L=+0.5 R=-0.5
    val clip = Multimodal.Asset(21L, "audio", wavBytes(inter, 8000f, 2), "wav")
    val f = Multimodal.audioFeatures(Seq(clip).toDS()).collect().head
    assert(f.ok && f.channels === 2 && f.numSamples === 800L)
    val w = Multimodal.audioWindowStats(Seq(clip).toDS(), 1000L).collect()
    assert(w.length === 1 && w.head.rms < 1e-4 && w.head.peak < 1e-4)
  }

  test("audio corrupt payloads flag ok=false and emit no window rows") {
    val bad = Seq(
      Multimodal.Asset(22L, "audio", Array.empty[Byte], "wav"),
      Multimodal.Asset(23L, "audio", "definitely not audio".getBytes, "wav")).toDS()
    assert(Multimodal.audioFeatures(bad).collect().forall(!_.ok))
    assert(Multimodal.audioWindowStats(bad, 100L).collect().isEmpty)
  }

  test("audio decode cap: header-declared frame bomb rejected before PCM reads") {
    // hand-built RIFF/WAVE header declaring ~1e9 mono 16-bit frames with
    // no payload: the frame-count guard must reject before any buffer
    // allocates (the audio twin of the BMP bomb test above)
    val bb = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(0x7ffffff0).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
    bb.putInt(8000).putInt(16000).putShort(2).putShort(16)
    bb.put("data".getBytes).putInt(0x7ffffff0)
    assert(Multimodal.decodeAudio(bb.array()).isEmpty)
  }

  test("readDir: binaryFile source yields (path, length, content)") {
    val dir = java.nio.file.Files.createTempDirectory("mm").toFile
    java.nio.file.Files.write(new java.io.File(dir, "a.bin").toPath, "hello".getBytes)
    java.nio.file.Files.write(new java.io.File(dir, "b.bin").toPath, "worlds".getBytes)
    val df = Multimodal.readDir(spark, dir.getAbsolutePath, "*.bin")
    val rows = df.select("length").as[Long].collect().sorted.toSeq
    assert(rows === Seq(5L, 6L))
  }

  test("imageTextPairDedup: a duplicate needs BOTH modalities — one alone never merges (q167 law)") {
    // REAL decode of the distinct image space: jpg/png are the same
    // picture in two containers (embedding near-dups, cosine ~ 1);
    // 'corrupt' never decodes and can only match by identity
    val imgAssets = Seq(
      Multimodal.Asset(1L, "image", fixture("halfred.jpg"), "jpeg"),
      Multimodal.Asset(2L, "image", fixture("halfred.png"), "png"),
      Multimodal.Asset(3L, "image", "broken".getBytes, "png"),
      // decodable but DISSIMILAR (solid blue vs half-red): decodes fine,
      // must never form an embedding pair with the halfreds
      Multimodal.Asset(4L, "image", fixture("blue.ppm"), "ppm")
    ).toDS()
    val nameOf = Map(1L -> "jpg", 2L -> "png", 3L -> "corrupt", 4L -> "blue")
    val images = Multimodal.imageFeatures(imgAssets).toDF()
      .select(col("assetId"), col("embedding"), col("ok"))
      .withColumn("img",
        element_at(typedLit(nameOf.map { case (k, v) => k.toString -> v }),
          col("assetId").cast("string")))
      .select(col("img"), col("embedding"), col("ok"))
    val capA = "alpha beta gamma delta epsilon"
    val capB = "one two three four five"
    // (doc, caption, priority, image):
    //   0: capA / corrupt — caption-dups 1/2/4 but IMAGE-incompatible -> kept
    //   1: capA / jpg, prio 3 — cluster {1, 2, 4}, survivor (min prio)
    //   2: capA / png, prio 7 — compatible with jpg via embedding pair
    //   4: capA / jpg, prio 9 — identity-compatible with 1
    //   3: capB / corrupt, prio 1 — cluster {3, 6} by identity, survivor
    //   6: capB / corrupt, prio 2 — dropped
    val docs = Seq(
      (0L, capA, 5L, "corrupt"), (1L, capA, 3L, "jpg"), (2L, capA, 7L, "png"),
      (4L, capA, 9L, "jpg"), (3L, capB, 1L, "corrupt"), (6L, capB, 2L, "corrupt"),
      // caption-dups the {1,2,4} cluster but its image is a DISSIMILAR
      // decodable — stays out (the embedding gate, not just identity)
      (8L, capA, 4L, "blue")
    ).toDF("doc_id", "text", "priority", "img")
    val kept = Multimodal.imageTextPairDedup(
      docs.select("doc_id", "text", "priority"),
      docs.select("doc_id", "img"), images,
      "doc_id", "text", "priority", "img")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(0L, 1L, 3L, 8L),
      "incompatible images block a caption dup (identity-only AND " +
        "dissimilar-decodable); compatible merge keeps min-priority")
    // the other single-modality direction: same image, UNRELATED
    // captions -> no caption pair, no merge
    val docs2 = Seq((10L, capA, 1L, "jpg"), (11L, capB, 2L, "jpg"))
      .toDF("doc_id", "text", "priority", "img")
    val kept2 = Multimodal.imageTextPairDedup(
      docs2.select("doc_id", "text", "priority"),
      docs2.select("doc_id", "img"), images,
      "doc_id", "text", "priority", "img")
      .collect().map(_.getLong(0)).toSet
    assert(kept2 === Set(10L, 11L), "image identity alone never merges")
    // identity compatibility must survive an images frame that never
    // decoded the assigned key: same payload + same caption still
    // merges (identity derives from the ASSIGNMENT, not the decode —
    // the silent-under-dedup class)
    val docs3 = Seq((20L, capA, 1L, "undec"), (21L, capA, 2L, "undec"))
      .toDF("doc_id", "text", "priority", "img")
    val kept3 = Multimodal.imageTextPairDedup(
      docs3.select("doc_id", "text", "priority"),
      docs3.select("doc_id", "img"), images,
      "doc_id", "text", "priority", "img")
      .collect().map(_.getLong(0)).toSet
    assert(kept3 === Set(20L),
      "same undecoded payload + caption dup merges (min-priority kept)")
  }

  test("audioStatsEmbedding: REAL decode envelope — re-containered clip embeds identically, different envelope does not") {
    val clips = Seq(
      Multimodal.Asset(1L, "audio", fixture("halfloud.wav"), "wav"),
      Multimodal.Asset(2L, "audio", fixture("halfloud.au"), "au"),
      Multimodal.Asset(3L, "audio", fixture("quiet.wav"), "wav"),
      Multimodal.Asset(4L, "audio", "broken".getBytes, "wav")
    ).toDS()
    val out = Multimodal.audioStatsEmbedding(clips, dims = 8)
      .collect().map(e => e.assetId -> e).toMap
    // corrupt: flagged, never embeds
    assert(!out(4L).ok && out(4L).embedding.isEmpty, "corrupt flags ok=false")
    assert(Seq(1L, 2L, 3L).forall(out(_).ok))
    // halfloud's envelope: loud first half, silent second half
    val hw = out(1L).embedding
    assert(hw.length === 8)
    assert(hw.take(4).forall(_ > 0.3f), s"loud first half: ${hw.toSeq}")
    assert(hw.drop(4).forall(_ < 0.01f), s"silent second half: ${hw.toSeq}")
    // the SAME samples in an AU container decode to the SAME envelope
    // (the JDK converts big-endian AU PCM to the same shorts)
    assert(out(2L).embedding.toSeq === hw.toSeq,
      "wav/au of one clip embed identically")
    // quiet.wav: constant low envelope — cosine vs halfloud well below
    // the 0.999 near-dup gate (≈ 0.707: half the mass in zero segments)
    val qe = out(3L).embedding
    def dot(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val cos = dot(hw, qe) / math.sqrt(dot(hw, hw) * dot(qe, qe))
    assert(cos < 0.9, s"different envelopes must not near-dup (cos $cos)")
    assert(qe.forall(v => v > 0.01f && v < 0.2f), s"quiet constant: ${qe.toSeq}")
  }

  test("audioTextPairDedup: the q167 lattice on audio — one modality never merges, corrupt is identity-only (q175 law)") {
    val clipAssets = Seq(
      Multimodal.Asset(1L, "audio", fixture("halfloud.wav"), "wav"),
      Multimodal.Asset(2L, "audio", fixture("halfloud.au"), "au"),
      Multimodal.Asset(3L, "audio", "broken".getBytes, "wav"),
      // decodable but DISSIMILAR envelope: must never pair with halfloud
      Multimodal.Asset(4L, "audio", fixture("quiet.wav"), "wav")
    ).toDS()
    val nameOf = Map(1L -> "wav", 2L -> "au", 3L -> "corrupt", 4L -> "quiet")
    val audio = Multimodal.audioStatsEmbedding(clipAssets).toDF()
      .select(col("assetId"), col("embedding"), col("ok"))
      .withColumn("clip",
        element_at(typedLit(nameOf.map { case (k, v) => k.toString -> v }),
          col("assetId").cast("string")))
      .select(col("clip"), col("embedding"), col("ok"))
    val capA = "alpha beta gamma delta epsilon"
    val capB = "one two three four five"
    val docs = Seq(
      // capA caption cluster: wav/au/wav compatible (embedding pair +
      // identity), corrupt incompatible, quiet decodable-but-dissimilar
      (0L, capA, 5L, "corrupt"), (1L, capA, 3L, "wav"), (2L, capA, 7L, "au"),
      (4L, capA, 9L, "wav"), (8L, capA, 4L, "quiet"),
      // capB cluster: two corrupt payloads merge by identity only
      (3L, capB, 1L, "corrupt"), (6L, capB, 2L, "corrupt")
    ).toDF("doc_id", "text", "priority", "clip")
    val kept = Multimodal.audioTextPairDedup(
      docs.select("doc_id", "text", "priority"),
      docs.select("doc_id", "clip"), audio,
      "doc_id", "text", "priority", "clip")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(0L, 1L, 3L, 8L),
      "joint dedup: {1,2,4} merge (min prio 1 kept), corrupt blocks, " +
        "dissimilar envelope blocks, identity merges {3,6}")
    // same clip, unrelated captions — audio identity alone never merges
    val docs2 = Seq((10L, capA, 1L, "wav"), (11L, capB, 2L, "wav"))
      .toDF("doc_id", "text", "priority", "clip")
    val kept2 = Multimodal.audioTextPairDedup(
      docs2.select("doc_id", "text", "priority"),
      docs2.select("doc_id", "clip"), audio,
      "doc_id", "text", "priority", "clip")
      .collect().map(_.getLong(0)).toSet
    assert(kept2 === Set(10L, 11L), "audio identity alone never merges")
  }

  test("interleavedTokenStream: placeholder at position 0, text shifted by one, unassigned docs pass through, payload-only docs emit") {
    // doc 1: two text tokens + an assignment; doc 2: text only (no
    // assignment — unshifted); doc 3: assignment only (a payload-only
    // sample — e.g. an image with an empty caption)
    val stream = Seq((1L, 0L, 10L), (1L, 1L, 11L), (2L, 0L, 20L))
      .toDF("doc_id", "tok_idx", "token_id")
    val assign = Seq((1L, 7L), (3L, 9L)).toDF("doc_id", "img_key")
    val out = Multimodal.interleavedTokenStream(
      stream, assign, "doc_id", "img_key")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out === Set(
      (1L, 0L, -2L, 7L), (1L, 1L, 10L, -1L), (1L, 2L, 11L, -1L),
      (2L, 0L, 20L, -1L),
      (3L, 0L, -2L, 9L)))
    // token conservation: text rows + one placeholder per assignment
    assert(out.size === 3 + 2)
    // the placeholder id must stay outside the vocabulary (ids are
    // nonnegative by the pieceVocab contract)
    intercept[IllegalArgumentException] {
      Multimodal.interleavedTokenStream(stream, assign, "doc_id", "img_key",
        placeholderId = 5L)
    }
    // duplicate / null assignment keys refuse IN-PLAN by name (the
    // jointPairDedup union-branch discipline)
    val dup = Seq((1L, 7L), (1L, 8L)).toDF("doc_id", "img_key")
    val errD = intercept[Exception] {
      Multimodal.interleavedTokenStream(stream, dup, "doc_id", "img_key")
        .collect()
    }
    assert(Option(errD.getMessage).getOrElse(errD.toString)
      .contains("duplicate"), s"named: ${errD.getMessage}")
    val nulKey = Seq((Some(1L), Some(7L)), (Some(2L), None))
      .toDF("doc_id", "img_key")
    val errK = intercept[Exception] {
      Multimodal.interleavedTokenStream(stream, nulKey, "doc_id", "img_key")
        .collect()
    }
    assert(Option(errK.getMessage).getOrElse(errK.toString)
      .contains("null payload key"), s"named: ${errK.getMessage}")
    val nulId = Seq((Some(1L), 7L), (None, 8L)).toDF("doc_id", "img_key")
    val errI = intercept[Exception] {
      Multimodal.interleavedTokenStream(stream, nulId, "doc_id", "img_key")
        .collect()
    }
    assert(Option(errI.getMessage).getOrElse(errI.toString)
      .contains("null doc id"), s"named: ${errI.getMessage}")
    // a NEGATIVE payload key collides with the −1 no-payload sentinel —
    // refused by name (r19 self-review)
    val negKey = Seq((1L, 7L), (2L, -1L)).toDF("doc_id", "img_key")
    val errNeg = intercept[Exception] {
      Multimodal.interleavedTokenStream(stream, negKey, "doc_id", "img_key")
        .collect()
    }
    assert(Option(errNeg.getMessage).getOrElse(errNeg.toString)
      .contains("negative payload key"), s"named: ${errNeg.getMessage}")
    // and the guard survives COLUMN PRUNING: a consumer that reads NONE
    // of the guard-bearing columns (a bare count) must still refuse —
    // the assert rides the union branch's filter predicate, not a
    // prunable projection (r19 self-review)
    val errCnt = intercept[Exception] {
      Multimodal.interleavedTokenStream(stream, dup, "doc_id", "img_key")
        .count()
    }
    assert(Option(errCnt.getMessage).getOrElse(errCnt.toString)
      .contains("duplicate assignment"),
      s"prune-proof: ${errCnt.getMessage}")
  }

  test("interleavedTokenStream composes with the channel materializer: payload keys ride placeholder positions; modality conservation; fsck green") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"),
      (3L, "zeta"), (4L, "eta theta iota kappa"))
      .toDF("doc_id", "text")
    val merges = Bpe.trainMergesFast(docs, "text", 4)
    val stream = Bpe.encodeIndexedIds(docs, "doc_id", "text", merges)
    val assign = Seq((1L, 101L), (3L, 103L)).toDF("doc_id", "img_key")
    val inter = Multimodal.interleavedTokenStream(
      stream, assign, "doc_id", "img_key")
    val packed = ShardPack.materializeSequencesWithChannels(
      inter, "doc_id", Seq("payload_key"), seqLen = 8L)
    val rows = packed.collect()
    // channel alignment: key >= 0 exactly where token_id == placeholder
    rows.foreach { r =>
      val toks = r.getSeq[Long](r.fieldIndex("token_ids"))
      val keys = r.getSeq[Long](r.fieldIndex("payload_key"))
      assert(toks.length === keys.length)
      toks.zip(keys).foreach { case (t, k) =>
        assert((t == -2L) === (k >= 0L),
          s"payload keys ride exactly the placeholder positions: ($t, $k)")
      }
    }
    // modality conservation: Σ placeholders == assignment count;
    // Σ tokens == text tokens + placeholders
    val nPlace = rows.map(r =>
      r.getSeq[Long](r.fieldIndex("token_ids")).count(_ == -2L)).sum
    assert(nPlace === 2L)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum === stream.count() + 2L)
    // the export is a legal split layout: its own writer manifest
    // passes the fsck clean (the multimodal loader contract end to end)
    val manifest = ShardPack.splitWriterManifest(
      packed.select(col("bin"), col("n_tokens"), col("n_docs")),
      fileBudget = 16L, epochs = 2)
    val checks = ShardPack.checkSplitManifest(manifest,
      packed.select(col("bin"), col("n_tokens"), col("n_docs")),
      fileBudget = 16L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq("epoch_gaps", "duplicate_manifest_keys", "missing_sequences",
      "layout_mismatches", "pos_violations", "pos_mismatches").foreach(c =>
      assert(checks(c) === 0L, s"fsck clean on the interleaved export: $c"))
  }

  test("interleaved BEST-FIT export (q188): keys ride placeholder positions AT segment starts, per-channel pads, mask-form law, fsck green") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"),
      (3L, "zeta"), (4L, "eta theta iota kappa"), (5L, "lambda mu"))
      .toDF("doc_id", "text")
    val merges = Bpe.trainMergesFast(docs, "text", 4)
    val stream = Bpe.encodeIndexedIds(docs, "doc_id", "text", merges)
    val assign = Seq((1L, 101L), (3L, 103L), (5L, 105L))
      .toDF("doc_id", "img_key")
    val inter = Multimodal.interleavedTokenStream(
      stream, assign, "doc_id", "img_key")
    val lens = inter.groupBy(col("doc_id")).agg(count(lit(1)).as("n_tok"))
    val seqLen = 16L
    val layout = ShardPack.packBestFit(lens, "doc_id", "n_tok",
      seqLen, shardBudget = 64L)
    val out = ShardPack.materializeBestFitWithChannels(
      inter, layout, "doc_id", Seq(("payload_key", -1L)), seqLen, padId = -9L)
    val segs = ShardPack.bestFitSegments(layout, "doc_id", seqLen)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        r.getSeq[Long](r.fieldIndex("cu_seqlens")))
      .toMap
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val toks = r.getSeq[Long](r.fieldIndex("token_ids"))
      val keys = r.getSeq[Long](r.fieldIndex("payload_key"))
      val fill = r.getAs[Long]("fill").toInt
      assert(toks.length === seqLen && keys.length === seqLen)
      // filled region: a nonnegative key EXACTLY where the placeholder is
      (0 until fill).foreach { p =>
        assert((toks(p) == -2L) === (keys(p) >= 0L),
          s"keys ride placeholder positions: pos $p (${toks(p)}, ${keys(p)})")
      }
      // pad suffix: token pads padId, the channel pads ITS OWN −1
      (fill until seqLen.toInt).foreach { p =>
        assert(toks(p) === -9L && keys(p) === -1L,
          s"per-channel pad at $p")
      }
      // every placeholder sits at a bestFitSegments segment START — the
      // q185 law re-pinned on the composed export (a doc's placeholder
      // is its position 0, laid down at its doc_off)
      val starts = segs((r.getAs[Long]("shard"), r.getAs[Long]("bin")))
        .dropRight(1).toSet
      (0 until fill).foreach { p =>
        if (toks(p) == -2L)
          assert(starts.contains(p.toLong),
            s"placeholder at $p is not a segment start ($starts)")
      }
    }
    // all three assigned docs materialize their placeholder
    assert(rows.map(r =>
      r.getSeq[Long](r.fieldIndex("token_ids")).count(_ == -2L)).sum === 3L)
    // the mask form IS the channels form with pad 0 modulo the name
    val masked = inter.withColumn("m",
      when(col("token_id") === -2L, 0L).otherwise(1L))
    val viaMask = ShardPack.materializeBestFitWithMask(
      masked, layout, "doc_id", "m", seqLen)
    val viaCh = ShardPack.materializeBestFitWithChannels(
      masked, layout, "doc_id", Seq(("m", 0L)), seqLen)
      .withColumnRenamed("m", "mask")
    assert(viaMask.collect().map(_.toSeq).toSet ===
      viaCh.collect().map(_.toSeq).toSet,
      "materializeBestFitWithMask == channels((mask, 0)) law")
    // the layout's own writer manifest passes the best-fit fsck clean
    val manifest = ShardPack.globalWriterManifest(layout, fileBudget = 32L,
      epochs = 2)
    val checks = ShardPack.checkBestFitManifest(manifest, layout,
      fileBudget = 32L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq("epoch_gaps", "duplicate_manifest_keys", "missing_sequences",
      "layout_mismatches", "pos_violations", "pos_mismatches").foreach(c =>
      assert(checks(c) === 0L, s"fsck clean on the interleaved layout: $c"))
    // the shadow guard refuses a reserved output name at the CALL
    val err = intercept[IllegalArgumentException] {
      ShardPack.materializeBestFitWithChannels(
        inter, layout, "doc_id", Seq(("fill", 0L)), seqLen)
    }
    assert(err.getMessage.contains("shadow"))
  }

  test("multimodal SFT artifact (q192): mask 0 EXACTLY at placeholders and pad, cu_seqlens rides the row and closes at fill") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"),
      (3L, "zeta"), (4L, "eta theta iota kappa"), (5L, "lambda mu"))
      .toDF("doc_id", "text")
    val merges = Bpe.trainMergesFast(docs, "text", 4)
    val assign = Seq((1L, 101L), (3L, 103L), (5L, 105L))
      .toDF("doc_id", "img_key")
    val inter = Multimodal.interleavedTokenStream(
      Bpe.encodeIndexedIds(docs, "doc_id", "text", merges),
      assign, "doc_id", "img_key")
      .withColumn("m", when(col("token_id") === -2L, 0L).otherwise(1L))
    val lens = inter.groupBy(col("doc_id")).agg(count(lit(1)).as("n_tok"))
    val seqLen = 16L
    val layout = ShardPack.packBestFit(lens, "doc_id", "n_tok",
      seqLen, shardBudget = 64L)
    val out = ShardPack.materializeBestFitWithChannels(
      inter, layout, "doc_id", Seq(("payload_key", -1L), ("m", 0L)),
      seqLen, padId = -9L)
      .join(ShardPack.bestFitSegments(layout, "doc_id", seqLen)
        .select(col("shard"), col("bin"), col("n_segments"),
          col("cu_seqlens")),
        Seq("shard", "bin"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val toks = r.getSeq[Long](r.fieldIndex("token_ids"))
      val mask = r.getSeq[Long](r.fieldIndex("m"))
      val cu = r.getSeq[Long](r.fieldIndex("cu_seqlens"))
      val fill = r.getAs[Long]("fill").toInt
      // the loss-mask law: 0 exactly where a trainer must not train —
      // placeholder slots and the pad suffix; 1 on every text token
      (0 until seqLen.toInt).foreach { p =>
        assert((mask(p) == 0L) === (toks(p) == -2L || p >= fill),
          s"mask law at $p (tok ${toks(p)}, fill $fill)")
      }
      // the segment contract rides the same row and closes at FILL
      // (the pad suffix attends to nothing)
      assert(cu.head === 0L && cu.last === fill.toLong)
      assert(cu.length.toLong === r.getAs[Long]("n_segments") + 1L)
    }
  }

  test("jointPairDedup assignment contracts: duplicate/null doc key refuses in-plan; a caption-pair doc missing from assign fails loud") {
    val images = Multimodal.imageFeatures(Seq(
      Multimodal.Asset(1L, "image", fixture("halfred.jpg"), "jpeg")).toDS())
      .toDF()
      .select(lit("jpg").as("img"), col("embedding"), col("ok"))
    val capA = "alpha beta gamma delta epsilon"
    val docs = Seq((1L, capA, 1L), (2L, capA, 2L))
      .toDF("doc_id", "text", "priority")
    // duplicate assignment key: refused IN-PLAN by the asserting union
    // branch (zero eager cost — no Spark job fires unless the composed
    // plan executes; the branch is a union child, so AQE cannot plan it
    // away like a join-output assert). A join fan-out would otherwise
    // double the pairs.
    val dup = Seq((1L, "jpg"), (1L, "jpg"), (2L, "jpg"))
      .toDF("doc_id", "img")
    val errD = intercept[Exception] {
      Multimodal.imageTextPairDedup(docs, dup, images,
        "doc_id", "text", "priority", "img").collect()
    }
    assert(Option(errD.getMessage).getOrElse(errD.toString)
      .contains("duplicate doc key"),
      s"duplicate assignment must refuse by name: ${errD.getMessage}")
    // null assignment key: named as null, not miscounted as duplicate
    // (both docs covered so the null branch is the ONLY violating one —
    // an uncovered doc would race its own asserting branch)
    val nul = Seq((Some(1L), "jpg"), (Some(2L), "jpg"), (None, "jpg"))
      .toDF("doc_id", "img")
    val errN = intercept[Exception] {
      Multimodal.imageTextPairDedup(docs, nul, images,
        "doc_id", "text", "priority", "img").collect()
    }
    assert(Option(errN.getMessage).getOrElse(errN.toString)
      .contains("null doc key"),
      s"null assignment key must refuse by name: ${errN.getMessage}")
    // NOTE: no construction-silence assertion — dedupByClusterPriority's
    // CC fixpoint is eager by nature, so composing this operator always
    // runs jobs; the point of the union branch is that the ONLY eager
    // work is the operator's own, with the guard riding it in-plan
    // (EagerContracts' doc and its callers now agree).
    // a doc that forms a caption pair but has NO assignment row: the
    // pair would silently drop from the joint edge set — must refuse
    // BY NAME (a non-null message alone would green on any incidental
    // exception)
    val missing = Seq((1L, "jpg")).toDF("doc_id", "img")
    val errM = intercept[Exception] {
      Multimodal.imageTextPairDedup(docs, missing, images,
        "doc_id", "text", "priority", "img").collect()
    }
    assert(Option(errM.getMessage).getOrElse(errM.toString)
      .contains("assignment frame"),
      s"uncovered caption-pair doc must refuse by name: ${errM.getMessage}")
    // and the skippable-guard class itself: an EMPTY assignment frame
    // (every pair doc uncovered, compat empty) must still refuse loud —
    // an in-plan assert on the semi-join output is planned away here
    val errE = intercept[Exception] {
      Multimodal.imageTextPairDedup(docs,
        Seq.empty[(Long, String)].toDF("doc_id", "img"), images,
        "doc_id", "text", "priority", "img").collect()
    }
    assert(Option(errE.getMessage).getOrElse(errE.toString)
      .contains("assignment frame"),
      s"empty assignment must refuse by name: ${errE.getMessage}")
  }
}
