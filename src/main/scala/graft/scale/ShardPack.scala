package graft.scale

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

import graft.ops.CacheScope

/** Deterministic token-budget shard packing — the training-output
  * primitive: shuffle the corpus into a deterministic pseudo-random
  * order (md5 of the id — the "global shuffle" every pretraining run
  * needs, reproducible across runs and engines), then cut the stream
  * into shards of ~`budget` tokens each by GLOBAL running token count.
  * A doc lands in shard `floor(start_offset / budget)`, so every shard
  * except the last holds >= budget tokens minus one doc's overhang —
  * uniform shard sizes regardless of document-length skew.
  *
  * The global running sum is the interesting part at scale. A naive
  * `sum().over(Window.orderBy(...))` with no partition key collapses
  * 100 TB into ONE task. This is instead the classic two-phase
  * distributed prefix sum:
  *
  *   1. range-repartition + sort within partitions on the hash key
  *      (the only shuffle — and it is exactly the shuffle a training
  *      export needs anyway to write shards in order);
  *   2. pass 1: per-partition token sums — P longs to the driver;
  *   3. driver: scan-left over P sums → per-partition start offsets
  *      (P ~ thousands: trivially driver-sized at any corpus scale);
  *   4. pass 2: per-partition running sum + broadcast offset, emitted
  *      via `mapPartitionsWithIndex` (genuine per-partition imperative
  *      logic — the sanctioned RDD boundary).
  *
  * The sorted frame is persisted across the two passes so both see the
  * SAME partitioning (range boundaries come from sampling; recomputing
  * could legally re-draw them, and pass-2 offsets must match pass-1
  * partitions). Result is independent of the partition count: the
  * prefix sum is over the total (key, id) order, which no boundary
  * placement changes.
  *
  * Output: (idCol, n_tokens, shard) — one row per input doc.
  */
object ShardPack {

  // the shared guard-first long cast (graft.ops.Guards — the r19
  // self-review extraction; one definition, three operator families)
  private def guardedLong(c: String, op: String, what: String) =
    graft.ops.Guards.guardedLong(c, op, what)

  def packByTokenBudget(
      docs: DataFrame,
      idCol: String,
      tokensCol: String,
      budget: Long,
      numPartitions: Int = 32): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    // `div`, not `/`: Spark's `/` on longs is DOUBLE division, which
    // loses exactness once offsets approach 2^53 — the same IEEE cliff
    // tokenBudgetAllocate's rank avoids. Offsets are nonnegative, so
    // `div` == floor division == the oracle's `//`.
    packWithOffsets(docs, idCol, tokensCol, numPartitions)
      .select(col(idCol), col("n_tokens"),
        expr(s"start div ${budget}L").as("shard"))
  }

  /** The two-phase global prefix sum itself: every doc's START OFFSET
    * in the deterministic md5 token stream — the primitive under
    * [[packByTokenBudget]] (shard = start div budget) and
    * [[packSequences]] (bin arithmetic over [start, start+n)).
    *
    * @return (idCol, n_tokens, start)
    */
  def packWithOffsets(
      docs: DataFrame,
      idCol: String,
      tokensCol: String,
      numPartitions: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    val keyed = docs.select(
      md5(concat(lit("shard:"), col(idCol).cast("string"))).as("k"),
      col(idCol).cast("long").as("id"),
      coalesce(col(tokensCol).cast("long"), lit(0L)).as("n_tokens"))
    val sorted = CacheScope.persisted(
      keyed
        .repartitionByRange(numPartitions, col("k"), col("id"))
        .sortWithinPartitions(col("k"), col("id")),
      StorageLevel.MEMORY_AND_DISK)

    // pass 1: per-partition token sums (P longs — driver-trivial)
    val partSums = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(2))
        Iterator((pid, s))
      }
      .collect()
      .sortBy(_._1)
      .map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _) // offsets(p) = tokens before partition p
    val bcOffsets = spark.sparkContext.broadcast(offsets)

    // pass 2: running sum + partition offset → global start offset
    val out = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = bcOffsets.value(pid)
      it.map { r =>
        val n = r.getLong(2)
        val start = run
        run += n
        Row(r.getLong(1), n, start)
      }
    }
    spark.createDataFrame(
      out,
      StructType(Seq(
        StructField(idCol, LongType, nullable = false),
        StructField("n_tokens", LongType, nullable = false),
        StructField("start", LongType, nullable = false))))
  }

  /** SAMPLE PACKING — lay the deterministic token stream into
    * fixed-length training sequences (`seqLen` tokens per bin) with
    * the boundary metadata an attention mask needs: one row per
    * (doc, bin) PIECE, `local_start`/`piece_len` locating the piece
    * inside its bin, `is_continuation` marking pieces that carry a doc
    * across a bin boundary. Every bin except the last is exactly full
    * (Σ piece_len == seqLen — no padding waste: the whole point of
    * packing), docs split rather than pad, and the layout is a pure
    * function of ids — the same reproducibility contract as
    * [[epochOrder]].
    *
    * Scale shape: [[packWithOffsets]]' two-phase prefix sum plus a
    * scan-pure bin explode (a doc spans `(start+n-1)/seqLen −
    * start/seqLen + 1` bins — cheap `sequence()` over a small range);
    * no additional shuffle.
    *
    * @return (idCol, n_tokens, bin, local_start, piece_len,
    *         is_continuation); zero-token docs emit no piece
    */
  def packSequences(
      docs: DataFrame,
      idCol: String,
      tokensCol: String,
      seqLen: Long,
      numPartitions: Int = 32): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    packWithOffsets(docs, idCol, tokensCol, numPartitions)
      .filter(col("n_tokens") > 0)
      // integer `div` (not double `/`): exact past 2^53 token offsets
      .withColumn("first_bin", expr(s"start div ${seqLen}L"))
      .withColumn("last_bin",
        expr(s"(start + n_tokens - 1) div ${seqLen}L"))
      .select(col(idCol), col("n_tokens"), col("start"),
        explode(sequence(col("first_bin"), col("last_bin"))).as("bin"),
        col("first_bin"))
      .withColumn("local_start",
        greatest(col("start") - col("bin") * seqLen, lit(0L)))
      .withColumn("piece_len",
        least((col("bin") + 1) * seqLen, col("start") + col("n_tokens")) -
          greatest(col("bin") * seqLen, col("start")))
      .withColumn("is_continuation", col("bin") > col("first_bin"))
      .select(col(idCol), col("n_tokens"), col("bin"), col("local_start"),
        col("piece_len"), col("is_continuation"))
  }

  /** MATERIALIZED sample packing — the trainer hand-off artifact: lay a
    * REAL token stream into [[packSequences]]' fixed-length bins and
    * emit one row per training SEQUENCE with the actual token ids in
    * position order (what a trainer mmaps), plus the boundary metadata:
    * tokens filled, distinct docs touching the bin, docs STARTING in
    * the bin. `tokenStream` is (idCol, tok_idx, token_id) with tok_idx
    * densely 0-based per document — e.g.
    * [[graft.scale.Bpe.encodeIndexed]] joined through
    * [[graft.scale.Bpe.pieceVocab]]. The layout is bit-for-bit the
    * [[packSequences]] contract: global doc order by md5(id), docs
    * split across bins, every bin except the last exactly `seqLen`
    * full (token conservation — Σ size(token_ids) == stream size —
    * spec-pinned).
    *
    * Scale shape: per-doc counts (one hash agg) feed
    * [[packWithOffsets]]' two-phase prefix sum; the stream joins its
    * doc's start offset (slim long columns per token) and folds into
    * per-bin arrays in ONE hash agg whose per-group state is bounded
    * by seqLen entries. Bins are the output's partition unit exactly
    * as shards are [[packByTokenBudget]]'s — nothing corpus-sized ever
    * sits in one task.
    *
    * @return (bin, n_tokens, n_docs, n_doc_starts, token_ids)
    */
  def materializeSequences(
      tokenStream: DataFrame,
      idCol: String,
      seqLen: Long,
      numPartitions: Int = 32): DataFrame =
    materializeCore(tokenStream, idCol, seqLen, numPartitions, Nil)

  /** [[materializeSequences]] carrying a per-token MASK column — the
    * SFT artifact: each sequence row also holds the 0/1 loss mask in
    * the same position order as its token ids (masked and unmasked
    * spans tile the sequences exactly as
    * [[graft.scale.Dialogue.lossMaskSpans]] describes them; equality
    * spec-pinned). Same plan as the unmasked form — the mask rides the
    * one collected struct, no extra agg.
    *
    * @return (bin, n_tokens, n_docs, n_doc_starts, token_ids, mask)
    */
  def materializeSequencesWithMask(
      tokenStream: DataFrame,
      idCol: String,
      maskCol: String,
      seqLen: Long,
      numPartitions: Int = 32): DataFrame =
    materializeCore(tokenStream, idCol, seqLen, numPartitions, Seq(maskCol))
      .withColumnRenamed(maskCol, "mask")

  /** [[materializeSequences]] carrying ARBITRARY per-token long
    * channels in the same position order as the token ids — the
    * multi-channel trainer artifact (e.g. a loss mask AND a per-token
    * process-reward value target ride one sequence row). Channels are
    * emitted as one array column per input channel name; the
    * (mask-only) form is [[materializeSequencesWithMask]] with the
    * output array named `mask` for compatibility. Same single-agg plan
    * whatever the channel count — channels ride the one collected
    * struct.
    */
  def materializeSequencesWithChannels(
      tokenStream: DataFrame,
      idCol: String,
      channelCols: Seq[String],
      seqLen: Long,
      numPartitions: Int = 32): DataFrame =
    materializeCore(tokenStream, idCol, seqLen, numPartitions, channelCols)

  private val MaterializeReserved =
    Set("bin", "n_tokens", "n_docs", "n_doc_starts", "token_ids")

  private def materializeCore(
      tokenStream: DataFrame,
      idCol: String,
      seqLen: Long,
      numPartitions: Int,
      channelCols: Seq[String]): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    // fail at the CALL with a named error: a duplicate channel name or
    // one shadowing a fixed output column would otherwise surface as an
    // ambiguous-reference AnalysisException at the caller's first select
    require(channelCols.distinct == channelCols,
      s"materializeSequences: duplicate channel names in $channelCols")
    val shadowed = channelCols.filter(MaterializeReserved.contains)
    require(shadowed.isEmpty,
      s"materializeSequences: channel name(s) $shadowed shadow fixed " +
        s"output columns $MaterializeReserved")
    // LINEAGE-CUT: the stream feeds BOTH the per-doc count pass and the
    // layout join, and its upstream is typically the full tokenizer
    // encode (vocab join + per-doc window) that must neither run twice
    // (a cache fixes that) nor re-ANALYZE per consumer (only the cut
    // fixes that — the r17 fan-out plan-blowup measurement). The cut
    // rows are slim long columns — disk-spillable, the q56 size class
    val cols = Seq(col(idCol), col("tok_idx"), col("token_id")) ++
      channelCols.zipWithIndex.map { case (c, i) =>
        col(c).cast("long").as(s"__ch$i")
      }
    val stream = CacheScope.cut(tokenStream.select(cols: _*))
    val counts = stream.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"))
    val offsets = packWithOffsets(counts, idCol, "n_tokens", numPartitions)
      .select(col(idCol), col("start"))
    val packedStruct = ("struct(local, token_id" +:
      channelCols.indices.map(i => s"__ch$i")).mkString(", ") + ")"
    val binned = stream
      .join(offsets, Seq(idCol))
      .withColumn("pos", col("start") + col("tok_idx"))
      .withColumn("bin", expr(s"pos div ${seqLen}L"))
      .withColumn("local", col("pos") - col("bin") * seqLen)
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n_tokens"),
        countDistinct(col(idCol)).as("n_docs"),
        sum(when(col("tok_idx") === 0L, 1L).otherwise(0L)).as("n_doc_starts"),
        expr(s"array_sort(collect_list($packedStruct))").as("__packed"))
    val chOut = channelCols.zipWithIndex.map { case (c, i) =>
      expr(s"transform(__packed, s -> s.__ch$i)").as(c)
    }
    binned.select(
      Seq(col("bin"), col("n_tokens"), col("n_docs"), col("n_doc_starts"),
        expr("transform(__packed, s -> s.token_id)").as("token_ids")) ++
        chOut: _*)
  }

  /** ATTENTION-SEGMENT BOUNDARIES (`cu_seqlens`) — the varlen-attention
    * contract a packed-sequence trainer consumes: for each sequence of
    * a channel-materialized export
    * ([[materializeSequencesWithChannels]] with the DOC ID riding a
    * channel), the cumulative segment offsets `[0, l₁, l₁+l₂, …,
    * n_tokens]` marking where attention must not cross document
    * boundaries (the block-diagonal mask a no-cross-doc-attention
    * trainer builds from exactly this array). A segment boundary sits
    * wherever the doc channel CHANGES; bins hold consecutive stream
    * positions and every doc occupies one contiguous span, so each doc
    * is ONE segment per bin — `n_segments == n_docs` (law), and the
    * interior boundaries equal [[packSequences]]' `local_start`
    * metadata for the same corpus (cross-operator law, both
    * spec-pinned).
    *
    * Scale shape: pure per-row ARRAY EXPRESSIONS over the already-
    * materialized sequence rows — no shuffle, no window, no UDF; the
    * filter/transform lambdas stay inside codegen. (The Spark
    * `sequence(1, n-1)` pitfall — it COUNTS DOWN when n-1 < 1 instead
    * of returning empty — is guarded for the single-token bin.)
    *
    * @param packed     a [[materializeSequencesWithChannels]] frame
    * @param docChannel the channel column carrying each position's doc
    * @return packed's columns + (n_segments, cu_seqlens)
    */
  def sequenceBoundaries(packed: DataFrame, docChannel: String): DataFrame = {
    require(packed.columns.contains(docChannel),
      s"sequenceBoundaries: no channel column '$docChannel' " +
        s"(columns: ${packed.columns.mkString(", ")})")
    // fail at the CALL on output-name collisions (the materializeCore
    // shadow-guard convention): a channel already named cu_seqlens /
    // n_segments would be silently OVERWRITTEN by the derivation
    Seq("cu_seqlens", "n_segments").foreach(c =>
      require(!packed.columns.contains(c),
        s"sequenceBoundaries: packed already has a '$c' column — the " +
          "derived output would silently overwrite it"))
    val ch = col(docChannel)
    // null-channel guard, IN the cu array's leading element: a nulled
    // channel value makes every change compare NULL, filter() drops
    // them all, and the bin silently reports ONE segment — a trainer
    // would then permit cross-document attention (the packBestFit
    // silent-cast-to-null class). The guard rides the artifact it
    // protects: any consumer of cu_seqlens evaluates it.
    val guard = coalesce(
      assert_true(!exists(ch, x => x.isNull),
        lit("sequenceBoundaries: the doc channel contains nulls — " +
          "every segment boundary would silently vanish (the channel " +
          "must be a non-null numeric doc id)")).cast("long"),
      lit(0L))
    val interior = when(size(ch) > 1,
      filter(
        sequence(lit(1), size(ch) - 1),
        p => element_at(ch, p + 1) =!= element_at(ch, p))
        .cast("array<bigint>"))
      .otherwise(array().cast("array<bigint>"))
    packed
      .withColumn("cu_seqlens",
        concat(array(guard), interior, array(size(ch).cast("long"))))
      .withColumn("n_segments", (size(col("cu_seqlens")) - 1).cast("long"))
  }

  /** Deterministic per-epoch data order — the reproducible data-loader
    * contract a training job needs to RESUME and to reproduce a run
    * bit-for-bit: within each shard, sequences are consumed in
    * `md5("epoch:<e>:<id>")` order (ties by id), so every epoch is a
    * fresh pseudo-random permutation of the same set, and the order is
    * a pure function of (epoch, ids) — identical across reruns,
    * engines, and cluster sizes. The shuffle stays WITHIN shards (the
    * unit a data loader reads in parallel): a keyed window, never a
    * global sort — shard sizes are budget-bounded by
    * [[packByTokenBudget]], so no window partition outgrows a task.
    *
    * @return packed columns + (epoch, pos); pos is 0-based within the
    *         shard
    */
  def epochOrder(packed: DataFrame, idCol: String, epoch: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(epoch >= 0, s"epoch must be >= 0, got $epoch")
    val ek = epochPermKey(lit(epoch), col(idCol))
    packed
      .withColumn("epoch", lit(epoch))
      .withColumn("pos",
        (row_number().over(
          Window.partitionBy("shard").orderBy(ek, col(idCol))) - 1).cast("long"))
  }

  /** The resume slice: everything STRICTLY AFTER the `(shard, pos)`
    * cursor in [[epochOrder]]'s lexicographic (shard, pos) order —
    * what a restarted loader feeds next. Consumed ∪ resume == the
    * epoch, disjoint (spec-pinned); a scan-pure filter, pushed to the
    * shard/pos columns.
    */
  def resumeAfter(ordered: DataFrame, shardCursor: Long, posCursor: Long): DataFrame =
    ordered.filter(col("shard") > shardCursor ||
      (col("shard") === shardCursor && col("pos") > posCursor))

  /** DOC-PRESERVING packing — [[packSequences]]' complement, the
    * post-training layout: docs are NEVER split (no cross-doc
    * attention), each bin holds whole docs up to `seqLen`, the
    * shortfall is padding waste (reported by [[packBestFitStats]]).
    * The algorithm is deterministic first-fit-decreasing WITHIN
    * md5-ordered shards: docs land in shards by [[packByTokenBudget]]
    * (budget `shardBudget`), then each shard packs its own docs
    * sorted (n_tokens desc, id asc) into the first bin with room —
    * the classic FFD ≤ 11/9·OPT + 1 bound per shard, reproducible
    * because both the shard membership and the in-shard order are pure
    * functions of ids.
    *
    * Docs LONGER than seqLen cannot be placed by a packer forbidden to
    * split: they are REPORTED (oversize = true, shard/bin = −1), never
    * silently dropped or truncated — the truncate-vs-split decision
    * belongs to the curation policy, not the layout engine. Zero-token
    * docs emit no row (the packSequences omission rule).
    *
    * Scale shape: the sequential unit is ONE SHARD's doc list
    * (shardBudget-bounded by construction — the collect_list and the
    * FFD loop are both capped by it), grouped-by-shard in one hash
    * agg; shards pack in parallel across the cluster. This is the
    * bounded-sequential-unit contract that makes a greedy algorithm
    * distributable: globally-greedy FFD would be a single task.
    *
    * @return (idCol, n_tokens, shard, bin, oversize) — bin is 0-based
    *         within its shard; (shard, bin) identifies a sequence
    */
  def packBestFit(
      docs: DataFrame,
      idCol: String,
      tokensCol: String,
      seqLen: Long,
      shardBudget: Long,
      numPartitions: Int = 32): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    require(shardBudget >= seqLen,
      s"shardBudget ($shardBudget) must be >= seqLen ($seqLen)")
    // fail loud on non-numeric ids: a silent cast-to-null would collapse
    // distinct docs into one null id inside the FFD fold (the
    // packWithOffsets numeric-id contract, enforced rather than assumed)
    // guard FIRST: the failing case is exactly a NULL cast, and
    // codegen's null-short-circuit would skip a right-hand guard there
    val base = docs.select(
      (coalesce(
        assert_true(col(idCol).isNull || col(idCol).cast("long").isNotNull,
          lit(s"packBestFit: $idCol is not castable to long — the packing " +
            "contract needs a numeric doc id")).cast("long"),
        lit(0L)) + col(idCol).cast("long")).as("id"),
      coalesce(col(tokensCol).cast("long"), lit(0L)).as("n_tokens"))
    val oversize = base.filter(col("n_tokens") > seqLen)
      .select(col("id"), col("n_tokens"), lit(-1L).as("shard"),
        lit(-1L).as("bin"), lit(true).as("oversize"))
    val fit = base.filter(col("n_tokens") > 0 && col("n_tokens") <= seqLen)
    val cap = seqLen
    val ffd = udf((items: Seq[Row]) => {
      val sorted = items.map(r => (r.getLong(0), r.getLong(1)))
        .sortBy { case (n, id) => (-n, id) }
      val loads = scala.collection.mutable.ArrayBuffer.empty[Long]
      sorted.map { case (n, id) =>
        val i = loads.indexWhere(_ + n <= cap)
        val bin =
          if (i >= 0) { loads(i) += n; i }
          else { loads += n; loads.size - 1 }
        (id, n, bin.toLong)
      }
    })
    packByTokenBudget(fit, "id", "n_tokens", shardBudget, numPartitions)
      .groupBy(col("shard"))
      .agg(ffd(collect_list(struct(col("n_tokens"), col("id")))).as("placed"))
      .select(col("shard"), explode(col("placed")).as("p"))
      .select(col("p._1").as("id"), col("p._2").as("n_tokens"), col("shard"),
        col("p._3").as("bin"), lit(false).as("oversize"))
      .unionByName(oversize)
      .withColumnRenamed("id", idCol)
  }

  /** Oversize policy 1 of 2 — TRUNCATE: consume a [[packBestFit]]
    * layout's oversize queue (bin = −1) by cutting each oversize doc to
    * exactly `seqLen` tokens. A truncated doc fills one bin alone (it
    * is exactly bin-sized), so the repair is COMPOSITIONAL: every
    * already-placed row passes through with its (shard, bin) untouched
    * (a writer that materialized them re-shuffles nothing), and the
    * truncated docs take fresh bins in fresh shards APPENDED after the
    * layout's last shard — [[packByTokenBudget]]'s md5 stream over the
    * truncated docs, one doc per bin, bins numbered in id order within
    * their shard. The cut is REPORTED per doc (`cut_tokens`), never
    * silent — truncation destroys data and the stage report must say
    * how much (conservation law n_tokens + cut_tokens == original,
    * spec-pinned). The complementary lossless policy is
    * [[splitOversize]]; [[packBestFitStats]] reads either result
    * directly (no oversize rows remain).
    *
    * Scale shape: one 1-row max-shard agg over the layout (broadcast
    * back), the two-phase prefix sum over the oversize frame, a keyed
    * row_number window. Nothing doc-content-sized.
    *
    * @return (idCol, n_tokens, cut_tokens, shard, bin, oversize=false,
    *         truncated)
    */
  def truncateOversize(
      layout: DataFrame,
      idCol: String,
      seqLen: Long,
      shardBudget: Long,
      numPartitions: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    // persisted: the layout feeds the passthrough, the max-shard agg,
    // and the oversize branch — doc-count-sized slim rows
    val l = CacheScope.persisted(layout, StorageLevel.MEMORY_AND_DISK)
    val passthrough = l.filter(!col("oversize"))
      .select(col(idCol), col("n_tokens"), lit(0L).as("cut_tokens"),
        col("shard"), col("bin"), lit(false).as("oversize"),
        lit(false).as("truncated"))
    val shardOff = l.filter(!col("oversize"))
      .agg(coalesce(max(col("shard")) + 1L, lit(0L)).as("__shard_off"))
    val truncated = l.filter(col("oversize"))
      .select(col(idCol), col("n_tokens").as("__orig"))
    val repacked = packByTokenBudget(
      truncated.select(col(idCol), lit(seqLen).as("n_tokens")),
      idCol, "n_tokens", shardBudget, numPartitions)
      .join(truncated.select(col(idCol), col("__orig")), Seq(idCol))
      .crossJoin(broadcast(shardOff))
      .withColumn("bin",
        (row_number().over(
          Window.partitionBy("shard").orderBy(col(idCol))) - 1).cast("long"))
      .select(col(idCol), col("n_tokens"),
        (col("__orig") - seqLen).as("cut_tokens"),
        (col("shard") + col("__shard_off")).as("shard"), col("bin"),
        lit(false).as("oversize"), lit(true).as("truncated"))
    passthrough.unionByName(repacked)
  }

  /** Oversize policy 2 of 2 — SPLIT-THEN-PACK (lossless): consume the
    * oversize queue by pre-splitting each oversize doc into
    * ceil(n/seqLen) chunks (all full except a possible remainder), then
    * [[packBestFit]] the CHUNKS into fresh shards appended after the
    * layout's last shard. Full chunks necessarily take a bin alone
    * (they are bin-sized); remainder chunks first-fit-pack ACROSS docs,
    * so the policy's padding waste is at most the per-doc-isolated
    * split's (waste law, spec-pinned) — for the docs it repairs this
    * converges toward [[packSequences]]' zero-waste layout, at the
    * price of re-introducing within-doc sequence boundaries (chunk
    * order is the `chunk` column; a no-cross-doc-attention trainer
    * treats chunks as independent docs). Placed rows pass through
    * untouched with chunk = 0. Chunk identity packs fail-loud as
    * id·chunkSpan + chunk (the [[graft.scale.Dialogue.sftCurate]]
    * convention), unpacked in the output.
    *
    * @return (idCol, chunk, n_tokens, shard, bin, oversize=false,
    *         from_split)
    */
  def splitOversize(
      layout: DataFrame,
      idCol: String,
      seqLen: Long,
      shardBudget: Long,
      chunkSpan: Long = 100000L,
      numPartitions: Int = 32): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    require(chunkSpan >= 2, s"chunkSpan must be >= 2, got $chunkSpan")
    // persisted for the same three-consumer reason as truncateOversize
    val l = CacheScope.persisted(layout, StorageLevel.MEMORY_AND_DISK)
    val passthrough = l.filter(!col("oversize"))
      .select(col(idCol), lit(0L).as("chunk"), col("n_tokens"),
        col("shard"), col("bin"), lit(false).as("oversize"),
        lit(false).as("from_split"))
    val shardOff = l.filter(!col("oversize"))
      .agg(coalesce(max(col("shard")) + 1L, lit(0L)).as("__shard_off"))
    val maxId = Long.MaxValue / chunkSpan
    val chunks = l.filter(col("oversize"))
      .withColumn("__n_chunks", expr(s"(n_tokens + ${seqLen}L - 1) div ${seqLen}L"))
      .select(col(idCol), col("n_tokens").as("__orig"),
        explode(sequence(lit(0L), col("__n_chunks") - 1)).as("chunk"))
      // guard FIRST: codegen's null-short-circuit would skip a
      // right-hand guard when the id cast is null
      .withColumn("cid",
        coalesce(
          assert_true(col("chunk") < chunkSpan &&
            col(idCol).cast("long").between(0L, maxId - 1),
            lit(s"splitOversize: chunk-id packing out of range (need " +
              s"0 <= $idCol < $maxId and ceil(n/seqLen) <= chunkSpan=" +
              s"$chunkSpan)")).cast("long"),
          lit(0L)) +
          col(idCol).cast("long") * chunkSpan + col("chunk"))
      .withColumn("n_tokens",
        least(lit(seqLen), col("__orig") - col("chunk") * seqLen))
    val repacked = packBestFit(
      chunks.select(col("cid"), col("n_tokens")),
      "cid", "n_tokens", seqLen, shardBudget, numPartitions)
      .crossJoin(broadcast(shardOff))
      .select(expr(s"cid div ${chunkSpan}L").as(idCol),
        (col("cid") % chunkSpan).as("chunk"), col("n_tokens"),
        (col("shard") + col("__shard_off")).as("shard"), col("bin"),
        lit(false).as("oversize"), lit(true).as("from_split"))
    passthrough.unionByName(repacked)
  }

  /** The WRITER-facing manifest of a [[packBestFit]] layout: one row
    * per (shard, bin) with the member doc ids in FFD insertion order
    * (n_tokens desc, id asc — within one bin, insertion order IS that
    * sort order, because items arrive sorted and a bin only accretes),
    * the fill, and the padding the writer must append. Oversize rows
    * are excluded — they are a policy queue, not bin members.
    *
    * `idCol` names the layout's doc-id column explicitly (the sibling
    * ops' convention) — inferring it positionally silently grouped by
    * the wrong column on any projected/reordered layout.
    *
    * @return (shard, bin, n_docs, fill, pad, doc_ids)
    */
  /** The ONE per-bin FFD-insertion-order aggregation under
    * [[bestFitBinManifest]] and [[bestFitSegments]] (r19 self-review
    * extraction — the (n desc, id asc) insertion-order convention must
    * live in one place): (shard, bin, n_docs, fill, __ffd) where
    * `__ffd` is the sorted (o1 = −n_tokens, o2 = id) struct array.
    * Typed columns, not expr interpolation: id names needing backticks
    * must not break or mis-bind the sort struct.
    */
  private def ffdBinAgg(layout: DataFrame, idCol: String): DataFrame =
    layout.filter(!col("oversize"))
      .groupBy(col("shard"), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("fill"),
        array_sort(collect_list(struct(
          (-col("n_tokens")).as("o1"), col(idCol).as("o2")))).as("__ffd"))

  def bestFitBinManifest(layout: DataFrame, idCol: String, seqLen: Long): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    require(layout.columns.contains(idCol),
      s"bestFitBinManifest: layout has no column '$idCol' " +
        s"(columns: ${layout.columns.mkString(", ")})")
    ffdBinAgg(layout, idCol)
      .withColumn("doc_ids", transform(col("__ffd"), s => s.getField("o2")))
      .withColumn("pad", lit(seqLen) - col("fill"))
      .select(col("shard"), col("bin"), col("n_docs"), col("fill"),
        col("pad"), col("doc_ids"))
  }

  /** [[sequenceBoundaries]]' POST-TRAINING twin — cu_seqlens for a
    * [[packBestFit]] layout's whole-doc bins: each (shard, bin)
    * sequence emits its cumulative segment offsets `[0, l₁, l₁+l₂, …,
    * fill]` in FFD insertion order (n_tokens desc, id asc — the same
    * order [[materializeBestFit]] lays tokens down, so the interior
    * boundaries are exactly its doc_off values; cross-operator law,
    * spec-pinned), plus the padding suffix a fixed-width trainer
    * masks: positions [fill, seqLen) attend to nothing. Docs never
    * split here, so segments == docs per bin; oversize rows are
    * excluded (the policy queue).
    *
    * Scale shape: ONE hash agg per (shard, bin) whose state is the
    * bin's own member list (seqLen-bounded by construction) + a
    * per-row prefix-sum array fold — no windows, no collects.
    *
    * @return (shard, bin, n_docs, n_segments, fill, pad, cu_seqlens)
    */
  def bestFitSegments(layout: DataFrame, idCol: String, seqLen: Long): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    require(layout.columns.contains(idCol),
      s"bestFitSegments: layout has no column '$idCol' " +
        s"(columns: ${layout.columns.mkString(", ")})")
    // the member LENGTHS in insertion order are the negated o1 field of
    // the shared [[ffdBinAgg]] struct — one agg definition for both
    // consumers of the insertion-order convention
    ffdBinAgg(layout, idCol)
      .withColumn("__lens",
        transform(col("__ffd"), s => (-s.getField("o1")).cast("long")))
      .withColumn("cu_seqlens",
        expr("aggregate(__lens, array(cast(0 as bigint)), " +
          "(acc, l) -> array_append(acc, element_at(acc, -1) + l))"))
      .withColumn("n_segments", (size(col("cu_seqlens")) - 1).cast("long"))
      .withColumn("pad", lit(seqLen) - col("fill"))
      .select(col("shard"), col("bin"), col("n_docs"), col("n_segments"),
        col("fill"), col("pad"), col("cu_seqlens"))
  }

  /** MATERIALIZED best-fit sequences — the post-training twin of
    * [[materializeSequences]]: lay a real token stream into a
    * [[packBestFit]] layout's whole-doc bins and emit one row per
    * (shard, bin) with the token ids in bin order (docs concatenate in
    * FFD insertion order — n_tokens desc, id asc — each doc's tokens
    * contiguous) RIGHT-PADDED with `padId` to exactly `seqLen`: the
    * fixed-width tensor a fine-tuning loader mmaps, pad_len doubling
    * as the attention-mask suffix length.
    *
    * CONSISTENCY is enforced, not assumed, at PER-DOC granularity: the
    * layout's token counts and the stream's actual per-doc sizes come
    * from different calls, and a drift between them would either
    * overflow a bin (stream longer than layout) or silently emit
    * tokens with docs shifted off their doc_off positions. Every doc's
    * actual stream count is compared in-plan against its layout
    * n_tokens through a FULL OUTER join (one doc-count-sized agg over
    * the stream), so compensating per-doc drift inside one bin, layout
    * docs missing from the stream, and stream docs missing from the
    * layout ALL fail loud; the per-bin fill is additionally checked
    * against seqLen (a layout bin packed past capacity has no legal
    * pad). Oversize layout rows are excluded (they are
    * [[packBestFit]]'s policy queue).
    *
    * Scale shape: one per-(shard, bin) window over the layout
    * (bin-sized partitions), the stream joins its doc's bin offset,
    * one hash agg whose per-group state is seqLen-bounded — the
    * [[materializeSequences]] discipline with (shard, bin) as the key.
    *
    * @return (shard, bin, n_docs, fill, pad_len, token_ids[seqLen])
    */
  def materializeBestFit(
      tokenStream: DataFrame,
      layout: DataFrame,
      idCol: String,
      seqLen: Long,
      padId: Long = -1L): DataFrame =
    materializeBestFitCore(tokenStream, layout, idCol, seqLen, padId, Nil)

  /** [[materializeBestFit]] carrying a per-token 0/1 MASK column — the
    * padded post-training twin of [[materializeSequencesWithMask]]:
    * each (shard, bin) row also holds the loss mask in the same
    * position order as its token ids, right-padded with 0 (pad tokens
    * never train). Same plan as the unmasked form — the mask rides the
    * one collected struct.
    *
    * @return (shard, bin, n_docs, fill, pad_len, token_ids[seqLen],
    *         mask[seqLen])
    */
  def materializeBestFitWithMask(
      tokenStream: DataFrame,
      layout: DataFrame,
      idCol: String,
      maskCol: String,
      seqLen: Long,
      padId: Long = -1L): DataFrame =
    materializeBestFitCore(tokenStream, layout, idCol, seqLen, padId,
      Seq((maskCol, 0L)))
      .withColumnRenamed(maskCol, "mask")

  /** [[materializeBestFit]] carrying ARBITRARY per-token long channels
    * — the split materializer's
    * [[materializeSequencesWithChannels]] generalized to the whole-doc
    * (post-training) layout: each (shard, bin) row also holds one
    * array per channel in the same position order as its token ids,
    * right-padded to `seqLen` with that channel's OWN pad value (a
    * loss mask pads 0 — pad tokens never train; a payload-key channel
    * pads −1 — the no-payload sentinel must survive the suffix, which
    * is why the pad rides the channel spec rather than a global
    * constant). This is the piece that lets
    * [[graft.scale.Multimodal.interleavedTokenStream]]'s payload-key
    * channel reach a multimodal SFT export: no cross-doc attention
    * (the layout's whole-doc contract) AND placeholder keys riding
    * exactly the placeholder positions — each assigned doc's key sits
    * at its doc_off, i.e. at a [[bestFitSegments]] segment start
    * (cross-operator law, spec-pinned).
    *
    * Same single-agg plan as the mask form whatever the channel count
    * — channels ride the one collected struct; the (mask-only) form is
    * [[materializeBestFitWithMask]] with the output array named `mask`.
    *
    * @param channels (column name, pad value) per channel; output
    *                 arrays keep the input names
    * @return (shard, bin, n_docs, fill, pad_len, token_ids[seqLen],
    *         <channel>[seqLen]…)
    */
  def materializeBestFitWithChannels(
      tokenStream: DataFrame,
      layout: DataFrame,
      idCol: String,
      channels: Seq[(String, Long)],
      seqLen: Long,
      padId: Long = -1L): DataFrame =
    materializeBestFitCore(tokenStream, layout, idCol, seqLen, padId, channels)

  private val BestFitReserved =
    Set("shard", "bin", "n_docs", "fill", "pad_len", "token_ids")

  private def materializeBestFitCore(
      tokenStream: DataFrame,
      layout: DataFrame,
      idCol: String,
      seqLen: Long,
      padId: Long,
      channels: Seq[(String, Long)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    // fail at the CALL with a named error (the materializeCore
    // shadow-guard convention): a duplicate channel name or one
    // shadowing a fixed output column would otherwise surface as an
    // ambiguous-reference AnalysisException downstream
    val chNames = channels.map(_._1)
    require(chNames.distinct == chNames,
      s"materializeBestFit: duplicate channel names in $chNames")
    val shadowed = chNames.filter(BestFitReserved.contains)
    require(shadowed.isEmpty,
      s"materializeBestFit: channel name(s) $shadowed shadow fixed " +
        s"output columns $BestFitReserved")
    val w = Window.partitionBy(col("shard"), col("bin"))
      .orderBy(col("n_tokens").desc, col(idCol))
    // persisted: the slim layout feeds BOTH the guarded expected-fill
    // agg and (through the doc_off window) the stream join — without
    // the cache the layout chain (packing agg included) runs twice.
    // Doc-count-sized slim long rows.
    val lay = CacheScope.persisted(
      layout.select(col(idCol), col("n_tokens"), col("shard"), col("bin"),
        col("oversize")),
      StorageLevel.MEMORY_AND_DISK)
    val placed = lay.filter(!col("oversize"))
      .withColumn("doc_off",
        coalesce(sum(col("n_tokens"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(idCol), col("shard"), col("bin"), col("doc_off"))
    val packedStruct = ("struct(local, token_id" +:
      channels.indices.map(i => s"__ch$i")).mkString(", ") + ")"
    val streamCols = Seq(col(idCol), col("tok_idx"), col("token_id")) ++
      channels.zipWithIndex.map { case ((c, _), i) =>
        col(c).cast("long").as(s"__ch$i")
      }
    // PER-DOC drift guard (both directions) feeding the expected-fill
    // agg: a bin-aggregate fill compare alone cannot see COMPENSATING
    // per-doc drift inside one bin (doc A k tokens short, doc B k long
    // sums to the right fill yet shifts every doc_off after A), and an
    // inner stream join silently drops stream docs absent from the
    // layout. The FULL OUTER join fails loud on all three classes:
    // per-doc count mismatch, placed doc missing from the stream
    // (__actual null), stream doc missing from the layout (n_tokens
    // null — assert_true on a null condition raises). Docs on the
    // layout's OVERSIZE queue are deliberately exempt (the filter keeps
    // stream-only rows, whose oversize is null): their stream rows are
    // REPORTED by the layout, not silently dropped, and they never
    // materialize. Doc-count-sized slim rows; the guard rides the
    // expected agg's input, the branch that drives the output join, so
    // it cannot be planned away.
    val streamCounts = tokenStream
      .groupBy(col(idCol)).agg(count(lit(1)).as("__actual"))
    val expected = lay
      .join(streamCounts, Seq(idCol), "full_outer")
      .filter(!coalesce(col("oversize"), lit(false)))
      .withColumn("__g", coalesce(
        assert_true(col("n_tokens") === col("__actual"),
          lit("materializeBestFit: a doc's stream token count disagrees " +
            "with the layout's n_tokens (or the doc is missing from one " +
            "side entirely) — its bin's doc_off layout would silently " +
            "shift")).cast("long"),
        lit(0L)))
      .groupBy(col("shard"), col("bin"))
      // __g (never null) on the LEFT: codegen short-circuits the right
      // operand of + when the left is null, and n_tokens IS null for
      // exactly the stream-only rows the guard must catch
      .agg(sum(col("__g") + col("n_tokens")).as("__expected_fill"))
    val actual = tokenStream.select(streamCols: _*)
      .join(placed, Seq(idCol))
      .withColumn("local", col("doc_off") + col("tok_idx"))
      .groupBy(col("shard"), col("bin"))
      .agg(
        count(lit(1)).as("fill"),
        countDistinct(col(idCol)).as("n_docs"),
        expr(s"array_sort(collect_list($packedStruct))").as("__packed"))
    expected.join(actual, Seq("shard", "bin"), "left")
      .withColumn("fill",
        coalesce(col("fill"), lit(0L)) + coalesce(
          assert_true(
            coalesce(col("fill"), lit(0L)) === col("__expected_fill") &&
              col("__expected_fill") <= seqLen,
            lit(s"materializeBestFit: bin fill disagrees with the layout's " +
              "token counts (overflow OR undercount — docs would shift off " +
              s"their doc_off positions), or the layout bin itself exceeds " +
              s"seqLen=$seqLen (negative pad)")).cast("long"),
          lit(0L)))
      .withColumn("token_ids",
        concat(expr("transform(__packed, s -> s.token_id)"),
          array_repeat(lit(padId), (lit(seqLen) - col("fill")).cast("int"))))
      .withColumn("pad_len", lit(seqLen) - col("fill"))
      .select(
        Seq(col("shard"), col("bin"), col("n_docs"), col("fill"),
          col("pad_len"), col("token_ids")) ++
          channels.zipWithIndex.map { case ((c, pad), i) =>
            concat(expr(s"transform(__packed, s -> s.__ch$i)"),
              array_repeat(lit(pad),
                (lit(seqLen) - col("fill")).cast("int"))).as(c)
          }: _*)
  }

  /** The padding-waste report over a [[packBestFit]] layout: bins,
    * capacity, filled tokens, waste (the tokens [[packSequences]]'
    * split layout would NOT pad), waste per-mille, and the oversize
    * count. One row; integer `div`.
    */
  def packBestFitStats(layout: DataFrame, seqLen: Long): DataFrame = {
    val bins = layout.filter(!col("oversize"))
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("nd"), sum("n_tokens").as("fill"))
    val b = bins.agg(
      count(lit(1)).as("n_bins"),
      coalesce(sum("nd"), lit(0L)).as("n_docs_packed"),
      coalesce(sum("fill"), lit(0L)).as("filled"))
    val o = layout.agg(
      sum(when(col("oversize"), 1L).otherwise(0L)).as("n_oversize"))
    b.crossJoin(broadcast(o))
      .withColumn("capacity", col("n_bins") * seqLen)
      .withColumn("waste", col("capacity") - col("filled"))
      .withColumn("waste_permille",
        when(col("capacity") > 0, expr("waste * 1000 div capacity"))
          .otherwise(lit(0L)))
      .select(col("n_bins"), col("n_docs_packed"), col("n_oversize"),
        col("capacity"), col("filled"), col("waste"), col("waste_permille"))
  }

  /** The EPOCH-SCHEDULE MANIFEST — [[epochOrder]] composed across a
    * whole training run: one (epoch, shard, pos) row per (epoch, doc),
    * each epoch a fresh deterministic permutation of the same shard
    * contents (epoch 0's order ≠ epoch 1's, both pure functions of
    * ids). This is the complete data-loader contract a run ships with:
    * the schedule is decided BEFORE training, reproducible on any
    * engine, and a resume cursor addresses any point of the whole run.
    *
    * Scale shape: `epochs` unioned keyed windows over the packed frame
    * — the scan replicates per epoch exactly as a loader would read it;
    * nothing is epoch-count-sized in one task. `epochs ≤ 64` keeps the
    * unrolled union plan shallow (a longer horizon materializes the
    * manifest per epoch anyway).
    */
  def epochManifest(packed: DataFrame, idCol: String, epochs: Int): DataFrame = {
    require(epochs >= 1 && epochs <= 64,
      s"epochs must be in [1, 64] (unrolled union plan), got $epochs")
    (0L until epochs.toLong).map(epochOrder(packed, idCol, _))
      .reduce(_.unionByName(_))
  }

  /** The GLOBAL WRITER MANIFEST — the missing piece between a
    * [[packBestFit]] layout (bins numbered within shards) and a trainer
    * shard-file writer: one row per (epoch, sequence) carrying
    *
    *   - `seq_id`: the CONTIGUOUS global sequence index, 0..N−1 in
    *     lexicographic (shard, bin) order — the offset a loader seeks
    *     by;
    *   - `file`: the deterministic output-file assignment — sequences
    *     stream IN seq_id ORDER into files of ~`fileBudget` tokens
    *     (file = running fill before the sequence, integer-divided by
    *     the budget — [[packByTokenBudget]]'s rule applied along the
    *     sequence order rather than an md5 order, because a writer
    *     emits consecutive sequences into one file; an md5 reshuffle
    *     here would make every file read the whole layout);
    *   - `(epoch, pos)`: [[epochManifest]] composed over the sequences
    *     (seq_id as the permutation key), so a resume cursor addresses
    *     any point of the whole run AND resolves to a concrete
    *     (file, seq_id) to seek.
    *
    * Every sequence appears in exactly one file and exactly once per
    * epoch (conservation law, spec-pinned); the whole manifest is a
    * pure function of the layout.
    *
    * Scale shape: the bin rollup is one hash agg; seq_id and file come
    * from ONE two-phase prefix pass (the [[packWithOffsets]] discipline
    * with two accumulators — running count and running fill — over the
    * range-partitioned (shard, bin) order); the epoch composition is
    * [[epochOrder]]'s keyed windows. Nothing corpus-sized in one task.
    *
    * @return (shard, bin, fill, n_docs, seq_id, file, epoch, pos)
    */
  def globalWriterManifest(
      layout: DataFrame,
      fileBudget: Long,
      epochs: Int,
      numPartitions: Int = 32): DataFrame = {
    require(fileBudget > 0, s"fileBudget must be positive, got $fileBudget")
    val spark = layout.sparkSession
    // guard FIRST (the splitWriterManifest discipline): null/non-long
    // shard, bin, or token counts in a caller-supplied layout must fail
    // by name, not as a two-phase-pass getLong NPE
    val bins = layout.filter(!col("oversize"))
      .select(
        guardedLong("shard", "globalWriterManifest", "numeric shard").as("shard"),
        guardedLong("bin", "globalWriterManifest", "numeric bin").as("bin"),
        guardedLong("n_tokens", "globalWriterManifest", "numeric token count")
          .as("n_tokens"))
      .groupBy(col("shard"), col("bin"))
      .agg(sum(col("n_tokens")).as("fill"), count(lit(1)).as("n_docs"))
    val sorted = CacheScope.persisted(
      bins
        .repartitionByRange(numPartitions, col("shard"), col("bin"))
        .sortWithinPartitions(col("shard"), col("bin")),
      StorageLevel.MEMORY_AND_DISK)
    // pass 1: per-partition (sequence count, fill sum) — 2P longs
    val parts = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var c = 0L
        var f = 0L
        it.foreach { r => c += 1; f += r.getLong(2) }
        Iterator((pid, c, f))
      }
      .collect()
      .sortBy(_._1)
    val cntOff = parts.map(_._2).scanLeft(0L)(_ + _)
    val fillOff = parts.map(_._3).scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast((cntOff, fillOff))
    // pass 2: running index + running fill → (seq_id, file)
    val out = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var c = bc.value._1(pid)
      var f = bc.value._2(pid)
      it.map { r =>
        val fill = r.getLong(2)
        val row = Row(r.getLong(0), r.getLong(1), fill, r.getLong(3),
          c, f / fileBudget)
        c += 1
        f += fill
        row
      }
    }
    val seqFrame = spark.createDataFrame(
      out,
      StructType(Seq(
        StructField("shard", LongType, nullable = false),
        StructField("bin", LongType, nullable = false),
        StructField("fill", LongType, nullable = false),
        StructField("n_docs", LongType, nullable = false),
        StructField("seq_id", LongType, nullable = false),
        StructField("file", LongType, nullable = false))))
    epochManifest(seqFrame, "seq_id", epochs)
  }

  /** The GLOBAL WRITER MANIFEST over a SPLIT-SPAN layout —
    * [[globalWriterManifest]]'s twin for [[materializeSequences]] /
    * [[materializeSequencesWithMask]] exports (the q151 packing, where
    * docs split across fixed `seqLen` bins and the bin IS the
    * sequence): one row per (epoch, sequence) carrying the contiguous
    * `seq_id` in bin order, the deterministic `file` assignment
    * (~`fileBudget` tokens per file along the sequence order — the
    * writer rule, running fill BEFORE the sequence integer-divided by
    * the budget), and the per-epoch `(file, pos)` permutation. Same
    * conservation laws as the best-fit manifest, spec-pinned: every
    * sequence in exactly one file, exactly once per epoch, seq_id a
    * bijection onto 0..N−1.
    *
    * `sequences` is the materialized export itself ((bin, n_tokens,
    * n_docs, …) — the manifest is a pure function of the artifact the
    * writer emits; extra columns such as the token arrays are pruned
    * here, not recomputed).
    *
    * Scale shape: seq_id and file come from ONE two-phase prefix pass
    * over the range-partitioned bin order (the [[globalWriterManifest]]
    * discipline — two running accumulators, P pairs of longs to the
    * driver); the epoch permutation windows partition by FILE, the
    * loader's parallel read unit here (a split layout fills every bin
    * except the last to exactly seqLen, so a file holds ~fileBudget /
    * seqLen sequences — budget-bounded by construction, the
    * [[epochOrder]] shard contract). Nothing corpus-sized in one task.
    *
    * @return (bin, fill, n_docs, seq_id, file, epoch, pos) — pos is
    *         0-based within (epoch, file)
    */
  def splitWriterManifest(
      sequences: DataFrame,
      fileBudget: Long,
      epochs: Int,
      numPartitions: Int = 32): DataFrame = {
    require(fileBudget > 0, s"fileBudget must be positive, got $fileBudget")
    val spark = sequences.sparkSession
    // guard FIRST (the curriculumOrder discipline): the two-phase
    // passes getLong these caller-supplied columns — a null or
    // non-castable value must fail with a splitWriterManifest-named
    // error, never an anonymous task NPE
    val bins = sequences.select(
      guardedLong("bin", "splitWriterManifest", "numeric bin").as("bin"),
      guardedLong("n_tokens", "splitWriterManifest", "numeric token count")
        .as("fill"),
      guardedLong("n_docs", "splitWriterManifest", "numeric doc count")
        .as("n_docs"))
    val sorted = CacheScope.persisted(
      bins
        .repartitionByRange(numPartitions, col("bin"))
        .sortWithinPartitions(col("bin")),
      StorageLevel.MEMORY_AND_DISK)
    // pass 1: per-partition (sequence count, fill sum) — 2P longs
    val parts = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var c = 0L
        var f = 0L
        it.foreach { r => c += 1; f += r.getLong(1) }
        Iterator((pid, c, f))
      }
      .collect()
      .sortBy(_._1)
    val cntOff = parts.map(_._2).scanLeft(0L)(_ + _)
    val fillOff = parts.map(_._3).scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast((cntOff, fillOff))
    // pass 2: running index + running fill → (seq_id, file)
    val out = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var c = bc.value._1(pid)
      var f = bc.value._2(pid)
      it.map { r =>
        val fill = r.getLong(1)
        val row = Row(r.getLong(0), fill, r.getLong(2), c, f / fileBudget)
        c += 1
        f += fill
        row
      }
    }
    val seqFrame = spark.createDataFrame(
      out,
      StructType(Seq(
        StructField("bin", LongType, nullable = false),
        StructField("fill", LongType, nullable = false),
        StructField("n_docs", LongType, nullable = false),
        StructField("seq_id", LongType, nullable = false),
        StructField("file", LongType, nullable = false))))
    // the epoch permutation's window unit is the FILE (epochOrder
    // partitions by "shard"; the split layout's shard IS the output
    // file — the unit a loader reads in parallel)
    epochManifest(seqFrame.withColumnRenamed("file", "shard"), "seq_id", epochs)
      .withColumnRenamed("shard", "file")
      .select(col("bin"), col("fill"), col("n_docs"), col("seq_id"),
        col("file"), col("epoch"), col("pos"))
  }

  /** The MANIFEST INTEGRITY CHECK — fsck for a [[splitWriterManifest]]
    * against its materialized export: a manifest that drifted from the
    * artifact it describes (a re-run with different inputs, a partial
    * overwrite, a hand edit) makes a loader silently read the wrong
    * sequences, so the check re-derives the EXPECTED layout from the
    * export (the manifest is a pure function of it — the exact rule,
    * not a heuristic) and reports violations as K7-style counter rows:
    *
    *   - `sequences_export` / `manifest_rows` / `epochs_seen` — the
    *     sizes (manifest_rows must equal sequences · epochs);
    *   - `epoch_gaps` — epochs in 0..max(epoch) absent entirely (a
    *     lost interior epoch fires here by name; a lost TAIL epoch is
    *     only visible through the size relation above);
    *   - `duplicate_manifest_keys` — extra rows per (epoch, seq_id)
    *     beyond the first (exactly-once-per-epoch law);
    *   - `missing_sequences` — Σ over seen epochs of export sequences
    *     absent from that epoch (coverage law);
    *   - `layout_mismatches` — manifest rows whose (bin, fill, n_docs,
    *     file) disagree with the re-derived layout at their seq_id, or
    *     whose seq_id does not exist in it (bijection + file rule);
    *   - `pos_violations` — (epoch, file) groups whose pos set is not
    *     dense 0..n−1 (resume-cursor addressability);
    *   - `pos_mismatches` — rows whose pos differs from the exact
    *     re-derived `md5("epoch:<e>:<seq_id>")` rank (a DENSE but
    *     drifted permutation, or a relabeled epoch, would pass every
    *     other counter while a loader consumed an order the generator
    *     never emitted).
    *
    * All-zero violation rows == the manifest is exactly the one
    * [[splitWriterManifest]] would emit FOR THE EPOCHS IT CONTAINS
    * (the size rows expose a missing epoch: manifest_rows must equal
    * sequences · epochs). Spec-pinned both ways: a clean manifest
    * passes, and each corruption class fires its own named counter.
    *
    * Scale shape: the expected layout is one [[splitWriterManifest]]
    * pass (epochs = 1 — the per-epoch permutation is irrelevant to the
    * layout); everything else is hash aggs and one seq_id-keyed join.
    * Both frames are lineage-cut (each fans out across the checks).
    *
    * @return (check, n) — sizes first, then violation counters
    */
  def checkSplitManifest(
      manifest: DataFrame,
      sequences: DataFrame,
      fileBudget: Long): DataFrame = {
    val (m, expected) = splitCheckInputs(manifest, sequences, fileBudget)
    manifestCheckCore(m, expected, SplitLayoutCols, Seq("epoch", "file"))
  }

  /** The REMEDIATION half of [[checkSplitManifest]] — the fsck made
    * actionable: instead of seven counters, ONE ROW PER VIOLATION,
    * labeled by class, carrying the offending manifest row and — where
    * the generator's re-derivation defines one — the corrected values
    * (`e_*` layout columns and/or `e_pos`):
    *
    *   - `duplicate_key`: every (epoch, seq_id) row beyond the first
    *     (first = smallest by (pos, layout) with nulls first — the
    *     deterministic keep rule); correction = delete (e_* null);
    *   - `missing`: a sequence absent from a seen epoch — the row is
    *     the COMPLETE generator-derived correction (e_* + e_pos), a
    *     loader can union it in;
    *   - `layout_mismatch`: a row whose (layout) cells disagree with
    *     the re-derived layout at its seq_id (or whose seq_id is
    *     foreign — e_* then null: no correction exists); correction =
    *     the e_* cells;
    *   - `pos_violation`: one row per (epoch, unit) GROUP whose pos
    *     set is not dense 0..n−1 (the group identity rides epoch +
    *     the unit column; row-level repairs come from pos_mismatch);
    *   - `pos_mismatch`: a row whose pos differs from the exact
    *     re-derived permutation; correction = e_pos;
    *   - `epoch_gap`: one row per absent epoch in 0..max(epoch).
    *
    * LAW (by construction — [[checkSplitManifest]]'s violation
    * counters ARE this frame's per-label counts): check(c) ==
    * count(violation rows labeled c) for every violation class; a
    * clean manifest yields an EMPTY frame. Spec-pinned per corruption
    * class, oracle-gated end to end (q181).
    *
    * Scale shape: the same cut inputs as the check; each label branch
    * is hash aggs / one seq_id-keyed join / budget-bounded windows.
    * Output is violation-count-sized.
    *
    * @return (violation, epoch, seq_id, bin, fill, n_docs, file, pos,
    *         e_bin, e_fill, e_n_docs, e_file, e_pos)
    */
  def quarantineSplitManifest(
      manifest: DataFrame,
      sequences: DataFrame,
      fileBudget: Long): DataFrame = {
    val (m, expected) = splitCheckInputs(manifest, sequences, fileBudget)
    manifestQuarantineCore(m, expected, SplitLayoutCols, Seq("epoch", "file"))
  }

  private val SplitLayoutCols = Seq("bin", "fill", "n_docs", "file")
  private val BestFitLayoutCols = Seq("shard", "bin", "fill", "n_docs", "file")

  /** The deterministic duplicate KEEP RULE — smallest by (pos, then
    * the identity cells) with NULLS FIRST, within (epoch, key) — in
    * ONE definition: each quarantine uses it to label rows past rank 1
    * and its repair re-applies it to drop them, and the idempotence
    * law quarantine(repair(m)).isEmpty silently breaks if the two ever
    * order differently (the r19 Guards three-copy drift class).
    */
  private def dupKeepWindow(keyCol: String, orderCols: Seq[String]) = {
    import org.apache.spark.sql.expressions.Window
    Window.partitionBy(col("epoch"), col(keyCol))
      .orderBy((col("pos") +: orderCols.map(col)).map(_.asc_nulls_first): _*)
  }

  /** The exact per-epoch permutation key `md5("epoch:<e>:<id>")` — ONE
    * definition for [[epochOrder]] (the generator), the quarantine's
    * re-derivation, and the repair's gap refill: a format drift in any
    * one of them would make the fsck reject (or the repair emit) an
    * order the generator never produced.
    */
  private def epochPermKey(epochCol: Column, idCol: Column): Column =
    md5(concat(lit("epoch:"), epochCol.cast("string"),
      lit(":"), idCol.cast("string")))

  private def splitCheckInputs(
      manifest: DataFrame,
      sequences: DataFrame,
      fileBudget: Long): (DataFrame, DataFrame) = {
    val m = CacheScope.cut(manifest.select(
      (SplitLayoutCols ++ Seq("seq_id", "epoch", "pos"))
        .map(c => col(c).cast("long").as(c)): _*))
    val expected = CacheScope.cut(
      splitWriterManifest(sequences, fileBudget, epochs = 1)
        .select(col("seq_id") +: SplitLayoutCols.map(c => col(c).as(s"e_$c")): _*))
    (m, expected)
  }

  private def bestFitCheckInputs(
      manifest: DataFrame,
      layout: DataFrame,
      fileBudget: Long): (DataFrame, DataFrame) = {
    val m = CacheScope.cut(manifest.select(
      (BestFitLayoutCols ++ Seq("seq_id", "epoch", "pos"))
        .map(c => col(c).cast("long").as(c)): _*))
    val expected = CacheScope.cut(
      globalWriterManifest(layout, fileBudget, epochs = 1)
        .select(col("seq_id") +: BestFitLayoutCols.map(c => col(c).as(s"e_$c")): _*))
    (m, expected)
  }

  /** [[checkSplitManifest]]'s twin for a [[globalWriterManifest]]
    * (best-fit) manifest: same five violation counters, with the
    * layout identity (shard, bin, fill, n_docs, file) re-derived from
    * the [[packBestFit]] layout and pos checked dense within
    * (epoch, SHARD) — that manifest's permutation unit.
    *
    * @return (check, n) — [[checkSplitManifest]]'s rows
    */
  def checkBestFitManifest(
      manifest: DataFrame,
      layout: DataFrame,
      fileBudget: Long): DataFrame = {
    val (m, expected) = bestFitCheckInputs(manifest, layout, fileBudget)
    manifestCheckCore(m, expected, BestFitLayoutCols, Seq("epoch", "shard"))
  }

  /** [[quarantineSplitManifest]]'s twin for a [[globalWriterManifest]]
    * (best-fit) manifest: same labels, laws, and corrections, with the
    * (shard, bin) layout identity and pos_violation groups per
    * (epoch, SHARD) — that manifest's permutation unit.
    *
    * @return (violation, epoch, seq_id, shard, bin, fill, n_docs,
    *         file, pos, e_shard, e_bin, e_fill, e_n_docs, e_file,
    *         e_pos)
    */
  def quarantineBestFitManifest(
      manifest: DataFrame,
      layout: DataFrame,
      fileBudget: Long): DataFrame = {
    val (m, expected) = bestFitCheckInputs(manifest, layout, fileBudget)
    manifestQuarantineCore(m, expected, BestFitLayoutCols, Seq("epoch", "shard"))
  }

  /** MANIFEST REPAIR — the detect→label→CORRECT loop closed: apply a
    * [[quarantineSplitManifest]] frame's own `e_*`/`e_pos` corrections
    * back onto the manifest it quarantined and emit the manifest a
    * loader can actually proceed with. Per violation class:
    *
    *   - `duplicate_key`: rows past rank 1 DROP — repair re-applies
    *     the quarantine's deterministic keep rule (smallest by
    *     (pos, layout), nulls first) rather than anti-joining the
    *     quarantined rows, because exact copies have no row identity
    *     an anti-join could distinguish (it would delete the kept copy
    *     too);
    *   - `layout_mismatch` with a correction: the `e_*` layout cells
    *     OVERWRITE the row's; with e_* null (a FOREIGN seq_id — no
    *     correction exists) the row DROPS, it describes a sequence the
    *     export never produced;
    *   - `pos_mismatch`: `e_pos` overwrites the row's pos;
    *   - `missing`: the quarantine row IS the complete generator-
    *     derived correction — unioned in verbatim;
    *   - `epoch_gap`: the absent epoch is regenerated whole — the
    *     layout cells are epoch-independent (post-repair every seen
    *     epoch carries the generator's cells, so one distinct over the
    *     repaired rows recovers the canonical (seq_id, layout) frame)
    *     and the per-epoch permutation is the [[epochOrder]] rule
    *     re-derived verbatim;
    *   - `pos_violation` rows are group-level labels and carry no
    *     row-level correction — density is restored by the classes
    *     above (post-repair, pos == the re-derived permutation, which
    *     is dense by construction).
    *
    * LAWS (spec-pinned for both layouts): `repair(clean) == clean`;
    * `quarantine(repair(m), …)` is EMPTY (idempotence); and
    * extensionally `repair(m) == ` the generator's own manifest for
    * exactly the epochs m names (seen ∪ gap-filled 0..max(epoch)) —
    * the oracle re-derives that frame independently (q186/q187). A
    * manifest naming an epoch the run never intended (a relabel past
    * the true count, or a negative label) is completed AS NAMED: the
    * check/quarantine/repair family treats every seen epoch label as
    * intended — the size relation `manifest_rows == sequences · epochs`
    * remains the caller's intended-epoch-count signal. A NULL key cell
    * (epoch or seq_id) names no identity at all: the row drops exactly
    * like a foreign one, and the phantom "epoch null" complement the
    * quarantine loudly reports as missing is ignored — the generator
    * names no null epoch (spec-pinned for both null keys).
    *
    * Scale shape: repair touches ONLY the manifest and the
    * quarantine frame — the generator re-derivation is already
    * embedded in the quarantine's correction columns, so no rescan of
    * the corpus-sized export/layout happens here (the 3 a.m. property:
    * label once, splice cheaply). One (epoch, seq_id)-keyed dedup
    * window (group = the duplicate copies of one key), one keyed
    * correction join, and the gap refill's (epoch, unit) windows are
    * fileBudget/shardBudget-bounded — nothing corpus-sized in a task.
    *
    * @param manifest   the manifest under repair (the quarantine's own
    *                   input)
    * @param quarantine [[quarantineSplitManifest]]'s frame FOR THAT
    *                   MANIFEST — pairing a foreign quarantine applies
    *                   foreign corrections (garbage in, garbage out;
    *                   the idempotence law only binds the matched pair)
    * @return (bin, fill, n_docs, seq_id, file, epoch, pos) — the
    *         corrected manifest in [[splitWriterManifest]]'s schema
    */
  def repairSplitManifest(manifest: DataFrame, quarantine: DataFrame): DataFrame =
    manifestRepairCore(manifest, quarantine, SplitLayoutCols, "file")

  /** [[repairSplitManifest]]'s twin for a [[globalWriterManifest]]
    * (best-fit) manifest: same classes and laws, with the (shard, bin)
    * layout identity and the gap refill's permutation windows per
    * (epoch, SHARD) — that manifest's permutation unit.
    *
    * @return (shard, bin, fill, n_docs, seq_id, file, epoch, pos)
    */
  def repairBestFitManifest(manifest: DataFrame, quarantine: DataFrame): DataFrame =
    manifestRepairCore(manifest, quarantine, BestFitLayoutCols, "shard")

  /** The shared check engine: `m` normalized to long columns with
    * (seq_id, epoch, pos) + `layoutCols`; `expected` one row per
    * sequence as (seq_id, e_*). `posKey` is (epoch, unit) — the
    * manifest's permutation unit: pos must be dense 0..n−1 within it
    * AND equal the re-derived `md5("epoch:<e>:<seq_id>")` rank
    * (pos_mismatches — without the exact re-derivation a dense
    * permutation DRIFT, or a relabeled epoch, would read clean while a
    * loader consumed an order the generator never emitted). All
    * comparisons null-safe: a nulled-out manifest cell is a mismatch,
    * never a silently-dropped filter row.
    */
  private def manifestCheckCore(
      m: DataFrame,
      expected: DataFrame,
      layoutCols: Seq[String],
      posKey: Seq[String]): DataFrame = {
    def counter(name: String, df: DataFrame) =
      df.agg(count(lit(1)).cast("long").as("n"))
        .select(lit(name).as("check"), col("n"))
    // the violation counters ARE the quarantine frame's per-label
    // counts — ONE definition, so the check and the remediation cannot
    // drift (the counters == groupBy(violation).count law holds by
    // construction); the static label map zero-fills absent classes so
    // a clean manifest still reports every counter's 0 row
    val spark = m.sparkSession
    import spark.implicits._
    val labels = Seq(
      ("epoch_gaps", "epoch_gap"),
      ("duplicate_manifest_keys", "duplicate_key"),
      ("missing_sequences", "missing"),
      ("layout_mismatches", "layout_mismatch"),
      ("pos_violations", "pos_violation"),
      ("pos_mismatches", "pos_mismatch")).toDF("check", "violation")
    val counts = manifestQuarantineCore(m, expected, layoutCols, posKey)
      .groupBy(col("violation")).agg(count(lit(1)).as("__n"))
    counter("sequences_export", expected)
      .unionByName(counter("manifest_rows", m))
      .unionByName(m.agg(countDistinct(col("epoch")).cast("long").as("n"))
        .select(lit("epochs_seen").as("check"), col("n")))
      .unionByName(labels.join(broadcast(counts), Seq("violation"), "left")
        .select(col("check"), coalesce(col("__n"), lit(0L)).cast("long").as("n")))
  }

  /** The shared quarantine engine under [[quarantineSplitManifest]] /
    * [[quarantineBestFitManifest]] (and, through its per-label counts,
    * [[manifestCheckCore]]): `m` normalized long columns with (seq_id,
    * epoch, pos) + `layoutCols`; `expected` one generator-derived row
    * per sequence as (seq_id, e_*). `posKey` = (epoch, unit). All
    * comparisons null-safe: a nulled-out manifest cell is a violation
    * row, never a silently-dropped filter row. The exact expected
    * permutation re-derives per SEEN epoch (the [[epochOrder]] rule
    * verbatim) — foreign epochs re-derive too, so a relabeled epoch's
    * pos values mismatch its own label's permutation; its window
    * partitions by the budget-bounded (epoch, unit), never
    * corpus-sized. A NULL epoch key reads as a seen epoch label: the
    * seen-epoch frame demands its full complement, so a nulled epoch
    * cell surfaces LOUDLY (one `missing` row per sequence against
    * "epoch null") — [[repairSplitManifest]] drops the row and ignores
    * that phantom block.
    */
  private def manifestQuarantineCore(
      m: DataFrame,
      expected: DataFrame,
      layoutCols: Seq[String],
      posKey: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val unit = posKey.last
    // null-safe inequality: a null layout cell must COUNT as a
    // mismatch — plain =!= yields NULL there and filter() would drop
    // the exact corrupt row the quarantine exists for
    val mismatch = layoutCols
      .map(c => !(col(c) <=> col(s"e_$c")))
      .reduce(_ || _)
    val epochsSeen = m.select(col("epoch")).distinct()
    val expPos = expected
      .crossJoin(broadcast(epochsSeen))
      .withColumn("e_pos",
        (row_number().over(
          Window.partitionBy(col("epoch"), col(s"e_$unit"))
            .orderBy(
              epochPermKey(col("epoch"), col("seq_id")),
              col("seq_id"))) - 1).cast("long"))
      .select(col("epoch"), col("seq_id"), col("e_pos"))
    val mCols = (Seq("epoch", "seq_id") ++ layoutCols) :+ "pos"
    val eCols = layoutCols.map(c => s"e_$c") :+ "e_pos"
    val nullL = lit(null).cast("long")
    def shape(label: String, df: DataFrame, have: Set[String]) =
      df.select(lit(label).as("violation") +:
        (mCols ++ eCols).map(c => (if (have(c)) col(c) else nullL).as(c)): _*)
    // duplicate_key: rows ranked past 1 within (epoch, seq_id); the
    // kept row is the smallest by (pos, layout) with NULLS FIRST
    // (Spark's asc default — the oracle must say NULLS FIRST
    // explicitly), so the verdict is deterministic even when the
    // copies disagree. Exact copies are interchangeable by identity.
    val duplicates = m
      .withColumn("__rn", row_number().over(dupKeepWindow("seq_id", layoutCols)))
      .filter(col("__rn") > 1)
    // missing: expected (epoch, seq_id) pairs with no manifest row —
    // the join back to `expected` completes the generator-derived
    // correction (e_* + e_pos): a loader can union these rows in
    val missing = expPos
      .join(m.select(col("epoch"), col("seq_id")),
        Seq("epoch", "seq_id"), "left_anti")
      .join(expected, Seq("seq_id"))
    val layoutMm = m.join(expected, Seq("seq_id"), "left").filter(mismatch)
    // pos_violation: one row per broken (epoch, unit) GROUP — the
    // counter counts groups, so the frame emits groups (the law); the
    // row-level corrections live in pos_mismatch
    val posViol = m.groupBy(posKey.map(col): _*)
      .agg(count(lit(1)).as("__c"), max(col("pos")).as("__mx"),
        countDistinct(col("pos")).as("__d"))
      .filter(col("__mx") =!= col("__c") - 1L || col("__d") =!= col("__c"))
    val posMm = m.join(expPos, Seq("epoch", "seq_id"), "inner")
      .filter(!(col("pos") <=> col("e_pos")))
    // epoch_gap: absent epochs in 0..max(epoch) — an empty manifest
    // emits nothing (sequence over a null max explodes to zero rows);
    // a lost TAIL epoch is invisible here by design (the check cannot
    // know the intended epoch count) and shows only through the
    // manifest_rows == sequences · epochs size relation
    // the when() guard covers BOTH the empty manifest (null max — when
    // yields null, explode emits nothing) and an all-negative corrupt
    // epoch domain: Spark's sequence(0, mx) COUNTS DOWN when mx < 0
    // (the sequenceBoundaries pitfall), which would emit spurious
    // descending "gap" epochs the generator never defined
    val gaps = m.agg(max(col("epoch")).as("__mx"))
      .select(explode(when(col("__mx") >= 0L, sequence(lit(0L), col("__mx"))))
        .as("epoch"))
      .join(epochsSeen, Seq("epoch"), "left_anti")
    shape("duplicate_key", duplicates, mCols.toSet)
      .unionByName(shape("missing", missing, Set("epoch", "seq_id") ++ eCols))
      .unionByName(shape("layout_mismatch", layoutMm,
        mCols.toSet ++ layoutCols.map(c => s"e_$c")))
      .unionByName(shape("pos_violation", posViol, Set("epoch", unit)))
      .unionByName(shape("pos_mismatch", posMm, mCols.toSet + "e_pos"))
      .unionByName(shape("epoch_gap", gaps, Set("epoch")))
  }

  /** The shared repair engine under [[repairSplitManifest]] /
    * [[repairBestFitManifest]]: the manifest normalized to long columns
    * (the check-input rule), the quarantine's corrections folded back
    * per (epoch, seq_id), the missing rows unioned, the gap epochs
    * regenerated from the repaired rows' own (epoch-independent) layout
    * cells plus the exact [[epochOrder]] permutation. `unit` is the
    * manifest's permutation unit (file / shard — a layout column, so
    * the gap refill needs no side input).
    */
  private def manifestRepairCore(
      manifest: DataFrame,
      quarantine: DataFrame,
      layoutCols: Seq[String],
      unit: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = manifest.select(
      (layoutCols ++ Seq("seq_id", "epoch", "pos"))
        .map(c => col(c).cast("long").as(c)): _*)
      // a null KEY cell names no generator identity — a null epoch
      // labels no epoch, a null seq_id no sequence — so the row DROPS
      // (the foreign rule extended to null keys; the correction join
      // below is null-unsafe and could never repair it anyway, and an
      // unfiltered null-seq_id row would ride through as a phantom
      // output row — the r20 self-review finding)
      .filter(col("epoch").isNotNull && col("seq_id").isNotNull)
    // LINEAGE-CUT: the quarantine fans out three ways (corrections,
    // missing union, gap epochs) and its upstream embeds the whole
    // generator re-derivation
    val q = graft.ops.CacheScope.cut(quarantine)
    // 1. duplicates: the quarantine's keep rule re-applied (see the
    //    public scaladoc for why not an anti-join)
    val deduped = m
      .withColumn("__rn", row_number().over(dupKeepWindow("seq_id", layoutCols)))
      .filter(col("__rn") === 1)
      .drop("__rn")
    // 2. corrections per (epoch, seq_id): max() folds the duplicate
    //    copies' correction rows — every non-null e_* for one key is
    //    the SAME generator value, so max is a deterministic pick (a
    //    layout_mismatch row carries e_layout with e_pos null; a
    //    pos_mismatch row the reverse; both may exist for one key)
    val eFirst = s"e_${layoutCols.head}"
    val corr = q
      .filter(col("violation").isin("layout_mismatch", "pos_mismatch"))
      .groupBy(col("epoch"), col("seq_id"))
      .agg(
        max(when(col("violation") === "layout_mismatch", 1L)).as("__lm"),
        (layoutCols.map(c => max(col(s"e_$c")).as(s"e_$c")) :+
          max(col("e_pos")).as("e_pos")): _*)
    // a layout_mismatch whose correction is null is a FOREIGN seq_id —
    // the export has no such sequence; the row drops. (e_* cells are
    // all-or-nothing from the expected join, so the first suffices.)
    val foreign = coalesce(col("__lm"), lit(0L)) === 1L && col(eFirst).isNull
    val kept = deduped
      .join(corr, Seq("epoch", "seq_id"), "left")
      .filter(!foreign)
      .select((Seq(col("epoch"), col("seq_id")) ++
        layoutCols.map(c => coalesce(col(s"e_$c"), col(c)).as(c)) :+
        coalesce(col("e_pos"), col("pos")).as("pos")): _*)
    // 3. missing rows ARE their own complete corrections. The epoch
    //    filter discards the PHANTOM complement a null-epoch manifest
    //    row provokes: the quarantine's seen-epoch frame treats the
    //    null as a seen label and reports every sequence missing from
    //    "epoch null" (loud, by design); the generator names no null
    //    epoch, so repair ignores that block along with the row itself
    val missing = q.filter(col("violation") === "missing" &&
        col("epoch").isNotNull)
      .select((Seq(col("epoch"), col("seq_id")) ++
        layoutCols.map(c => col(s"e_$c").as(c)) :+
        col("e_pos").as("pos")): _*)
    // CUT: the repaired seen-epoch rows feed the canonical-layout
    // distinct AND the output union
    val seen = graft.ops.CacheScope.cut(kept.unionByName(missing))
    // 4. gap epochs regenerate whole: post-steps-1..3 every seen epoch
    //    carries exactly the generator's (seq_id, layout) cells, which
    //    are epoch-independent — one distinct recovers the canonical
    //    frame; pos is the epochOrder rule verbatim, windowed by the
    //    budget-bounded (epoch, unit)
    val gapEpochs = q.filter(col("violation") === "epoch_gap")
      .select(col("epoch"))
    val canonical = seen
      .select(col("seq_id") +: layoutCols.map(col): _*)
      .distinct()
    val gapW = Window.partitionBy(col("epoch"), col(unit))
      .orderBy(epochPermKey(col("epoch"), col("seq_id")), col("seq_id"))
    val gapRows = canonical
      .crossJoin(broadcast(gapEpochs))
      .withColumn("pos", (row_number().over(gapW) - 1).cast("long"))
    // the generator's own column order: layout cells (file last, after
    // seq_id), then the epoch-schedule pair
    val outCols = (layoutCols.dropRight(1) ++
      Seq("seq_id", "file", "epoch", "pos")).map(col)
    seen.unionByName(gapRows.select(seen.columns.toIndexedSeq.map(col): _*))
      .select(outCols: _*)
  }

  /** CURRICULUM SCHEDULE — the annealed ("baby steps") data order: docs
    * rank globally by (difficulty, id), split into `buckets` contiguous
    * difficulty bands, and epoch e of E admits the PREFIX of bands
    * `bucket < ceil((e+1)·buckets/E)` — early epochs train on the
    * easiest bands, the final epoch admits everything (admission is
    * prefix-monotone across epochs and total at the end; laws,
    * spec-pinned). Within an epoch, admitted docs consume in
    * lexicographic (bucket, pos) order where pos is a fresh
    * deterministic per-epoch permutation INSIDE each bucket
    * (md5("curr:<e>:<id>") — [[epochOrder]]'s reproducibility
    * contract, so the curriculum anneals difficulty bands while still
    * shuffling within a band).
    *
    * Scale shape: the global difficulty rank is a range-sort +
    * zipWithIndex (per-partition offset ranges — the K1 insert-id
    * pattern; NO single-task window), the band cut is scalar
    * arithmetic on the rank, and each epoch's in-band positions come
    * from a range-sort on (bucket, md5-key, id) plus the
    * [[globalWriterManifest]] two-phase per-partition offset pass with
    * one running counter PER BAND (bands are contiguous inside a
    * sorted partition, so pass 1 ships ≤ partitions + buckets triples
    * to the driver). ZERO windows anywhere — a `Window.partitionBy
    * (bucket)` would put corpus/buckets rows in ONE sort task (~10 TB
    * per band at the 100 TB target with the default 10 bands; and
    * buckets = 1 — a degenerate but legal call — would be a full-corpus
    * single-task sort). With the range-sort both hazards vanish: a
    * band spreads over as many partitions as its row count needs,
    * whatever `buckets` is. Each epoch's two passes share ONE sorted
    * RDD object — its range boundaries are baked into its shuffle
    * dependency at construction, so pass 2 re-reads pass 1's exact
    * partitioning WITHOUT a per-epoch persist (which would hold
    * ~epochs·corpus/2 rows until release — the r18 advisory).
    * `epochs ≤ 64` (unrolled union).
    *
    * @return (epoch, bucket, idCol, difficultyCol, pos) — pos is
    *         0-based within (epoch, bucket) in md5("curr:<e>:<id>")
    *         order
    */
  def curriculumOrder(
      docs: DataFrame,
      idCol: String,
      difficultyCol: String,
      epochs: Int,
      buckets: Int = 10): DataFrame = {
    require(epochs >= 1 && epochs <= 64,
      s"epochs must be in [1, 64] (unrolled union plan), got $epochs")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val spark = docs.sparkSession
    // guard FIRST (the codegen null-short-circuit law): a null or
    // non-castable id/difficulty would otherwise reach the zipWithIndex
    // mapper's getLong as an unnamed NullPointerException in a task
    val sorted = docs
      .select(guardedLong(idCol, "curriculumOrder", "numeric id").as(idCol),
        guardedLong(difficultyCol, "curriculumOrder", "numeric difficulty")
          .as(difficultyCol))
      .orderBy(col(difficultyCol), col(idCol))
    val idxSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField(difficultyCol, LongType, nullable = false),
      StructField("__rank", LongType, nullable = false)))
    // persist the sorted RDD BEFORE zipWithIndex: zipWithIndex launches
    // an eager per-partition count job, and without the cache the
    // corpus-wide sort would run twice (once for that job, once when
    // the ranked frame materializes). Plain persist, not checkpoint —
    // recompute-on-eviction stays possible.
    val srdd = CacheScope.registerRdd(
      sorted.rdd.persist(StorageLevel.MEMORY_AND_DISK))
    val ranked = CacheScope.persisted(
      spark.createDataFrame(
        srdd.zipWithIndex.map { case (r, i) =>
          Row(r.getLong(0), r.getLong(1), i)
        },
        idxSchema),
      StorageLevel.MEMORY_AND_DISK)
    val total = ranked.agg(count(lit(1)).as("__n"))
    val banded = ranked.crossJoin(broadcast(total))
      .withColumn("bucket", expr(s"__rank * ${buckets}L div __n"))
      .select(col(idCol), col(difficultyCol), col("bucket"))
    val outSchema = StructType(Seq(
      StructField("epoch", LongType, nullable = false),
      StructField("bucket", LongType, nullable = false),
      StructField(idCol, LongType, nullable = false),
      StructField(difficultyCol, LongType, nullable = false),
      StructField("pos", LongType, nullable = false)))
    (0 until epochs).map { e =>
      // ceil((e+1)·B/E) admitted bands; final epoch == all (law)
      val cut = ((e.toLong + 1L) * buckets + epochs - 1) / epochs
      val ek = md5(concat(lit(s"curr:$e:"), col(idCol).cast("string")))
      // range-sort on (bucket, permutation key, id): the total order
      // whose per-band dense index IS pos. A band's rows spread across
      // however many range partitions they need — nothing band-sized
      // ever sits in one task.
      val admitted = banded
        .filter(col("bucket") < cut)
        .select(col("bucket"), ek.as("__ek"), col(idCol), col(difficultyCol))
        .orderBy(col("bucket"), col("__ek"), col(idCol))
      // ONE RDD object shared by both passes, deliberately UNPERSISTED:
      // the range boundaries are sampled once when this RDD is built
      // (they are baked into its shuffle dependency — re-executing the
      // RDD re-reads the SAME map outputs with the SAME partitioner and
      // re-sorts a total order, so pass 2 sees bit-identical partitions
      // without any cache), and persisting here would hold one
      // epoch-sized sorted frame PER EPOCH until releaseAll — an
      // aggregate footprint of ~epochs·corpus/2 rows. The price is one
      // re-read+re-sort of the epoch's shuffle output when the caller
      // executes (the map stage itself is skipped — shuffle files
      // outlive the job); the upstream band frame stays served by the
      // `ranked` cache.
      val ardd = admitted.rdd
      // pass 1: per-(partition, band) row counts. Bands are contiguous
      // within a sorted partition, so this is ≤ P + buckets triples —
      // driver-sized at any corpus scale (the globalWriterManifest
      // collect shape: a few longs per partition).
      val parts = ardd.mapPartitionsWithIndex { (pid, it) =>
        val counts = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
        it.foreach { r =>
          val b = r.getLong(0)
          counts.update(b, counts.getOrElse(b, 0L) + 1L)
        }
        counts.iterator.map { case (b, c) => (pid, b, c) }.toList.iterator
      }.collect()
      // driver scan in partition order → each (partition, band)'s start
      // offset within its band
      val running = scala.collection.mutable.HashMap.empty[Long, Long]
      val offsets = parts.sortBy(_._1).map { case (pid, b, c) =>
        val start = running.getOrElse(b, 0L)
        running.update(b, start + c)
        (pid, b) -> start
      }.toMap
      val bc = spark.sparkContext.broadcast(offsets)
      // pass 2: one running counter per band inside the partition,
      // seeded from the broadcast offsets — dense 0-based pos per band
      val out = ardd.mapPartitionsWithIndex { (pid, it) =>
        val cursors = scala.collection.mutable.HashMap.empty[Long, Long]
        it.map { r =>
          val b = r.getLong(0)
          val p = cursors.getOrElse(b, bc.value((pid, b)))
          cursors.update(b, p + 1L)
          Row(e.toLong, b, r.getLong(2), r.getLong(3), p)
        }
      }
      spark.createDataFrame(out, outSchema)
    }.reduce(_.unionByName(_))
  }

  /** [[resumeAfter]] across epoch boundaries: everything STRICTLY
    * AFTER the (epoch, shard, pos) cursor in the manifest's
    * lexicographic order — a cursor at an epoch's last sequence rolls
    * to the next epoch's first (consumed ∪ rest == the whole run,
    * disjoint; spec-pinned). Scan-pure, pushed to the three columns.
    */
  def resumeAfterEpoch(
      manifest: DataFrame,
      epochCursor: Long,
      shardCursor: Long,
      posCursor: Long): DataFrame =
    manifest.filter(col("epoch") > epochCursor ||
      (col("epoch") === epochCursor &&
        (col("shard") > shardCursor ||
          (col("shard") === shardCursor && col("pos") > posCursor))))

  /** [[resumeAfterEpoch]]'s CURRICULUM twin — the missing resume half
    * of [[curriculumOrder]]'s loader contract: a curriculum consumes
    * in lexicographic (epoch, bucket, pos) order (bands easiest-first
    * within an epoch, the per-epoch permutation within a band), so a
    * restart resumes with everything STRICTLY AFTER that cursor.
    * Consumed ∪ resume == the whole schedule, disjoint (spec-pinned);
    * scan-pure, pushed to the three columns.
    */
  def resumeAfterCurriculum(
      ordered: DataFrame,
      epochCursor: Long,
      bucketCursor: Long,
      posCursor: Long): DataFrame =
    ordered.filter(col("epoch") > epochCursor ||
      (col("epoch") === epochCursor &&
        (col("bucket") > bucketCursor ||
          (col("bucket") === bucketCursor && col("pos") > posCursor))))

  /** The CURRICULUM QUARANTINE — the manifest family's detect→label
    * loop ([[quarantineSplitManifest]]) applied to the third loader
    * contract, [[curriculumOrder]]'s schedule: one row per violation,
    * labeled by class, carrying the offending schedule row and the
    * generator-derived correction where one exists. The expected
    * schedule re-derives from the INPUT docs (the fsck rule: the
    * schedule is a pure function of them), and — unlike the writer
    * manifests — the epoch domain is CALLER-KNOWN (`epochs`), so there
    * is NO epoch_gap class: a wholly lost epoch (tail included, the
    * manifests' documented blind spot) surfaces as its full complement
    * of `missing` rows. Classes:
    *
    *   - `duplicate_key`: (epoch, id) rows past rank 1 (keep rule:
    *     smallest by (pos, bucket, difficulty), nulls first);
    *   - `missing`: an admitted (epoch, id) absent from the schedule —
    *     the row IS the complete correction (e_bucket, e_difficulty,
    *     e_pos);
    *   - `layout_mismatch`: bucket/difficulty cells disagreeing with
    *     the generator's (null-safe — a nulled cell counts), or a row
    *     the generator never admits (an unknown doc, an unadmitted
    *     band's doc in an early epoch, a foreign/null epoch label) —
    *     e_* then null: no correction exists, the explicit
    *     `e_bucket IS NULL` arm fires even when every manifest cell is
    *     also null;
    *   - `pos_violation`: one row per (epoch, bucket) group whose pos
    *     set is not dense 0..n−1;
    *   - `pos_mismatch`: pos differing from the exact
    *     `md5("curr:<e>:<id>")` rank; correction = e_pos.
    *
    * LAW (by construction): [[checkCurriculum]]'s violation counters
    * ARE this frame's per-label counts; a clean schedule quarantines
    * nothing. Scale shape: the expected side is one [[curriculumOrder]]
    * run (range-sorts + two-phase offsets — zero windows); every label
    * branch is a keyed join/agg; the only windows partition by
    * (epoch, id) duplicate groups or ride the expected generator.
    *
    * @return (violation, epoch, idCol, bucket, difficultyCol, pos,
    *         e_bucket, e_difficulty, e_pos)
    */
  def quarantineCurriculum(
      schedule: DataFrame,
      docs: DataFrame,
      idCol: String,
      difficultyCol: String,
      epochs: Int,
      buckets: Int = 10): DataFrame =
    quarantineCurriculumAgainst(schedule,
      curriculumOrder(docs, idCol, difficultyCol, epochs, buckets),
      idCol, difficultyCol)

  /** [[quarantineCurriculum]] against an ALREADY-DERIVED generator
    * schedule — the caller-side reuse form (r21): [[curriculumOrder]]
    * is EAGER (its global rank and per-epoch offset passes execute at
    * construction), so a caller that already holds the generator's
    * frame for the same (docs, epochs, buckets) — the fsck pattern,
    * where the schedule under test derives from the expected one —
    * passes it here instead of paying a second full generator run.
    * `expectedSchedule` MUST be [[curriculumOrder]]'s output for the
    * quarantine's own docs/parameters; the convenience form above
    * derives it and is otherwise identical (same frame by construction,
    * CorpusOpsSpec pins the quarantine's semantics either way).
    */
  def quarantineCurriculumAgainst(
      schedule: DataFrame,
      expectedSchedule: DataFrame,
      idCol: String,
      difficultyCol: String): DataFrame = {
    val m = graft.ops.CacheScope.cut(schedule.select(
      Seq("epoch", "bucket", idCol, difficultyCol, "pos")
        .map(c => col(c).cast("long").as(c)): _*))
    val expected = graft.ops.CacheScope.cut(
      expectedSchedule
        .select(col("epoch"), col(idCol),
          col("bucket").as("e_bucket"),
          col(difficultyCol).as("e_difficulty"),
          col("pos").as("e_pos")))
    val mCols = Seq("epoch", idCol, "bucket", difficultyCol, "pos")
    val eCols = Seq("e_bucket", "e_difficulty", "e_pos")
    val nullL = lit(null).cast("long")
    def shape(label: String, df: DataFrame, have: Set[String]) =
      df.select(lit(label).as("violation") +:
        (mCols ++ eCols).map(c => (if (have(c)) col(c) else nullL).as(c)): _*)
    val duplicates = m
      .withColumn("__rn",
        row_number().over(dupKeepWindow(idCol, Seq("bucket", difficultyCol))))
      .filter(col("__rn") > 1)
    val missing = expected
      .join(m.select(col("epoch"), col(idCol)), Seq("epoch", idCol), "left_anti")
    // e_bucket IS NULL fires the foreign arm even when every manifest
    // cell is also null — the all-null-cells hole the null-safe
    // compares alone would leave
    val layoutMm = m.join(expected, Seq("epoch", idCol), "left")
      .filter(col("e_bucket").isNull ||
        !(col("bucket") <=> col("e_bucket")) ||
        !(col(difficultyCol) <=> col("e_difficulty")))
      .select((mCols.map(col) :+ col("e_bucket") :+ col("e_difficulty")): _*)
    val posViol = m.groupBy(col("epoch"), col("bucket"))
      .agg(count(lit(1)).as("__c"), max(col("pos")).as("__mx"),
        countDistinct(col("pos")).as("__d"))
      .filter(col("__mx") =!= col("__c") - 1L || col("__d") =!= col("__c"))
    val posMm = m.join(expected, Seq("epoch", idCol), "inner")
      .filter(!(col("pos") <=> col("e_pos")))
    shape("duplicate_key", duplicates, mCols.toSet)
      .unionByName(shape("missing", missing, Set("epoch", idCol) ++ eCols))
      .unionByName(shape("layout_mismatch", layoutMm,
        mCols.toSet + "e_bucket" + "e_difficulty"))
      .unionByName(shape("pos_violation", posViol, Set("epoch", "bucket")))
      .unionByName(shape("pos_mismatch", posMm, mCols.toSet + "e_pos"))
  }

  /** The curriculum fsck's COUNTER face — K7-style rows whose
    * violation counters are DERIVED FROM [[quarantineCurriculum]]'s
    * frame (the r19 counters-from-quarantine law: check and
    * remediation cannot drift), plus the sizes: `schedule_rows`,
    * `rows_expected` (Σ per-epoch admitted docs — the caller-known
    * epoch domain makes the size relation exact, no manifests-style
    * tail blind spot), `epochs_expected`.
    *
    * @return (check, n)
    */
  def checkCurriculum(
      schedule: DataFrame,
      docs: DataFrame,
      idCol: String,
      difficultyCol: String,
      epochs: Int,
      buckets: Int = 10): DataFrame = {
    val spark = schedule.sparkSession
    import spark.implicits._
    def counter(name: String, df: DataFrame) =
      df.agg(count(lit(1)).cast("long").as("n"))
        .select(lit(name).as("check"), col("n"))
    val labels = Seq(
      ("duplicate_schedule_keys", "duplicate_key"),
      ("missing_rows", "missing"),
      ("layout_mismatches", "layout_mismatch"),
      ("pos_violations", "pos_violation"),
      ("pos_mismatches", "pos_mismatch")).toDF("check", "violation")
    val counts = quarantineCurriculum(schedule, docs, idCol, difficultyCol,
      epochs, buckets)
      .groupBy(col("violation")).agg(count(lit(1)).as("__n"))
    val expectedRows = curriculumOrder(docs, idCol, difficultyCol, epochs,
      buckets)
    counter("schedule_rows", schedule)
      .unionByName(counter("rows_expected", expectedRows))
      .unionByName(schedule.sparkSession.range(1)
        .select(lit("epochs_expected").as("check"),
          lit(epochs.toLong).as("n")))
      .unionByName(labels.join(broadcast(counts), Seq("violation"), "left")
        .select(col("check"), coalesce(col("__n"), lit(0L)).cast("long").as("n")))
  }

  /** CURRICULUM REPAIR — [[repairSplitManifest]]'s discipline on the
    * schedule: apply [[quarantineCurriculum]]'s own corrections and
    * emit the schedule a loader can proceed with. Duplicates re-drop
    * by the shared keep rule; bucket/difficulty/pos overwrite from the
    * e_* cells; rows with no correction (foreign docs, unadmitted
    * bands, foreign or NULL epoch labels, null ids) DROP; missing rows
    * union in verbatim — and because the epoch domain is caller-known,
    * a wholly lost epoch comes back through `missing` alone (no gap
    * refill needed, simpler than the manifest repair). LAWS
    * (spec-pinned): repair(clean) == clean;
    * quarantine(repair(s)).isEmpty; extensionally repair(s) ==
    * [[curriculumOrder]]'s own output (the oracle re-derives exactly
    * that, battery-free — q191).
    *
    * Scale shape: the manifest repair's — keyed dedup window, one
    * keyed correction join, no rescan of the docs (the quarantine's
    * correction columns already embed the generator).
    *
    * @return (epoch, bucket, idCol, difficultyCol, pos) — the
    *         generator's schema
    */
  def repairCurriculum(
      schedule: DataFrame,
      quarantine: DataFrame,
      idCol: String,
      difficultyCol: String): DataFrame = {
    val m = schedule.select(
      Seq("epoch", "bucket", idCol, difficultyCol, "pos")
        .map(c => col(c).cast("long").as(c)): _*)
      // null KEY cells name no identity — the manifest repair's rule
      .filter(col("epoch").isNotNull && col(idCol).isNotNull)
    val q = graft.ops.CacheScope.cut(quarantine)
    val deduped = m
      .withColumn("__rn",
        row_number().over(dupKeepWindow(idCol, Seq("bucket", difficultyCol))))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val corr = q
      .filter(col("violation").isin("layout_mismatch", "pos_mismatch"))
      .groupBy(col("epoch"), col(idCol))
      .agg(
        max(when(col("violation") === "layout_mismatch", 1L)).as("__lm"),
        max(col("e_bucket")).as("e_bucket"),
        max(col("e_difficulty")).as("e_difficulty"),
        max(col("e_pos")).as("e_pos"))
    val foreign = coalesce(col("__lm"), lit(0L)) === 1L && col("e_bucket").isNull
    val kept = deduped
      .join(corr, Seq("epoch", idCol), "left")
      .filter(!foreign)
      .select(col("epoch"), col(idCol),
        coalesce(col("e_bucket"), col("bucket")).as("bucket"),
        coalesce(col("e_difficulty"), col(difficultyCol)).as(difficultyCol),
        coalesce(col("e_pos"), col("pos")).as("pos"))
    val missing = q.filter(col("violation") === "missing" &&
        col("epoch").isNotNull)
      .select(col("epoch"), col(idCol),
        col("e_bucket").as("bucket"),
        col("e_difficulty").as(difficultyCol),
        col("e_pos").as("pos"))
    kept.unionByName(missing)
      .select(col("epoch"), col("bucket"), col(idCol), col(difficultyCol),
        col("pos"))
  }
}
