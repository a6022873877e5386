package graft.scale

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Integration specs for [[Curation.pretrainCurate]] — the composed
  * chunk → dedup → decontam → gate → mix → split → pack pipeline.
  */
class PretrainCurateSpec extends SparkSpec {

  import spark.implicits._

  // 40-token docs of POSITION-UNIQUE tokens (a cyclic vocabulary would
  // make every window a near-dup of every other): cross-doc jaccard is
  // 0 except for the planted duplicate, within-doc adjacent windows
  // share stride/window < 0.6, and every bigram is unique so the
  // surprisal gate scores exactly 1000 per chunk (kept). doc 4
  // duplicates doc 1's text from a lower-priority source; doc 5 shares
  // a 4-token run with the holdout (decontaminated away).
  private def tokens(seed: Int, n: Int): String =
    (0 until n).map(i => s"s${seed}t$i").mkString(" ")

  private def corpus = Seq(
    (1L, tokens(1, 40), 1L, "en"),
    (2L, tokens(2, 40), 1L, "en"),
    (3L, tokens(3, 44), 2L, "de"),
    (4L, tokens(1, 40), 9L, "en"), // exact dup of doc 1, lower priority
    (5L, tokens(4, 20) + " leak1 leak2 leak3 leak4", 1L, "de"),
    (6L, "short", 1L, "de") // 1 token: chunks but never scores
  ).toDF("doc_id", "text", "priority", "lang")

  private def holdout = Seq(
    (100L, "benchmark text with leak1 leak2 leak3 leak4 inside")
  ).toDF("doc_id", "text")

  private def run(docs: org.apache.spark.sql.DataFrame) =
    Curation.pretrainCurate(
      docs, holdout, "doc_id", "text", "priority", "lang",
      window = 8, stride = 4, dedupThreshold = 0.6,
      budgetSeqs = 10L, testPermille = 100, valPermille = 100)

  private def collectAll(r: Curation.PretrainResult) = {
    val seqs = r.sequences.collect().map(_.toSeq).toList.sortBy(_.toString)
    val cnts = r.counters.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    graft.ops.CacheScope.releaseAll()
    (seqs, cnts)
  }

  test("rerun idempotence: two invocations produce bit-identical frames") {
    val (s1, c1) = collectAll(run(corpus))
    val (s2, c2) = collectAll(run(corpus))
    assert(s1 === s2)
    assert(c1 === c2)
    assert(s1.nonEmpty, "pipeline must not starve on the fixture")
  }

  test("partitioning invariance end-to-end") {
    val (s1, c1) = collectAll(run(corpus))
    val (s2, c2) = collectAll(run(corpus.repartition(7)))
    assert(s1 === s2)
    assert(c1 === c2)
  }

  test("stage counters are monotone and mutually consistent") {
    val (seqs, c) = collectAll(run(corpus))
    assert(c("docs_in") === 6L)
    assert(c("chunks") > c("docs_in"), "windowing must fan out")
    assert(c("chunks_dedup") <= c("chunks"))
    assert(c("chunks_clean") <= c("chunks_dedup"))
    assert(c("chunks_gated") <= c("chunks_clean"))
    assert(c("train_sequences") <= c("sequences_mixed"))
    assert(c("packed_sequences") === c("train_sequences"))
    assert(c("packed_sequences") === seqs.length.toLong)
    assert(c("shards") >= 1L)
  }

  test("tokenizerMerges repacks by BPE counts; everything upstream of the pack is unchanged") {
    val merges = Bpe.trainMergesFast(corpus, "text", 6)
    val base = Curation.pretrainCurate(
      corpus, holdout, "doc_id", "text", "priority", "lang",
      window = 8, stride = 4, dedupThreshold = 0.6,
      budgetSeqs = 10L, testPermille = 100, valPermille = 100)
    val bpe = Curation.pretrainCurate(
      corpus, holdout, "doc_id", "text", "priority", "lang",
      window = 8, stride = 4, dedupThreshold = 0.6,
      budgetSeqs = 10L, testPermille = 100, valPermille = 100,
      tokenizerMerges = merges)
    // same survivors and splits (the swap touches only pack counts)
    val keyCols = Seq("chunk_id", "doc_id", "chunk_idx", "lang")
    assert(
      bpe.sequences.select(keyCols.map(col): _*).collect().map(_.toSeq).sortBy(_.toString).toSeq ===
      base.sequences.select(keyCols.map(col): _*).collect().map(_.toSeq).sortBy(_.toString).toSeq)
    // n_tokens now reconciles with the tokenizer, not the chunker
    val perChunk = bpe.sequences.select("chunk_id", "n_tokens").distinct()
      .as[(Long, Long)].collect().toMap
    val expected = Bpe.tokenCounts(
      bpe.gatedChunks.select(col("chunk_id"), col("chunk_text")),
      "chunk_id", "chunk_text", merges)
      .as[(Long, Long)].collect().toMap
    perChunk.foreach { case (id, n) =>
      assert(n === expected.getOrElse(id, 0L), s"chunk $id")
    }
    assert(perChunk.nonEmpty)
    graft.ops.CacheScope.releaseAll()
  }

  test("cross-doc duplicate chunks dedup to the higher-priority doc; within-doc overlap survives") {
    val (seqs, c) = collectAll(run(corpus))
    val docsKept = seqs.map(_(1).asInstanceOf[Long]).toSet
    // doc 4 (priority 9) duplicates doc 1 (priority 1): every doc-4
    // chunk is a jaccard-1.0 twin of a doc-1 chunk, so none survive
    assert(!docsKept.contains(4L), s"duplicate doc's chunks must lose: $docsKept")
    // doc 1 keeps MULTIPLE overlapping chunks — stride overlap is not
    // duplication (the cross-doc pair filter)
    assert(seqs.count(_(1) == 1L) > 1)
    // doc 5's leaked chunk is decontaminated: no surviving chunk of doc
    // 5 contains the benchmark run (its tail chunks all do at stride 4)
    assert(c("chunks_clean") < c("chunks_dedup"))
  }

  // exact-vs-approx quantile gate: docs of "g c_i" pairs with varying
  // repeat counts — c1(g) is corpus-global while cb(g, c_i) is the
  // per-doc repeat count, so every doc's single chunk lands at a
  // DIFFERENT avg_surp (distinct quantile ranks); tokens c_i are
  // doc-unique so there are no cross-doc near-dups and no holdout
  // contamination. One chunk per doc (window 64 > max doc length).
  private def variedSurpCorpus = (1 to 10).map { i =>
    val m = i + 2
    (i.toLong, (1 to m).map(_ => s"g c$i").mkString(" "), 1L, "en")
  }.toDF("doc_id", "text", "priority", "lang")

  private def runVaried(acc: Int) =
    Curation.pretrainCurate(
      variedSurpCorpus, holdout, "doc_id", "text", "priority", "lang",
      window = 64, stride = 64, dedupThreshold = 0.6,
      approxQuantileAccuracy = acc,
      budgetSeqs = 10L, testPermille = 0, valPermille = 0)

  test("approx quantile gate: bounded-sketch path deterministic, differs from exact only between the two cutoffs") {
    val (se, ce) = collectAll(runVaried(0)) // oracle-exact percentile
    val (sa1, ca1) = collectAll(runVaried(10000)) // production approx
    val (sa2, ca2) = collectAll(runVaried(10000))
    assert(sa1 === sa2, "approx gate must be rerun-deterministic")
    assert(ca1 === ca2)
    assert(ce("chunks_gated") >= 1L && ca1("chunks_gated") >= 1L)
    // independent scored frame (each doc IS its one chunk, so the
    // pipeline's bigram model sees exactly these texts)
    val scored = TextStats.bigramSurprisal(
      variedSurpCorpus.select(col("doc_id").as("chunk_id"), col("text").as("chunk_text")),
      "chunk_id", "chunk_text")
      .select(col("avg_surp").cast("double")).as[Double].collect().sorted
    assert(scored.distinct.length === scored.length, "fixture must have distinct quantile ranks")
    val cutE = { // interpolated exact percentile at 0.9
      val rank = 0.9 * (scored.length - 1)
      val lo = scored(rank.toInt)
      val hi = scored(math.min(rank.toInt + 1, scored.length - 1))
      lo + (rank - rank.toInt) * (hi - lo)
    }
    assert(ce("chunks_gated") === scored.count(_ <= cutE).toLong,
      "exact gate must match the interpolated percentile law")
    // tolerance contract: both gates keep a prefix of the sorted
    // avg_surp values (avg_surp <= cutoff with all-distinct values), so
    // they can disagree only on chunks between the two cutoffs; with
    // accuracy 10000 on a 10-value corpus the GK sketch is at most one
    // rank off the interpolated exact cut
    assert(ca1("chunks_gated") <= scored.length.toLong)
    assert(math.abs(ce("chunks_gated") - ca1("chunks_gated")) <= 1L,
      s"approx gate drifted more than one rank from exact: " +
        s"exact=${ce("chunks_gated")} approx=${ca1("chunks_gated")}")
  }

  // --- incremental curation (pretrainCurateIncrement) ----------------------

  private def incRun(
      batch: org.apache.spark.sql.DataFrame,
      store: org.apache.spark.sql.DataFrame,
      offset: Long = 0L) =
    Curation.pretrainCurateIncrement(
      batch, holdout, store, "doc_id", "text", "priority", "lang",
      window = 8, stride = 4, dedupThreshold = 0.6,
      budgetSeqs = 10L, testPermille = 100, valPermille = 100,
      shardOffset = offset)

  private def emptyStore = corpus.limit(0).select(
    col("doc_id").as("chunk_id"), col("text").as("chunk_text"), col("lang"))

  test("incremental run: store incumbents win, batch-internal dedup stays priority-based") {
    val store = run(corpus).gatedChunks
    val batch = Seq(
      (10L, tokens(2, 40), 1L, "en"), // exact text of store doc 2 -> incumbent wins
      (11L, tokens(7, 40), 1L, "en"), // genuinely new
      (12L, tokens(7, 40), 9L, "de") // batch-internal dup of 11, lower priority
    ).toDF("doc_id", "text", "priority", "lang")
    val inc = incRun(batch, store)
    val keptDocs = inc.gatedChunks.select("chunk_id").as[Long].collect()
      .map(_ / 65536L).toSet
    val c = inc.counters.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val seqs = inc.sequences.collect().map(_.toSeq).toList.sortBy(_.toString)
    graft.ops.CacheScope.releaseAll()
    assert(!keptDocs.contains(10L), "chunk near-dupping the store must lose to the incumbent")
    assert(keptDocs.contains(11L))
    assert(!keptDocs.contains(12L), "batch-internal dup must resolve by priority")
    assert(c("chunks_vs_store") < c("chunks_dedup"), "incumbent filter must have fired")
    assert(c("chunks_gated") === c("chunks_vs_store")) // nothing contaminated / all score 1000
    // rerun determinism end-to-end
    val inc2 = incRun(batch, store)
    val seqs2 = inc2.sequences.collect().map(_.toSeq).toList.sortBy(_.toString)
    graft.ops.CacheScope.releaseAll()
    assert(seqs === seqs2)
  }

  test("incremental tokenizerMerges repacks by BPE counts with survivors unchanged") {
    val store = run(corpus).gatedChunks
    val batch = Seq(
      (11L, tokens(7, 40), 1L, "en"),
      (13L, tokens(8, 44), 2L, "de")
    ).toDF("doc_id", "text", "priority", "lang")
    val merges = Bpe.trainMergesFast(batch, "text", 6)
    val base = incRun(batch, store)
    val bpe = Curation.pretrainCurateIncrement(
      batch, holdout, store, "doc_id", "text", "priority", "lang",
      window = 8, stride = 4, dedupThreshold = 0.6,
      budgetSeqs = 10L, testPermille = 100, valPermille = 100,
      tokenizerMerges = merges)
    val keyCols = Seq("chunk_id", "doc_id", "chunk_idx", "lang")
    assert(
      bpe.sequences.select(keyCols.map(col): _*).collect().map(_.toSeq).sortBy(_.toString).toSeq ===
      base.sequences.select(keyCols.map(col): _*).collect().map(_.toSeq).sortBy(_.toString).toSeq)
    val perChunk = bpe.sequences.select("chunk_id", "n_tokens").distinct()
      .as[(Long, Long)].collect().toMap
    val expected = Bpe.tokenCounts(
      bpe.gatedChunks.select(col("chunk_id"), col("chunk_text")),
      "chunk_id", "chunk_text", merges)
      .as[(Long, Long)].collect().toMap
    perChunk.foreach { case (id, n) =>
      assert(n === expected.getOrElse(id, 0L), s"chunk $id")
    }
    assert(perChunk.nonEmpty)
    graft.ops.CacheScope.releaseAll()
  }

  test("re-ingesting the store's own documents is a no-op (idempotence)") {
    val base = run(corpus)
    val store = base.gatedChunks
    val inc = incRun(corpus, store)
    val c = inc.counters.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    graft.ops.CacheScope.releaseAll()
    assert(c("chunks_gated") === 0L,
      s"every re-ingested chunk must dedup against the store or drop at its own gate: $c")
    assert(c("packed_sequences") === 0L)
  }

  test("split stability: a kept chunk's split is independent of the store and of reruns") {
    val store = run(corpus).gatedChunks
    val batch = Seq(
      (11L, tokens(7, 40), 1L, "en"),
      (13L, tokens(8, 44), 2L, "de")
    ).toDF("doc_id", "text", "priority", "lang")
    def splitsOf(store: org.apache.spark.sql.DataFrame) = {
      val m = incRun(batch, store).splits.collect()
        .map(r => r.getLong(0) -> r.getString(2)).toMap
      graft.ops.CacheScope.releaseAll()
      m
    }
    val withStore = splitsOf(store)
    val withStore2 = splitsOf(store)
    val withoutStore = splitsOf(emptyStore)
    assert(withStore === withStore2, "split must be rerun-stable")
    // the split hashes the batch clustering's representative — a pure
    // function of chunk ids — so growing the store between runs can
    // never move a chunk across splits (leakage over time)
    withStore.foreach { case (id, s) =>
      assert(withoutStore.get(id).forall(_ === s),
        s"chunk $id split changed with store contents: $s vs ${withoutStore.get(id)}")
    }
  }

  test("two-increment lifecycle: fold-in blocks re-dedup and keeps splits stable across BOTH hops") {
    val base = run(corpus)
    val store0 = base.gatedChunks
    val splits0 = base.splits
    val sigs0 = Dedup.minhashSignatures(
      store0.select(col("chunk_id"), col("chunk_text")), "chunk_id", "chunk_text", 3, 16)
    val offA = base.sequences.agg(max("shard")).as[Long].head() + 1L
    val batchA = Seq(
      (11L, tokens(7, 40), 1L, "en"),
      (13L, tokens(8, 44), 2L, "de")
    ).toDF("doc_id", "text", "priority", "lang")
    val incA = Curation.pretrainCurateIncrement(
      batchA, holdout, store0, "doc_id", "text", "priority", "lang",
      storeSigs = Some(sigs0),
      window = 8, stride = 4, dedupThreshold = 0.6,
      budgetSeqs = 10L, testPermille = 100, valPermille = 100,
      shardOffset = offA)
    val splitsA = incA.splits.select("chunk_id", "split").as[(Long, String)].collect().toMap
    assert(splitsA.nonEmpty, "hop A must keep chunks")
    // FOLD-IN: the seam under test
    val (store1, sigs1, splits1) = Curation.foldIncrement(store0, sigs0, splits0, incA)
    val offB = incA.sequences.agg(max("shard")).as[Long].head() + 1L
    graft.ops.CacheScope.releaseAll()
    // hop B part 1 — re-ingesting BOTH the base corpus AND batch A is a
    // no-op only BECAUSE the fold extended the index: without it, batch
    // A's docs would sail through the incumbent filter again
    val reingest = Curation.pretrainCurateIncrement(
      corpus.unionByName(batchA), holdout, store1, "doc_id", "text", "priority", "lang",
      storeSigs = Some(sigs1),
      window = 8, stride = 4, dedupThreshold = 0.6,
      budgetSeqs = 10L, testPermille = 100, valPermille = 100,
      shardOffset = offB)
    val cr = reingest.counters.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    graft.ops.CacheScope.releaseAll()
    assert(cr("chunks_gated") === 0L,
      s"re-ingest across the fold must be a no-op: $cr")
    // hop B part 2 — new content: 21 near-dups hop A's doc 11 (blocked
    // ONLY via the folded index), 22 is genuinely new
    val batchB = Seq(
      (21L, tokens(7, 40), 1L, "en"),
      (22L, tokens(9, 40), 1L, "en")
    ).toDF("doc_id", "text", "priority", "lang")
    val incB = Curation.pretrainCurateIncrement(
      batchB, holdout, store1, "doc_id", "text", "priority", "lang",
      storeSigs = Some(sigs1),
      window = 8, stride = 4, dedupThreshold = 0.6,
      budgetSeqs = 10L, testPermille = 100, valPermille = 100,
      shardOffset = offB)
    val keptB = incB.gatedChunks.select("chunk_id").as[Long].collect().map(_ / 65536L).toSet
    val splitsB = incB.splits.select("chunk_id", "split").as[(Long, String)].collect().toMap
    val shardsB = incB.sequences.select("shard").as[Long].collect().toSet
    graft.ops.CacheScope.releaseAll()
    assert(!keptB.contains(21L), "hop-A incumbent must win through the folded index")
    assert(keptB === Set(22L))
    // split stability ACROSS hops: the folded assignments are disjoint
    // from hop B's, and no chunk carries two different splits
    val all = splits1.select("chunk_id", "split").as[(Long, String)].collect().toSeq ++ splitsB.toSeq
    assert(all.map(_._1).distinct.size === all.size,
      "a chunk must never be re-assigned across hops")
    // shard-offset contract: hop B's shards start past everything prior
    assert(shardsB.forall(_ >= offB), s"shards $shardsB must start at offset $offB")
    val priorShards = base.sequences.select("shard").as[Long].collect().toSet ++
      incA.sequences.select("shard").as[Long].collect().toSet
    assert(shardsB.intersect(priorShards).isEmpty)
    // prebuilt-index path == in-job path across the fold
    val incB2 = Curation.pretrainCurateIncrement(
      batchB, holdout, store1, "doc_id", "text", "priority", "lang",
      window = 8, stride = 4, dedupThreshold = 0.6,
      budgetSeqs = 10L, testPermille = 100, valPermille = 100,
      shardOffset = offB)
    val s1 = incB.sequences.collect().map(_.toSeq).toList.sortBy(_.toString)
    val s2 = incB2.sequences.collect().map(_.toSeq).toList.sortBy(_.toString)
    graft.ops.CacheScope.releaseAll()
    assert(s1 === s2, "prebuilt vs in-job index must agree across the fold")
  }

  test("temperatureMixRebalance: combined-population scores, batch-population rates") {
    val batchChunks = ((1 to 4).map(i => (i.toLong, "en")) ++
      (101 to 125).map(i => (i.toLong, "de"))).toDF("id", "g")
    val baseSizes = Seq(("en", 96L)).toDF("g", "n_base")
    // en: n_tot 100 -> s 10; de: n_tot 25 -> s 5; S = 15; B = 30, res 1000
    // rate_en = (1000*30*10) div (15*4) = 5000 -> exactly 5 copies each
    // rate_de = (1000*30*5) div (15*25) = 400 -> 0 or 1 copies by hash draw
    val out = TextStats.temperatureMixRebalance(
      batchChunks, "id", "g", baseSizes, budgetDocs = 30L, resolution = 1000L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getLong(4)))
    val en = out.filter(_._2 == "en")
    val de = out.filter(_._2 == "de")
    assert(en.length === 20, s"4 en chunks x exactly 5 copies, got ${en.length}")
    assert(en.forall(_._3 === 5000L))
    assert(de.forall(_._3 === 400L))
    assert(de.length <= 25 && de.forall(_._4 === 0L))
    // determinism
    val out2 = TextStats.temperatureMixRebalance(
      batchChunks, "id", "g", baseSizes, 30L, 1000L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getLong(4)))
    assert(out.sortBy(_.toString).toSeq === out2.sortBy(_.toString).toSeq)
  }

  test("shardOffset shifts every emitted shard id") {
    val batch = Seq((11L, tokens(7, 40), 1L, "en")).toDF("doc_id", "text", "priority", "lang")
    val shards = incRun(batch, emptyStore, offset = 7L)
      .sequences.select("shard").as[Long].collect()
    graft.ops.CacheScope.releaseAll()
    assert(shards.nonEmpty && shards.forall(_ >= 7L))
  }

  test("chunkIdSpan overflow fails loud at first action") {
    val e = intercept[Exception] {
      Curation.pretrainCurate(
        corpus, holdout, "doc_id", "text", "priority", "lang",
        window = 2, stride = 1, chunkIdSpan = 4L,
        budgetSeqs = 5L).sequences.count()
    }
    assert(e.getMessage.contains("chunkIdSpan"))
    graft.ops.CacheScope.releaseAll()
  }

  test("chunkByTokens carryCols ride the scan row-for-row") {
    val out = TextStats.chunkByTokens(
      corpus, "doc_id", "text", window = 8, stride = 4,
      carryCols = Seq("priority", "lang"))
    assert(out.columns.toSeq ===
      Seq("doc_id", "priority", "lang", "chunk_idx", "chunk_text", "n_tokens"))
    val bad = out.join(
      corpus.select(col("doc_id"), col("priority").as("p0"), col("lang").as("l0")),
      Seq("doc_id"))
      .filter(col("priority") =!= col("p0") || col("lang") =!= col("l0"))
    assert(bad.isEmpty)
  }
}
