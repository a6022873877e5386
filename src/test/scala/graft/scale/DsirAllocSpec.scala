package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR importance selection + token-budget water-filling:
  * [[Sampling.millilog2]] exactness/monotonicity, score semantics on
  * hand corpora, selection determinism, and the closed-form allocator
  * cross-checked against an iterative fixpoint reference.
  */
class DsirAllocSpec extends SparkSpec {

  import spark.implicits._

  private def ml2Ref(x: Long): Long = {
    require(x >= 1)
    val l = 63 - java.lang.Long.numberOfLeadingZeros(x)
    1000L * l + ((x * 1000L) >> l) - 1000L
  }

  test("millilog2 matches the bit-arithmetic reference and is monotone") {
    val xs = Seq(1L, 2L, 3L, 5L, 7L, 8L, 999L, 1000L, 1023L, 1024L, 1025L,
      1000000L, 123456789L, 9007199254740993L) // incl. > 2^53 (double-unsafe)
    val got = xs.toDF("x").select(col("x"), Sampling.millilog2(col("x")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach { x => assert(got(x) === ml2Ref(x), s"millilog2($x)") }
    // monotone over a dense range crossing several powers of two
    val dense = (1L to 5000L)
    val ms = dense.toDF("x").select(Sampling.millilog2(col("x")))
      .collect().map(_.getLong(0))
    assert(ms.sliding(2).forall(p => p(0) <= p(1)))
    // exact at powers of two: 1000 * log2
    Seq(1, 2, 4, 1024, 65536).foreach { p =>
      assert(got.getOrElse(p.toLong, ml2Ref(p.toLong)) ===
        1000L * (63 - java.lang.Long.numberOfLeadingZeros(p.toLong)))
    }
  }

  test("dsirScores ranks target-like documents above raw-typical ones") {
    // raw corpus: docs of word "aa" (common in raw, absent in target)
    // vs docs of word "bb" (the target's vocabulary)
    val raw = Seq(
      (1L, "aa aa aa aa"), (2L, "aa aa aa aa"), (3L, "aa aa aa aa"),
      (4L, "bb bb bb bb")).toDF("doc_id", "text")
    val target = Seq((100L, "bb bb bb bb bb bb")).toDF("doc_id", "text")
    val sc = Sampling.dsirScores(raw, target, "doc_id", "text", buckets = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(sc.keySet === Set(1L, 2L, 3L, 4L))
    assert(sc(1L)._1 === 4L) // n_tokens
    assert(sc(4L)._2 > sc(1L)._2, "target-vocabulary doc must outscore")
    assert(sc(1L) === sc(2L) && sc(2L) === sc(3L), "identical docs tie")
  }

  test("dsirScores: empty-token docs emit no row; empty target still scores") {
    val raw = Seq((1L, "aa bb"), (2L, "???"), (3L, "")).toDF("doc_id", "text")
    val target = Seq((9L, "cc")).toDF("doc_id", "text")
    val ids = Sampling.dsirScores(raw, target, "doc_id", "text", buckets = 16)
      .select("doc_id").as[Long].collect().toSet
    assert(ids === Set(1L))
    val emptyTarget = target.filter(col("doc_id") < 0L)
    val sc = Sampling.dsirScores(raw, emptyTarget, "doc_id", "text", buckets = 16)
    assert(sc.count() === 1L)
  }

  test("dsirSelect is deterministic, k-bounded, and gumbel reorders only") {
    val raw = (1L to 50L).map(i => (i, s"w${i % 7} w${i % 5} w${i % 3}"))
      .toDF("doc_id", "text")
    val target = Seq((0L, "w1 w2 w1 w2 w1")).toDF("doc_id", "text")
    def run(g: Boolean) = Sampling
      .dsirSelect(raw, target, "doc_id", "text", buckets = 32, k = 10, gumbel = g)
      .select("doc_id", "sel_milli").as[(Long, Long)].collect().toSeq
    val a, b = run(false)
    assert(a === b, "rerun-deterministic")
    assert(a.size === 10)
    assert(a.map(_._2).sliding(2).forall(p => p(0) >= p(1)), "ranked desc")
    val g1, g2 = run(true)
    assert(g1 === g2, "gumbel rerun-deterministic")
    // noise perturbs the key but scores themselves are unchanged
    val plain = Sampling.dsirScores(raw, target, "doc_id", "text", buckets = 32)
      .select("doc_id", "score_milli").as[(Long, Long)].collect().toMap
    val gsel = Sampling
      .dsirSelect(raw, target, "doc_id", "text", buckets = 32, k = 50, gumbel = true)
      .select("doc_id", "score_milli").as[(Long, Long)].collect().toMap
    assert(gsel === plain)
  }

  test("dsirModelDense covers every bucket; untrained buckets score the floor") {
    val raw = Seq((1L, "aa aa bb")).toDF("doc_id", "text")
    val target = Seq((9L, "bb cc")).toDF("doc_id", "text")
    val B = 32
    val m = Sampling.dsirModelDense(raw, target, "text", buckets = B)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.size === B && m.keySet === (0L until B.toLong).toSet)
    // the smoothing constant K = ml2(qtot+B) - ml2(ptot+B); a bucket
    // seen by NEITHER corpus carries exactly K (llr = ml2(1)-ml2(1) = 0)
    val k = ml2Ref(3 + B) - ml2Ref(2 + B)
    val seen = Seq("aa", "bb", "cc").map { w =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 8), 16) % B
    }.toSet
    (0L until B.toLong).filterNot(seen.contains).foreach { b =>
      assert(m(b) === k, s"untrained bucket $b")
    }
  }

  test("gumbelMilli is bounded and deterministic per id") {
    val g = spark.range(2000)
      .select(Sampling.gumbelMilli(col("id")).as("g")).as[Long].collect()
    // -log2(-log2 u) for u in [1e-6, 1): within (-4400, 9966]
    assert(g.forall(x => x > -4400 && x <= 9966), s"range: ${g.min}..${g.max}")
    assert(g.distinct.length > 100, "noise varies across ids")
  }

  // iterative fixpoint reference: saturate every domain whose cap fits
  // under the current fair share, recompute, repeat; floor-divide the
  // remainder among the never-saturated
  private def waterfillRef(
      doms: Seq[(String, Long, Long)], // (domain, tokens, weight)
      budget: Long,
      maxEpochsMilli: Long): Map[String, Long] = {
    val caps = doms.map { case (d, t, w) => (d, t * maxEpochsMilli / 1000, w) }
    var sat = Map.empty[String, Long]
    var unsat = caps
    var changed = true
    while (changed && unsat.nonEmpty) {
      changed = false
      val rem = BigInt(budget) - sat.values.map(BigInt(_)).sum
      val wU = unsat.map(x => BigInt(x._3)).sum
      val newly = unsat.filter { case (_, c, w) => BigInt(c) * wU <= rem * w }
      if (newly.nonEmpty) {
        changed = true
        sat ++= newly.map(x => x._1 -> x._2)
        unsat = unsat.filterNot(x => newly.exists(_._1 == x._1))
      }
    }
    val rem = BigInt(budget) - sat.values.map(BigInt(_)).sum
    val wU = unsat.map(x => BigInt(x._3)).sum
    sat ++ unsat.map { case (d, _, w) => d -> (rem * w / wU).toLong }
  }

  private def runAlloc(
      doms: Seq[(String, Long, Long)], budget: Long, maxE: Long) =
    Sampling.tokenBudgetAllocate(
      doms.toDF("domain", "tokens", "weight"),
      "domain", "tokens", "weight", budget, maxE)
      .select("domain", "alloc").as[(String, Long)].collect().toMap

  test("tokenBudgetAllocate matches the iterative water-filling fixpoint") {
    val rnd = new scala.util.Random(42)
    (1 to 40).foreach { trial =>
      val n = 1 + rnd.nextInt(8)
      val doms = (1 to n).map(i =>
        (s"d$i", 1L + rnd.nextInt(1000000), 1L + rnd.nextInt(1000)))
      val budget = rnd.nextInt(3000000).toLong
      val maxE = 1L + rnd.nextInt(5000)
      val got = runAlloc(doms, budget, maxE)
      val want = waterfillRef(doms, budget, maxE)
      assert(got === want, s"trial $trial: doms=$doms budget=$budget maxE=$maxE")
    }
  }

  test("tokenBudgetAllocate invariants: caps, budget, saturation regimes") {
    val doms = Seq(("a", 1000L, 500L), ("b", 2000L, 200L), ("c", 10000L, 300L))
    // budget above all caps: alloc == cap, epochs == maxEpochs (floor)
    val big = Sampling.tokenBudgetAllocate(
      doms.toDF("domain", "tokens", "weight"),
      "domain", "tokens", "weight", 1000000L, 2000L)
      .select("domain", "tokens", "cap", "alloc", "epochs_milli")
      .as[(String, Long, Long, Long, Long)].collect()
    big.foreach { case (_, t, cap, alloc, em) =>
      assert(alloc === cap && cap === t * 2 && em === 2000L)
    }
    // tight budget: sum within (budget - n, budget], nothing over cap
    val tight = runAlloc(doms, 5000L, 2000L)
    assert(tight.values.sum <= 5000L && tight.values.sum > 5000L - 3)
    doms.foreach { case (d, t, _) => assert(tight(d) <= t * 2) }
    // zero budget allocates zero
    assert(runAlloc(doms, 0L, 2000L).values.forall(_ === 0L))
  }

  test("tokenBudgetAllocate fails loud on zero tokens or weight") {
    val bad = Seq(("a", 0L, 100L)).toDF("domain", "tokens", "weight")
    val e = intercept[Exception] {
      Sampling.tokenBudgetAllocate(bad, "domain", "tokens", "weight", 10L, 1000L)
        .collect()
    }
    assert(e.getMessage != null)
  }

  private def pow2Ref(m: Long): BigInt = {
    val f = ((m % 1000) + 1000) % 1000
    val i = (m - f) / 1000
    if (i >= 0) BigInt(1000 + f) << i.toInt else BigInt(1000 + f) >> (-i).toInt
  }

  test("pow2Milli inverts millilog2 within 0.1% over the int64 domain") {
    val rnd = new scala.util.Random(7)
    val xs = (Seq(1L, 2L, 3L, 999L, 1000L, 1023L, 1024L, 1025L) ++
      (0 to 52).map(i => 1L << i) ++
      (1 to 52).map(i => (1L << i) - 1) ++
      (1 to 300).map(_ => 1L + (rnd.nextLong() & ((1L << 53) - 1)))).distinct
    val got = xs.toDF("x")
      .select(col("x"), Sampling.pow2Milli(Sampling.millilog2(col("x"))).as("r"))
      .collect()
    got.foreach { r =>
      val x = r.getLong(0); val v = BigInt(r.getLong(1))
      assert((v - BigInt(x) * 1000).abs <= BigInt(x),
        s"round-trip violated at x=$x: pow2Milli(millilog2(x))=$v")
    }
    // matches the bit-arithmetic reference exactly, incl. negative m
    val ms = Seq(-11000L, -2000L, -999L, -1L, 0L, 1L, 999L, 1000L, 1500L,
      10000L, 52999L, 53023L)
    val gm = ms.toDF("m").select(col("m"), Sampling.pow2Milli(col("m")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ms.foreach(m => assert(BigInt(gm(m)) === pow2Ref(m), s"pow2Milli($m)"))
    assert(gm(0L) === 1000L && gm(1000L) === 2000L, "2^0 and 2^1 anchors")
    assert(gm(-11000L) === 0L, "deep-negative truncates to 0")
    assert(gm(53023L) === (1023L << 53), "last in-domain mantissa step")
  }

  test("pow2Milli fails loud past the int64 domain edge (m > 53023)") {
    // m = 53024 needs 2^53*1024 = 2^63: the old silent-wrap bug class
    val e = intercept[Throwable] {
      Seq(53024L).toDF("m").select(Sampling.pow2Milli(col("m"))).collect()
    }
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("pow2Milli"), s"unexpected failure: $chain")
  }

  // scala reference of the drift decomposition's exact integer math
  private def md5Bucket(w: String, b: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(md.substring(0, 8), 16) % b
  }

  private def driftRef(tgt: Seq[String], ref: Seq[String], b: Int)
      : Map[Long, (Long, Long, Long, Long)] = {
    def cnt(ds: Seq[String]) = ds
      .flatMap(_.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty))
      .groupBy(md5Bucket(_, b)).map { case (k, v) => k -> v.size.toLong }
    val p = cnt(tgt); val q = cnt(ref)
    val ps = p.values.sum + b; val qs = q.values.sum + b
    (p.keySet ++ q.keySet).iterator.map { k =>
      val pc = p.getOrElse(k, 0L); val qc = q.getOrElse(k, 0L)
      val llr = (ml2Ref(pc + 1) - ml2Ref(ps)) - (ml2Ref(qc + 1) - ml2Ref(qs))
      val contrib = llr.sign *
        (BigInt(pc + 1) * BigInt(llr.abs) * 1000 / BigInt(ps)).toLong
      k -> (pc, qc, llr, contrib)
    }.toMap
  }

  test("domainDriftContributors matches the integer reference; sign and KL laws") {
    val tgt = Seq("aa aa aa cc", "aa cc dd", "aa aa")
    val ref = Seq("bb bb cc", "bb cc cc dd", "bb")
    val B = 64
    val got = Sampling.domainDriftContributors(
        tgt.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
        ref.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
        "text", buckets = B)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val want = driftRef(tgt, ref, B)
    assert(got === want, "exact integer-reference replication")
    // buckets in neither corpus are omitted (64 - distinct words present)
    assert(got.size === want.size && got.size < B)
    // sign law: target-heavy feature drifts positive, reference-heavy negative
    assert(got(md5Bucket("aa", B))._3 > 0, "aa (target-only) llr > 0")
    assert(got(md5Bucket("bb", B))._3 < 0, "bb (reference-only) llr < 0")
    // Σ contrib_micro ≈ 10^6 · KL(P'‖Q') in log2 over the present buckets
    val ps = want.values.map(_._1).sum + B.toLong
    val qs = want.values.map(_._2).sum + B.toLong
    val kl2 = want.values.map { case (pc, qc, _, _) =>
      val p = (pc + 1).toDouble / ps; val q = (qc + 1).toDouble / qs
      p * math.log(p / q) / math.log(2)
    }.sum
    val sum = got.values.map(_._4).sum.toDouble
    // millilog2's linear mantissa underestimates log2 by up to 86.1
    // milli per term (max interp error of log2(1+t) ~ t), so the
    // integer sum sits within a few percent of true KL on a corpus
    // whose llr values are O(100 milli) — 5% is the honest envelope
    // for this fixture (observed 3.3%), not a precision claim
    assert(math.abs(sum - 1e6 * kl2) <= math.abs(1e6 * kl2) * 0.05 + 2.0 * got.size,
      s"sum_contrib=$sum vs 1e6*KL=${1e6 * kl2}")
  }

  test("snapshotDrift reads the store's live-vs-previous pair and fails loud on a single version") {
    import graft.ops.SnapshotStore
    val store = java.nio.file.Files.createTempDirectory("drift_spec").toString
    val v1 = Seq((1L, "aa aa cc"), (2L, "aa dd")).toDF("doc_id", "text")
    val v2 = Seq((1L, "aa aa cc"), (3L, "bb bb ee")).toDF("doc_id", "text")
    SnapshotStore.publish(store, Seq("corpus" -> v1), retain = 3)
    // one retained version: the monitor must refuse, not report zero drift
    val e = intercept[IllegalArgumentException] {
      Sampling.snapshotDrift(spark, store, "corpus", "text", buckets = 32)
    }
    assert(e.getMessage.contains("retained versions"))
    SnapshotStore.publish(store, Seq("corpus" -> v2), retain = 3)
    val got = Sampling.snapshotDrift(spark, store, "corpus", "text", buckets = 32)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4)))
    // identical to running the decomposition directly on the two frames
    val direct = Sampling.domainDriftContributors(v2, v1, "text", buckets = 32)
      .orderBy(abs(col("contrib_micro")).desc, col("b").asc).limit(20)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(got.toSeq === direct.toSeq, "store round-trip == direct frames")
    // a THIRD publish moves the pair forward: drift(v3 vs v2), not v2 vs v1
    SnapshotStore.publish(store, Seq("corpus" -> v1), retain = 3)
    val third = Sampling.snapshotDrift(spark, store, "corpus", "text", buckets = 32)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    val directThird = Sampling.domainDriftContributors(v1, v2, "text", buckets = 32)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(third === directThird, "pair advances with the store history")
    // ENTITY-scoped history: publishes of OTHER entities sharing the
    // store must not advance this entity's pair — store-level "last two
    // versions" would compare corpus to itself and report zero drift
    val other = Seq((9L, "zz zz")).toDF("doc_id", "text")
    SnapshotStore.publish(store, Seq("other" -> other), retain = 3)
    val afterOther = Sampling.snapshotDrift(spark, store, "corpus", "text", buckets = 32)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(afterOther === directThird,
      "interleaved other-entity publish leaves the corpus pair unchanged")
  }

  test("embeddingCellDrift: reference-frozen cells, zero drift on identical eras, moved mass surfaces") {
    // 2-D unit-ish vectors in two clusters; centroid stride 2 over the
    // reference picks ids 0 and 2 -> cells are the two cluster axes
    def vecs(rows: (Long, Array[Double])*) =
      rows.toSeq.toDF("vec_id", "embedding")
    val ref = vecs(
      0L -> Array(1.0, 0.0), 1L -> Array(0.9, 0.1),
      2L -> Array(0.0, 1.0), 3L -> Array(0.1, 0.9),
      4L -> Array(0.95, 0.05), 5L -> Array(0.05, 0.95))
    // identical eras: p_cnt == q_cnt per cell and ps == qs -> llr == 0
    val same = Similarity.embeddingCellDrift(ref, ref, "vec_id", "embedding", 2L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // centroid 4 wins no vector (0 beats it on every x-cluster dot), so
    // its cell is omitted — the present-in-neither omission contract
    assert(same.keySet === Set(0L, 2L), "cells are the stride-picked reference ids")
    same.foreach { case (b, (p, q, llr, c)) =>
      assert(p === q && llr === 0L && c === 0L, s"cell $b must show zero drift")
    }
    // target era: all mass moved to the y-axis cluster -> cell 2 (and
    // its stride-mate) drift positive, x-axis cells negative
    val tgt = vecs(
      10L -> Array(0.0, 1.0), 11L -> Array(0.1, 0.9),
      12L -> Array(0.05, 0.95), 13L -> Array(0.2, 0.8))
    val moved = Similarity.embeddingCellDrift(tgt, ref, "vec_id", "embedding", 2L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(moved(2L)._1 === 4L && moved(2L)._2 > 0L,
      s"the gaining cell must drift positive: $moved")
    assert(moved(0L)._1 === 0L && moved(0L)._2 < 0L,
      s"the emptied cell must drift negative: $moved")
    // the cell SYSTEM never drifts with the target: cells are reference ids
    assert(moved.keySet.subsetOf(Set(0L, 2L, 4L)))
    // the explicit-centroid production form reproduces the stride form
    // bit-for-bit when handed the same frame
    val cents = ref.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("centroid_id"),
        col("embedding").cast("array<double>").as("centroid_vec"))
    val explicit = Similarity
      .embeddingCellDriftWithCentroids(tgt, ref, cents, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(explicit === moved, "withCentroids == stride form on the same cells")
    // an EMPTY cell system must refuse AT CALL TIME, not report zero
    // drift forever (an in-plan assert gets pruned by AQE's
    // empty-relation propagation — hence the eager probe)
    val err = intercept[IllegalArgumentException] {
      Similarity.embeddingCellDriftWithCentroids(
        tgt, ref, cents.limit(0), "vec_id", "embedding")
    }
    assert(err.getMessage.contains("empty centroid frame"))
  }

  test("embedding drift over TRAINED centroids: zero on identical eras, moved mass surfaces, nlist is a model constant") {
    // the q145 composition: KMeans.trainedCentroids on the reference
    // era, frozen, serving embeddingCellDriftWithCentroids
    def vecs(rows: (Long, Array[Double])*) =
      rows.toSeq.toDF("vec_id", "embedding")
    val ref = vecs(
      0L -> Array(1.0, 0.0), 1L -> Array(0.0, 1.0),
      2L -> Array(0.9, 0.1), 3L -> Array(0.1, 0.9),
      4L -> Array(0.95, 0.05), 5L -> Array(0.05, 0.95))
    val cents = KMeans.trainedCentroids(ref, "vec_id", "embedding", k = 2, iters = 2)
    // identical eras through the trained cells: llr == 0 everywhere
    val same = Similarity
      .embeddingCellDriftWithCentroids(ref, ref, cents, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(same.keySet === Set(0L, 1L), s"cells are the trained cluster ids: $same")
    same.foreach { case (b, (p, q, llr)) =>
      assert(p === q && llr === 0L, s"cell $b must show zero drift")
    }
    // all target mass on the y-axis cluster: its cell gains, the other empties
    val tgt = vecs(
      10L -> Array(0.0, 1.0), 11L -> Array(0.1, 0.9), 12L -> Array(0.05, 0.95))
    val moved = Similarity
      .embeddingCellDriftWithCentroids(tgt, ref, cents, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(4))).toMap
    val yCell = moved.maxBy(_._2._1)._1
    assert(moved(yCell)._1 === 3L && moved(yCell)._2 > 0L,
      s"the gaining trained cell drifts positive: $moved")
    assert(moved((1L - yCell))._1 === 0L && moved(1L - yCell)._2 < 0L,
      s"the emptied trained cell drifts negative: $moved")
    // the linear-scaling property in miniature: DOUBLING the reference
    // leaves the cell count at k (q141's stride rule would double it —
    // that proportionality is exactly what makes its scoring pass
    // N²/stride at scale)
    val ref2 = ref.unionByName(
      ref.select((col("vec_id") + 6L).as("vec_id"), col("embedding")))
    val cents2 = KMeans.trainedCentroids(ref2, "vec_id", "embedding", k = 2, iters = 2)
    assert(cents2.count() === 2L, "trained nlist == k regardless of corpus size")
  }

  test("lossAwareWeights: best domain weighs 1000; tau-excess doubles exactly") {
    val loss = Seq(("a", 1000L), ("b", 2000L), ("c", 3000L))
      .toDF("dom", "loss")
    def wts(tau: Long) = Sampling.lossAwareWeights(loss, "dom", "loss", tau)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val w1 = wts(1000L)
    assert(w1("a") === ((1000L, 0L, 1000L)), "best domain: excess 0, weight 1000")
    assert(w1("b") === ((2000L, 1000L, 2000L)), "one tau worse: weight 2000")
    assert(w1("c") === ((3000L, 2000L, 4000L)), "two tau worse: weight 4000")
    val w2 = wts(500L)
    assert(w2("b")._3 === 4000L && w2("c")._3 === 16000L, "halving tau squares the ratio")
    // tau-doubling law: for ANY excess e, weight(e + tau) == 2 * weight(e)
    // ((e+tau)*1000 div tau == e*1000 div tau + 1000 exactly, and
    // pow2Milli(m + 1000) == 2*pow2Milli(m) for m >= 0)
    val rnd = new scala.util.Random(11)
    (1 to 20).foreach { _ =>
      // keep m = (e+tau)*1000/tau inside pow2Milli's int64 domain
      val tau = 1000L + rnd.nextInt(5000)
      val e = rnd.nextInt((tau * 40 / 1000).toInt + 1).toLong
      val f = Seq(("base", 0L), ("lo", e), ("hi", e + tau)).toDF("dom", "loss")
      val w = Sampling.lossAwareWeights(f, "dom", "loss", tau)
        .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
      assert(w("hi") === 2L * w("lo"), s"tau=$tau e=$e")
    }
  }

  // BigInt reference of the DoReMi round dynamics (floor division
  // everywhere, mirroring the in-plan decimal(38,0) arithmetic)
  private def doremiRef(
      losses: Seq[(String, Long)], tau: Long, rounds: Int)
      : Map[String, (Long, Long)] = {
    val best = losses.map(_._2).min
    val mult = losses.map { case (d, l) =>
      d -> pow2Ref((l - best) * 1000 / tau)
    }.toMap
    var w = losses.map { case (d, _) => d -> BigInt(1000000) }.toMap
    var wSum = losses.map { case (d, _) => d -> BigInt(0) }.toMap
    (1 to rounds).foreach { _ =>
      val raw = w.map { case (d, x) => d -> (x * mult(d) / 1000) }
      val tot = raw.values.sum
      w = raw.map { case (d, x) => d -> (x * 1000000 / tot) }
      wSum = wSum.map { case (d, s) => d -> (s + w(d)) }
    }
    losses.map { case (d, _) =>
      d -> (w(d).toLong, (wSum(d) / rounds).toLong)
    }.toMap
  }

  private def runDoremi(losses: Seq[(String, Long)], tau: Long, rounds: Int) =
    Sampling.doremiWeights(losses.toDF("dom", "loss"), "dom", "loss", tau, rounds)
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap

  test("doremiWeights matches the BigInt round-dynamics reference") {
    val rnd = new scala.util.Random(5)
    (1 to 15).foreach { trial =>
      val n = 2 + rnd.nextInt(6)
      val tau = 200L + rnd.nextInt(2000)
      // excesses bounded so the per-round multiplier stays moderate
      val losses = (1 to n).map(i => (s"d$i", 1000L + rnd.nextInt(3 * tau.toInt)))
      val rounds = 1 + rnd.nextInt(6)
      assert(runDoremi(losses, tau, rounds) === doremiRef(losses, tau, rounds),
        s"trial $trial: losses=$losses tau=$tau rounds=$rounds")
    }
  }

  test("doremiWeights survives the pow2Milli domain edge (raw ~9e21 stays exact, never wraps)") {
    // tau=1 with excess near the pow2Milli ceiling: the round-1 raw is
    // 10^6 * pow2Milli(53000) / 1000 ~ 9.3e21 — past int64. The fix
    // keeps raw in decimal(38,0); the BigInt reference is exact.
    val losses = Seq(("best", 0L), ("edge", 53L))
    val got = runDoremi(losses, 1L, 2)
    assert(got === doremiRef(losses, 1L, 2), s"domain edge: $got")
    assert(got.values.forall { case (f, a) => f >= 0 && a >= 0 },
      s"no silent wrap to negative: $got")
    // the edge domain takes essentially the whole mixture
    assert(got("edge")._1 > 999999L - losses.size, s"edge dominates: $got")
  }

  test("doremiWeights laws: uniform stays uniform; rounds=1 is the one-shot rule; concentration is monotone") {
    // equal losses: every domain holds 10^6/n ppm every round
    val eq = runDoremi(Seq(("a", 500L), ("b", 500L), ("c", 500L)), 1000L, 5)
    assert(eq.values.toSet === Set((333333L, 333333L)), s"uniform: $eq")
    // rounds = 1 reproduces lossAwareWeights normalized to ppm
    val losses = Seq(("a", 1000L), ("b", 1400L), ("c", 2100L))
    val one = runDoremi(losses, 700L, 1)
    val oneShot = Sampling.lossAwareWeights(
        losses.toDF("dom", "loss"), "dom", "loss", 700L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val tot = oneShot.values.sum
    losses.foreach { case (d, _) =>
      assert(one(d)._1 === BigInt(oneShot(d)) * 1000000 / tot,
        s"one-round vs one-shot at $d")
      assert(one(d)._1 === one(d)._2, "single round: final == average")
    }
    // the max-excess domain's weight is non-decreasing across horizons,
    // and the average lags the final (concentration damping)
    val byRounds = (1 to 6).map(r => runDoremi(losses, 700L, r)("c"))
    assert(byRounds.map(_._1).sliding(2).forall(p => p(0) <= p(1)),
      s"final-weight monotone: ${byRounds.map(_._1)}")
    assert(byRounds.last._2 < byRounds.last._1,
      "step average damps the final concentration")
  }
}
