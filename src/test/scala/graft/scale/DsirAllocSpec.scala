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
}
