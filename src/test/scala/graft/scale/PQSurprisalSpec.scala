package graft.scale

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Specs for the round-11 additions: bigram-LM surprisal scoring and
  * product-quantization ADC top-k.
  */
class PQSurprisalSpec extends SparkSpec {

  import spark.implicits._

  // --- TextStats.bigramSurprisal -------------------------------------------

  private val surpDocs = Seq(
    (1L, "a b a b"),
    (2L, "a b c"),
    (3L, "x"),
    (4L, "   ")
  ).toDF("doc_id", "text")

  test("bigramSurprisal matches the hand-computed integer formula") {
    // cb: (a,b)=3, (b,a)=1, (b,c)=1; c1: a=3, b=2
    // surp(a,b) = 1000*3 div 3 = 1000; surp(b,a) = surp(b,c) = 2000
    val out = TextStats.bigramSurprisal(surpDocs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out === Map(
      1L -> ((4000L, 3L, 1333L)), // ab, ba, ab
      2L -> ((3000L, 2L, 1500L)) // ab, bc
    ))
    graft.ops.CacheScope.releaseAll()
  }

  test("bigramSurprisal drops token-less docs and is partitioning-invariant") {
    val base = TextStats.bigramSurprisal(surpDocs, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    graft.ops.CacheScope.releaseAll()
    val shuffled = TextStats.bigramSurprisal(
      surpDocs.repartition(7), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    graft.ops.CacheScope.releaseAll()
    assert(base === shuffled)
    assert(!base.exists(r => r.head == 3L || r.head == 4L))
  }

  // --- PQ.adcTopK ----------------------------------------------------------

  // 4 distinct vectors (ids 0-3, the first-k init set) duplicated at
  // ids 4-7: training converges in one iteration to the distinct set
  // itself (integer means of identical members are exact), every code
  // reconstructs its vector exactly, and ADC == the true quantized
  // squared distance — checkable against a driver-side brute force.
  private val distinct4 = Seq(
    Array(0.0f, 0.0f, 1.0f, 1.0f),
    Array(1.0f, 0.0f, 0.0f, 1.0f),
    Array(0.5f, 0.5f, 0.5f, 0.5f),
    Array(0.9f, 0.1f, 0.2f, 0.8f))
  private val pqVecs = (0 until 8).map(i => (i.toLong, distinct4(i % 4)))
  private val pqDf = pqVecs.toDF("vec_id", "embedding")

  private def quant(v: Array[Float]): Array[Long] =
    v.map(x => math.floor(x.toDouble * 1000).toLong + 32768L)

  private def sqDist(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  test("adcTopK on an exactly-clusterable corpus equals brute-force quantized distance") {
    val queries = pqDf.filter(col("vec_id") < 2)
    val out = PQ.adcTopK(pqDf, queries, "vec_id", "embedding", m = 2, k = 4, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    graft.ops.CacheScope.releaseAll()
    val expected = (0L until 2L).flatMap { qid =>
      val qv = quant(distinct4(qid.toInt % 4))
      pqVecs.filter(_._1 != qid)
        .map { case (id, v) => (id, sqDist(qv, quant(v))) }
        .sortBy { case (id, d) => (d, id) }
        .take(3).zipWithIndex
        .map { case ((id, d), i) => (qid, (i + 1).toLong, id, d) }
    }
    assert(out.sortBy(r => (r._1, r._2)).toSeq === expected)
  }

  test("adcTopK ranks are contiguous per query, self-free, and partitioning-invariant") {
    val queries = pqDf.filter(col("vec_id") % 4 === 1)
    val base = PQ.adcTopK(pqDf, queries, "vec_id", "embedding", m = 2, k = 4, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    graft.ops.CacheScope.releaseAll()
    val shuffledOut = PQ.adcTopK(
      pqDf.repartition(5), queries, "vec_id", "embedding", m = 2, k = 4, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    graft.ops.CacheScope.releaseAll()
    assert(base.sorted.toSeq === shuffledOut.sorted.toSeq)
    assert(base.forall { case (qid, _, nid, _) => qid != nid })
    base.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (1L to rows.length.toLong))
    }
  }

  test("ivfAdcTopK with nprobe=1 returns only the query's own coarse list") {
    // coarseK=4 on the duplicated fixture: each coarse list is exactly
    // {i, i+4}; probing 1 list leaves the query's exact duplicate as the
    // only candidate — rank 1, ADC distance 0.
    val queries = pqDf.filter(col("vec_id") < 2)
    val out = PQ.ivfAdcTopK(
      pqDf, queries, "vec_id", "embedding",
      coarseK = 4, nprobe = 1, m = 2, k = 4, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    graft.ops.CacheScope.releaseAll()
    assert(out.sortBy(_._1).toSeq === Seq((0L, 1L, 4L, 0L), (1L, 1L, 5L, 0L)))
  }

  test("ivfAdcTopK probing ALL lists equals exhaustive adcTopK") {
    val queries = pqDf.filter(col("vec_id") % 4 === 2)
    val full = PQ.adcTopK(pqDf, queries, "vec_id", "embedding", m = 2, k = 4, topK = 4)
      .collect().map(_.toSeq).toSet
    graft.ops.CacheScope.releaseAll()
    val ivf = PQ.ivfAdcTopK(
      pqDf, queries, "vec_id", "embedding",
      coarseK = 4, nprobe = 4, m = 2, k = 4, topK = 4)
      .collect().map(_.toSeq).toSet
    graft.ops.CacheScope.releaseAll()
    assert(ivf === full)
  }

  test("ivfAdcTopKWithCentroids probing ALL lists equals exhaustive adcTopK") {
    // with every list probed the coarse structure is irrelevant — the
    // trained quantizer path must reduce to the exhaustive ADC scores
    // whatever centroids it was given
    val queries = pqDf.filter(col("vec_id") % 4 === 3)
    val full = PQ.adcTopK(pqDf, queries, "vec_id", "embedding", m = 2, k = 4, topK = 4)
      .collect().map(_.toSeq).toSet
    graft.ops.CacheScope.releaseAll()
    val trained = PQ.ivfAdcTopKWithCentroids(
      pqDf, queries,
      KMeans.trainedCentroids(pqDf, "vec_id", "embedding", k = 4, iters = 1),
      "vec_id", "embedding", nprobe = 4, m = 2, k = 4, topK = 4)
      .collect().map(_.toSeq).toSet
    graft.ops.CacheScope.releaseAll()
    assert(trained === full)
    // empty centroid frame fails loud
    val e = intercept[IllegalArgumentException] {
      PQ.ivfAdcTopKWithCentroids(
        pqDf, queries,
        KMeans.trainedCentroids(pqDf, "vec_id", "embedding", k = 4, iters = 1)
          .filter(col("centroid_id") < 0),
        "vec_id", "embedding")
    }
    assert(e.getMessage.contains("empty"))
    graft.ops.CacheScope.releaseAll()
  }

  test("sparse id spaces fail LOUD at trainer construction, never return empty") {
    val sparse = pqVecs.map { case (i, v) => (i + 1000L, v) }.toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException] {
      KMeans.lloydAssign(sparse, "vec_id", "embedding", k = 4, iters = 1)
    }
    assert(e1.getMessage.contains("dense 0-based"))
    graft.ops.CacheScope.releaseAll()
    val e2 = intercept[IllegalArgumentException] {
      PQ.adcTopK(sparse, sparse.limit(1), "vec_id", "embedding", m = 2, k = 4)
    }
    assert(e2.getMessage.contains("dense 0-based"))
    graft.ops.CacheScope.releaseAll()
    val e3 = intercept[IllegalArgumentException] {
      PQ.ivfAdcTopK(sparse, sparse.limit(1), "vec_id", "embedding", coarseK = 4)
    }
    assert(e3.getMessage.contains("dense 0-based"))
    graft.ops.CacheScope.releaseAll()
  }

  test("excludeSelf=false keeps corpus neighbors whose id collides with a query id") {
    // query ids 100-101 carry vectors identical to corpus ids 0-1: with
    // the default self-filter nothing is dropped (ids are disjoint), and
    // with excludeSelf=false an id-colliding query (id 3, vector of 0)
    // still sees corpus doc 3 as a candidate instead of losing it
    val disjointQ = pqDf.filter(col("vec_id") < 2)
      .select((col("vec_id") + 100L).as("vec_id"), col("embedding"))
    val out = PQ.adcTopK(pqDf, disjointQ, "vec_id", "embedding",
      m = 2, k = 4, topK = 1, excludeSelf = false)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    graft.ops.CacheScope.releaseAll()
    // rank-1 neighbor of each disjoint query is its exact duplicate, d2=0
    assert(out.sortBy(_._1).toSeq === Seq((100L, 0L, 0L), (101L, 1L, 0L)))
    // id-colliding query: vector of distinct4(0) but id 3 — corpus doc 3
    // (same id, DIFFERENT vector) must remain eligible under
    // excludeSelf=false and must NOT outrank the true duplicates
    val collide = Seq((3L, distinct4(0))).toDF("vec_id", "embedding")
    val got = PQ.adcTopK(pqDf, collide, "vec_id", "embedding",
      m = 2, k = 4, topK = 8, excludeSelf = false)
      .collect().map(r => r.getLong(2)).toSet
    graft.ops.CacheScope.releaseAll()
    assert(got.contains(3L)) // would be silently dropped by the default filter
  }

  test("PQ construction runs ONLY the documented bounded probes (2 adc / 3 ivfadc)") {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    // FIFO listener bus: once a sentinel submitted AFTER construction is
    // counted, any construction job was counted before it (ScaleSpec's
    // LSH-laziness pattern)
    def settle(atLeast: Int): Int = {
      val deadline = System.currentTimeMillis() + 30000
      while (counter.get() < atLeast && System.currentTimeMillis() < deadline)
        Thread.sleep(10)
      counter.get()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val queries = pqDf.filter(col("vec_id") < 2)
      spark.range(1).collect() // sentinel: listener live
      val base = settle(1)
      val adc = PQ.adcTopK(pqDf, queries, "vec_id", "embedding", m = 2, k = 4, topK = 3)
      spark.range(1).collect()
      val afterAdc = settle(base + 1)
      // dims head() + limit-1 init probe + the sentinel; local-relation
      // fixtures may constant-fold a probe to ZERO jobs, so pin an upper
      // bound — eager training (the regression this guards) would run a
      // cache-materializing scan + aggregation far above it
      assert(afterAdc - base - 1 <= 2,
        s"adcTopK construction ran ${afterAdc - base - 1} jobs; documented contract is <=2")
      val ivf = PQ.ivfAdcTopK(pqDf, queries, "vec_id", "embedding",
        coarseK = 4, nprobe = 4, m = 2, k = 4, topK = 3)
      spark.range(1).collect()
      val afterIvf = settle(afterAdc + 1)
      // dims + coarse init probe + sub-codebook init probe + sentinel
      assert(afterIvf - afterAdc - 1 <= 3,
        s"ivfAdcTopK construction ran ${afterIvf - afterAdc - 1} jobs; documented contract is <=3")
      // and both frames still execute correctly afterwards
      assert(adc.count() > 0 && ivf.count() > 0)
      graft.ops.CacheScope.releaseAll()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("KMeans construction runs ONLY the documented bounded probes (no qv cache materialization)") {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    def settle(atLeast: Int): Int = {
      val deadline = System.currentTimeMillis() + 30000
      while (counter.get() < atLeast && System.currentTimeMillis() < deadline)
        Thread.sleep(10)
      counter.get()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.range(1).collect() // sentinel: listener live
      val base = settle(1)
      // dims head() + limit-1 init probe + sentinel; the regression this
      // guards is the old cent0.count() guard, which materialized the
      // whole persisted quantized-vector cache at construction
      val asg = KMeans.lloydAssign(pqDf, "vec_id", "embedding", k = 4, iters = 2)
      spark.range(1).collect()
      val afterAssign = settle(base + 1)
      assert(afterAssign - base - 1 <= 2,
        s"lloydAssign construction ran ${afterAssign - base - 1} jobs; documented contract is <=2")
      val cents = KMeans.trainedCentroids(pqDf, "vec_id", "embedding", k = 4, iters = 2)
      spark.range(1).collect()
      val afterTrain = settle(afterAssign + 1)
      assert(afterTrain - afterAssign - 1 <= 2,
        s"trainedCentroids construction ran ${afterTrain - afterAssign - 1} jobs; documented contract is <=2")
      assert(asg.count() === 8L && cents.count() === 4L)
      graft.ops.CacheScope.releaseAll()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("serve-path equality: external centroids from the one-iteration trained quantizer reproduce ivfAdcTopK bit-for-bit") {
    // ivfAdcTopK's internal coarse quantizer IS one Lloyd iteration from
    // the first-k init — exactly KMeans.trainedCentroids(k, iters = 1).
    // Feeding those centroids through the external serve API must hit
    // the shared ivfAdcCore tail with the identical integer grid (the
    // dequantize/requantize round trip is exact on integer-mean cells),
    // so the two result frames are bit-identical.
    val queries = pqDf.filter(col("vec_id") < 2)
    val internal = PQ.ivfAdcTopK(pqDf, queries, "vec_id", "embedding",
      coarseK = 4, nprobe = 2, m = 2, k = 4, topK = 3)
      .collect().map(_.toSeq).toSet
    graft.ops.CacheScope.releaseAll()
    val served = PQ.ivfAdcTopKWithCentroids(pqDf, queries,
      KMeans.trainedCentroids(pqDf, "vec_id", "embedding", k = 4, iters = 1),
      "vec_id", "embedding", nprobe = 2, m = 2, k = 4, topK = 3)
      .collect().map(_.toSeq).toSet
    graft.ops.CacheScope.releaseAll()
    assert(internal === served)
    assert(internal.nonEmpty)
  }

  test("ivfAdcTopKWithCentroids fails loud on negative or duplicate centroid ids; tolerates gaps") {
    val queries = pqDf.filter(col("vec_id") < 2)
    def cents(ids: Seq[Long]) =
      ids.map(i => (i, Array(0.0, 0.0, 1.0, 1.0))).toDF("centroid_id", "centroid_vec")
    val neg = intercept[IllegalArgumentException] {
      PQ.ivfAdcTopKWithCentroids(pqDf, queries, cents(Seq(-1L, 0L)),
        "vec_id", "embedding", nprobe = 1, m = 2, k = 4, topK = 3)
    }
    assert(neg.getMessage.contains("nonnegative"))
    val dup = intercept[IllegalArgumentException] {
      PQ.ivfAdcTopKWithCentroids(pqDf, queries, cents(Seq(0L, 0L, 1L)),
        "vec_id", "embedding", nprobe = 1, m = 2, k = 4, topK = 3)
    }
    assert(dup.getMessage.contains("duplicate"))
    // gapped (trained quantizer lost a cluster): constructs and serves
    val gapped = PQ.ivfAdcTopKWithCentroids(pqDf, queries,
      Seq((0L, Array(0.0, 0.0, 1.0, 1.0)), (2L, Array(1.0, 0.0, 0.0, 1.0)))
        .toDF("centroid_id", "centroid_vec"),
      "vec_id", "embedding", nprobe = 1, m = 2, k = 4, topK = 3)
    assert(gapped.count() > 0)
    graft.ops.CacheScope.releaseAll()
  }

  // --- Dedup.corpusOverlapEstimate -----------------------------------------

  test("corpusOverlapEstimate: hand-computed bottom-k overlap, identical and disjoint bounds") {
    val a = Seq((1L, "a b c")).toDF("doc_id", "text")
    val b = Seq((2L, "a b c"), (3L, "x y z")).toDF("doc_id", "text")
    // grams: A = {"a b c"}; B = {"a b c", "x y z"} -> union 2, both 1
    val row = Dedup.corpusOverlapEstimate(a, b, "text", shingleSize = 3, k = 256)
      .collect().head
    assert(row.getLong(0) === 1L) // n_grams_a
    assert(row.getLong(1) === 2L) // n_grams_b
    assert(row.getLong(2) === 2L) // k_used
    assert(row.getLong(3) === 1L) // n_both
    assert(row.getLong(4) === 500L) // jaccard_milli

    val same = Dedup.corpusOverlapEstimate(b, b, "text", 3, 256).collect().head
    assert(same.getLong(3) === same.getLong(2) && same.getLong(4) === 1000L)
    val disj = Dedup.corpusOverlapEstimate(a,
      Seq((9L, "p q r")).toDF("doc_id", "text"), "text", 3, 256).collect().head
    assert(disj.getLong(3) === 0L && disj.getLong(4) === 0L)
  }

  test("corpusOverlapEstimate k bounds the sketch and the estimate is partitioning-invariant") {
    val docs = (0L until 40L)
      .map(i => (i, s"tok${i % 12} tok${(i + 1) % 12} tok${(i + 2) % 12} shared common text"))
      .toDF("doc_id", "text")
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val r1 = Dedup.corpusOverlapEstimate(a, b, "text", 3, 8).collect().head
    val r2 = Dedup.corpusOverlapEstimate(
      a.repartition(7), b.repartition(3), "text", 3, 8).collect().head
    assert(r1.toSeq === r2.toSeq)
    assert(r1.getLong(2) <= 8L)
  }

  // --- Dedup.dedupByClusterPriority ----------------------------------------

  test("dedupByClusterPriority keeps the (priority, id) argmin per cluster, singletons survive") {
    val docs = Seq(
      (1L, Some(5L)), (2L, Some(3L)), (3L, Some(3L)), // cluster {1,2,3}: tie at 3 -> id 2
      (4L, Some(1L)), // singleton
      (6L, None: Option[Long]), (7L, Some(2L)), // cluster {6,7}: non-null 2 wins
      (8L, None: Option[Long]), (9L, None: Option[Long]) // all-null cluster -> min id 8
    ).toDF("doc_id", "priority")
    val pairs = Seq((1L, 2L), (2L, 3L), (6L, 7L), (8L, 9L)).toDF("id_a", "id_b")
    val kept = Dedup.dedupByClusterPriority(docs, pairs, "doc_id", "priority")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(2L, 4L, 7L, 8L))
  }

  // --- TextStats.chunkByTokens ---------------------------------------------

  test("chunkByTokens: window/stride arithmetic, remnant kept, empty dropped") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks: chunks at 0, 4, 8
      (2L, "a b c"), // shorter than window -> one chunk
      (3L, ""), (4L, "  \t ") // no tokens -> no rows
    ).toDF("doc_id", "text")
    val out = TextStats.chunkByTokens(docs, "doc_id", "text", window = 4, stride = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getString(2), r.getLong(3))))
      .toMap
    assert(out === Map(
      (1L, 0L) -> (("t1 t2 t3 t4", 4L)),
      (1L, 1L) -> (("t5 t6 t7 t8", 4L)),
      (1L, 2L) -> (("t9 t10", 2L)), // trailing remnant
      (2L, 0L) -> (("a b c", 3L))
    ))
    // overlapping stride: 10 tokens, window 4, stride 2 -> starts 0,2,4,6
    val ov = TextStats.chunkByTokens(
      docs.filter($"doc_id" === 1L), "doc_id", "text", window = 4, stride = 2)
      .collect().map(r => (r.getLong(1), r.getString(2)))
    assert(ov.map(_._1).sorted.toSeq === Seq(0L, 1L, 2L, 3L))
    assert(ov.toMap.apply(3L) === "t7 t8 t9 t10") // exact cover, no empty chunk
  }

  // --- Dedup.duplicationHistogram ------------------------------------------

  test("duplicationHistogram rolls group sizes up; docs and removables reconcile") {
    val docs = Seq(
      (1L, "x"), (2L, "x"), (3L, "x"), // one group of 3
      (4L, "y"), (5L, "y"), // one group of 2
      (6L, "z"), (7L, "w") // two singletons
    ).toDF("doc_id", "text")
    val out = Dedup.duplicationHistogram(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out === Map(
      3L -> ((1L, 3L, 2L)),
      2L -> ((1L, 2L, 1L)),
      1L -> ((2L, 2L, 0L))
    ))
    assert(out.values.map(_._2).sum === docs.count())
  }

  // --- Dedup.exactGroupsWithProvenance -------------------------------------

  test("exactGroupsWithProvenance records the sorted distinct source set per group") {
    val docs = Seq(
      (1L, "same text", "web"), (2L, "same text", "wiki"), (3L, "same text", "web"),
      (4L, "unique", "books")
    ).toDF("doc_id", "text", "source")
    val out = Dedup.exactGroupsWithProvenance(docs, "doc_id", "text", "source")
      .select("keeper", "n_copies", "provenance")
      .as[(Long, Long, String)].collect().toSet
    assert(out === Set((1L, 3L, "web|wiki"), (4L, 1L, "books")))
  }
}
