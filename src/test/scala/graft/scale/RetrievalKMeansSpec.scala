package graft.scale

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Specs for the r9 session-3 additions: inverted-index retrieval
  * (integer BM25 surrogate), quantized distributed Lloyd k-means, and
  * the per-domain adaptive quality cutoff.
  */
class RetrievalKMeansSpec extends SparkSpec {

  import spark.implicits._

  // --- Retrieval.searchTopK -------------------------------------------------

  private val corpus = Seq(
    (1L, "apple banana apple cherry"),
    (2L, "apple banana banana banana"),
    (3L, "cherry cherry cherry cherry date"),
    (4L, "elephant fig grape huckleberry iris"),
    (5L, "apple")
  ).toDF("doc_id", "text")

  test("searchTopK ranks the exact-match doc first and bounds output by k") {
    val queries = Seq((10L, "elephant fig")).toDF("query_id", "qtext")
    val out = Retrieval
      .searchTopK(corpus, queries, "doc_id", "text", "query_id", "qtext", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 'elephant'/'fig' occur only in doc 4 — one hit, rank 1
    assert(out.toSeq === Seq((10L, 1L, 4L)))
  }

  test("conjunctive searchTopK keeps only all-terms matches; OR mode keeps partials") {
    // 'apple banana': docs 1 and 2 contain both; doc 5 has apple only
    val queries = Seq((11L, "apple banana")).toDF("query_id", "qtext")
    val conj = Retrieval.searchTopK(
      corpus, queries, "doc_id", "text", "query_id", "qtext", k = 5,
      requireAllTerms = true)
      .select("doc_id").as[Long].collect().sorted.toSeq
    graft.ops.CacheScope.releaseAll()
    assert(conj === Seq(1L, 2L))
    val or = Retrieval.searchTopK(
      corpus, queries, "doc_id", "text", "query_id", "qtext", k = 5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    graft.ops.CacheScope.releaseAll()
    assert(or === Seq(1L, 2L, 5L))
    // a query with any out-of-corpus term returns nothing under AND
    val oov = Seq((12L, "apple zzznope")).toDF("query_id", "qtext")
    val strict = Retrieval.searchTopK(
      corpus, oov, "doc_id", "text", "query_id", "qtext", k = 5,
      requireAllTerms = true).collect()
    graft.ops.CacheScope.releaseAll()
    assert(strict.isEmpty)
  }

  test("searchTopK matches the hand-computed integer formula") {
    // query 'apple': df=3, N=5. postings: doc1 tf=2, doc2 tf=1, doc5 tf=1.
    // tot_tokens=19, avgdl = 19 div 5 = 3.
    val queries = Seq((7L, "apple")).toDF("query_id", "qtext")
    val out = Retrieval
      .searchTopK(corpus, queries, "doc_id", "text", "query_id", "qtext", k = 5)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toMap
    def score(tf: Long, dl: Long): Long = {
      val relMilli = (1000 * dl) / 3
      val inner = 250 + (750 * relMilli) / 1000
      val tfsat = (tf * 2200000) / (tf * 1000 + (1200 * inner) / 1000)
      val idf = (1000 * (5 - 3 + 1)) / (3 + 1)
      idf * tfsat
    }
    assert(out === Map(1L -> score(2, 4), 2L -> score(1, 4), 5L -> score(1, 1)))
    // the short all-apple doc 5 outscores the tf=1 long doc 2
    assert(out(5L) > out(2L))
  }

  test("searchTopK scores are partitioning-invariant (integer sums)") {
    val queries = Seq((1L, "apple cherry"), (2L, "banana date")).toDF("query_id", "qtext")
    val a = Retrieval
      .searchTopK(corpus, queries, "doc_id", "text", "query_id", "qtext", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val b = Retrieval
      .searchTopK(corpus.repartition(7), queries.repartition(3),
        "doc_id", "text", "query_id", "qtext", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(a === b)
  }

  // --- KMeans.lloydAssign ---------------------------------------------------

  /** Driver-side reference Lloyd on the same quantization. */
  private def refLloyd(
      vecs: Map[Long, Array[Long]], k: Int, iters: Int): Map[Long, (Long, Long)] = {
    var cent: Map[Long, Array[Long]] =
      (0L until k.toLong).map(j => j -> vecs(j)).toMap
    var asg: Map[Long, (Long, Long)] = null
    for (_ <- 1 to iters) {
      asg = vecs.map { case (id, v) =>
        val (c, d) = cent.toSeq
          .map { case (cid, cv) =>
            (cid, v.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum)
          }
          .minBy { case (cid, d) => (d, cid) }
        id -> ((c, d))
      }
      cent = asg.groupBy(_._2._1).map { case (cid, members) =>
        val ids = members.keys.toSeq
        val dims = vecs(ids.head).length
        cid -> Array.tabulate(dims) { d =>
          ids.map(vecs(_)(d)).sum / ids.size
        }
      }
    }
    asg
  }

  private def quantized(rows: Seq[(Long, Seq[Float])]): Map[Long, Array[Long]] =
    rows.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 1000).toLong + 32768L).toArray
    }.toMap

  test("df-ceiling: capped == uncapped on a Zipfian corpus (ubiquitous term scores 0 anyway)") {
    // 1200 docs; the stop term 'the' is in EVERY doc, so its integer idf
    // is exactly 0 (1000·(N−df+1) div (df+1) = 1000 div 1201 = 0) and
    // the 999‰ ceiling — which drops ONLY terms with df > 0.999·N, i.e.
    // exactly the ubiquitous one here — cannot change any score. The
    // Zipf body terms w0..w36 (df ≈ N/37) stay under every ceiling.
    val zipf = (1L to 1200L).map { i =>
      (i, s"the w${i % 37} w${i % 7} unique$i")
    }.toDF("doc_id", "text")
    val queries = Seq(
      (9001L, "the w3 w5"),
      (9003L, "the")).toDF("query_id", "qtext")
    def run(cap: Int) = Retrieval
      .searchTopK(zipf, queries, "doc_id", "text", "query_id", "qtext", k = 4,
        maxDfPermille = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val uncapped = run(1000)
    graft.ops.CacheScope.releaseAll()
    val capped = run(999)
    graft.ops.CacheScope.releaseAll()
    // mixed query: ~204 docs match a kept term with POSITIVE score, so
    // the top-4 is decided by kept terms alone — capped == uncapped,
    // scores included (the ubiquitous term added 0 to every candidate)
    assert(capped.filter(_._1 == 9001L) === uncapped.filter(_._1 == 9001L))
    assert(capped.count(_._1 == 9001L) === 4)
    // the documented recall trade, pinned: a query of ONLY capped terms
    // loses its candidates entirely (uncapped padded k rows of score 0)
    assert(uncapped.count(_._1 == 9003L) === 4)
    assert(uncapped.filter(_._1 == 9003L).forall(_._4 == 0L))
    assert(capped.count(_._1 == 9003L) === 0,
      "the ceiling must remove the ubiquitous term's postings from scoring")
  }

  test("lloydAssign matches a driver-side reference implementation") {
    val rows: Seq[(Long, Seq[Float])] = (0L until 40L).map { i =>
      val base = (i % 4).toFloat
      (i, Seq(base + i * 0.001f, -base * 0.5f + 0.002f * i, 0.1f * base))
    }
    val df = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val got = KMeans.lloydAssign(df, "vec_id", "embedding", k = 3, iters = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === refLloyd(quantized(rows), k = 3, iters = 3))
  }

  test("lloydAssign is partitioning-invariant and covers every vector once") {
    val rows: Seq[(Long, Seq[Float])] =
      (0L until 30L).map(i => (i, Seq(0.01f * i, 0.5f - 0.02f * i)))
    val df = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val a = KMeans.lloydAssign(df, "vec_id", "embedding", k = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = KMeans.lloydAssign(df.repartition(11), "vec_id", "embedding", k = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
    assert(a.map(_._1) === (0L until 30L).toSet)
  }

  test("trainedCentroids equals the reference means, dequantized, in dim order") {
    val rows: Seq[(Long, Seq[Float])] = (0L until 24L).map { i =>
      (i, Seq(0.05f * (i % 3), 0.3f - 0.01f * i, 0.002f * i))
    }
    val df = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val got = KMeans.trainedCentroids(df, "vec_id", "embedding", k = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    // reference: means over the final (iters=2) assignment
    val asg = refLloyd(quantized(rows), k = 3, iters = 2)
    val want = asg.groupBy(_._2._1).map { case (cid, members) =>
      val ids = members.keys.toSeq
      val q = quantized(rows)
      cid -> (0 until 3).map { d =>
        (ids.map(q(_)(d)).sum / ids.size - 32768L) / 1000.0
      }
    }
    assert(got === want)
  }

  test("ivfTopK == ivfTopKWithCentroids on the stride quantizer (delegation)") {
    val rows: Seq[(Long, Seq[Float])] =
      (0L until 32L).map(i => (i, Seq(0.11f * (i % 5) - 0.2f, 0.07f * (i % 7))))
    val df = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val probes = df.filter(col("vec_id") % 8 === 0)
    val a = Similarity.ivfTopK(df, probes, "vec_id", "embedding",
      k = 3, centroidStride = 4, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val cents = df.filter(col("vec_id") % 4 === 0)
      .select(col("vec_id").as("centroid_id"),
        col("embedding").cast("array<double>").as("centroid_vec"))
    val b = Similarity.ivfTopKWithCentroids(df, probes, cents, "vec_id", "embedding",
      k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a === b)
  }

  test("semDedup == semDedupWithCentroids on the stride quantizer (delegation)") {
    val rnd = new scala.util.Random(5)
    val rows: Seq[(Long, Seq[Float])] =
      (0L until 48L).map(i => (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("vec_id", "embedding")
    val a = Similarity.semDedup(df, "vec_id", "embedding", 0.3, centroidStride = 6)
      .as[Long].collect().toSet
    val cents = df.filter(col("vec_id") % 6 === 0)
      .select(col("vec_id").as("centroid_id"),
        col("embedding").cast("array<double>").as("centroid_vec"))
    val b = Similarity.semDedupWithCentroids(df, "vec_id", "embedding", 0.3, cents)
      .as[Long].collect().toSet
    assert(a === b && a.nonEmpty)
  }

  test("trained-centroid semDedup keeps min id per near-dup pair; keep list covers all clusters") {
    // planted near-dups: 2i and 2i+1 are scaled copies (cosine 1)
    val rnd = new scala.util.Random(9)
    val base = (0L until 20L).map(_ => Seq.fill(8)(rnd.nextFloat() * 2 - 1))
    val rows: Seq[(Long, Seq[Float])] = base.zipWithIndex.flatMap { case (v, i) =>
      Seq((2L * i, v), (2L * i + 1, v.map(_ * 2.0f)))
    }
    val df = rows.toDF("vec_id", "embedding")
    val keep = Similarity.semDedupWithCentroids(
      df, "vec_id", "embedding", 0.999,
      KMeans.trainedCentroids(df, "vec_id", "embedding", k = 4, iters = 2))
      .as[Long].collect().toSet
    // copies land in the same cluster (identical direction -> same argmax),
    // so every odd id loses to its even twin
    assert(keep === (0L until 40L by 2).toSet)
  }

  // --- TextStats.adaptiveQualityCutoff --------------------------------------

  test("adaptiveQualityCutoff keeps ~the top 3 quartiles per group") {
    val docs = (1L to 8L).map(i => (i, "g1", i * 10L)) ++
      (11L to 18L).map(i => (i, "g2", 1000L + i))
    val out = TextStats
      .adaptiveQualityCutoff(docs.toDF("doc_id", "source", "n_chars"),
        "doc_id", "source", "n_chars")
      .collect()
      // join on groupCol puts the key column first
      .map(r => (r.getLong(1), r.getString(0), r.getDouble(3), r.getLong(4)))
    // g1 p25 of 10..80 = 27.5 -> docs 3..8 kept; g2 analogous
    assert(out.filter(_._2 == "g1").forall(_._3 === 27.5))
    assert(out.filter(r => r._2 == "g1" && r._4 == 1L).map(_._1).sorted.toSeq
      === (3L to 8L))
    assert(out.filter(r => r._2 == "g2" && r._4 == 1L).map(_._1).sorted.toSeq
      === (13L to 18L))
  }
}
