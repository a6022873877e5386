package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE tokenizer laws: hand-computed merges on the Sennrich-style
  * fixture, the greedy-run replace semantics, encode/train consistency,
  * early stop, and determinism.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // Sennrich's running example shape: "low" x5, "lower" x2, "newest" x6,
  // "widest" x3 — known first merges: (e,s) 9, then (es,t) 9, (est,_) 9...
  private def fixture = Seq(
    (1L, Array.fill(5)("low").mkString(" ")),
    (2L, Array.fill(2)("lower").mkString(" ")),
    (3L, Array.fill(6)("newest").mkString(" ")),
    (4L, Array.fill(3)("widest").mkString(" "))
  ).toDF("doc_id", "text")

  test("trainMerges learns the Sennrich example's first merges with deterministic ties") {
    val m = Bpe.trainMerges(fixture, "text", 4)
    // pair counts over {low:5, lower:2, newest:6, widest:3}:
    //   (e,s)=9, (s,t)=9, (t,_)=9, (l,o)=7, (o,w)=7, ... — count ties at 9
    //   break (left,right) ascending: (e,s) < (s,t) < (t,_)
    assert(m(0).left === "e" && m(0).right === "s" && m(0).cnt === 9L)
    // after merge 1 symbols hold "es": (es,t)=9 ties with (t,_)=9 -> es < t
    assert(m(1).left === "es" && m(1).right === "t" && m(1).cnt === 9L)
    // after merge 2: (est,_)=9 is the unique 9
    assert(m(2).left === "est" && m(2).right === "_" && m(2).cnt === 9L)
    // then (l,o)=7 vs (o,w)=7 -> l < o
    assert(m(3).left === "l" && m(3).right === "o" && m(3).cnt === 7L)
  }

  test("merge replace is greedy left-to-right on runs (double-space encoding)") {
    // word "aaaaa": symbols a a a a a _; merging (a,a) must produce
    // [aa, aa, a, _] (true BPE), not the single-space encoding's
    // corrupted [aa, a, aa, _]
    val docs = Seq((1L, "aaaaa")).toDF("doc_id", "text")
    val m = Bpe.trainMerges(docs, "text", 1)
    assert(m.head.left === "a" && m.head.right === "a" && m.head.cnt === 4L)
    val pieces = Bpe.encode(docs, "doc_id", "text", m)
      .select("piece").as[String].collect().toSeq
    assert(pieces === Seq("aa", "aa", "a", "_"))
  }

  test("a pair never matches inside a longer token") {
    // after (a,a) is a token, a later (a,b) merge must not fire on the
    // "aa b" boundary
    val docs = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    val m = Seq(Bpe.Merge(1, "a", "b", 0L))
    val pieces = Bpe.encode(docs, "doc_id", "text", m)
      .select("piece").as[String].collect().toSeq
    assert(pieces === Seq("a", "a", "_", "a", "a", "_", "ab", "_"))
  }

  test("encode pieces concatenate back to word + end marker") {
    val m = Bpe.trainMerges(fixture, "text", 6)
    val bad = Bpe.encode(
        fixture.select(col("doc_id"), col("text")), "doc_id", "text", m)
      .groupBy("doc_id").agg(concat_ws("", collect_list("piece")).as("joined"))
      .join(
        fixture.select(col("doc_id"),
          concat_ws("", transform(split(col("text"), " "),
            w => concat(w, lit("_")))).as("expected")),
        "doc_id")
      .filter(col("joined") =!= col("expected"))
    assert(bad.count() === 0L)
  }

  test("trainMerges stops early when the vocabulary is fully fused") {
    // one word "ab": merges (a,b) -> (ab,_) fuse everything in 2 steps
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val m = Bpe.trainMerges(docs, "text", 10)
    assert(m.length === 2)
    assert(m.map(x => (x.left, x.right)) === Seq(("a", "b"), ("ab", "_")))
    val pieces = Bpe.encode(docs, "doc_id", "text", m)
      .select("piece").as[String].collect().toSeq
    assert(pieces === Seq("ab_", "ab_"))
  }

  test("train is deterministic and pieceHistogram matches encode-side counts") {
    val a = Bpe.train(fixture, "text", 5).collect().toSeq
    val b = Bpe.train(fixture, "text", 5).collect().toSeq
    assert(a === b)
    val m = Bpe.trainMerges(fixture, "text", 5)
    val hist = Bpe.pieceHistogram(fixture, "text", m, topK = 100)
      .as[(String, Long)].collect().toMap
    val fromEncode = Bpe.encode(fixture, "doc_id", "text", m)
      .groupBy("piece").count().as[(String, Long)].collect().toMap
    assert(hist === fromEncode)
  }

  test("trainMergesFast == trainMerges (fixture, corpus, and early-stop parity)") {
    assert(Bpe.trainMergesFast(fixture, "text", 6) === Bpe.trainMerges(fixture, "text", 6))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(Bpe.trainMergesFast(docs, "text", 12) === Bpe.trainMerges(docs, "text", 12))
    // early stop: fully fused vocabulary ends both trainers at the same step
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    assert(Bpe.trainMergesFast(tiny, "text", 10) === Bpe.trainMerges(tiny, "text", 10))
  }

  test("trainLocal matches a naive recount-from-scratch trainer on randomized corpora") {
    // cross-checks the incremental bookkeeping (pair->count deltas,
    // pair->words index, lazy-deletion heap) against an oracle that
    // recounts every pair each step — pure local, no Spark jobs
    def naive(vocab0: Array[(Array[String], Long)], numMerges: Int): Seq[Bpe.Merge] = {
      var vocab = vocab0.map { case (s, c) => (s.clone(), c) }
      val out = scala.collection.mutable.ArrayBuffer.empty[Bpe.Merge]
      var step = 1
      while (step <= numMerges) {
        val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
        vocab.foreach { case (s, c) =>
          (0 until s.length - 1).foreach(i => counts((s(i), s(i + 1))) =
            counts.getOrElse((s(i), s(i + 1)), 0L) + c)
        }
        if (counts.isEmpty) return out.toSeq
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        out += Bpe.Merge(step, l, r, c)
        vocab = vocab.map { case (s, cnt) =>
          // greedy left-to-right non-overlapping pass
          val b = Array.newBuilder[String]; var i = 0
          while (i < s.length) {
            if (i < s.length - 1 && s(i) == l && s(i + 1) == r) { b += l + r; i += 2 }
            else { b += s(i); i += 1 }
          }
          (b.result(), cnt)
        }
        step += 1
      }
      out.toSeq
    }
    val rnd = new scala.util.Random(20260814L)
    (1 to 30).foreach { trial =>
      val alphabet = "ab" + ("cde".take(rnd.nextInt(3)))
      val vocab = Array.fill(2 + rnd.nextInt(8)) {
        val w = (0 until 1 + rnd.nextInt(6))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        ((w + Bpe.EndOfWord).map(_.toString).toArray, 1L + rnd.nextInt(5))
      }
      val merges = 1 + rnd.nextInt(12)
      val fast = Bpe.trainLocal(vocab.map { case (s, c) => (s.clone(), c) }, merges)
      val ref = naive(vocab, merges)
      assert(fast === ref, s"trial $trial vocab=${vocab.map(_._1.mkString).toSeq}")
    }
  }

  test("encodeByVocab / pieceHistogramByVocab == the replace-chain forms") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = Bpe.trainMergesFast(docs, "text", 10)
    val chain = Bpe.encode(docs, "doc_id", "text", m)
      .groupBy("doc_id", "piece").count().as[(Long, String, Long)].collect().toSet
    val vocabed = Bpe.encodeByVocab(docs, "doc_id", "text", m)
      .groupBy("doc_id", "piece").count().as[(Long, String, Long)].collect().toSet
    assert(vocabed === chain)
    assert(chain.nonEmpty)
    val h1 = Bpe.pieceHistogram(docs, "text", m, topK = 1000)
      .as[(String, Long)].collect().toSeq
    val h2 = Bpe.pieceHistogramByVocab(docs, "text", m, topK = 1000)
      .as[(String, Long)].collect().toSeq
    assert(h1 === h2)
  }

  test("FromCounts forms == the docs forms on the pre-aggregated vocabulary") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val counts = Bpe.wordCounts(docs, "text")
    val m = Bpe.trainMergesFast(docs, "text", 9)
    assert(Bpe.trainMergesFromCounts(counts, "w", "cnt", 9) === m)
    val h1 = Bpe.pieceHistogramByVocab(docs, "text", m, topK = 500)
      .as[(String, Long)].collect().toSeq
    val h2 = Bpe.pieceHistogramFromCounts(counts, "w", "cnt", m, topK = 500)
      .as[(String, Long)].collect().toSeq
    assert(h1 === h2)
    assert(h1.nonEmpty)
  }

  test("tokenCounts == per-doc encode piece counts (docs without tokens absent)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = Bpe.trainMergesFast(docs, "text", 8)
    val viaEncode = Bpe.encode(docs, "doc_id", "text", m)
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    val counts = Bpe.tokenCounts(docs, "doc_id", "text", m)
      .as[(Long, Long)].collect().toMap
    assert(counts === viaEncode)
    assert(counts.nonEmpty)
  }

  test("merge-table artifact round-trips through a frame (parquet-shaped)") {
    val m = Bpe.trainMergesFast(fixture, "text", 6)
    // shuffle row order like a parquet round-trip may; rehydration must
    // restore learn order
    val frame = Bpe.train(fixture, "text", 6).orderBy(col("pair_left"))
    assert(Bpe.mergesFromFrame(frame) === m)
    // a truncated/filtered table must fail loud, not silently re-rank
    val bad = frame.filter(col("step") =!= 3)
    val e = intercept[IllegalArgumentException](Bpe.mergesFromFrame(bad))
    assert(e.getMessage.contains("steps must be exactly"))
  }

  test("fertilityByDomain reconciles with tokenCounts and whitespace words") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = Bpe.trainMergesFast(docs, "text", 8)
    val fert = Bpe.fertilityByDomain(docs, "lang", "text", m)
      .as[(String, Long, Long, Long)].collect()
    assert(fert.nonEmpty)
    fert.foreach { case (_, nw, np, f) =>
      assert(np >= nw)                       // a word is >= 1 piece
      assert(f === np * 1000 / nw)           // integer per-mille law
      assert(f >= 1000L)
    }
    // totals reconcile with the per-doc counts
    val totalPieces = Bpe.tokenCounts(docs, "doc_id", "text", m)
      .agg(sum("n_tokens")).as[Long].head()
    assert(fert.map(_._3).sum === totalPieces)
  }

  test("applyMergesLocal keeps chain semantics where the min-rank loop diverges") {
    // homograph table: "abc" is producible by two merge paths; rank 4
    // consumes "abc" but in CHAIN order it runs before rank 5 creates
    // one. The min-rank-pair loop would fuse to "abcd_" here — the
    // library's contract (applyMerges = SQL replace chain) must not.
    val m = Seq(
      Bpe.Merge(1, "b", "c", 0), Bpe.Merge(2, "a", "b", 0),
      Bpe.Merge(3, "ab", "c", 0), Bpe.Merge(4, "abc", "d", 0),
      Bpe.Merge(5, "a", "bc", 0))
    // word "aabcd": chain -> a ab c d _ -> ... trace both forms via Spark
    val docs = Seq((1L, "aabcd")).toDF("doc_id", "text")
    val viaChain = Bpe.encode(docs, "doc_id", "text", m)
      .select("piece").as[String].collect().toSeq
    val local = Bpe.applyMergesLocal("aabcd", m).toSeq
    assert(local === viaChain)
  }

  test("deep merge loops neither nest plans nor RDD lineage (80 iterations)") {
    // regression: before the localCheckpoint cut, ~40 stacked iterations
    // overflowed the DAGScheduler's stack serializing the nested RDD
    // dependency chain (persist bounds plan depth, NOT lineage depth)
    val rnd = new scala.util.Random(7L)
    val docs = (1 to 60).map { i =>
      (i.toLong, (0 until 10).map(_ => "abcdefghij"(rnd.nextInt(10))).mkString)
    }.toSeq.toDF("doc_id", "text")
    val slow = Bpe.trainMerges(docs, "text", 80)
    assert(slow.length === 80, s"fixture fused early at ${slow.length}")
    assert(Bpe.trainMergesFast(docs, "text", 80) === slow)
  }

  test("piece-dim artifact: store round-trip, novel-word fallback, wrong-table refusal") {
    val m = Bpe.trainMergesFast(fixture, "text", 4)
    val store = java.nio.file.Files.createTempDirectory("bpe_dim_spec").toString
    Bpe.writePieceDim(store, fixture, "text", m)
    val dim = Bpe.readPieceDim(spark, store, m)
    def pieces(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    // second encode through the prebuilt dim == the self-deriving form
    assert(pieces(Bpe.encodeWithPieceDim(fixture, "doc_id", "text", m, dim)) ===
      pieces(Bpe.encodeByVocab(fixture, "doc_id", "text", m)))
    // a grown corpus: "lowest"/"newer" never reached the dim — the
    // in-row fallback must keep output identical to encodeByVocab
    val grown = fixture.union(
      Seq((5L, "lowest lowest newer")).toDF("doc_id", "text"))
    assert(pieces(Bpe.encodeWithPieceDim(grown, "doc_id", "text", m, dim)) ===
      pieces(Bpe.encodeByVocab(grown, "doc_id", "text", m)))
    // a DIFFERENT merge table's hash must refuse to resolve this dim
    val other = Bpe.trainMergesFast(fixture, "text", 2)
    assert(Bpe.mergeTableHash(other) !== Bpe.mergeTableHash(m))
    val e = intercept[IllegalArgumentException] {
      Bpe.readPieceDim(spark, store, other)
    }
    assert(e.getMessage.contains("no piece dim"))
    // publishing the second table's dim makes BOTH resolvable
    Bpe.writePieceDim(store, fixture, "text", other)
    assert(Bpe.readPieceDim(spark, store, other).count() > 0)
    assert(Bpe.readPieceDim(spark, store, m).count() > 0)
  }

  test("mergeTableDiff: empty on equal tables; prefix law; tail kinds") {
    val m = Bpe.trainMergesFast(fixture, "text", 6)
    assert(Bpe.mergeTableDiff(spark, m, m).count() === 0L)
    // mutate step 4: rows must start exactly at the divergence
    val mutated = m.updated(3, m(3).copy(left = "zz"))
    val d = Bpe.mergeTableDiff(spark, m, mutated)
      .collect().map(r => (r.getInt(0), r.getString(5)))
    assert(d.map(_._1).min === 4, "common trusted prefix = 3")
    assert(d.forall(_._2 === "changed"))
    // a truncated retrain: steps past the shorter table are only_a
    val short = m.take(4)
    val d2 = Bpe.mergeTableDiff(spark, m, short)
      .collect().map(r => (r.getInt(0), r.getString(5))).toSeq
    assert(d2 === Seq((5, "only_a"), (6, "only_a")))
    val d3 = Bpe.mergeTableDiff(spark, short, m)
      .collect().map(r => (r.getInt(0), r.getString(5))).toSeq
    assert(d3 === Seq((5, "only_b"), (6, "only_b")))
    // non-contiguous steps refuse (the mergesFromFrame law)
    intercept[IllegalArgumentException] {
      Bpe.mergeTableDiff(spark, m.drop(1), m)
    }
  }

  test("encode plan is scan-pure: no exchange, stays in whole-stage codegen") {
    val m = Bpe.trainMerges(fixture, "text", 3)
    val plan = Bpe.encode(fixture, "doc_id", "text", m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(800))
    // `*(n)` is the whole-stage-codegen marker in the executed plan's
    // string form — every operator here must carry it
    assert(plan.linesIterator.forall(l => l.trim.isEmpty ||
      l.contains("*(1)")), plan.take(800))
  }

  test("decode round-trip: decode(encodeIndexedIds) == canonical text; zero-word docs emit nothing (q178)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The QUICK brown-fox, jumps!"),
      (2L, "lowest estimate lowest"),
      (3L, "???!!!...---"), // zero words after normalization
      (4L, "a")
    ).toDF("doc_id", "text")
    val merges = Bpe.trainMergesFast(docs, "text", 12)
    val out = Bpe.decode(
      Bpe.encodeIndexedIds(docs, "doc_id", "text", merges),
      Bpe.pieceVocab(docs, "text", merges), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(
      1L -> "the quick brown fox jumps",
      2L -> "lowest estimate lowest",
      4L -> "a"),
      "round-trip reproduces the canonical token text; zero-word docs vanish")
  }
}
