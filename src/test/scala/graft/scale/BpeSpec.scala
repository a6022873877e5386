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
}
