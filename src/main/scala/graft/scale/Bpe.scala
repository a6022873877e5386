package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.CacheScope

/** Byte-pair-encoding tokenizer training and encoding (Sennrich,
  * Haddow & Birch, ACL 2016 — "Neural Machine Translation of Rare
  * Words with Subword Units"), in the word-count formulation every
  * production BPE trainer uses: the corpus is read ONCE into a
  * (word, count) frame, and all merge iterations run over that frame —
  * distinct-word-sized, not corpus-sized. This is the operator a
  * pretraining shop runs before anything else touches tokens; the
  * reference pipeline has no tokenizer (its parsers split on
  * delimiters), so this extends the engine's LLM-data surface.
  *
  * Symbol representation — chosen so BOTH the merge and the oracle are
  * one engine-portable string `replace`: a word's symbol sequence is
  * kept as a single string, tokens joined by TWO spaces with one
  * leading and one trailing space (`"low"` → `" l  o  w  _ "`; `_` is
  * the end-of-word marker, safe because words are the house
  * `[a-z0-9]+` token stream). Merging pair (x, y) is then
  * `replace(sym, " x  y ", " xy ")`:
  *
  *  - the single-space anchors make token boundaries explicit, so a
  *    pair can never match inside a longer token (`" a  b "` does not
  *    match `" aa  b "`);
  *  - the DOUBLE-space join means adjacent occurrences share no
  *    characters, so one left-to-right non-overlapping `replace` pass
  *    (Java, Spark and DuckDB all scan this way — verified on the
  *    `a a a a a` run case) merges exactly the occurrences greedy
  *    left-to-right BPE merges: `" a  a  a  a  a "` →
  *    `" aa  aa  a "`, never the single-space encoding's corrupted
  *    `" aa  a  aa "` (the first match would eat the next
  *    occurrence's leading anchor).
  *
  * Scale shape: ONE corpus pass builds the word-count frame (map-side
  * partial hash agg on the token stream); each merge iteration is a
  * pair-explode + hash agg over the DISTINCT-WORD frame (bounded by
  * vocabulary, not corpus — ~10⁶ rows at 100 TB) and a 1-row
  * `TakeOrderedAndProject` argmax collected to the driver (the merge
  * table IS a driver-sized model, same contract as the streaming
  * frozen-model maps). Iteration frames are persisted re-rooted on
  * their own RDD ([[Curation]]'s `persistedCut`) so `numMerges` cache
  * layers never nest plans. Encoding is scan-pure: a chain of
  * `numMerges` codegen'd `replace`s inside one projection — no
  * shuffle, no state.
  */
object Bpe {

  /** Re-root a persisted frame on its own materialized RDD — bounds
    * plan depth at one cache layer across merge iterations (the r13
    * nested-cache plan-walk finding; see [[Curation]]). Merge loops
    * run tens of iterations, the depth this guards against.
    */
  private def persistedCut(df: DataFrame): DataFrame =
    CacheScope.persisted(
      df.sparkSession.createDataFrame(df.rdd, df.schema))

  /** End-of-word marker appended before splitting into symbols —
    * distinguishes word-final subwords ("est_" in "lowest") from
    * word-internal ones ("est" in "estimate"), the Sennrich §3.2
    * device. Outside `[a-z0-9]`, so it cannot collide with a corpus
    * character.
    */
  val EndOfWord = "_"

  /** The house token stream: lowercase `[a-z0-9]+` runs (same
    * tokenizer as [[TextStats.bigramSurprisal]] / vocab coverage).
    */
  private def tokens(textCol: Column): Column =
    regexp_extract_all(lower(textCol), lit("[a-z0-9]+"), lit(0))

  /** (w, cnt) over `docs` — the one corpus-sized pass. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Initial symbol string of a word: characters + [[EndOfWord]],
    * double-space joined, single-space padded (`"ab"` → `" a  b  _ "`).
    */
  def symInit(w: Column): Column =
    concat(lit(" "),
      rtrim(regexp_replace(concat(w, lit(EndOfWord)), "(.)", "$1  ")),
      lit(" "))

  /** One learned merge: `left`+`right` → `left+right`, with the pair's
    * corpus frequency at learn time.
    */
  final case class Merge(step: Int, left: String, right: String, cnt: Long)

  /** Apply `merges` IN LEARN ORDER to a symbol-string column — a chain
    * of literal `replace`s, one codegen'd projection.
    */
  def applyMerges(sym: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(sym) { (s, m) =>
      replace(s, lit(s" ${m.left}  ${m.right} "), lit(s" ${m.left}${m.right} "))
    }

  /** Train `numMerges` BPE merges over `docs(textCol)`; returns the
    * merge table as driver-side rows (it IS the model — tokenizer merge
    * tables are a few tens of thousands of rows at production vocab
    * sizes, the frozen-model-map contract). Ties break deterministic:
    * highest count, then (left, right) ascending — the oracle's
    * `ORDER BY c DESC, l, r LIMIT 1`. Stops early when no pair is left
    * (every word fused to a single token).
    *
    * The 1-row-per-iteration `collect` is the sanctioned driver-scalar
    * pattern: the argmax frame is cut to one row by
    * `TakeOrderedAndProject` before anything reaches the driver.
    */
  def trainMerges(docs: DataFrame, textCol: String, numMerges: Int): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var cur = persistedCut(
      wordCounts(docs, textCol).withColumn("sym", symInit(col("w"))))
    var step = 1
    while (step <= numMerges) {
      val t = split(trim(col("sym")), "  ")
      val best = cur
        .select(col("cnt"), t.as("t"))
        .filter(size(col("t")) >= 2)
        .select(col("cnt"),
          slice(col("t"), lit(1), size(col("t")) - 1).as("ls"),
          slice(col("t"), lit(2), size(col("t")) - 1).as("rs"))
        .select(col("cnt"), explode(arrays_zip(col("ls"), col("rs"))).as("p"))
        .groupBy(col("p.ls").as("l"), col("p.rs").as("r"))
        .agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect()
      if (best.isEmpty) return merges.toSeq // vocabulary fully fused
      val m = Merge(step, best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      merges += m
      cur = persistedCut(cur.withColumn("sym",
        replace(col("sym"), lit(s" ${m.left}  ${m.right} "), lit(s" ${m.left}${m.right} "))))
      step += 1
    }
    merges.toSeq
  }

  /** [[trainMerges]] as a frame: (step, pair_left, pair_right, cnt). */
  def train(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainMerges(docs, textCol, numMerges)
      .toDF("step", "pair_left", "pair_right", "cnt")
  }

  /** Encode `docs` with a trained merge table: one row per (id, piece
    * occurrence), pieces in reading order within each word. Scan-pure —
    * tokenize, init symbols, fold the merge chain, split: a single
    * projection pipeline with zero exchanges, the shape that encodes a
    * 100 TB corpus at scan speed.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame =
    docs
      .select(col(idCol), explode(tokens(col(textCol))).as("w"))
      .select(col(idCol),
        explode(split(trim(applyMerges(symInit(col("w")), merges)), "  ")).as("piece"))

  /** Corpus piece histogram under a trained merge table, top `topK` by
    * frequency (ties: piece ascending). Runs over the DISTINCT-WORD
    * frame — each word is encoded once and contributes its count, so
    * the merge-chain projection runs at vocabulary size, not corpus
    * size (the memoized form of [[encode]] for whole-corpus stats).
    */
  def pieceHistogram(docs: DataFrame, textCol: String,
      merges: Seq[Merge], topK: Int): DataFrame =
    wordCounts(docs, textCol)
      .select(col("cnt"),
        explode(split(trim(applyMerges(symInit(col("w")), merges)), "  ")).as("piece"))
      .groupBy("piece").agg(sum("cnt").as("n"))
      .orderBy(col("n").desc, col("piece").asc)
      .limit(topK)
}
