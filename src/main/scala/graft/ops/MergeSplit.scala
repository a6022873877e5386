package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Group-merge-split: the annotation post-processing chain
  * (reference: AnnotCache.mergeIncomingAnnots1/2, AnnotCache.java:92-134 /
  * 169-211; splitAnnots/splitAnnots2, AnnotCache.java:136-167 / 213-244).
  *
  * Phase 1 groups annotations on a 9-part natural key and set-merges
  * XREF_SOURCE (split on `[|,;]`) and NOTES (split on ` | `); rows whose
  * merged XREF_SOURCE exceeds 4000 chars are split back into multiple
  * rows at the last `|` before the limit. Phase 2 repeats with the key
  * including xref_source and WITH_INFO merged (1700-char limit).
  *
  * Spark shape: groupBy().agg(set-merge) then explode(chunked) — the
  * chunker is a scalar function producing an array, exploded by the
  * built-in generator; no custom Generator needed (SURVEY §2.10.3).
  */
object MergeSplit {

  /** Exact mirror of AnnotCache.splitAnnots (AnnotCache.java:136-160):
    * while the value is longer than `maxLen`, cut at the LAST `sep` at
    * index <= maxLen and continue on the remainder. The remainder (the
    * original annot) keeps the tail; split-off heads are emitted first.
    * A value with no separator inside the window would loop forever in
    * the reference; we mirror the happy path and hard-cut as a guard.
    */
  def chunkBySeparator(value: String, maxLen: Int, sep: String): Array[String] = {
    if (value == null) return null
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var rest = value
    while (rest.length > maxLen) {
      val splitPos = rest.lastIndexOf(sep, maxLen)
      if (splitPos <= 0) {
        // degenerate: no separator in window — hard cut (reference would
        // spin; never happens on `|`-merged accumulators)
        out += rest.substring(0, maxLen)
        rest = rest.substring(maxLen)
      } else {
        out += rest.substring(0, splitPos)
        rest = rest.substring(splitPos + sep.length)
      }
    }
    out += rest
    out.toArray
  }

  def chunkUdf = udf(chunkBySeparator _)

  def chunked(c: Column, maxLen: Int, sep: String = "|"): Column =
    chunkUdf(c, lit(maxLen), lit(sep))

  /** groupBy(key).agg(set-merge of mergeCols) then explode oversize
    * `splitCol` into chunks — one call = one reference merge+split phase.
    *
    * Scale shape: each merge column is exploded to scalar (key, token)
    * rows and deduped BEFORE the collect, so the shuffles carry distinct
    * scalars with map-side partial aggregation — never whole merged
    * arrays (the array-carrying formulation was the bench's worst
    * regression: per-key arrays rode the exchange and were distinct'd
    * post-shuffle). Multiple merge columns aggregate independently and
    * rejoin on the key, which reuses the groupBy's hash partitioning
    * (no extra exchange).
    *
    * @param mergeCols output-name -> (source column, intra-value split
    *   regex, join delimiter)
    */
  def mergeThenSplit(
      df: DataFrame,
      keyCols: Seq[String],
      mergeCols: Map[String, (Column, String, String)],
      splitCol: String,
      maxLen: Int,
      chunkSep: String = "|"): DataFrame = {
    val keys = keyCols.map(col)
    val merged = mergeCols.toSeq
      .map { case (out, (src, splitRegex, delim)) =>
        // explode_outer keeps keys whose source is all-null (collect_list
        // then skips the null token → empty merge, as before)
        // ONE exchange: collect_set over exploded scalars dedups in the
        // map-side partial, so the shuffle carries one deduped set per
        // (key, partition) — strictly smaller than the final array
        // (the distinct-then-collect formulation paid a second exchange)
        // Trailing separators are stripped BEFORE the split: Spark's
        // split keeps trailing empty tokens, Java's String.split (the
        // reference, AnnotCache.java:183) drops them — without the strip
        // a value ending in a separator grows a leading '|' after the
        // sort+rejoin. Interior empties stay, exactly as in Java.
        df.select(keys :+ explode_outer(
          split(regexp_replace(src, splitRegex + "+$", ""), splitRegex)).as("_tok"): _*)
          .groupBy(keys: _*)
          .agg(concat_ws(delim, array_sort(collect_set(col("_tok")))).as(out))
      }
      .reduce { (a, b) =>
        // NULL-SAFE key equality: a plain equi-join would silently drop
        // groups whose key contains null (both sides share the key
        // partitioning from their groupBys, so this adds no exchange)
        val b2 = keyCols.foldLeft(b)((d, k) => d.withColumnRenamed(k, "_r_" + k))
        val cond = keyCols.map(k => col(k) <=> col("_r_" + k)).reduce(_ && _)
        a.join(b2, cond).drop(keyCols.map("_r_" + _): _*)
      }
    merged
      .withColumn(splitCol, explode(chunked(col(splitCol), maxLen, chunkSep)))
  }
}
