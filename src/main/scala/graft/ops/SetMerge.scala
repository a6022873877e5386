package graft.ops

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pipe-set merge algebra.
  *
  * The reference stores multi-valued fields as `|`-separated strings and
  * merges them as `TreeSet`s — dedup + lexicographic sort
  * (reference: Record.merge, Record.java:120-143; QC.merge, QC.java:112-142;
  * NotesCollection.java:36-84; TraitNameCollection.java:38-76;
  * SubmitterCollection.java:35-74).
  *
  * All variants below are pure `org.apache.spark.sql.functions` composites
  * — codegen'd, no UDFs — so they stay inside whole-stage codegen and
  * map-side partial aggregation applies (collect_set has a partial-merge
  * implementation).
  */
object SetMerge {

  /** Aggregation: distinct values of `value`, sorted, joined by `delim`.
    * TreeSet-equivalent of Record.merge applied across a group.
    */
  def mergeSet(value: Column, delim: String = "|"): Column =
    concat_ws(delim, array_sort(collect_set(value)))

  /** Aggregation over values that are themselves `delim`-joined lists:
    * split each, flatten, dedup, sort, re-join (A1/A5-A7 across RCVs).
    */
  def mergeLists(listValue: Column, delim: String = "|"): Column = {
    val parts = split(listValue, Pattern.quote(delim))
    concat_ws(delim, array_sort(array_distinct(flatten(collect_list(parts)))))
  }

  /** Row-level merge of two pipe-lists (either may be null), TreeSet
    * semantics: union, dedup, sort. Mirrors Record.merge (Record.java:
    * 120-143) for the non-case-folding path.
    */
  def mergeTwoLists(a: Column, b: Column, delim: String = "|"): Column = {
    val pat = Pattern.quote(delim)
    val parts = filter(
      concat(
        split(coalesce(a, lit("")), pat),
        split(coalesce(b, lit("")), pat)),
      x => x =!= "")
    val merged = concat_ws(delim, array_sort(array_distinct(parts)))
    when(a.isNull && b.isNull, lit(null).cast("string")).otherwise(merged)
  }

  /** QC.merge parity (QC.java:112-142): before the TreeSet union the
    * reference deletes every case-insensitive *substring* occurrence of
    * `incoming` from `inRgd`. That substring loop has no functions._
    * equivalent, so this one path is a documented scalar UDF (per-row
    * string op at the merge edge, not in a hot scan).
    * Returns null only when both inputs are null.
    */
  def qcMergeValue(incoming: String, inRgd: String): String = {
    // empty incoming = no info, like null (the reference NVLs empties
    // away before QC; an actual "" would infinite-loop its substring-
    // delete scan, QC.java:122-127 — contains("") is always true)
    if (incoming == null || incoming.isEmpty) return inRgd
    if (inRgd == null) return incoming
    var cur = inRgd
    val incUpper = incoming.toUpperCase
    while (cur.toUpperCase.contains(incUpper)) {
      val pos = cur.toUpperCase.indexOf(incUpper)
      cur = cur.substring(0, pos) + cur.substring(pos + incoming.length)
    }
    val set = new java.util.TreeSet[String]()
    cur.split("[\\|]").foreach(set.add)
    incoming.split("\\|").foreach(set.add)
    concatenate(set, "|")
  }

  /** Exact mirror of rgdcore Utils.concatenate(Collection, sep): append
    * every element, separator only when the buffer is non-empty (so a
    * leading empty element is silently absorbed).
    */
  private[graft] def concatenate(values: java.util.Collection[String], delim: String): String = {
    val sb = new StringBuilder
    values.forEach { v =>
      if (sb.nonEmpty) sb.append(delim)
      sb.append(v)
    }
    sb.toString
  }

  val qcMergeUdf = udf(qcMergeValue _)
}
