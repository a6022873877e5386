package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Normalized-name entity resolution (reference: TermNameMatcher.
  * normalizeTerm, TermNameMatcher.java:135-150): lowercase, map
  * `- , ( ) /` to spaces, split on whitespace, sort words, join with `.`.
  * Used to probe condition names against the pre-normalized ontology
  * term+synonym index (VariantAnnotator.java:512-581) and for the
  * duplicate-term QC report.
  *
  * Pure built-ins — the normalization runs on the fact side of the term
  * join, so it must stay codegen'd.
  *
  * Java-parity notes:
  *  - the reference splits on `[\s]` (keeping inner/leading empty
  *    tokens) and then joins with `Utils.concatenate`, which appends the
  *    separator only when the buffer is non-empty — appending "" leaves
  *    the buffer empty, and since empties sort FIRST they are ALL
  *    silently absorbed. Net semantics: empty tokens never appear in the
  *    output, which is what `trim` + split on `\s+` computes directly.
  *  - The T/B/NK-Cell special case (TermNameMatcher.java:141-144) guards
  *    two RDO terms falsely reported as duplicates.
  */
object NameNormalize {

  def normalizeName(c: Column): Column = {
    val special = c.contains("T Cell-") && c.contains("B Cell-") && c.contains("NK Cell-")
    val fixed = when(
      special,
      replaceAll(c, Seq("T Cell-" -> "TCell", "B Cell-" -> "BCell", "NK Cell-" -> "NKCell"))
    ).otherwise(c)
    val spaced = lower(translate(fixed, "-,()/", "     "))
    array_join(array_sort(split(trim(spaced), "[\\s]+")), ".")
  }

  private def replaceAll(c: Column, subs: Seq[(String, String)]): Column =
    subs.foldLeft(c) { case (acc, (from, to)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(from), to)
    }

  /** Strip the ` [RCV...]` suffix the parser appends to trait names
    * (reference: X15 — Parser.java:438-442 composes, VariantAnnotator.
    * java:434-438/521-525 strips before term matching).
    */
  def stripRcvSuffix(c: Column): Column =
    regexp_replace(c, " \\[RCV.*$", "")

  /** Build a normalized term index from a (term_acc, name) dimension:
    * one row per (normalized name) with the set of matching accessions —
    * the Spark analog of TermNameMatcher's in-memory multimap
    * (TermNameMatcher.java:16-127).
    */
  def termIndex(terms: org.apache.spark.sql.DataFrame, accCol: String, nameCol: String)
      : org.apache.spark.sql.DataFrame =
    terms
      .select(col(accCol).as("term_acc"), normalizeName(col(nameCol)).as("norm_name"))
      .groupBy("norm_name")
      .agg(array_sort(collect_set(col("term_acc"))).as("term_accs"))
}
