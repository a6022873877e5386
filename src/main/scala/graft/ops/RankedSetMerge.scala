package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Ranked set-merge: union of two delimited sets ordered by a domain rank
  * instead of lexicographically — the reference's #1 domain-specific
  * operator (clinical-significance merge, QC.mergeCS, QC.java:145-224).
  *
  * Subtle reference semantics preserved:
  *  - both sides split on `\s*[,;|/]\s*` (QC.java:201);
  *  - the merged set is a TreeSet whose comparator is rank difference
  *    (QC.java:154-158), so two distinct strings with the SAME rank
  *    collapse to whichever was inserted first — in-store parts are
  *    inserted before incoming parts (QC.java:202-206);
  *  - "already contains" fast path: if the merged string equals the
  *    in-store string, no update is flagged (QC.java:210-212).
  */
object RankedSetMerge {

  /** The 31-entry clinical-significance rank table (QC.java:160-197).
    * Unknown values rank 999 (and the reference bumps a warning counter).
    */
  val ClinSigRanks: Map[String, Int] = Map(
    "pathogenic" -> 0,
    "likely pathogenic" -> 10,
    "risk factor" -> 20,
    "association" -> 30,
    "established risk allele" -> 31,
    "likely risk allele" -> 32,
    "oncogenic" -> 33,
    "affects" -> 35,
    "likely oncogenic" -> 37,
    "benign" -> 40,
    "likely benign" -> 50,
    "conflicting interpretations of pathogenicity" -> 60,
    "somatic clinical impact: tier i - strong" -> 61,
    "somatic clinical impact: tier ii - potential" -> 62,
    "somatic clinical impact: tier iii - unknown" -> 63,
    "somatic clinical impact: tier iv - benign" -> 64,
    "drug response" -> 70,
    "protective" -> 80,
    "evidence_only" -> 81,
    "confers sensitivity" -> 85,
    "uncertain risk allele" -> 87,
    "vus-high" -> 88,
    "vus-mid" -> 89,
    "uncertain significance" -> 90,
    "vus-low" -> 91,
    "low penetrance" -> 95,
    "conflicting data from submitters" -> 100,
    "association not found" -> 110,
    "no classifications from unflagged records" -> 115,
    "other" -> 120,
    "not provided" -> 2000
  )

  val UnknownRank = 999

  def clinSigRank(s: String): Int = ClinSigRanks.getOrElse(s, UnknownRank)

  /** Rank as a Column against an arbitrary rank table (broadcast as a map
    * literal — evaluated with codegen'd element_at, no UDF).
    */
  def rankOf(value: Column, ranks: Map[String, Int], unknownRank: Int = UnknownRank): Column = {
    val entries = ranks.toSeq.sortBy(_._2).flatMap { case (k, v) => Seq(lit(k), lit(v)) }
    coalesce(element_at(map(entries: _*), value), lit(unknownRank))
  }

  /** Aggregation form over atomic values: distinct values of `value`
    * ordered by rank (ties broken by the value itself to stay
    * deterministic in a distributed agg), joined by `delim`.
    * Pure built-ins: collect_set of (rank, value) structs, array_sort
    * (struct field order = sort key order), transform back to values.
    */
  def rankedMergeAgg(value: Column, ranks: Map[String, Int], delim: String = "|"): Column = {
    val ranked = struct(rankOf(value, ranks).as("r"), value.as("v"))
    concat_ws(delim, transform(array_sort(collect_set(ranked)), x => x("v")))
  }

  /** Row-level QC.mergeCS parity (QC.java:145-224): merge an incoming
    * clinical-significance list into the in-store one. Scalar UDF — the
    * same-rank-collapse + insertion-order semantics are not expressible
    * with built-ins. Used at the variant-QC merge edge only.
    */
  def mergeCS(incoming: String, inRgd: String): String = {
    if (incoming == null) return inRgd
    if (inRgd == null) return incoming
    val regex = "\\s*[,;|/]\\s*"
    // TreeMap keyed by rank = TreeSet with rank comparator; first-inserted
    // value wins per rank (TreeSet.add is a no-op on "equal" elements).
    val byRank = new java.util.TreeMap[Int, String]()
    (inRgd.split(regex) ++ incoming.split(regex)).foreach { part =>
      byRank.putIfAbsent(clinSigRank(part), part)
    }
    SetMerge.concatenate(byRank.values(), "|")
  }

  val mergeCSUdf = udf(mergeCS _)
}
