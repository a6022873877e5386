package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Closure, NameNormalize}

/** The `--qcDuplicateTerms[AndSynonyms]` dataflow (SURVEY §2 O2;
  * reference: TermNameMatcher.java:16-227): normalize every active term
  * name (and optionally synonyms), group by the normalized form, report
  * groups with >1 distinct accession, and pick one winner per group by
  * the 3-level rank — annotation count desc, child-term count desc,
  * parent-term count asc (TermNameMatcher.pickHigherRankedTerm:198-213).
  *
  * When the ontology's (child, parent) edge table is supplied, duplicate
  * pairs on the SAME branch — one term an ancestor of the other — are
  * suppressed down to the higher-ranked term, mirroring
  * `termsOnSeparateOntBranches` (TermNameMatcher.java:102-133: same
  * branch → keep the picked term only, "g1"; separate branches → keep
  * both, "g2"). Groups that shrink to one term stop being duplicates.
  */
object DupTermQcPipeline {

  /** @param terms term_acc, name, annot_count, child_count, parent_count
    * @param synonyms optional (term_acc, synonym) to fold in
    * @param dagEdges optional (child, parent) ontology edges for the
    *                 same-branch suppression (J14)
    */
  def run(
      terms: DataFrame,
      synonyms: Option[DataFrame] = None,
      dagEdges: Option[DataFrame] = None): DataFrame = {
    val names = synonyms match {
      case Some(syn) =>
        terms.select(col("term_acc"), col("name"))
          .unionByName(syn.select(col("term_acc"), col("synonym").as("name")))
      case None => terms.select(col("term_acc"), col("name"))
    }
    val normed = names
      .withColumn("norm_name", NameNormalize.normalizeName(col("name")))
      .select("term_acc", "norm_name")
      .distinct()

    val dups = normed
      .withColumn("n_terms", count(lit(1)).over(Window.partitionBy("norm_name")))
      .filter(col("n_terms") > 1)

    def rank3(df: DataFrame): DataFrame = df
      .withColumn(
        "rank",
        row_number().over(
          Window.partitionBy("norm_name")
            .orderBy(col("annot_count").desc, col("child_count").desc,
              col("parent_count").asc, col("term_acc").asc)))

    val ranked = rank3(
      dups.join(terms.select(col("term_acc"), col("annot_count"),
        col("child_count"), col("parent_count")), Seq("term_acc")))

    // J14: same-branch suppression — a lower-ranked duplicate that is an
    // ancestor/descendant of a higher-ranked term in its group loses to
    // it (TermNameMatcher.java:102-117); groups shrunk to 1 term drop out
    val surviving = dagEdges match {
      case None => ranked
      case Some(edges) =>
        val sameBranch = broadcast(Closure.sameBranchPairs(Closure.ancestors(edges)))
        val suppressed = ranked.as("a")
          .join(ranked.as("b"),
            col("a.norm_name") === col("b.norm_name") && col("a.rank") < col("b.rank"))
          .join(sameBranch,
            col("a.term_acc") === col("acc_a") && col("b.term_acc") === col("acc_b"))
          .select(col("b.norm_name").as("norm_name"), col("b.term_acc").as("term_acc"))
          .distinct()
        val kept = ranked
          .join(suppressed, Seq("norm_name", "term_acc"), "left_anti")
          .withColumn("n_terms", count(lit(1)).over(Window.partitionBy("norm_name")))
          .filter(col("n_terms") > 1)
        rank3(kept.drop("rank"))
    }

    surviving.select(
      col("norm_name"), col("term_acc"), col("n_terms"), col("rank"),
      (col("rank") === 1).as("is_winner"))
  }
}
