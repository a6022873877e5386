package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.NameNormalize

/** The `--qcDuplicateTerms[AndSynonyms]` dataflow (SURVEY §2 O2;
  * reference: TermNameMatcher.java:16-227): normalize every active term
  * name (and optionally synonyms), group by the normalized form, report
  * groups with >1 distinct accession, and pick one winner per group by
  * the 3-level rank — annotation count desc, child-term count desc,
  * parent-term count asc (TermNameMatcher.pickHigherRankedTerm:198-213).
  */
object DupTermQcPipeline {

  /** @param terms term_acc, name, annot_count, child_count, parent_count
    * @param synonyms optional (term_acc, synonym) to fold in
    */
  def run(terms: DataFrame, synonyms: Option[DataFrame] = None): DataFrame = {
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

    val ranked = dups
      .join(terms.select(col("term_acc"), col("annot_count"),
        col("child_count"), col("parent_count")), Seq("term_acc"))
      .withColumn(
        "rank",
        row_number().over(
          Window.partitionBy("norm_name")
            .orderBy(col("annot_count").desc, col("child_count").desc,
              col("parent_count").asc, col("term_acc").asc)))
    ranked.select(
      col("norm_name"), col("term_acc"), col("n_terms"), col("rank"),
      (col("rank") === 1).as("is_winner"))
  }
}
