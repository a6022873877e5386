package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The `--clinvar2vcf` dataflow (SURVEY §3.3; reference: Clinvar2Vcf.run,
  * Clinvar2Vcf.java:25-181): per-chromosome variant extract → rs-id
  * reconciliation against dbSNP (J13) → indel left-padding
  * normalization against the reference genome (X18, S9: join to a
  * (chr,pos,base) table instead of per-row HTTP) → allele-group merge
  * (A11) → lexicographic-chromosome sort (O1) → tab-joined VCF lines
  * (K5).
  *
  * The reference parallelizes by hand over 25 chromosomes with one JDBC
  * scan each; here chromosome is just a partition-pruned filter column
  * and the whole genome flows through one plan.
  */
object Clinvar2VcfPipeline {

  /** J13: fill missing rs ids from dbSNP by exact positional key
    * (chr, pos, ref, alt) (Clinvar2Vcf.getRsIs:420-448).
    */
  def reconcileRsIds(variants: DataFrame, dbsnp: DataFrame): DataFrame =
    variants
      .join(
        dbsnp.select(
          col("chr"), col("pos"), col("ref"), col("alt"),
          col("rs_id").as("_drs")),
        Seq("chr", "pos", "ref", "alt"),
        "left")
      .withColumn("rs_id", coalesce(col("rs_id"), col("_drs")))
      .drop("_drs")

  /** X18: VCF left-padding for indels — prepend the reference base at
    * pos-1 and shift pos down (Clinvar2Vcf.normalize:205-259). The
    * reference fetches bases over HTTP one variant at a time (S9); at
    * scale the genome is a table and this is one equi join.
    */
  def normalizeIndels(variants: DataFrame, refBases: DataFrame): DataFrame = {
    val needsPad = col("var_type").isin("deletion", "insertion") &&
      (col("ref") === "" || col("alt") === "")
    // no broadcast hint: a full-genome (chr,pos,base) table is billions
    // of rows — AQE picks broadcast only when the table (or its
    // dynamically-pruned slice) actually fits
    variants
      .join(
        refBases.select(
          col("chr"), (col("pos") + 1).as("pos"), col("base").as("_pad")),
        Seq("chr", "pos"), "left")
      .withColumn("ref0", when(needsPad, concat(col("_pad"), col("ref"))).otherwise(col("ref")))
      .withColumn("alt0", when(needsPad, concat(col("_pad"), col("alt"))).otherwise(col("alt")))
      .withColumn("pos0", when(needsPad, col("pos") - 1).otherwise(col("pos")))
      .drop("ref", "alt", "pos", "_pad")
      .withColumnRenamed("ref0", "ref")
      .withColumnRenamed("alt0", "alt")
      .withColumnRenamed("pos0", "pos")
  }

  /** SNV ref-allele validation against the genome table
    * (Clinvar2Vcf.validateRef, Clinvar2Vcf.java:362-403): flag stored
    * snvs whose ref base disagrees with the reference genome
    * (`has_bad_ref`). The reference fetches a whole-chromosome FASTA
    * slice and substrings per variant; at scale the genome is a
    * (chr, pos, base) table and validation is one equi join.
    */
  def validateRef(variants: DataFrame, refBases: DataFrame): DataFrame =
    variants
      .join(
        refBases.select(col("chr"), col("pos"), col("base").as("_fasta")),
        Seq("chr", "pos"), "left")
      .withColumn(
        "has_bad_ref",
        col("var_type") === "snv" && col("_fasta").isNotNull &&
          !(col("ref") <=> col("_fasta")))
      .drop("_fasta")

  /** A11: allele-group merge — group on (chr,pos,rs,var_type), merge
    * ref/alt allele sets comma-joined with missing nucs coalesced to
    * "-" BEFORE the merge (Utils.NVL(nuc,"-"), Clinvar2Vcf.java:105-106),
    * first-row-wins for the rest (Clinvar2Vcf.groupVariants:183-203,
    * merge :102-113).
    */
  def groupAlleles(variants: DataFrame): DataFrame =
    variants
      .groupBy(col("chr"), col("pos"), col("rs_id"), col("var_type"))
      .agg(
        concat_ws(",", array_sort(collect_set(
          when(col("ref").isNull || col("ref") === "", "-").otherwise(col("ref"))))).as("ref"),
        concat_ws(",", array_sort(collect_set(
          when(col("alt").isNull || col("alt") === "", "-").otherwise(col("alt"))))).as("alt"),
        min(col("variant_id")).as("variant_id"))

  /** K5 + O1 + F11: the final VCF body — CHROM POS ID REF ALT QUAL
    * FILTER INFO, tab-joined, sorted with the reference's LEXICOGRAPHIC
    * chromosome order ("10" < "2"; Clinvar2Vcf.java:137-167). A group is
    * skipped whenever BOTH merged allele strings exceed one char —
    * commas or not (Clinvar2Vcf.java:111-114). INFO carries the
    * reference's fields: dbSNP_156 when an rs id is present, TSA=<type>,
    * E_Freq (Clinvar2Vcf.java:118-131).
    */
  def toVcfLines(grouped: DataFrame): DataFrame = {
    val hasRs = col("rs_id").isNotNull && col("rs_id") =!= ""
    grouped
      .filter(!(length(col("ref")) > 1 && length(col("alt")) > 1))
      .select(
        col("chr"), col("pos"),
        concat_ws("\t",
          col("chr"), col("pos").cast("string"),
          when(hasRs, concat(lit("rs"), col("rs_id"))).otherwise("."),
          col("ref"), col("alt"), lit("."), lit("."),
          concat(
            when(hasRs, lit("dbSNP_156;")).otherwise(lit("")),
            lit("TSA="), col("var_type"), lit(";E_Freq"))).as("line"))
      .orderBy(col("chr").asc, col("pos").asc, col("line").asc)
      .select("line")
  }

  /** Full export: normalize → reconcile → group → lines. Normalization
    * runs FIRST because dbSNP keys variants by their VCF-normalized
    * (left-padded) coordinates — reconciling raw indel coordinates
    * would miss (this is the coordinate-shift problem the reference
    * handles with its ±1 pad-shift probes, Clinvar2Vcf.java:455-717).
    * Returns the body lines in order; the caller prepends the header
    * template (Clinvar2Vcf.java:75-89) and writes with coalesce(1)
    * when a single file is required.
    */
  def run(variants: DataFrame, dbsnp: DataFrame, refBases: DataFrame): DataFrame =
    toVcfLines(groupAlleles(reconcileRsIds(normalizeIndels(variants, refBases), dbsnp)))
}
