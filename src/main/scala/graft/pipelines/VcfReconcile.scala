package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The ±1 pad-shift reconciliation handler set — the Spark shape of the
  * reference's dev-mode sweep comparing an external ClinVar VCF against
  * the store (Clinvar2Vcf.fixRefAndAllele, Clinvar2Vcf.java:455-717).
  *
  * Per VCF line, routed on its CLNVC class:
  *  - snv (1-char ref+alt): probe the store at (chr, pos); a stored snv
  *    whose ref base DISAGREES is repaired (handleSnv :560-596 — emitted
  *    here on the `snvUpdates` frame instead of a JDBC update); else
  *    allele-match / '.' / not-in-rgd counters.
  *  - deletion (1-char allele): the store keeps UNPADDED alleles, so the
  *    probe shifts to pos+1 and strips the padding base from REF
  *    (handleDel :598-634); snv/insertion store rows are excluded.
  *  - insertion/duplication (1-char ref): pos+1, padding stripped from
  *    ALT, stored ref must be "-" (handleIns :636-670; NB the reference
  *    initializes its match flag to TRUE, so any non-empty candidate
  *    list counts as a match — mirrored faithfully).
  *  - microsatellite: re-routed to deletion or insertion by allele
  *    shape (:526-541), with its own counters.
  *  - indel / inversion: counted unhandled (:671-686, :697-700).
  *  - variation: counted when allele is '.' (:688-695).
  *
  * The reference walks the VCF line-at-a-time with a per-line store
  * query; here every handler is one (chr, pos)-keyed join over the
  * whole file.
  */
object VcfReconcile {

  final case class Result(
      classified: DataFrame, // chr, pos, counter (one row per VCF line)
      counters: DataFrame,   // counter, n
      snvUpdates: DataFrame) // rgd_id, ref, allele (the repair batch)

  /** @param vcf   chr, pos, ref, alt, var_class (CLNVC value), rs_id
    * @param store chr, pos, rgd_id, var_type, ref_nuc, var_nuc
    */
  def run(vcf: DataFrame, store: DataFrame): Result = {
    // microsatellite re-route by allele shape (Clinvar2Vcf.java:526-541)
    val routed = vcf.withColumn(
      "route",
      when(col("var_class") === "single_nucleotide_variant" &&
        length(col("ref")) === 1 && length(col("alt")) === 1, "snv")
        .when(col("var_class").isin("Insertion", "Duplication") &&
          length(col("ref")) === 1, "ins")
        .when(col("var_class") === "Deletion" && length(col("alt")) === 1, "del")
        .when(col("var_class") === "Microsatellite" &&
          length(col("alt")) === 1 && length(col("ref")) > 1, "ms_del")
        .when(col("var_class") === "Microsatellite" &&
          length(col("alt")) > 1 && length(col("ref")) === 1, "ms_ins")
        .when(col("var_class") === "Inversion", "inversion")
        .when(col("var_class") === "Indel", "indel")
        .when(col("var_class") === "Variation", "variation")
        .otherwise("unhandled"))

    val s = store.select(
      col("chr").as("s_chr"), col("pos").as("s_pos"), col("rgd_id"),
      col("var_type"), col("ref_nuc"), col("var_nuc"))

    // ONE probe join for all five store-probing routes: the probe key is
    // (chr, pos) for snvs and (chr, pos+1) for the pad-shifted indel
    // routes, and each route's store-side type exclusions become a
    // participation predicate inside the aggregate — the store shuffles
    // once, not once per handler.
    val probes = routed
      .filter(col("route").isin("snv", "del", "ms_del", "ins", "ms_ins"))
      .withColumn(
        "probe_pos",
        when(col("route") === "snv", col("pos")).otherwise(col("pos") + 1))
    val participates =
      when(col("route") === "snv", col("var_type") === "snv")
        .when(col("route").isin("del", "ms_del"),
          !col("var_type").isin("snv", "insertion"))
        .otherwise(col("var_type") =!= "snv")
    val agg = probes
      .join(s, col("chr") === col("s_chr") && col("probe_pos") === col("s_pos"), "left")
      .groupBy("route", "chr", "pos", "ref", "alt")
      .agg(
        count(when(participates, col("rgd_id"))).as("n_store"),
        // snv: the FIRST disagreeing stored snv gets repaired (break after one)
        min(when(col("route") === "snv" && participates &&
          col("ref_nuc") =!= col("ref"), col("rgd_id"))).as("bad_rgd_id"),
        max(when(col("route") === "snv" && participates &&
          col("var_nuc") === col("alt"), lit(1)).otherwise(lit(0))).as("allele_match"),
        max(when(col("route").isin("del", "ms_del") && participates &&
          expr("substring(ref, 2)") === col("ref_nuc") &&
          col("var_nuc").startsWith("-"), lit(1)).otherwise(lit(0))).as("del_match"))

    val prefix = when(col("route") === "del", "deletion")
      .when(col("route") === "ms_del", "ms-deletion")
      .when(col("route") === "ins", "insertion")
      .otherwise("ms-insertion")
    val probeClassified = agg.select(
      col("chr"), col("pos"),
      when(col("route") === "snv",
        when(col("n_store") === 0, "clinvar snv - not in rgd")
          .when(col("bad_rgd_id").isNotNull, "clinvar snv - updated")
          .when(col("allele_match") === 1, "clinvar snv matches rgd")
          .when(col("alt") === ".", "clinvar snv - allele is '.'")
          .otherwise("clinvar snv - allele not in rgd"))
        .when(col("route").isin("del", "ms_del"),
          when(col("n_store") === 0, concat(lit("clinvar "), prefix, lit(" not in rgd")))
            .when(col("del_match") === 1, concat(lit("clinvar "), prefix, lit(" matches rgd")))
            .otherwise(concat(lit("clinvar "), prefix, lit(" does not match rgd"))))
        // insertion match flag starts TRUE in the reference: any
        // non-empty candidate list counts as a match
        .otherwise(
          when(col("n_store") === 0, concat(lit("clinvar "), prefix, lit(" not in rgd")))
            .otherwise(concat(lit("clinvar "), prefix, lit(" matches rgd"))))
        .as("counter"))
    val snvUpdates = agg
      .filter(col("route") === "snv" && col("bad_rgd_id").isNotNull)
      .select(col("bad_rgd_id").as("rgd_id"), col("ref"), col("alt").as("allele"))

    val passthrough = routed
      .filter(col("route").isin("inversion", "indel", "variation", "unhandled"))
      .select(
        col("chr"), col("pos"),
        when(col("route") === "inversion", "clinvar inversion -- not handled")
          .when(col("route") === "indel", "clinvar indel -- not handled")
          .when(col("route") === "variation" && col("alt") === ".",
            "clinvar variation - allele is '.'")
          .otherwise("unhandled").as("counter"))

    val classified = probeClassified.unionByName(passthrough)

    val counters = classified.groupBy("counter").agg(count(lit(1)).as("n"))

    Result(classified, counters, snvUpdates)
  }
}
