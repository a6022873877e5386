package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The `--addRsIds` dataflow (SURVEY §2 J12; reference: VariantRsId.run,
  * VariantRsId.java:21-60): ClinVar variants ⋈ their dbSNP xrefs
  * (xdb_key=48) ⋈ the carpe-novo variant map rows → emit RS_ID updates
  * only where the stored value differs (null-safe). The reference
  * batches per-row SQL updates (K4, 999-key IN lists); here the whole
  * thing is two joins, a change filter, and a per-variant winner pick,
  * and the output IS the batched update set.
  *
  * Reference parity details (VariantRsId.java:35-44):
  *   - only xrefs whose link text starts with "rs" participate
  *     (`xdb.getLinkText().startsWith("rs")`, line 36);
  *   - at most ONE update is emitted per rgd_id (`!rgdIds.contains(
  *     var.getRgdId())`, line 40) — the first differing (xref, variant)
  *     pair in DAO order wins. DAO order is not reproducible, so the
  *     deterministic analog picks the smallest (rs_new, variant_id)
  *     pair per rgd_id via a map-side-combinable min(struct) — one
  *     shuffle, no window sort.
  */
object VariantRsIdPipeline {

  def run(
      variantXdb: DataFrame,   // rgd_id, xdb_key, link_text
      variantMap: DataFrame    // variant_id, rgd_id, rs_id (carpe VARIANT/VARIANT_MAP_DATA)
  ): DataFrame = {
    val rs = variantXdb
      .filter(col("xdb_key") === 48 && col("link_text").startsWith("rs"))
      .select(col("rgd_id"), col("link_text").as("rs_new"))
    val diffs = variantMap
      .join(rs, Seq("rgd_id"))
      .filter(!(col("rs_id") <=> col("rs_new")))
    // one winner per rgd_id; (rs_new, variant_id) is unique within the
    // group (variant_id is unique in the map), so rs_old never
    // tie-breaks and the pick is total
    diffs
      .groupBy(col("rgd_id"))
      .agg(min(struct(
        col("rs_new"), col("variant_id"), col("rs_id").as("rs_old"))).as("w"))
      .select(
        col("w.variant_id").as("variant_id"),
        col("rgd_id"),
        col("w.rs_old").as("rs_old"),
        col("w.rs_new").as("rs_new"))
  }
}
