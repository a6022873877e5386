package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The `--addRsIds` dataflow (SURVEY §2 J12; reference: VariantRsId.run,
  * VariantRsId.java:21-60): ClinVar variants ⋈ their dbSNP xrefs
  * (xdb_key=48) ⋈ the carpe-novo variant map rows → emit RS_ID updates
  * only where the stored value differs (null-safe). The reference
  * batches per-row SQL updates (K4, 999-key IN lists); here the whole
  * thing is two joins and a change filter, and the output IS the
  * batched update set.
  */
object VariantRsIdPipeline {

  def run(
      variantXdb: DataFrame,   // rgd_id, xdb_key, acc_id
      variantMap: DataFrame    // variant_id, rgd_id, rs_id (carpe VARIANT/VARIANT_MAP_DATA)
  ): DataFrame = {
    val rs = variantXdb
      .filter(col("xdb_key") === 48)
      .select(col("rgd_id"), concat(lit("rs"), col("acc_id")).as("rs_new"))
      .distinct()
    variantMap
      .join(rs, Seq("rgd_id"))
      .filter(!(col("rs_id") <=> col("rs_new")))
      .select(col("variant_id"), col("rgd_id"), col("rs_id").as("rs_old"), col("rs_new"))
  }
}
