package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Priority-staged fallback join.
  *
  * The reference matches entities through ordered lookup cascades: variant
  * by RCV accession, else by symbol, else by name (Dao.getVariantByRCVand-
  * Name, Dao.java:80-127, called from QC.java:31-34); gene by NCBI GeneID,
  * else by symbol (GeneAssociations.qc, GeneAssociations.java:38-71);
  * condition name against term index with a 3-stage fallback
  * (VariantAnnotator.java:512-581). Stages that hit multiple rows treat
  * the probe as unmatched and fall through (warn + continue).
  *
  * Spark shape: per stage, a left join of the still-unmatched remainder
  * against the stage dimension; matched rows exit with `matched_stage` =
  * 1-based stage index, the remainder cascades on. Dimensions are
  * broadcast by default (they are small in the reference — gene/term
  * indexes), so the fact side never shuffles; the cascade costs one
  * broadcast-hash join per stage over a shrinking remainder.
  */
object FallbackJoin {

  /** One lookup stage.
    *
    * @param dim dimension table
    * @param keys probe-column -> dim-column equi-join pairs
    * @param payload dim-column -> output-column pairs carried to output
    * @param uniqueOnly multi-match = no-match (reference semantics for
    *   variant/gene matching); enforced by a pre-pass count over the dim
    * @param broadcastDim hint the dim side as broadcast
    */
  final case class Stage(
      dim: DataFrame,
      keys: Seq[(String, String)],
      payload: Seq[(String, String)],
      uniqueOnly: Boolean = true,
      broadcastDim: Boolean = true)

  val StageCol = "matched_stage"

  /** Returns all probe columns + payload output columns + `matched_stage`
    * (0 = unmatched by every stage, payload null).
    * Payload output names/types must agree across stages.
    */
  def apply(probe: DataFrame, stages: Seq[Stage]): DataFrame = {
    require(stages.nonEmpty, "at least one stage")
    val probeCols = probe.columns.toSeq
    val payloadNames = stages.head.payload.map(_._2)

    var remaining = probe
    val matched = Seq.newBuilder[DataFrame]

    stages.zipWithIndex.foreach { case (st, i) =>
      require(st.payload.map(_._2) == payloadNames,
        s"stage ${i + 1} payload names ${st.payload.map(_._2)} != $payloadNames")
      val dimKeyCols = st.keys.map(_._2)
      val uniqueDim =
        if (st.uniqueOnly) {
          val w = Window.partitionBy(dimKeyCols.map(st.dim(_)): _*)
          st.dim
            .withColumn("_g_nk", count(lit(1)).over(w))
            .filter(col("_g_nk") === 1)
            .drop("_g_nk")
        } else st.dim
      // rename dim keys to collision-free names, payload to output names
      val d0 = uniqueDim.select(
        st.keys.map { case (p, dk) => col(dk).as(s"_g_k_$p") } ++
          st.payload.map { case (src, dst) => col(src).as(dst) } :+
          lit(true).as("_g_hit"): _*)
      val d = if (st.broadcastDim) broadcast(d0) else d0
      val cond = st.keys
        .map { case (p, _) => remaining(p) === d(s"_g_k_$p") }
        .reduce(_ && _)
      val joined = remaining.join(d, cond, "left")
      matched += joined
        .filter(col("_g_hit"))
        .select(probeCols.map(col) ++ payloadNames.map(col) :+
          lit(i + 1).as(StageCol): _*)
      remaining = joined
        .filter(col("_g_hit").isNull)
        .select(probeCols.map(col): _*)
    }

    // unmatched rows: null payload, stage 0, types borrowed from stage 1
    val payloadTypes = {
      val d = stages.head.dim
      stages.head.payload.map { case (src, dst) => dst -> d.schema(src).dataType }
    }
    val unmatched = remaining.select(
      probeCols.map(col) ++ payloadTypes.map { case (dst, t) =>
        lit(null).cast(t).as(dst)
      } :+ lit(0).as(StageCol): _*)

    (matched.result() :+ unmatched).reduce(_.unionByName(_))
  }
}
