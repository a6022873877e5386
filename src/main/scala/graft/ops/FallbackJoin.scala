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
  * Spark shape: ONE pass over the probe through a chain of left
  * broadcast joins (one per stage), then a priority coalesce — the
  * first stage that hit supplies the payload and the stage index.
  * The probe scans once regardless of stage count; each stage dim is
  * broadcast (they are small in the reference — gene/term indexes), so
  * no stage shuffles the fact side. (A remainder-cascade formulation —
  * filter misses, rejoin, union — reads the probe once PER STAGE and
  * triples the scan cost at 3 stages; `.explain` on the driver's
  * testdata showed exactly that, which is why this is a single chain.)
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

    var joined = probe
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
      // rename dim keys/payload to per-stage collision-free names
      val d0 = uniqueDim.select(
        st.keys.map { case (p, dk) => col(dk).as(s"_g_k${i}_$p") } ++
          st.payload.map { case (src, dst) => col(src).as(s"_g_p${i}_$dst") } :+
          lit(true).as(s"_g_hit$i"): _*)
      val d = if (st.broadcastDim) broadcast(d0) else d0
      val cond = st.keys
        .map { case (p, _) => joined(p) === d(s"_g_k${i}_$p") }
        .reduce(_ && _)
      joined = joined.join(d, cond, "left")
    }

    val hit = (i: Int) => col(s"_g_hit$i").isNotNull
    // first-HIT-stage wins (not first non-null payload: a matched stage
    // with a null payload value must not fall through to later stages)
    val payloadOut = payloadNames.map { name =>
      stages.indices
        .foldRight(lit(null).cast(stages.head.dim.schema(
          stages.head.payload.find(_._2 == name).get._1).dataType)) { (i, rest) =>
          when(hit(i), col(s"_g_p${i}_$name")).otherwise(rest)
        }
        .as(name)
    }
    val stageOut = stages.indices
      .foldRight(lit(0)) { (i, rest) => when(hit(i), lit(i + 1)).otherwise(rest) }
      .as(StageCol)
    joined.select(probeCols.map(col) ++ payloadOut :+ stageOut: _*)
  }
}
