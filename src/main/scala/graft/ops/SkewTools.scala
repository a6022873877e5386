package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed.
  *
  * AQE's skew-join handling (on by default) splits oversized shuffle
  * partitions at runtime, which covers most cases; explicit salting is
  * the deterministic fallback when one side can be replicated — e.g. a
  * hot chromosome in a positional join, or a degenerate normalized name
  * matching millions of rows.
  *
  * `saltedJoin`: scatter the skewed side across `salt` sub-keys with a
  * uniform hash of the whole row, replicate the small side once per
  * sub-key, and join on (key, salt). Each hot key's rows now land in
  * `salt` different shuffle partitions instead of one. Result set is
  * identical to the unsalted join (verified by spec).
  */
object SkewTools {

  /** Inner equi-join of `skewed` (large, hot keys) with `small`
    * (replicable) on `keys`, scattered over `salt` sub-partitions.
    */
  def saltedJoin(
      skewed: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salt: Int = 16): DataFrame = {
    require(salt >= 1)
    val scattered = skewed.withColumn(
      "_g_salt",
      pmod(xxhash64(struct(skewed.columns.map(col).toIndexedSeq: _*)), lit(salt)))
    val replicated = small
      .withColumn("_g_salt", explode(array((0 until salt).map(lit(_)): _*)))
    scattered
      .join(replicated, keys :+ "_g_salt")
      .drop("_g_salt")
  }

  /** Two-phase aggregation under an explicit salt for NON-algebraic
    * aggregations (e.g. exact distinct counts over a hot key). Algebraic
    * aggs (sum/min/collect_set) already partial-merge map-side and do
    * not need this.
    *
    * Phase 1 aggregates per (key, salt); `phase2` must re-aggregate the
    * phase-1 partials to the final value.
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltBy: Column,
      salt: Int,
      phase1: Seq[Column],
      phase2: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_g_salt", pmod(xxhash64(saltBy), lit(salt)))
    salted
      .groupBy((keys :+ "_g_salt").map(col): _*)
      .agg(phase1.head, phase1.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(phase2.head, phase2.tail: _*)
  }
}
