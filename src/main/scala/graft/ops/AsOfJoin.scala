package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed AS-OF join — for each left row, the single most recent
  * right row at or before its timestamp within the same key (the
  * standard event-enrichment primitive: "the latest view before this
  * click", "the prevailing price at order time").
  *
  * Spark has no ASOF operator; the naive formulations are a range
  * join (O(n·m) BroadcastNestedLoop per key) or a per-left correlated
  * max — both scale-killers. This is the UNION-AND-SWEEP formulation
  * instead: tag both sides, union them, and run ONE window sweep per
  * key ordered by (ts, side) taking the last non-null right payload at
  * or before each row. Cost = one shuffle on the key + one in-partition
  * sort of left+right rows — the same plan family as sessionization,
  * no join node at all, and every key processes independently
  * (key-count parallelism at 100 TB; a single hot key degrades to its
  * own sorted partition, the same bound any per-key ordering has).
  *
  * Determinism: the right side is pre-deduplicated to ONE row per
  * (key, ts) — the max payload — because "which of several equal-ts
  * right rows wins" is otherwise engine-dependent (DuckDB's native
  * ASOF JOIN, the oracle twin, documents the same requirement). Right
  * rows order BEFORE left rows at the same timestamp, so the match is
  * inclusive (`rightTs <= leftTs`), matching `ASOF LEFT JOIN ... ON
  * l.ts >= r.ts`. Unmatched left rows keep a null payload (left-join
  * semantics).
  */
object AsOfJoin {

  /** Returns (leftIdCol, keyCol, tsCol, asof_<rightIdCol>) — one row
    * per left row.
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      leftIdCol: String,
      rightIdCol: String): DataFrame = {
    val out = s"asof_$rightIdCol"
    val r = right
      .groupBy(col(keyCol), col(tsCol))
      .agg(max(col(rightIdCol)).as("rv"))
      .select(
        col(keyCol), col(tsCol),
        lit(null).cast("long").as(leftIdCol),
        col("rv"), lit(0).as("side"))
    val l = left.select(
      col(keyCol), col(tsCol),
      col(leftIdCol),
      lit(null).cast("long").as("rv"), lit(1).as("side"))
    val w = Window
      .partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(out, last(col("rv"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col(leftIdCol), col(keyCol), col(tsCol), col(out))
  }
}
