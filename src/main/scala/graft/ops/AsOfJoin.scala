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
  * key ordered by (ts, side, payload) taking the last non-null right
  * payload at or before each row. Cost = ONE shuffle on the key + one
  * in-partition sort of left+right rows — the same plan family as
  * sessionization, no join node and no aggregate at all, and every key
  * processes independently (key-count parallelism at 100 TB; a single
  * hot key degrades to its own sorted partition, the same bound any
  * per-key ordering has).
  *
  * Determinism: several right rows may share a (key, ts); "which wins"
  * is otherwise engine-dependent (DuckDB's native ASOF JOIN, the
  * oracle twin, documents the same hazard). Here the window's tertiary
  * sort on the packed payload struct makes the LAST equal-ts right row
  * the lexicographically greatest payload — exactly the max-payload
  * dedup the earlier aggregation formulation computed, without its
  * extra shuffle. Right rows order BEFORE left rows at the same
  * timestamp, so the match is inclusive (`rightTs <= leftTs`), matching
  * `ASOF LEFT JOIN ... ON l.ts >= r.ts`. Unmatched left rows keep null
  * payload columns (left-join semantics).
  */
object AsOfJoin {

  /** Single-payload convenience shape (the q111 contract): returns
    * (leftIdCol, keyCol, tsCol, asof_<rightIdCol>) — one row per left
    * row, payload = the max rightIdCol among equal-ts right rows.
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      leftIdCol: String,
      rightIdCol: String): DataFrame =
    asOfAll(left, right, keyCol, tsCol, leftIdCol, Seq(rightIdCol))

  /** FORWARD as-of — for each left row, the single EARLIEST right row
    * at or after its timestamp within the same key ("the next fill
    * after this order", "the first view after this impression"). The
    * same sweep with the timestamp sort reversed: rows at larger ts
    * process first, so the last right row before a left row in sort
    * order is the nearest ts >= leftTs; equal-ts winner and null
    * semantics exactly as [[asOfAll]] (DuckDB twin:
    * `ASOF LEFT JOIN ... ON l.ts <= r.ts`).
    */
  def asOfNext(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      leftIdCol: String,
      payloadCols: Seq[String]): DataFrame =
    asOfAll(left, right, keyCol, tsCol, leftIdCol, payloadCols, forward = true)

  /** General multi-column payload AS-OF: carries EVERY column in
    * `payloadCols` from the matched right row (price + currency +
    * venue, not just an id to join back by). Returns
    * (leftIdCol, keyCol, tsCol, asof_<c> for each payload column), one
    * row per left row; all payload columns come from the SAME winning
    * right row (struct-packed through the sweep, so they can never mix
    * across rows). Equal-ts winner = lexicographic max of
    * (payloadCols in the given order).
    */
  def asOfAll(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      leftIdCol: String,
      payloadCols: Seq[String],
      forward: Boolean = false): DataFrame = {
    require(payloadCols.nonEmpty, "payloadCols must be non-empty")
    val packed = struct(payloadCols.map(col): _*)
    // plan-time schema access only — no jobs at construction
    val rvType = right.select(packed).schema.head.dataType
    val lidType = left.schema(leftIdCol).dataType
    val r = right.select(
      col(keyCol), col(tsCol),
      lit(null).cast(lidType).as(leftIdCol),
      packed.as("rv"), lit(0).as("side"))
    val l = left.select(
      col(keyCol), col(tsCol),
      col(leftIdCol),
      lit(null).cast(rvType).as("rv"), lit(1).as("side"))
    val w = Window
      .partitionBy(keyCol)
      // rv as tertiary sort: among equal-ts right rows the max payload
      // struct lands LAST, so the sweep's last() is the deterministic
      // winner (left rows tie on null rv — their value comes from
      // preceding rows, so their relative order is irrelevant).
      // forward = the ts sort reversed: larger ts processes first, so
      // "last right row seen" = nearest ts >= leftTs
      .orderBy(
        (if (forward) col(tsCol).desc else col(tsCol).asc),
        col("side").asc, col("rv").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = l.unionByName(r)
      .withColumn("asof_rv", last(col("rv"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
    swept.select(
      col(leftIdCol) +: col(keyCol) +: col(tsCol) +:
        payloadCols.map(c => col("asof_rv").getField(c).as(s"asof_$c")): _*)
  }
}
