package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
  *
  * PAYLOAD TYPE CONTRACT: because the packed payload struct is the
  * window's tertiary SORT key, every payload column must be an
  * ORDERABLE type (atomics, arrays/structs of orderables). A MapType
  * payload would fail at analysis time with an opaque sort error, so
  * [[asOfAll]] validates up front and fail-louds with the offending
  * column. Carry a map by packing it to a sorted array upstream, or
  * carry an id and join the map back after the sweep.
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
    *
    * Ergonomics (all defaults preserve the original contract):
    *
    *  - `rightTsCol` — the right side's timestamp column name when it
    *    differs from the left's (`trades.ts` vs `quotes.quote_time`);
    *    the output keeps the LEFT name. Default: same name both sides.
    *  - `tolerance` — optional max staleness: a backward match older
    *    than `tolerance` (or a forward match further ahead than it)
    *    does NOT count — its left row stays, payload nulled, exactly
    *    like no match ("the prevailing price, but no older than 5
    *    min"). Expressed as `rightTs >= leftTs - tolerance` (forward:
    *    `rightTs <= leftTs + tolerance`), so it works for numeric
    *    timestamps with a numeric literal AND for native timestamps
    *    with an interval literal. Implemented as a post-sweep filter on
    *    the matched right ts carried through the payload struct — the
    *    sweep itself stays joinless and aggregate-free (the carried ts
    *    equals the primary sort key for every tie group member, so
    *    equal-ts winner semantics are unchanged).
    *  - `emitMatchedTs` — also emit the winning right row's timestamp
    *    as `asof_<rightTsCol>` (the column a staleness AUDIT wants);
    *    off by default to keep existing output schemas stable.
    */
  def asOfAll(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      leftIdCol: String,
      payloadCols: Seq[String],
      forward: Boolean = false,
      rightTsCol: Option[String] = None,
      tolerance: Option[Column] = None,
      emitMatchedTs: Boolean = false): DataFrame = {
    require(payloadCols.nonEmpty, "payloadCols must be non-empty")
    val rtName = rightTsCol.getOrElse(tsCol)
    require(!payloadCols.contains(rtName),
      s"right timestamp column '$rtName' is carried implicitly — drop it from payloadCols")
    // fail loud on non-orderable payload types: the packed struct is
    // the window's tertiary SORT key (see the scaladoc type contract)
    payloadCols.foreach { c =>
      val dt = right.schema(c).dataType
      require(
        org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(dt),
        s"payload column '$c' has non-orderable type ${dt.simpleString}: " +
          "the payload struct is the sweep's tie-break sort key — carry an " +
          "orderable surrogate and join the value back after the sweep")
    }
    // the matched right ts rides FIRST in the struct; within an equal-ts
    // tie group it is constant, so the tie still breaks on the payload
    val packed = struct(
      (col(rtName).as("__asof_rt") +: payloadCols.map(col)): _*)
    // plan-time schema access only — no jobs at construction
    val rvType = right.select(packed).schema.head.dataType
    val lidType = left.schema(leftIdCol).dataType
    val r = right.select(
      col(keyCol), col(rtName).as(tsCol),
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
    // staleness gate: a match outside the tolerance band becomes a
    // non-match (payload nulls), never a dropped row
    val matched = tolerance match {
      case Some(tol) =>
        val rt = col("asof_rv").getField("__asof_rt")
        val inBand =
          if (forward) rt <= col(tsCol) + tol else rt >= col(tsCol) - tol
        when(col("asof_rv").isNotNull && inBand, col("asof_rv"))
      case None => col("asof_rv")
    }
    val payloadOut =
      payloadCols.map(c => matched.getField(c).as(s"asof_$c")) ++
        (if (emitMatchedTs) Seq(matched.getField("__asof_rt").as(s"asof_$rtName"))
         else Seq.empty)
    swept.select(
      col(leftIdCol) +: col(keyCol) +: col(tsCol) +: payloadOut: _*)
  }
}
