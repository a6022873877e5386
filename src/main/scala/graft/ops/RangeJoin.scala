package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed interval joins — containment (point in interval) and
  * overlap (interval meets interval) within a key (clicks inside each
  * signup's attribution window, variants inside each gene's span,
  * session windows colliding across sources).
  *
  * Spark plans the naive inequality join as a per-key nested loop
  * (BroadcastNestedLoop / CartesianProduct — the scale-killers the
  * PlanGuard bans). This is the GRID-BUCKET formulation instead: pick a
  * cell size on the order of the maximum interval width; each interval
  * explodes to its covered cells (≤ width/cell + 1 rows — a small
  * constant by the cell-size contract), and the pair space reduces to
  * an equi-join on (key, cell) followed by the exact predicate. An
  * emit-once rule picks the single cell where a qualifying pair is
  * allowed to meet, so no dedup pass is ever needed. Cost: one
  * equi-join shuffle on slim (key, cell) rows; hot cells parallelize
  * like any hash join key.
  *
  * Domain: any long domain, including negative (timestamps before the
  * epoch, signed coordinates) — cells are assigned by exact integer
  * FLOOR division, not `div`'s truncation toward zero, which for
  * negative operands would fold cells -1 and 0 together and lose pairs.
  * Intervals with `hi < lo` are dropped.
  */
object RangeJoin {

  /** Exact floor(colName / size) for longs of either sign: SQL `div`
    * truncates toward zero, so compensate when a negative numerator
    * leaves a remainder. Integer arithmetic throughout — a
    * double-division formulation would lose precision past 2^53 (epoch
    * nanos).
    */
  private def floorDiv(name: String, size: Long): Column = {
    val q = expr(s"`$name` div ${size}L")
    when(col(name) % lit(size) < 0, q - 1).otherwise(q)
  }

  /** Returns (intervalIdCol, pointIdCol, keyCol) — one row per
    * qualifying (interval, point) pair, `lo <= v <= hi`. The point's
    * single cell is the only place a pair can meet, so every pair
    * appears EXACTLY once.
    */
  def pointsInIntervals(
      intervals: DataFrame,
      points: DataFrame,
      keyCol: String,
      loCol: String,
      hiCol: String,
      vCol: String,
      intervalIdCol: String,
      pointIdCol: String,
      cellSize: Long): DataFrame = {
    require(cellSize >= 1, s"cellSize must be >= 1, got $cellSize")
    val iv = intervals
      .select(col(keyCol), col(intervalIdCol), col(loCol), col(hiCol))
      .filter(col(hiCol) >= col(loCol))
      .withColumn("cell",
        explode(sequence(floorDiv(loCol, cellSize), floorDiv(hiCol, cellSize))))
    val pt = points
      .select(col(keyCol), col(pointIdCol), col(vCol))
      .withColumn("cell", floorDiv(vCol, cellSize))
    iv
      .join(pt, Seq(keyCol, "cell"))
      .filter(col(vCol) >= col(loCol) && col(vCol) <= col(hiCol))
      .select(col(intervalIdCol), col(pointIdCol), col(keyCol))
  }

  /** Interval-interval OVERLAP join: all (a, b) pairs with
    * `a.lo <= b.hi AND b.lo <= a.hi` (inclusive-touch) within a key.
    * Returns (aIdCol, bIdCol, keyCol) — one row per qualifying pair.
    *
    * Emit-once rule: two overlapping intervals share every cell between
    * max(lo) and min(hi), so the join would multiply-emit; the pair is
    * counted ONLY in cell floor(max(a.lo, b.lo) / cellSize). Both sides
    * are guaranteed to cover that cell — it is the later interval's own
    * lo-cell, and the earlier interval reaches it because overlap means
    * its hi crosses the later lo — so the filter is exact, not lossy.
    *
    * Cell-size contract (same as containment): cells on the order of
    * the larger side's maximum width keep the explode factor a small
    * constant; the equi-join key stays (key, cell).
    */
  def intervalOverlap(
      a: DataFrame,
      b: DataFrame,
      keyCol: String,
      aLoCol: String,
      aHiCol: String,
      bLoCol: String,
      bHiCol: String,
      aIdCol: String,
      bIdCol: String,
      cellSize: Long): DataFrame = {
    require(cellSize >= 1, s"cellSize must be >= 1, got $cellSize")
    val aCols = Set(aIdCol, aLoCol, aHiCol)
    val bCols = Set(bIdCol, bLoCol, bHiCol)
    require((aCols & bCols).isEmpty,
      s"a/b column names must be disjoint (rename one side): ${aCols & bCols}")
    val av = a
      .select(col(keyCol), col(aIdCol), col(aLoCol), col(aHiCol))
      .filter(col(aHiCol) >= col(aLoCol))
      .withColumn("cell",
        explode(sequence(floorDiv(aLoCol, cellSize), floorDiv(aHiCol, cellSize))))
    val bv = b
      .select(col(keyCol), col(bIdCol), col(bLoCol), col(bHiCol))
      .filter(col(bHiCol) >= col(bLoCol))
      .withColumn("cell",
        explode(sequence(floorDiv(bLoCol, cellSize), floorDiv(bHiCol, cellSize))))
    av
      .join(bv, Seq(keyCol, "cell"))
      .filter(
        col(aLoCol) <= col(bHiCol) && col(bLoCol) <= col(aHiCol) &&
          col("cell") === greatest(
            floorDiv(aLoCol, cellSize), floorDiv(bLoCol, cellSize)))
      .select(col(aIdCol), col(bIdCol), col(keyCol))
  }
}
