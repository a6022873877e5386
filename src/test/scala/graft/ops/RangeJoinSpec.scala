package graft.ops

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private val intervals = Seq(
    (1L, 10L, 20L, 100L), // key 1, [10, 20]
    (1L, 15L, 40L, 101L), // overlapping interval, spans cells
    (2L, 0L, 5L, 102L), // key 2
    (1L, 30L, 25L, 103L) // hi < lo -> dropped
  ).toDF("k", "lo", "hi", "iid")

  private val points = Seq(
    (1L, 10L, 200L), // boundary lo of 100 (inclusive)
    (1L, 20L, 201L), // boundary hi of 100, inside 101
    (1L, 39L, 202L), // inside 101 only, different cell than its lo
    (1L, 45L, 203L), // outside all
    (2L, 3L, 204L), // inside 102
    (3L, 10L, 205L) // key with no intervals
  ).toDF("k", "v", "pid")

  test("pointsInIntervals: exact containment, inclusive bounds, each pair once") {
    val out = RangeJoin.pointsInIntervals(
      intervals, points, "k", "lo", "hi", "v", "iid", "pid", cellSize = 16L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out.sorted === Seq(
      (100L, 200L), (100L, 201L), (101L, 201L), (101L, 202L), (102L, 204L)))
    assert(out.distinct.size === out.size, "a pair must appear exactly once")
  }

  test("pointsInIntervals equals the inequality-join reference; cell size is semantics-free") {
    val iv = (0L until 80L).map(i => (i % 5, (i * 7) % 90, (i * 7) % 90 + (i % 23), i))
      .toDF("k", "lo", "hi", "iid")
    val pt = (0L until 120L).map(i => (i % 6, (i * 11) % 113, 500L + i))
      .toDF("k", "v", "pid")
    val ref = iv.as("a").join(pt.as("b"),
      $"a.k" === $"b.k" && $"b.v" >= $"a.lo" && $"b.v" <= $"a.hi")
      .select($"a.iid", $"b.pid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Seq(1L, 8L, 64L, 1024L).foreach { cs =>
      val got = RangeJoin.pointsInIntervals(
        iv, pt, "k", "lo", "hi", "v", "iid", "pid", cellSize = cs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === ref, s"cellSize=$cs diverged from the inequality join")
    }
  }

  test("negative domains: floor-div cells keep pairs that straddle zero") {
    // truncating div folds cells -1 and 0 together: interval [-5, -1]
    // and point -3 both land in "cell 0" alongside [1, 5] / point 3,
    // but a point at -17 (true cell -2 at size 16) would be assigned
    // cell -1 and MISS interval [-20, -10] — the exact wrong-floor
    // hazard this closes
    val iv = Seq(
      (1L, -20L, -10L, 100L), // strictly negative, spans cells -2..-1
      (1L, -5L, 5L, 101L), // straddles zero
      (1L, 1L, 5L, 102L)
    ).toDF("k", "lo", "hi", "iid")
    val pt = Seq(
      (1L, -17L, 200L), // inside 100 only
      (1L, -3L, 201L), // inside 101 only
      (1L, 3L, 202L), // inside 101 and 102
      (1L, -9L, 203L) // in no interval (gap between 100 and 101)
    ).toDF("k", "v", "pid")
    Seq(1L, 7L, 16L, 64L).foreach { cs =>
      val got = RangeJoin.pointsInIntervals(
        iv, pt, "k", "lo", "hi", "v", "iid", "pid", cellSize = cs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got.sorted === Seq(
        (100L, 200L), (101L, 201L), (101L, 202L), (102L, 202L)),
        s"cellSize=$cs")
      assert(got.distinct.size === got.size, s"cellSize=$cs duplicated a pair")
    }
  }

  test("intervalOverlap: inclusive-touch semantics, each pair exactly once across cell sizes") {
    val a = Seq(
      (1L, 10L, 20L, 100L),
      (1L, 25L, 60L, 101L), // spans several cells
      (2L, 0L, 5L, 102L),
      (1L, 9L, 3L, 103L) // hi < lo -> dropped
    ).toDF("k", "a_lo", "a_hi", "aid")
    val b = Seq(
      (1L, 20L, 24L, 200L), // touches 100 at 20 exactly; misses 101 by 1
      (1L, 18L, 30L, 201L), // overlaps 100 AND 101
      (1L, 61L, 70L, 202L), // just past 101
      (1L, 0L, 100L, 203L), // engulfs everything in key 1
      (2L, 5L, 9L, 204L), // touches 102 at 5
      (3L, 0L, 9L, 205L) // key with no a rows
    ).toDF("k", "b_lo", "b_hi", "bid")
    val expected = Seq(
      (100L, 200L), (100L, 201L), (100L, 203L),
      (101L, 201L), (101L, 203L), (102L, 204L))
    Seq(1L, 4L, 16L, 256L).foreach { cs =>
      val got = RangeJoin.intervalOverlap(
        a, b, "k", "a_lo", "a_hi", "b_lo", "b_hi", "aid", "bid", cellSize = cs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got.sorted === expected, s"cellSize=$cs")
      assert(got.distinct.size === got.size,
        s"cellSize=$cs multiply-emitted a pair — emit-once cell rule broken")
    }
  }

  test("intervalOverlap equals the inequality-join reference on a generated fixture, negative domain included") {
    val a = (0L until 70L).map(i => (i % 4, (i * 13) % 120 - 60, (i * 13) % 120 - 60 + (i % 19), i))
      .toDF("k", "a_lo", "a_hi", "aid")
    val b = (0L until 90L).map(i => (i % 5, (i * 17) % 140 - 70, (i * 17) % 140 - 70 + (i % 11), 500L + i))
      .toDF("k", "b_lo", "b_hi", "bid")
    val ref = a.as("x").join(b.as("y"),
      $"x.k" === $"y.k" && $"x.a_lo" <= $"y.b_hi" && $"y.b_lo" <= $"x.a_hi")
      .select($"x.aid", $"y.bid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Seq(1L, 8L, 32L, 512L).foreach { cs =>
      val rows = RangeJoin.intervalOverlap(
        a, b, "k", "a_lo", "a_hi", "b_lo", "b_hi", "aid", "bid", cellSize = cs)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSet === ref, s"cellSize=$cs diverged from the inequality join")
      assert(rows.distinct.length === rows.length, s"cellSize=$cs duplicated a pair")
    }
  }

  test("intervalOverlap rejects colliding a/b column names") {
    val a = Seq((1L, 0L, 1L, 10L)).toDF("k", "lo", "hi", "aid")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(a, a, "k", "lo", "hi", "lo", "hi", "aid", "aid", 10L)
    }
    assert(e.getMessage.contains("disjoint"))
  }
}
