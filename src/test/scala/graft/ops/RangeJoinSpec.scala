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
}
