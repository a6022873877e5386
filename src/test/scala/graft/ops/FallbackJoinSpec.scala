package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FallbackJoinSpec extends SparkSpec {
  import spark.implicits._

  private def probe = Seq(
    (1, "r1", "s1"),  // matches stage 1
    (2, "rX", "s2"),  // falls through to stage 2
    (3, "rX", "sX"),  // unmatched
    (4, "rDup", "s4") // stage-1 key is ambiguous in dim -> falls to stage 2
  ).toDF("id", "rcv", "sym")

  private def dim1 = Seq(
    ("r1", "hit1"), ("rDup", "d1"), ("rDup", "d2")
  ).toDF("rcv_key", "payload")

  private def dim2 = Seq(
    ("s2", "hit2"), ("s4", "hit4")
  ).toDF("sym_key", "payload")

  private def stages = Seq(
    FallbackJoin.Stage(dim1, Seq("rcv" -> "rcv_key"), Seq("payload" -> "out")),
    FallbackJoin.Stage(dim2, Seq("sym" -> "sym_key"), Seq("payload" -> "out")))

  test("priority cascade: stage 1 wins, remainder cascades (Dao.getVariantByRCVandName:80-127)") {
    val res = FallbackJoin(probe, stages)
      .select("id", "out", "matched_stage").as[(Int, Option[String], Int)]
      .collect().toSet
    assert(res === Set(
      (1, Some("hit1"), 1),
      (2, Some("hit2"), 2),
      (3, None, 0),
      (4, Some("hit4"), 2)))
  }

  test("uniqueOnly=false lets ambiguous dims multi-match") {
    val st = Seq(FallbackJoin.Stage(
      dim1, Seq("rcv" -> "rcv_key"), Seq("payload" -> "out"), uniqueOnly = false))
    val res = FallbackJoin(probe.filter($"id" === 4), st)
    assert(res.count() === 2) // both rDup rows
  }

  test("probe columns and row count preserved (left-join cardinality, 1 output row per probe)") {
    val res = FallbackJoin(probe, stages)
    assert(res.count() === probe.count())
    assert(res.columns.toSet === Set("id", "rcv", "sym", "out", "matched_stage"))
  }
}
