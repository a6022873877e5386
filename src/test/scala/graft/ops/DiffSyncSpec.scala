package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DiffSyncSpec extends SparkSpec {
  import spark.implicits._

  private def incoming = Seq(
    (1, "a"),  // unchanged vs current -> match
    (2, "B"),  // changed -> update
    (4, "d")   // new -> insert
  ).toDF("k", "v")

  private def current = Seq(
    (1, "a"),
    (2, "b"),
    (3, "c")   // gone -> delete
  ).toDF("k", "v")

  test("4-way classification (insert/update/delete/match)") {
    val diff = DiffSync(incoming, current, Seq("k"), Seq("v"))
    val byKey = diff.select("k", "action").as[(Int, String)].collect().toMap
    assert(byKey === Map(1 -> "match", 2 -> "update", 3 -> "delete", 4 -> "insert"))
  }

  test("update rows carry both new and old content") {
    val diff = DiffSync(incoming, current, Seq("k"), Seq("v"))
    val upd = diff.filter($"action" === "update").select("k", "v", "v_old")
      .as[(Int, String, String)].collect().toSeq
    assert(upd === Seq((2, "B", "b")))
  }

  test("null-safe content compare: null vs null is a match") {
    val inc = Seq((1, Option.empty[String])).toDF("k", "v")
    val cur = Seq((1, Option.empty[String])).toDF("k", "v")
    val diff = DiffSync(inc, cur, Seq("k"), Seq("v"))
    assert(diff.select("action").as[String].collect().toSeq === Seq("match"))
  }

  test("guardDeletes downgrades deletes above the ceiling (Dao.java:409-436 semantics)") {
    // 1 delete out of 3 current rows = 33% > 8% -> keep_stale
    val diff = DiffSync(incoming, current, Seq("k"), Seq("v"))
    val guarded = DiffSync.guardDeletes(diff, 0.08)
    val actions = guarded.groupBy("action").count().as[(String, Long)].collect().toMap
    assert(actions === Map("match" -> 1L, "update" -> 1L, "insert" -> 1L, "keep_stale" -> 1L))
  }

  test("guardDeletes passes deletes under the ceiling") {
    val diff = DiffSync(incoming, current, Seq("k"), Seq("v"))
    val guarded = DiffSync.guardDeletes(diff, 0.5) // 33% < 50%
    assert(guarded.filter($"action" === "delete").count() === 1)
  }

  test("guardDeletesBy uses the NET basis: inserts offset deletes (Dao.java:705-708)") {
    // group A: 3 deletes, 3 inserts, 10 pre-run rows -> net 0 <= 0.5
    //   -> deletes PROCEED even though raw stale (30%) is over 5%
    // group B: 3 deletes, 0 inserts, 10 pre-run rows -> net 3 > 0.5
    //   -> keep_stale
    def rows(g: String, nDel: Int, nIns: Int) =
      (1 to 7).map(i => (g, s"$g-m$i", "match")) ++
        (1 to nDel).map(i => (g, s"$g-d$i", "delete")) ++
        (1 to nIns).map(i => (g, s"$g-i$i", "insert"))
    val diff = (rows("A", 3, 3) ++ rows("B", 3, 0)).toDF("aspect", "k", "action")
    val out = DiffSync.guardDeletesBy(diff, Seq("aspect"), 0.05)
      .groupBy("aspect", "action").count()
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out.getOrElse(("A", "delete"), 0L) === 3L)
    assert(out.getOrElse(("A", "keep_stale"), 0L) === 0L)
    assert(out.getOrElse(("B", "keep_stale"), 0L) === 3L)
    assert(out.getOrElse(("B", "delete"), 0L) === 0L)
  }

  test("nextSnapshot applies inserts/updates and drops deletes, keeps guarded rows") {
    val diff = DiffSync.guardDeletes(DiffSync(incoming, current, Seq("k"), Seq("v")), 0.08)
    val next = DiffSync.nextSnapshot(diff, Seq("k"), Seq("v"))
    val m = next.as[(Int, String)].collect().toMap
    // insert 4->d, update 2->B, match 1->a, keep_stale 3 keeps OLD value c
    assert(m === Map(1 -> "a", 2 -> "B", 3 -> "c", 4 -> "d"))
  }
}
