package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SetMergeSpec extends SparkSpec {
  import spark.implicits._

  test("mergeSet: TreeSet semantics — dedup + lexicographic sort + pipe join") {
    val df = Seq(("g", "b"), ("g", "a"), ("g", "b"), ("g", "c")).toDF("k", "v")
    val out = df.groupBy("k").agg(SetMerge.mergeSet($"v").as("m")).as[(String, String)].collect()
    assert(out.toSeq === Seq(("g", "a|b|c")))
  }

  test("mergeLists: splits pipe-lists before the set union (Record.merge:120-143)") {
    val df = Seq(("g", "b|a"), ("g", "c|b")).toDF("k", "v")
    val out = df.groupBy("k").agg(SetMerge.mergeLists($"v").as("m")).as[(String, String)].collect()
    assert(out.toSeq === Seq(("g", "a|b|c")))
  }

  test("mergeTwoLists: row-level union, null passthrough") {
    val df = Seq(
      (1, Some("b|a"), Some("c")),
      (2, None, Some("x")),
      (3, Some("y"), None),
      (4, None, None)
    ).toDF("k", "a", "b")
    val out = df.select($"k", SetMerge.mergeTwoLists($"a", $"b").as("m"))
      .as[(Int, Option[String])].collect().toMap
    assert(out === Map(1 -> Some("a|b|c"), 2 -> Some("x"), 3 -> Some("y"), 4 -> None))
  }

  test("qcMergeValue: case-insensitive substring removal then TreeSet union (QC.java:112-142)") {
    // reference deletes every case-insensitive occurrence of incoming from inRgd
    assert(SetMerge.qcMergeValue("abc", "xABCy|z") === "abc|xy|z")
    assert(SetMerge.qcMergeValue(null, "a") === "a")
    assert(SetMerge.qcMergeValue("a", null) === "a")
  }

  // --- merge-algebra laws (SURVEY §5): the set merge is idempotent,
  // commutative, associative. Seeded random pipe-lists, one Spark job
  // per law, checked against a Scala-side model.
  private val rnd = new scala.util.Random(42)
  private val atoms = Vector("a", "b", "c", "dd", "e1", "zz")
  private def randList(): String =
    (0 until (1 + rnd.nextInt(4))).map(_ => atoms(rnd.nextInt(atoms.size))).mkString("|")
  private def norm(s: String): String =
    s.split("[|]").filter(_.nonEmpty).distinct.sorted.mkString("|")

  private val cases = (1 to 100).map(i => (i, randList(), randList(), randList()))

  test("law: idempotent — merge(x, x) = norm(x)") {
    val df = cases.toDF("i", "a", "b", "c")
    val out = df.select($"a", SetMerge.mergeTwoLists($"a", $"a").as("m"))
      .as[(String, String)].collect()
    out.foreach { case (a, m) => assert(m === norm(a), s"input $a") }
  }

  test("law: commutative — merge(a, b) = merge(b, a)") {
    val df = cases.toDF("i", "a", "b", "c")
    val out = df.select(
      SetMerge.mergeTwoLists($"a", $"b").as("ab"),
      SetMerge.mergeTwoLists($"b", $"a").as("ba"))
      .as[(String, String)].collect()
    out.foreach { case (ab, ba) => assert(ab === ba) }
  }

  test("law: associative + model — merge chain equals set-union model") {
    val df = cases.toDF("i", "a", "b", "c")
    val out = df.select(
      $"a", $"b", $"c",
      SetMerge.mergeTwoLists(SetMerge.mergeTwoLists($"a", $"b"), $"c").as("l"),
      SetMerge.mergeTwoLists($"a", SetMerge.mergeTwoLists($"b", $"c")).as("r"))
      .as[(String, String, String, String, String)].collect()
    out.foreach { case (a, b, c, l, r) =>
      assert(l === r)
      assert(l === norm(s"$a|$b|$c"))
    }
  }
}
