package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewToolsSpec extends SparkSpec {
  import spark.implicits._

  // heavy-tailed: 90% of rows share one key
  private def skewed = ((1 to 900).map(i => (1L, i)) ++ (1 to 100).map(i => (i.toLong % 7 + 2, i)))
    .toDF("k", "payload")
  private def small = (1L to 10L).map(k => (k, s"dim$k")).toDF("k", "dim")

  test("saltedJoin result is identical to the plain join") {
    val plain = skewed.join(small, Seq("k"))
      .select("k", "payload", "dim").as[(Long, Int, String)].collect().sorted.toSeq
    val salted = SkewTools.saltedJoin(skewed, small, Seq("k"), salt = 8)
      .select("k", "payload", "dim").as[(Long, Int, String)].collect().sorted.toSeq
    assert(salted === plain)
    assert(salted.count(_._1 == 1L) === 900)
  }

  test("saltedJoin scatters the hot key across salt sub-keys") {
    val scattered = skewed
      .withColumn("_g_salt",
        pmod(xxhash64(struct(skewed.columns.map(col).toIndexedSeq: _*)), lit(8)))
      .filter($"k" === 1L)
      .select("_g_salt").distinct().count()
    assert(scattered > 4) // hot key's rows spread over most sub-keys
  }

  test("saltedAgg: two-phase exact count equals direct aggregation") {
    val direct = skewed.groupBy("k").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val salted = SkewTools.saltedAgg(
      skewed, Seq("k"), saltBy = col("payload"), salt = 8,
      phase1 = Seq(count(lit(1)).as("pn")),
      phase2 = Seq(sum(col("pn")).as("n")))
      .as[(Long, Long)].collect().toMap
    assert(salted === direct)
  }
}
