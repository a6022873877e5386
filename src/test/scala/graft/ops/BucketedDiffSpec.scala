package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** §2.6 at scale: the DiffSync full-outer join shuffles both sides on
  * the natural key every run. For a DAILY re-run against a persistent
  * snapshot (the reference's cadence), bucketing the stored snapshot
  * (and writing the incoming batch bucketed the same way) makes the
  * merge a ZERO-SHUFFLE sort-merge join — this spec proves the plan
  * has no Exchange on either side.
  */
class BucketedDiffSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed snapshot + bucketed incoming -> shuffle-free full-outer merge") {
    val current = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val incoming = (500 to 1500).map(i => (i.toLong, s"v${i * 7}")).toDF("k", "v")
    current.write.mode("overwrite")
      .bucketBy(8, "k").sortBy("k").saveAsTable("diff_current")
    incoming.write.mode("overwrite")
      .bucketBy(8, "k").sortBy("k").saveAsTable("diff_incoming")

    val diff = DiffSync(
      spark.table("diff_incoming"), spark.table("diff_current"), Seq("k"), Seq("v"))
    val plan = diff.queryExecution.executedPlan.toString

    assert(plan.contains("SortMergeJoin"), plan.take(400))
    assert(!plan.contains("Exchange"), "bucketed merge must not shuffle:\n" + plan.take(800))

    val counts = DiffSync.counts(diff).as[(String, Long)].collect().toMap
    assert(counts("insert") === 500L) // 1001..1500
    assert(counts("delete") === 499L) // 1..499
    assert(counts("update") === 501L) // 500..1000 changed content
    spark.sql("DROP TABLE diff_current")
    spark.sql("DROP TABLE diff_incoming")
  }
}
