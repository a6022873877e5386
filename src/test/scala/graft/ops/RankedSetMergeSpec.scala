package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RankedSetMergeSpec extends SparkSpec {
  import spark.implicits._

  test("clinSigRank covers the 27-entry table + unknown fallback (QC.java:160-197)") {
    assert(RankedSetMerge.clinSigRank("pathogenic") === 0)
    assert(RankedSetMerge.clinSigRank("not provided") === 2000)
    assert(RankedSetMerge.clinSigRank("likely benign") === 50)
    assert(RankedSetMerge.clinSigRank("no such value") === RankedSetMerge.UnknownRank)
  }

  test("mergeCS: multi-delimiter split, rank-ordered union (QC.mergeCS QC.java:145-224)") {
    // in-store "benign|pathogenic", incoming adds "likely benign, drug response"
    val merged = RankedSetMerge.mergeCS("likely benign, drug response", "benign|pathogenic")
    assert(merged === "pathogenic|benign|likely benign|drug response")
  }

  test("mergeCS: same-rank collapse keeps first-inserted (in-store wins)") {
    // two unknown-rank strings collapse to the in-store one (TreeSet
    // comparator = rank difference; QC.java:154-158,202-206)
    assert(RankedSetMerge.mergeCS("zzz unknown", "aaa unknown") === "aaa unknown")
  }

  test("mergeCS: null handling") {
    assert(RankedSetMerge.mergeCS(null, "benign") === "benign")
    assert(RankedSetMerge.mergeCS("benign", null) === "benign")
  }

  test("mergeCS: already-contained incoming returns in-store unchanged (QC.java:210-212)") {
    assert(RankedSetMerge.mergeCS("benign", "benign|pathogenic") === "pathogenic|benign")
  }

  test("rankedMergeAgg: distinct values ordered by rank table") {
    val ranks = Map("high" -> 0, "mid" -> 10, "low" -> 20)
    val df = Seq(("g", "low"), ("g", "high"), ("g", "low"), ("g", "mid")).toDF("k", "v")
    val out = df.groupBy("k")
      .agg(RankedSetMerge.rankedMergeAgg($"v", ranks).as("m"))
      .as[(String, String)].collect()
    assert(out.toSeq === Seq(("g", "high|mid|low")))
  }

  test("rankedMergeAgg: unknown values rank 999 — after known, before 'not provided'-style") {
    val ranks = Map("known" -> 0, "last" -> 2000)
    val df = Seq(("g", "mystery"), ("g", "known"), ("g", "last")).toDF("k", "v")
    val out = df.groupBy("k")
      .agg(RankedSetMerge.rankedMergeAgg($"v", ranks).as("m"))
      .as[(String, String)].collect()
    assert(out.toSeq === Seq(("g", "known|mystery|last")))
  }
}
