package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary profiling harness (not part of the library surface). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time(label: String)(f: => Long): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[profile] $label run$i rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }

    // q23 stage breakdown
    import graft.scale.Dedup
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sh = docs.select(col("doc_id").as("id"),
      explode(Dedup.shingles(col("text"), 3)).as("sh"))
    time("shingles")(sh.count())
    val sigAggs = (0 until 16).map { s =>
      min(md5(concat(lit(s"$s:"), col("sh")).cast("binary"))).as(s"h$s")
    }
    val sig = sh.groupBy("id").agg(sigAggs.head, sigAggs.tail: _*)
    time("signature")(sig.count())
    val bandKeys = (0 until 8).map { b =>
      val slice = (0 until 2).map(r => col(s"h${b * 2 + r}"))
      md5(concat(lit(s"$b:"), concat_ws(",", slice: _*)).cast("binary"))
    }
    val banded = sig.select(col("id"), explode(array(bandKeys: _*)).as("band"))
    val buckets = banded.groupBy("band").agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, 1000))
    time("buckets")(buckets.count())
    val pairs = buckets
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(filter(col("ids"), x => x > col("id_a"))).as("id_b"))
      .distinct()
    time("pairs")(pairs.count())
    val inter = pairs
      .join(sh.select(col("id").as("id_a"), col("sh")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh")), Seq("id_b", "sh"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("ni"))
    time("inter")(inter.count())
    time("full_q23")(SparkEntry.queries("q23_lsh_pairs")(spark, sfDir).count())
    spark.stop()
  }
}
