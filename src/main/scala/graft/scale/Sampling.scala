package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling: exactly `n` docs per group (fewer
  * iff the group is smaller), selected by md5 order so the same corpus
  * always yields the same sample — the "N docs per language / per
  * source" training-mix primitive.
  *
  * The semantics are `row_number() over (partition by g order by
  * md5(id), id) <= n` — but that window shuffles EVERY group's full
  * membership to a single partition each, and a per-language quota over
  * a 100 TB corpus has group cardinality ~ corpus size: one task gets
  * 30 TB. This instead runs the classic two-pass group-wise top-n, both
  * passes bounded by PARTITION size, never group size:
  *
  *   1. sort each input partition by (g, k, id) and keep the first `n`
  *      rows per group per partition (a partition's top-n for a group
  *      is a superset of that partition's contribution to the global
  *      top-n — pruning is lossless);
  *   2. shuffle the survivors — at most n·P rows per group — by g,
  *      re-sort within partitions, keep the first `n` per group and
  *      emit `sample_rank` (1-based).
  *
  * Both prune passes are single-forward-pass iterator logic over sorted
  * partitions (the sanctioned imperative boundary). Output:
  * (groupCol string, idCol long, sample_rank long).
  */
object Sampling {

  /** Leakage-safe train/val/test split: the split bucket hashes the
    * NEAR-DUP CLUSTER REPRESENTATIVE, not the document id — any two
    * documents connected by a near-dup pair share a representative
    * ([[Dedup.connectedComponents]] min-label) and therefore land in
    * the same split by construction, so eval can never contain a
    * near-copy of a training document (the classic contamination bug a
    * per-document random split invites). Singleton documents (no pair)
    * are their own representative. Deterministic: the bucket is the
    * md5 permille of the representative id, so the same corpus + pair
    * list always yields the same split.
    *
    * Scale shape: cluster formation is the CC operator (size-switched
    * driver union-find / distributed min-label); the assignment itself
    * is one left join against the pair-bounded rep frame plus per-row
    * hashing — the corpus never shuffles on anything but the id join
    * key.
    *
    * @return (idCol, rep, split) with split ∈ {train, val, test}
    */
  def leakageSafeSplit(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String,
      aCol: String,
      bCol: String,
      testPermille: Int = 100,
      valPermille: Int = 100): DataFrame =
    leakageSafeSplitWithReps(
      docs,
      Dedup.connectedComponents(pairs, aCol, bCol).withColumnRenamed("id", idCol),
      idCol, testPermille, valPermille)

  /** [[leakageSafeSplit]] over PRE-COMPUTED cluster representatives
    * (`reps` = (idCol, rep)) — shares one CC pass with other consumers
    * of the same clustering (see [[Curation.pretrainCurate]]).
    */
  def leakageSafeSplitWithReps(
      docs: DataFrame,
      reps: DataFrame,
      idCol: String,
      testPermille: Int = 100,
      valPermille: Int = 100): DataFrame = {
    require(testPermille >= 0 && valPermille >= 0 &&
      testPermille + valPermille <= 1000, "permilles must fit in [0, 1000]")
    docs
      .join(reps, Seq(idCol), "left")
      .withColumn("rep", coalesce(col("rep"), col(idCol)))
      .withColumn(
        "bucket", TextStats.hashBucket(col("rep").cast("string"), 1000))
      .withColumn(
        "split",
        when(col("bucket") < testPermille, "test")
          .when(col("bucket") < testPermille + valPermille, "val")
          .otherwise("train"))
      .select(col(idCol), col("rep"), col("split"))
  }

  def topNPerGroup(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"sample size must be >= 1, got $n")
    val spark = df.sparkSession
    import spark.implicits._
    val slim = df.select(
      col(groupCol).cast("string").as("g"),
      md5(concat(lit("strat:"), col(idCol).cast("string"))).as("k"),
      col(idCol).cast("long").as("id")).as[(String, String, Long)]

    def firstNPerGroup(it: Iterator[(String, String, Long)]): Iterator[((String, String, Long), Long)] =
      new Iterator[((String, String, Long), Long)] {
        private var curG: String = null
        private var taken = 0L
        private var nextRow: ((String, String, Long), Long) = _
        private def advance(): Unit = {
          nextRow = null
          while (nextRow == null && it.hasNext) {
            val r = it.next()
            if (r._1 != curG) { curG = r._1; taken = 0L }
            if (taken < n) { taken += 1; nextRow = (r, taken) }
          }
        }
        advance()
        override def hasNext: Boolean = nextRow != null
        override def next(): ((String, String, Long), Long) = {
          val out = nextRow; advance(); out
        }
      }

    // pass A sorts the source columns (g, k, id); the mapPartitions
    // re-tuples the schema to _1/_2/_3 for pass B
    val passA = slim
      .sortWithinPartitions("g", "k", "id")
      .mapPartitions(it => firstNPerGroup(it).map(_._1))
    passA
      .repartition(col("_1"))
      .sortWithinPartitions("_1", "_2", "_3")
      .mapPartitions(firstNPerGroup)
      .map { case ((g, _, id), rank) => (g, id, rank) }
      .toDF(groupCol, idCol, "sample_rank")
  }
}
