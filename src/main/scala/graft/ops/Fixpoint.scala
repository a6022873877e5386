package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative fixpoint resolution over a substitution table — the Spark
  * shape of the reference's recursive obsolete-SO-term substitution
  * (reference: Dao.validateSoAccId, Dao.java:542-574: replaced_by
  * chains are followed until a non-obsolete term is reached) and of
  * ontology-ancestry closure probes (TermNameMatcher.java:129-133).
  *
  * Like [[Closure]], two paths switched on table size: substitution
  * dims are ontology-sized, so up to `driverThreshold` rows the chains
  * are followed on the driver with one memoized walk (milliseconds);
  * above it, distributed pointer jumping — substitute through the
  * PARTIALLY-RESOLVED table, not the raw edges, so a chain of length L
  * converges in O(log L) broadcast-join rounds. Either way the 100 TB
  * fact table never iterates: it joins the FINAL materialized map.
  */
object Fixpoint {

  /** Resolve every `oldCol` to the end of its substitution chain.
    * Returns (old_id, resolved_id). Cycles throw.
    *
    * @param driverThreshold row count up to which the dim-sized driver
    *        path runs; pass 0 to force distributed pointer jumping
    */
  def resolve(
      subs: DataFrame,
      oldCol: String,
      newCol: String,
      maxRounds: Int = 20,
      driverThreshold: Long = 2000000L): DataFrame = {
    // distinct first so both paths agree on row multiplicity for inputs
    // carrying duplicate substitution rows (same idiom as Closure/Dedup)
    val edges = subs.select(col(oldCol).as("old_id"), col(newCol).as("resolved_id")).distinct()
    val n0 = edges.count()
    if (n0 <= driverThreshold) return driverResolve(edges)
    val spark = subs.sparkSession
    // rounds are re-rooted on their own locally-checkpointed RDD: a
    // plain-persisted round embeds the previous round's plan and
    // references it twice (cur + jump), the 2^rounds plan-walk /
    // lineage-stacking class the CC chain-graph probe OOM'd on (see
    // Dedup.connectedComponents / MEMORY_NOTES r13)
    def cutRound(df: DataFrame)
        : (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
      val r = df.rdd
      r.localCheckpoint()
      (spark.createDataFrame(r, df.schema), r)
    }
    var (cur, curRdd) = cutRound(edges)
    var round = 0
    var changed = true
    while (changed) {
      if (round >= maxRounds) {
        curRdd.unpersist(blocking = false) // no cache leak on the failure path
        throw new IllegalStateException(
          s"fixpoint did not converge after $maxRounds rounds (cycle in substitutions?)")
      }
      // pointer jumping: follow resolved_id through the current table
      val jump = cur.select(col("old_id").as("j_old"), col("resolved_id").as("j_new"))
      val joined = cur
        .join(broadcast(jump), cur("resolved_id") === col("j_old"), "left")
        .persist()
      changed = joined.filter(col("j_new").isNotNull).limit(1).count() > 0
      val (next, nextRdd) = cutRound(joined
        .select(col("old_id"), coalesce(col("j_new"), col("resolved_id")).as("resolved_id")))
      next.count() // materialize the cut before unpersisting parents
      curRdd.unpersist(blocking = false)
      joined.unpersist()
      cur = next
      curRdd = nextRdd
      round += 1
    }
    // returned frame scans the cached final-round RDD; released by the
    // query driver's CacheScope (terminal — see registerRdd's caveat)
    CacheScope.registerRdd(curRdd)
    cur
  }

  /** Dim-sized path: collect the substitution map, follow every chain
    * once with memoization (path compression), parallelize the resolved
    * map back. Cycles throw like the distributed path's round cap.
    */
  private def driverResolve(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    val pairs = edges.collect().map(r => (r.get(0), r.get(1)))
    val next = new scala.collection.mutable.HashMap[Any, Any]()
    pairs.foreach { case (o, n) => next(o) = n }
    val resolved = new scala.collection.mutable.HashMap[Any, Any]()
    next.keysIterator.foreach { start =>
      if (!resolved.contains(start)) {
        val path = new scala.collection.mutable.ArrayBuffer[Any]()
        val onPath = new scala.collection.mutable.HashSet[Any]()
        var cur: Any = start
        while (next.contains(cur) && !resolved.contains(cur)) {
          if (onPath.contains(cur))
            throw new IllegalStateException(
              "fixpoint found a cycle in the substitutions at " + cur)
          path += cur
          onPath += cur
          cur = next(cur)
        }
        val end = resolved.getOrElse(cur, cur)
        path.foreach(p => resolved(p) = end)
      }
    }
    val rows = resolved.iterator.map { case (o, r) => org.apache.spark.sql.Row(o, r) }.toSeq
    DriverDim.toDF(spark, rows, edges.schema)
  }
}
