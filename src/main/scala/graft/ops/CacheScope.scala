package graft.ops

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Session-lifetime bookkeeping for operator-internal `persist`s.
  *
  * Several operators cache an intermediate frame that feeds multiple
  * consumers inside ONE returned plan (LSH candidate pairs, signature
  * frames, the load pipeline's identity-matched snapshot). The function
  * cannot unpersist before returning — the caller has not executed the
  * plan yet — so without bookkeeping every call leaks its cached blocks
  * for the life of the SparkSession: a long-lived session running many
  * queries accumulates dead cache (the round-5 bench log's repeated
  * `CacheManager: Asked to cache already cached data` warnings) until
  * eviction pressure slows unrelated work.
  *
  * The contract: operators register via [[persisted]]; the driver of a
  * query batch (graft.Bench / graft.Verify, a user's query loop) calls
  * [[releaseAll]] once the results of a query are materialized. Frames
  * are unpersisted non-blocking — in-flight consumers of an already-
  * materialized result are unaffected, and re-running the same query
  * simply re-persists.
  *
  * SINGLE-DRIVER ASSUMPTION: the registry is process-global, so
  * [[releaseAll]] releases every registered frame in the SparkSession —
  * including ones registered by a concurrent query driver in the same
  * JVM, whose not-yet-materialized consumers would then silently
  * recompute. Concurrent query drivers sharing one session must either
  * coordinate their release points or skip releaseAll and accept the
  * session-lifetime cache.
  */
object CacheScope {
  private val registry = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Persist `ds` at `level` and register it for the next [[releaseAll]]. */
  def persisted[T](ds: Dataset[T], level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] = {
    val p = ds.persist(level)
    registry.add(p)
    p
  }

  /** Register an ALREADY-persisted frame (the final frame of an
    * iterative loop that manages its own per-round lifecycle) for the
    * next [[releaseAll]].
    */
  def register[T](ds: Dataset[T]): Dataset[T] = {
    registry.add(ds)
    ds
  }

  /** LINEAGE CUT + persist for a frame that fans out into MANY
    * downstream plan references: rebuilding the frame over its own RDD
    * (`createDataFrame(df.rdd, df.schema)`) replaces the LOGICAL
    * subtree with a LEAF (LogicalRDD), so each downstream reference
    * costs O(1) analysis/optimization instead of re-walking the whole
    * upstream chain per reference — the fan-out plan-blowup class
    * measured on the preference chain (a plain [[persisted]] dedups
    * EXECUTION but leaves the full tree in every consumer's logical
    * plan, and Catalyst re-analyzes it per consumer; adding two guard
    * references to q163 cost +20 s at sf0.01 before the cut, and the
    * cut then took the whole family BELOW its pre-guard cost).
    *
    * Deliberately NOT `localCheckpoint`: a locally-checkpointed block
    * that gets EVICTED under memory pressure is unrecoverable (the
    * compute lineage is truncated) — measured as "Block rdd_N does not
    * exist" task failures at the 100× century staging. Here the cut is
    * logical-plan-side only: the underlying RDD keeps its full compute
    * DAG, so an evicted or released block recomputes like any cache
    * miss. The Row encode/decode round-trip this costs happens once,
    * at cache materialization. Registered for [[releaseAll]] like
    * every operator-internal cache.
    */
  def cut(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    persisted(df.sparkSession.createDataFrame(df.rdd, df.schema))

  private val rddRegistry =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[_]]()

  /** Register a cached RDD (the locally-checkpointed final round of an
    * iterative loop) for the next [[releaseAll]]. CAVEAT: unlike a
    * released DataFrame cache, a released locally-checkpointed RDD
    * cannot recompute (its lineage was truncated) — re-materializing a
    * plan over it after release fails rather than recomputing. The
    * contract is the same release point as [[persisted]] (results
    * already materialized); iterative results are terminal — re-derive
    * by re-calling the operator.
    */
  def registerRdd[T](rdd: org.apache.spark.rdd.RDD[T]): org.apache.spark.rdd.RDD[T] = {
    rddRegistry.add(rdd)
    rdd
  }

  /** Currently-registered cached RDDs (spec observability: which
    * iterative path ran).
    */
  def registeredRddCount: Int = rddRegistry.size()

  /** Unpersist (non-blocking) every registered frame; returns how many
    * were released. Safe to call at any point between queries.
    */
  def releaseAll(): Int = {
    var n = 0
    var ds = registry.poll()
    while (ds != null) {
      ds.unpersist(blocking = false)
      n += 1
      ds = registry.poll()
    }
    var rdd = rddRegistry.poll()
    while (rdd != null) {
      rdd.unpersist(blocking = false)
      n += 1
      rdd = rddRegistry.poll()
    }
    n
  }
}
