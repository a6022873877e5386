package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph signals for corpus curation: a crawl-derived host graph
  * ranks domains (the classic web-quality prior used to weight or
  * filter crawl data), and the rank iteration is the canonical
  * distributed-graph workload — per step, one equi-join of the rank
  * frame against the edge list and one aggregation of contributions by
  * target, both hash-partitioned on the node key.
  */
object LinkGraph {

  /** PageRank with INTEGER milli-ranks — damping and contributions in
    * exact integer arithmetic (`rank div outdeg`, then
    * `(1000−d) + d·inflow div 1000`), so every engine reproduces the
    * ranks bit-for-bit (the DuckDB oracle mirrors the iterations as
    * CTEs; all quantities are non-negative, where floor and
    * truncating division agree). The rank scale is 1000 = 1.0.
    *
    * Dangling mass (nodes with no outlinks) is dropped rather than
    * redistributed — deterministic and mirrored by the oracle; the
    * full redistribution variant adds one scalar agg per step if ever
    * needed.
    *
    * Scale shape: `iters` is small and unrolled (the
    * [[graft.scale.KMeans]] regime — no driver loop on data). Each
    * step: edges ⋈ ranks on src (both sides hash-partition on the node
    * key; Catalyst broadcasts the rank frame while it fits, and the
    * fallback is a slim (node, rank) shuffle), then one
    * map-side-combined sum by dst. The edge list never changes, so its
    * exchange is reused across steps; nothing materializes beyond
    * (node, long) rows.
    *
    * @return (node, rank) — milli-ranks after `iters` steps from a
    *         uniform 1000 start
    */
  def pagerankMilli(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      dampingMilli: Long = 850L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampingMilli >= 0 && dampingMilli <= 1000,
      s"dampingMilli must be in [0, 1000], got $dampingMilli")
    // distinct edge list + slim frames, persisted: every step consumes
    // the same edges and outdegrees; the cached rows are (string, string)
    // and (string, long) — node-scale, never corpus-scale
    val e = graft.ops.CacheScope.persisted(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct())
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val base = lit(1000L - dampingMilli)
    val r0 = nodes.select(col("node"), lit(1000L).as("rank"))
    (1 to iters).foldLeft(r0) { (r, _) =>
      val inflow = e
        .join(r.withColumnRenamed("node", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("node"), expr("rank div outdeg").as("contrib"))
        .groupBy(col("node"))
        .agg(sum(col("contrib")).as("inflow"))
      nodes
        .join(inflow, Seq("node"), "left")
        .select(
          col("node"),
          (base + expr(s"($dampingMilli * coalesce(inflow, 0L)) div 1000"))
            .as("rank"))
    }
  }
}
