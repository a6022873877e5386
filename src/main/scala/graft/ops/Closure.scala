package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transitive ancestor closure over a multi-parent DAG edge table — the
  * set-oriented form of the reference's per-pair ontology ancestry
  * probes (Dao.isDescendantOf, Dao.java:629-631, backed by the RGD
  * ontology DAG) used by duplicate-term QC's separate-branch check
  * (TermNameMatcher.termsOnSeparateOntBranches,
  * TermNameMatcher.java:129-133).
  *
  * Path doubling: each round unions the current closure with its
  * self-join, so covered path length doubles per round — a DAG of depth
  * L converges in O(log L) rounds. Ontology DAGs are broadcast-sized
  * dims (like [[Fixpoint]]'s substitution table), so each round is a
  * broadcast join and the per-round convergence count is a driver-side
  * action over a small frame — the 100 TB fact side only ever joins the
  * FINAL materialized closure.
  */
object Closure {

  /** All (term, ancestor) pairs reachable through `edges`.
    *
    * @param edges child/parent columns, one row per direct edge;
    *              multi-parent rows are the point (a DAG, not a chain —
    *              [[Fixpoint.resolve]] handles the one-successor case)
    */
  def ancestors(
      edges: DataFrame,
      childCol: String = "child",
      parentCol: String = "parent",
      maxRounds: Int = 20): DataFrame = {
    var cur = edges
      .select(col(childCol).as("term"), col(parentCol).as("ancestor"))
      .distinct()
      .persist()
    var n = cur.count()
    var round = 0
    var changed = true
    while (changed) {
      if (round >= maxRounds)
        throw new IllegalStateException(
          s"closure did not converge after $maxRounds rounds (cycle in DAG?)")
      val hop = cur.select(col("term").as("h_term"), col("ancestor").as("h_anc"))
      val next = cur
        .unionByName(
          cur.join(broadcast(hop), cur("ancestor") === col("h_term"))
            .select(cur("term"), col("h_anc").as("ancestor")))
        .distinct()
        .persist()
      val m = next.count()
      changed = m != n
      cur.unpersist()
      cur = next
      n = m
      round += 1
    }
    cur
  }

  /** (acc_a, acc_b) pairs that sit on the SAME branch — one is an
    * ancestor of the other (the complement of
    * `termsOnSeparateOntBranches`). Symmetric: both orientations match.
    */
  def sameBranchPairs(closure: DataFrame): DataFrame =
    closure.select(col("term").as("acc_a"), col("ancestor").as("acc_b"))
      .unionByName(
        closure.select(col("ancestor").as("acc_a"), col("term").as("acc_b")))
      .distinct()
}
