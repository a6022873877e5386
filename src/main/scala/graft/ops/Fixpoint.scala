package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative fixpoint resolution over a substitution table — the Spark
  * shape of the reference's recursive obsolete-SO-term substitution
  * (reference: Dao.validateSoAccId, Dao.java:542-574: replaced_by
  * chains are followed until a non-obsolete term is reached) and of
  * ontology-ancestry closure probes (TermNameMatcher.java:129-133).
  *
  * The substitution dim is SMALL (ontology-sized), so each round is a
  * broadcast hash join; rounds double the resolved-chain length
  * (pointer jumping: substitute through the PARTIALLY-RESOLVED table,
  * not the raw edges), so a chain of length L converges in O(log L)
  * rounds. Convergence is detected with a 1-row count per round —
  * driver-side loops over broadcast-sized dims are the idiomatic Spark
  * pattern for small-fixpoint work (the 100 TB fact table never joins
  * until the closure is materialized and broadcast).
  */
object Fixpoint {

  /** Resolve every `oldCol` to the end of its substitution chain.
    * Returns (old_id, resolved_id). Cycles throw after `maxRounds`.
    */
  def resolve(
      subs: DataFrame,
      oldCol: String,
      newCol: String,
      maxRounds: Int = 20): DataFrame = {
    var cur = subs
      .select(col(oldCol).as("old_id"), col(newCol).as("resolved_id"))
      .persist()
    var round = 0
    var changed = true
    while (changed) {
      if (round >= maxRounds)
        throw new IllegalStateException(
          s"fixpoint did not converge after $maxRounds rounds (cycle in substitutions?)")
      // pointer jumping: follow resolved_id through the current table
      val jump = cur.select(col("old_id").as("j_old"), col("resolved_id").as("j_new"))
      val joined = cur
        .join(broadcast(jump), cur("resolved_id") === col("j_old"), "left")
        .persist()
      changed = joined.filter(col("j_new").isNotNull).limit(1).count() > 0
      val next = joined
        .select(col("old_id"), coalesce(col("j_new"), col("resolved_id")).as("resolved_id"))
        .persist()
      next.count() // materialize before unpersisting parents
      cur.unpersist()
      joined.unpersist()
      cur = next
      round += 1
    }
    cur
  }
}
