package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count, countDistinct, lit}

/** The EAGER key-contract guard, extracted once the pattern reached its
  * fourth site (the `signalGated` precedent): some operators consume a
  * small keyed side frame (prompt texts, trajectory signals, an
  * image-assignment map) whose DUPLICATE or NULL keys a downstream join
  * fan-out would silently amplify — doubled turns with colliding ids,
  * double-counted group stats, double-assigned payloads. An IN-PLAN
  * assert cannot gate that class: the guard column rides the join
  * output, and codegen/AQE legally skip it for exactly the offending
  * rows (a null-rejecting filter turns the outer join inner; the
  * empty-relation rule then never evaluates the guard — the r16
  * adjudication). So the contract is checked EAGERLY instead.
  *
  * COST, stated plainly: every call fires ONE small Spark job at
  * plan-CONSTRUCTION time — a 1-row (count, count(key),
  * countDistinct(key)) aggregation over `df` — even if the composed
  * plan is never executed. Only use it on key-count-sized frames (the
  * side input, never the corpus); there the job is milliseconds and
  * the alternative is silent data corruption.
  */
object EagerContracts {

  /** Require `keyCol` non-null and unique in `df`, failing with a
    * NAMED error that separates null keys from duplicate keys (a
    * bare count-vs-countDistinct compare misreports null keys as
    * duplicates — countDistinct ignores nulls).
    *
    * @param op          operator name for the error message
    * @param consequence what a violating key would silently do
    */
  def requireUniqueKeys(
      df: DataFrame,
      keyCol: String,
      op: String,
      consequence: String): Unit = {
    val r = df.agg(
      count(lit(1)).as("n"),
      count(col(keyCol)).as("nn"),
      countDistinct(col(keyCol)).as("nd")).head()
    val (n, nn, nd) = (r.getLong(0), r.getLong(1), r.getLong(2))
    require(nn == n,
      s"$op: $keyCol has ${n - nn} null key(s) — $consequence")
    require(nd == nn,
      s"$op: $keyCol has ${nn - nd} duplicate key(s) — $consequence")
  }
}
