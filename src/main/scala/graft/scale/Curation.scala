package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.CacheScope

/** End-to-end training-corpus curation — the composite the individual
  * operators exist FOR, as one call: quality gate → exact dedup →
  * benchmark decontamination → deterministic token-budget shard
  * packing. Output is the curated corpus as (id, n_tokens, shard): the
  * exact file layout a pretraining export writes.
  *
  * Stage shapes (each individually driver-gated by its own query; the
  * composite is gated end-to-end by q87 against a composed oracle):
  *
  *   1. quality gate — `n_tokens >= minTokens` as a scan-side filter
  *      (codegen'd, pushdown-friendly; the C4 [[TextStats.policyFilter]]
  *      slots in here for corpora with line structure);
  *   2. exact dedup — keep each digest group's min-id doc: one
  *      map-side-combined agg + one semi-join, both keyed on the
  *      16-byte md5 digest (the q16 operator); at 100 TB both sides
  *      shuffle slim digest rows, never text;
  *   3. decontamination — [[Dedup.decontaminate]] (benchmark grams
  *      broadcast; swap in [[Dedup.decontaminateBloom]] when the
  *      benchmark outgrows broadcast), then an anti-join on id;
  *   4. shard packing — [[ShardPack.packByTokenBudget]]'s two-phase
  *      prefix sum over the survivors.
  *
  * The dedup survivors feed two consumers (the gram probe and the
  * anti-join), so the slim survivor frame is CacheScope-persisted; at
  * export scale the alternative is a second corpus scan — either works,
  * the persist just trades disk for scan time on the common case.
  */
object Curation {

  def curate(
      docs: DataFrame,
      holdout: DataFrame,
      idCol: String,
      textCol: String,
      minTokens: Int = 20,
      contamGramN: Int = 4,
      shardBudget: Long = 2000L): DataFrame = {
    val filt = docs
      .select(col(idCol), col(textCol), TextStats.tokenCount(col(textCol)).as("n_tokens"))
      .filter(col("n_tokens") >= minTokens)
      .withColumn("text_hash", md5(col(textCol).cast("binary")))
    val keepers = filt
      .groupBy("text_hash").agg(min(col(idCol)).as(idCol))
    val ded = CacheScope.persisted(
      filt.join(keepers, Seq("text_hash", idCol), "left_semi"))
    val contaminated = Dedup
      .decontaminate(ded, holdout, idCol, textCol, contamGramN)
      .select(idCol)
    val clean = ded.join(contaminated, Seq(idCol), "left_anti")
    ShardPack.packByTokenBudget(clean, idCol, "n_tokens", shardBudget)
  }
}
