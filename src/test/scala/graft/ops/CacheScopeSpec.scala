package graft.ops

import graft.SparkSpec
import graft.scale.{Dedup, Similarity}
import org.apache.spark.sql.functions._

class CacheScopeSpec extends SparkSpec {
  import spark.implicits._

  private def cachedRddCount: Int = spark.sparkContext.getPersistentRDDs.size

  test("operator-internal persists all release via releaseAll (no session leak)") {
    CacheScope.releaseAll() // start from a clean slate whatever ran before
    val base = cachedRddCount

    val docs = (1 to 40)
      .map(i => (i.toLong, s"the quick brown fox ${i % 5} jumps over the lazy dog ${i % 5}"))
      .toDF("doc_id", "text")
    Dedup.minhashPairsExact(docs, "doc_id", "text").count()

    val emb = (1 to 30)
      .map(i => (i.toLong, Array.fill(8)((i % 3).toFloat + 0.1f)))
      .toDF("id", "embedding")
    Similarity.cosineNearDupPairs(emb, "id", "embedding", 0.95, numPlanes = 8, bands = 4, dims = 8)
      .count()

    assert(cachedRddCount > base, "operators should have registered persisted frames")
    assert(CacheScope.releaseAll() >= 2)
    // unpersist is async (blocking=false): poll briefly for drain. <=
    // rather than ===: the ContextCleaner may concurrently GC-unpersist
    // leftovers counted in `base` (e.g. a prior suite's failure-path
    // RDDs), legitimately dropping the count BELOW the snapshot
    val deadline = System.nanoTime() + 10e9.toLong
    while (cachedRddCount > base && System.nanoTime() < deadline) Thread.sleep(50)
    assert(cachedRddCount <= base, "released frames must leave the block manager")
    assert(CacheScope.releaseAll() === 0, "registry must drain on release")
  }

  test("released operator re-runs produce identical results (re-persist is safe)") {
    val docs = (1 to 30)
      .map(i => (i.toLong, s"alpha beta gamma ${i % 4} delta epsilon ${i % 4}"))
      .toDF("doc_id", "text")
    val first = Dedup.minhashPairsExact(docs, "doc_id", "text").count()
    CacheScope.releaseAll()
    val second = Dedup.minhashPairsExact(docs, "doc_id", "text").count()
    assert(first === second)
    CacheScope.releaseAll()
  }
}
