package graft.ops

import java.io.File

import graft.SparkSpec

class SnapshotStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmpStore(): String =
    java.nio.file.Files.createTempDirectory("snapstore").toString

  private def readIds(store: String, entity: String): Set[Long] =
    spark.read.parquet(SnapshotStore.path(store, entity))
      .select("id").as[Long].collect().toSet

  test("publish then read-back; superseded version is GC'd") {
    val store = tmpStore()
    val v1 = SnapshotStore.publish(store, Seq(
      "a" -> Seq(1L, 2L).toDF("id"), "b" -> Seq(10L).toDF("id")))
    assert(readIds(store, "a") === Set(1L, 2L) && readIds(store, "b") === Set(10L))
    val v2 = SnapshotStore.publish(store, Seq(
      "a" -> Seq(3L).toDF("id"), "b" -> Seq(10L, 11L).toDF("id")))
    assert(v2 === v1 + 1)
    assert(readIds(store, "a") === Set(3L) && readIds(store, "b") === Set(10L, 11L))
    // the v1 dir is unreferenced after the flip and must be gone
    assert(!new File(store, s"v$v1").exists())
  }

  test("subset publish keeps the other entities' pointers in the same flip") {
    val store = tmpStore()
    SnapshotStore.publish(store, Seq(
      "a" -> Seq(1L).toDF("id"), "b" -> Seq(10L).toDF("id")))
    SnapshotStore.publish(store, Seq("b" -> Seq(20L).toDF("id")))
    assert(readIds(store, "a") === Set(1L)) // untouched entity still resolves
    assert(readIds(store, "b") === Set(20L))
  }

  test("crash before the manifest flip leaves readers on the old consistent state") {
    val store = tmpStore()
    SnapshotStore.publish(store, Seq(
      "a" -> Seq(1L).toDF("id"), "b" -> Seq(10L).toDF("id")))
    // simulate a loader that staged half a version then died: data dirs
    // exist, manifest never flipped
    Seq(99L).toDF("id").write.parquet(s"$store/v7/a")
    assert(readIds(store, "a") === Set(1L) && readIds(store, "b") === Set(10L))
    // next successful publish claims a HIGHER version and GCs the orphan
    val v = SnapshotStore.publish(store, Seq("a" -> Seq(2L).toDF("id")))
    assert(v > 7)
    assert(!new File(store, "v7").exists())
    assert(readIds(store, "a") === Set(2L) && readIds(store, "b") === Set(10L))
  }

  test("legacy flat layout resolves when no manifest exists") {
    val store = tmpStore()
    Seq(5L).toDF("id").write.parquet(s"$store/a")
    assert(SnapshotStore.exists(store, "a") && !SnapshotStore.exists(store, "b"))
    assert(readIds(store, "a") === Set(5L))
    // first publish moves 'a' to the versioned layout; flat side tables
    // not covered by the manifest keep resolving
    Seq(7L).toDF("id").write.parquet(s"$store/side")
    SnapshotStore.publish(store, Seq("a" -> Seq(6L).toDF("id")))
    assert(readIds(store, "a") === Set(6L))
    assert(readIds(store, "side") === Set(7L))
  }
}
