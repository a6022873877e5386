package graft.pipelines

import graft.SparkSpec

/** End-to-end `--load` convergence over the real fixture XML and a real
  * on-disk store — the integration surface unit specs miss (this round
  * a green 118-spec suite hid a broken alias snapshot schema that only
  * a second LoadMain run exposed).
  */
class LoadMainIntegrationSpec extends SparkSpec {

  test("three runs of the same release converge: insert -> mergeCS reorder -> all match") {
    val store = java.nio.file.Files.createTempDirectory("loadstore").toFile.getAbsolutePath
    val xml = graft.SparkEntry.fixturePath("data/fixtures/vcv_sample.xml")

    val r1 = LoadMain.run(spark, xml, store)
    assert(r1(("variants", "insert")) === 3L)
    assert(r1.keys.forall(_._2 == "insert")) // bootstrap: everything inserts

    val r2 = LoadMain.run(spark, xml, store)
    // first reload: the documented mergeCS rank-reorder updates variants
    // once; every child entity must already match
    assert(r2(("variants", "match")) + r2.getOrElse(("variants", "update"), 0L) === 3L)
    assert(r2.getOrElse(("aliases", "match"), 0L) === 1L)
    assert(r2.getOrElse(("xdb_ids", "match"), 0L) === 15L)
    assert(!r2.contains(("aliases", "insert")) && !r2.contains(("aliases", "delete")))

    val r3 = LoadMain.run(spark, xml, store)
    assert(r3.keys.forall(_._2 == "match"), s"run 3 not converged: $r3")

    // bucket-selective publish: a converged load changes nothing, so a
    // further identical run must rewrite ZERO buckets — every manifest
    // pointer stays on the version that last wrote it (carried by
    // reference, not re-staged)
    val manifestBefore = graft.ops.SnapshotStore.readManifest(store)
    val r4 = LoadMain.run(spark, xml, store)
    assert(r4.keys.forall(_._2 == "match"))
    assert(graft.ops.SnapshotStore.readManifest(store) === manifestBefore,
      "an all-match load rewrote buckets")
  }

  test("--landing mode: loads the newest dated dir once; re-run without a new dir is a no-op") {
    import java.nio.file.{Files, Paths}
    val store = Files.createTempDirectory("landstore").toFile.getAbsolutePath
    val landing = Files.createTempDirectory("landing").toFile.getAbsolutePath
    val xml = Paths.get(graft.SparkEntry.fixturePath("data/fixtures/vcv_sample.xml"))
    def stage(stamp: String): Unit = {
      val d = Paths.get(landing, stamp)
      Files.createDirectories(d)
      Files.copy(xml, d.resolve("vcv_release.xml"))
    }
    // empty landing root: nothing to do, no store mutation
    assert(LoadMain.runLatest(spark, landing, store).isEmpty)

    stage("2025-01-01")
    stage("2025-06-01")
    val r1 = LoadMain.runLatest(spark, landing, store)
    assert(r1.isDefined, "a fresh dated dir must load")
    assert(r1.get(("variants", "insert")) === 3L) // bootstrap insert = read the release
    assert(LoadMain.lastLoadedStamp(spark, store).contains("2025-06-01"),
      "must have loaded the NEWER dated dir")

    // no new dated dir appeared: the daily cron's call is a no-op
    assert(LoadMain.runLatest(spark, landing, store).isEmpty)

    // a new release lands: loaded again (same content -> converging actions)
    stage("2025-07-15")
    val r3 = LoadMain.runLatest(spark, landing, store)
    assert(r3.isDefined)
    assert(LoadMain.lastLoadedStamp(spark, store).contains("2025-07-15"))
  }
}
