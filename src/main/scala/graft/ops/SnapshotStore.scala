package graft.ops

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame

/** Crash-atomic snapshot store: versioned entity directories published
  * through a single manifest flip.
  *
  * The reference gets multi-table commit atomicity from Oracle
  * transactions (Dao.java:142-155); the snapshot-file analog is:
  *
  *   1. write every entity of the new state under `v<N>/<entity>` —
  *      never touching the live directories;
  *   2. atomically replace the `MANIFEST` file (one `ATOMIC_MOVE`
  *      rename) mapping each entity to its version directory;
  *   3. garbage-collect version directories no longer referenced.
  *
  * A crash during (1) leaves the manifest — and therefore every reader
  * — on the previous fully-consistent state (the orphan staging dir is
  * GC'd by the next successful publish). A crash during (2) resolves to
  * either the old or the new manifest, never a mix. A crash during (3)
  * leaves only unreferenced garbage. Publishing a SUBSET of entities
  * (e.g. the annotate pass rewriting only `annotations`) keeps the
  * other entities' pointers unchanged in the same atomic flip.
  *
  * Readers resolve through [[path]], which falls back to the flat
  * legacy layout (`storeDir/<entity>`) for stores that predate the
  * manifest — so side tables never written by a publish (e.g. staged
  * `dbsnp`) keep resolving too.
  *
  * On a distributed filesystem the same protocol holds wherever rename
  * is atomic (HDFS: yes; object stores: swap step 2 for a conditional
  * PUT of the manifest object — the data layout is unchanged).
  */
object SnapshotStore {

  val ManifestName = "MANIFEST"

  private def manifestFile(storeDir: String) = new File(storeDir, ManifestName)

  /** entity -> version-relative path (e.g. "variants" -> "v3/variants"). */
  def readManifest(storeDir: String): Map[String, String] = {
    val f = manifestFile(storeDir)
    if (!f.exists()) Map.empty
    else Files.readAllLines(f.toPath, StandardCharsets.UTF_8)
      .toArray(Array.empty[String])
      .iterator
      .map(_.trim)
      .filter(_.nonEmpty)
      .map { line =>
        val i = line.indexOf('\t')
        require(i > 0, s"malformed manifest line: $line")
        line.substring(0, i) -> line.substring(i + 1)
      }
      .toMap
  }

  /** Resolve an entity's current data path: manifest-pinned version dir
    * if published, else the flat legacy path `storeDir/<entity>`.
    */
  def path(storeDir: String, entity: String): String =
    readManifest(storeDir).get(entity) match {
      case Some(rel) => s"$storeDir/$rel"
      case None      => s"$storeDir/$entity"
    }

  /** True when the entity resolves to existing data. */
  def exists(storeDir: String, entity: String): Boolean =
    new File(path(storeDir, entity)).exists()

  private val VersionDir = "^v(\\d+)$".r

  private def nextVersion(storeDir: String): Int = {
    val onDisk = Option(new File(storeDir).listFiles()).getOrElse(Array.empty)
      .iterator.map(_.getName).collect { case VersionDir(n) => n.toInt }
    val referenced = readManifest(storeDir).values
      .iterator.map(_.takeWhile(_ != '/')).collect { case VersionDir(n) => n.toInt }
    ((onDisk ++ referenced).maxOption.getOrElse(0)) + 1
  }

  /** Stage-and-commit: write each frame under the next version dir,
    * then flip the manifest once. Entities not in `frames` keep their
    * current pointers. Returns the committed version number.
    */
  def publish(storeDir: String, frames: Seq[(String, DataFrame)]): Int = {
    new File(storeDir).mkdirs()
    val v = nextVersion(storeDir)
    frames.foreach { case (entity, df) =>
      df.write.mode("overwrite").parquet(s"$storeDir/v$v/$entity")
    }
    val updated = readManifest(storeDir) ++ frames.map { case (e, _) => e -> s"v$v/$e" }
    commitManifest(storeDir, updated)
    gc(storeDir, updated)
    v
  }

  /** Atomic manifest replacement: write a temp file in the same
    * directory, then one ATOMIC_MOVE rename over the live name.
    */
  private def commitManifest(storeDir: String, entries: Map[String, String]): Unit = {
    val body = entries.toSeq.sorted.map { case (e, p) => s"$e\t$p" }.mkString("", "\n", "\n")
    val tmp = Paths.get(storeDir, s".$ManifestName.tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(
      tmp, manifestFile(storeDir).toPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Delete version directories no longer referenced by the manifest —
    * superseded versions and orphaned half-written staging dirs alike.
    * Runs strictly after the manifest flip, so a failure here never
    * affects consistency.
    */
  private def gc(storeDir: String, manifest: Map[String, String]): Unit = {
    val live = manifest.values.map(_.takeWhile(_ != '/')).toSet
    Option(new File(storeDir).listFiles()).getOrElse(Array.empty).foreach { f =>
      f.getName match {
        case VersionDir(_) if !live.contains(f.getName) => rm(f)
        case _ =>
      }
    }
  }

  private def rm(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
    f.delete()
  }
}
