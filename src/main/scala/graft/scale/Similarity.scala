package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), for training-data curation at scale.
  *
  * Baseline: brute-force cosine top-k for a (small, broadcast) probe set
  * — probes x corpus pairs, map-side math, one shuffle to rank per probe.
  * Scale path: hyperplane-LSH bucketing — each vector gets a signature
  * from the signs of dot products with deterministic pseudo-random
  * hyperplanes; probes only compare against their own bucket, so the
  * pair count drops from |P|x|N| to |P|x|bucket|.
  *
  * All vector math is done in double (cast once) with sequential
  * left-to-right accumulation (functions.aggregate), which keeps results
  * bit-stable across engines and runs.
  */
object Similarity {

  /** Sequential double dot product of two equal-length array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y),
      lit(0d),
      (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Brute-force cosine top-k: for each probe vector, the k nearest
    * corpus vectors (excluding itself). Probes must be small enough to
    * broadcast; corpus streams map-side. Ranking ties break on neighbor
    * id for determinism.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val p = broadcast(
      probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("neighbor_vec"))
    val pairs = c
      .join(p, col("neighbor_id") =!= col("probe_id"))
      .withColumn("cos", cosine(col("probe_vec"), col("neighbor_vec")))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "rank", "neighbor_id", "cos")
  }

  /** Deterministic pseudo-random hyperplane weight for (plane, dim):
    * xxhash64 folded into [-1.0, 1.0). Stable across runs/executors —
    * no RNG state to ship.
    */
  private def planeWeight(plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit(plane), dim), lit(2000001L)).cast("double") - 1000000d) / 1000000d

  /** Sign-of-hyperplane LSH signature: one bit per plane, packed long. */
  def hyperplaneSignature(vec: Column, numPlanes: Int): Column = {
    val v = vec.cast("array<double>")
    val idx = sequence(lit(0), size(v) - 1)
    val bits = (0 until numPlanes).map { pl =>
      val d = aggregate(
        zip_with(v, idx, (x, i) => x * planeWeight(pl, i)),
        lit(0d),
        (acc, x) => acc + x)
      when(d >= 0d, lit(1L << pl)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** LSH-bucketed cosine top-k: corpus and probes are bucketed by
    * hyperplane signature; candidate pairs only form inside a bucket.
    * Recall < 1 by construction (ANN); increase recall by lowering
    * `numPlanes` (bigger buckets) or probing multi-bit neighborhoods.
    */
  def lshTopK(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numPlanes: Int = 8): DataFrame = {
    val c = corpus.select(
      col(idCol).as("neighbor_id"),
      col(vecCol).as("neighbor_vec"),
      hyperplaneSignature(col(vecCol), numPlanes).as("bucket"))
    val p = broadcast(
      probes.select(
        col(idCol).as("probe_id"),
        col(vecCol).as("probe_vec"),
        hyperplaneSignature(col(vecCol), numPlanes).as("bucket")))
    val pairs = c
      .join(p, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .withColumn("cos", cosine(col("probe_vec"), col("neighbor_vec")))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "rank", "neighbor_id", "cos")
  }
}
