package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over integer-quantized embeddings — the
  * centroid TRAINER behind [[Similarity.ivfTopK]]'s coarse quantizer
  * (Lloyd 1982; the IVF training step of Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", 2011). The serving-side
  * IVF probe takes any centroid frame; this builds a data-dependent one
  * with nothing but DataFrame ops.
  *
  * Determinism contract (the reason for QUANTIZED vectors): float
  * centroid means are sums of doubles whose value depends on partition
  * order, so no float k-means can be oracle-gated. Instead each
  * coordinate is quantized ONCE to a nonnegative integer
  * (`floor(x * 1000) + 32768` — the float→double product is exact, the
  * offset keeps every later quotient nonnegative so truncating and
  * flooring division coincide on every engine), and every distance,
  * sum, and mean after that is exact integer arithmetic — associative,
  * partition-invariant, and bit-identical in the DuckDB oracle, which
  * unrolls the same iterations as CTEs. Quantization costs 1e-3
  * per-coordinate resolution, irrelevant for a coarse quantizer whose
  * job is bucketing.
  *
  * Semantics per iteration (unrolled `iters` times into ONE lazy plan):
  *  - assign: each vector goes to the centroid minimizing exact squared
  *    L2 distance, ties to the smallest centroid id;
  *  - update: each centroid coordinate becomes the truncating-integer
  *    mean of its members (a cluster that loses all members drops out,
  *    and k shrinks — documented Lloyd behavior, deterministic here).
  *  - init: centroids are the quantized vectors of the k smallest ids
  *    (deterministic; callers wanting k-means++ seed with any other
  *    deterministic id set).
  *
  * Scale shape (the 100 TB question): the corpus-sized frame is the
  * exploded (id, dim, v) — N·D slim long rows. Per iteration it meets
  * the k·D centroid frame in a BROADCAST join (centroids are dim-sized
  * by construction), the distance agg shuffles (id, cluster) partial
  * sums with map-side combine, and the update agg shuffles (cluster,
  * dim) partials — both exchanges carry counters, never vectors. No
  * iteration collects to the driver; the plan is one DAG and Spark
  * re-scans the source per iteration (persist the exploded frame
  * upstream when the scan dominates — at 64-dim × 1e9 rows that is the
  * standard cache-the-training-set call the caller owns).
  */
object KMeans {

  /** (id, dim, v) exploded quantized coordinates. */
  private[scale] def quantize(embeds: DataFrame, idCol: String, vecCol: String): DataFrame =
    embeds.select(
      col(idCol).cast("long").as("id"),
      posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(
        col("id"), col("dim"),
        (floor(col("x").cast("double") * 1000) + 32768).cast("long").as("v"))

  /** One assignment pass: (id, cluster, dist2) under `cent` =
    * (cluster, dim, cv).
    */
  private def assign(quant: DataFrame, cent: DataFrame): DataFrame =
    quant
      .join(broadcast(cent), "dim")
      .groupBy("id", "cluster")
      .agg(sum((col("v") - col("cv")) * (col("v") - col("cv"))).as("dist2"))
      .groupBy("id")
      .agg(min(struct(col("dist2"), col("cluster"))).as("m"))
      .select(col("id"), col("m.cluster").as("cluster"), col("m.dist2").as("dist2"))

  /** Truncating-integer mean per (cluster, dim) of the assigned members. */
  private def update(quant: DataFrame, asg: DataFrame): DataFrame =
    quant
      .join(asg.select("id", "cluster"), "id")
      .groupBy("cluster", "dim")
      .agg(expr("sum(v) div count(1)").as("cv"))

  /** Run `iters` Lloyd iterations; returns the FINAL assignment
    * (idCol, cluster, dist2) — exact integers, 1 row per input vector.
    */
  def lloydAssign(
      embeds: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val quant = quantize(embeds, idCol, vecCol)
    val cent0 = quant.filter(col("id") < k)
      .select(col("id").as("cluster"), col("dim"), col("v").as("cv"))
    val finalAssign = (1 until iters).foldLeft(assign(quant, cent0)) { (asg, _) =>
      assign(quant, update(quant, asg))
    }
    finalAssign.select(col("id").as(idCol), col("cluster"), col("dist2"))
  }
}
