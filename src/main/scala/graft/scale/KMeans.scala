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
  * iteration collects to the driver; the plan is one DAG over the
  * PERSISTED exploded frame ([[graft.ops.CacheScope]] lifecycle — the
  * standard cache-the-training-set shape, done here because every
  * assign and update branch reads it).
  */
object KMeans {

  /** (id, qv array<long>) quantized vector rows — ONE row per vector.
    * The per-dimension form only materializes where the update step's
    * per-coordinate means need it ([[explodeQv]]).
    */
  private[scale] def quantizeVec(embeds: DataFrame, idCol: String, vecCol: String): DataFrame =
    embeds.select(
      col(idCol).cast("long").as("id"),
      transform(col(vecCol),
        x => (floor(x.cast("double") * 1000) + 32768).cast("long")).as("qv"))

  /** (id, dim, v) per-dimension rows derived from the cached vector
    * frame — the update step's input.
    */
  private[scale] def explodeQv(qv: DataFrame): DataFrame =
    qv.select(col("id"), posexplode(col("qv")).as(Seq("dim", "v")))

  /** One assignment pass over VECTOR rows: (id, cluster, dist2) under
    * `cent` = (cluster, cva array<long>).
    *
    * dist2 is the codegen'd exact-integer
    * [[graft.functions.SqDistLong]] over the quantized arrays, so the
    * frame entering the argmin is N·k rows — NOT the N·D·k
    * per-dimension explosion an (id, dim)-keyed formulation pushes
    * through the aggregation machinery (measured at 10×: the exploded
    * form spent ~8 s/iteration shuffling 102M slim rows; this form is
    * 64× fewer rows with the same arithmetic, bit-identical because
    * integer addition is associative in any evaluation order).
    *
    * The argmin packs (dist2, cluster) into ONE long — `dist2 * k +
    * cluster`, exact because both are nonnegative and cluster < k — so
    * the aggregation is a plain `min(long)` inside HashAggregate with
    * map-side partials. Both `min(struct(...))` and `min_by(_,
    * struct(...))` carry a struct buffer and regress the whole pass to
    * SortAggregate (measured; PlanGuardSpec pins the absence). Overflow
    * bound: dist2 <= dims * 65536^2, so dims * k < 2^31 keeps the
    * packed value far inside a long — enforced below.
    */
  private[scale] def assign(qv: DataFrame, cent: DataFrame, k: Int): DataFrame =
    qv
      .crossJoin(broadcast(cent))
      .select(col("id"), col("cluster"),
        graft.functions.SqDistLong(col("qv"), col("cva")).as("dist2"))
      .groupBy("id")
      .agg(min(col("dist2") * k + col("cluster")).as("enc"))
      .select(
        col("id"),
        pmod(col("enc"), lit(k.toLong)).as("cluster"),
        expr(s"enc div ${k}L").as("dist2"))

  /** Truncating-integer mean per (cluster, dim) of the assigned members. */
  private[scale] def update(quant: DataFrame, asg: DataFrame): DataFrame =
    quant
      .join(asg.select("id", "cluster"), "id")
      .groupBy("cluster", "dim")
      .agg(expr("sum(v) div count(1)").as("cv"))

  /** (cluster, cva array<long>) assembly of a per-dim centroid frame —
    * k·D rows in, k rows out, never corpus-sized.
    */
  private[scale] def centArrays(cent: DataFrame): DataFrame =
    cent.groupBy("cluster")
      .agg(expr("transform(array_sort(collect_list(struct(dim, cv))), s -> s.cv)").as("cva"))

  /** Shared trainer core: the persisted quantized-vector frame + the
    * final assignment DAG (so [[trainedCentroids]]'s closing update
    * reads the SAME cache instead of re-quantizing the corpus).
    */
  private def lloydCore(
      embeds: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): (DataFrame, DataFrame) = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val dims = embeds.selectExpr(s"size($vecCol)").head().getInt(0)
    require(dims.toLong * k < (1L << 31),
      s"dims * k = ${dims.toLong * k} overflows the packed argmin encoding")
    // persisted: the quantized frame feeds 2·iters-1 branches (every
    // assign + every update) — without it each iteration re-scans and
    // re-quantizes the source (CacheScope lifecycle, released by the
    // query driver after materialization)
    val qv = graft.ops.CacheScope.persisted(quantizeVec(embeds, idCol, vecCol))
    val cent0 = qv.filter(col("id") < k)
      .select(col("id").as("cluster"), col("qv").as("cva"))
    // fail LOUD on sparse/offset id spaces: with no ids in [0, k) the
    // assignment frame would be silently EMPTY (the autoStrideAnchor
    // lesson). Probed on the RAW corpus with limit-1 short-circuit, the
    // PQ-family pattern — a count() over the quantized frame would
    // materialize the whole persisted qv cache at construction time.
    require(!embeds.filter(col(idCol) < k).limit(1).isEmpty,
      s"first-$k init found no ids < $k in '$idCol' — the trainer's id " +
        "contract is dense 0-based (renumber upstream, e.g. zipWithIndex)")
    val finalAssign = (1 until iters).foldLeft(assign(qv, cent0, k)) { (asg, _) =>
      assign(qv, centArrays(update(explodeQv(qv), asg)), k)
    }
    (qv, finalAssign)
  }

  /** Run `iters` Lloyd iterations; returns the FINAL assignment
    * (idCol, cluster, dist2) — exact integers, 1 row per input vector.
    */
  def lloydAssign(
      embeds: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): DataFrame = {
    val (_, finalAssign) = lloydCore(embeds, idCol, vecCol, k, iters)
    finalAssign.select(col("id").as(idCol), col("cluster"), col("dist2"))
  }

  /** The TRAINED coarse quantizer: centroid means over the final
    * assignment, dequantized back to the embedding space
    * (`(cv - 32768) / 1000.0` — one exact subtraction and one
    * correctly-rounded division, identical in any IEEE engine), shaped
    * for [[Similarity.ivfTopKWithCentroids]]:
    * (centroid_id, centroid_vec array<double>). The per-cluster
    * assembly is a (cluster, dim) agg + one dim-sized
    * `array_sort(collect_list(struct(dim, mean)))` per centroid — k·D
    * rows, never corpus-sized.
    */
  def trainedCentroids(
      embeds: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): DataFrame = {
    val (qv, finalAssign) = lloydCore(embeds, idCol, vecCol, k, iters)
    val asg = finalAssign.select(col("id"), col("cluster"))
    update(explodeQv(qv), asg)
      .groupBy(col("cluster").as("centroid_id"))
      // 1000.0D: the plain literal parses as DECIMAL in SQL exprs and
      // would silently make the whole vector decimal-typed
      .agg(expr(
        "transform(array_sort(collect_list(struct(dim, cv))), s -> (s.cv - 32768) / 1000.0D)")
        .as("centroid_vec"))
  }
}
