package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze, Schmid, "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011) over integer-quantized
  * embeddings: the vector space splits into `m` contiguous subspaces,
  * each trained with its own tiny k-means codebook
  * ([[KMeans]] machinery per subspace), and every corpus vector is
  * ENCODED as `m` small codes — the memory-compression layer of a
  * large-scale ANN stack (D floats → m code bytes per vector).
  *
  * Search is ADC (asymmetric distance computation): the query stays
  * un-encoded; per subspace a lookup table of exact integer squared-L2
  * distances from the query's sub-vector to each codebook centroid is
  * built (q·m·k rows — broadcast-sized), and a document's approximate
  * distance is the sum of its codes' LUT entries. All arithmetic rides
  * the same `floor(x*1000)+32768` integer grid as [[KMeans]], so every
  * distance, mean, and tie-break is bit-identical in the DuckDB oracle
  * (the unrolled sub-keyed CTE chain in SparkEntry's q104/q105).
  *
  * Scale shape (the 100 TB question): the corpus-facing frames are all
  * N-row slim — the per-subspace quantized sub-vector frame (persisted
  * once per subspace, feeding init/assign/update/encode), and the code
  * frame (id, sub, code) of N·m longs. Training joins meet k-sized
  * codebooks as broadcasts; the ADC scoring join is a BROADCAST hash
  * join of the code frame against the LUT followed by a map-side
  * combined (query, id) partial-sum — the only corpus-sized exchange
  * carries (qid, id, partial) longs.
  *
  * [[adcTopK]] is the EXHAUSTIVE form — every corpus row is scored per
  * query (the paper's ADC baseline; scored pairs are N·Q by
  * construction). [[ivfAdcTopK]] is the production composition (IVFADC,
  * §V of the paper): a coarse full-vector k-means partitions the corpus
  * into inverted lists, each query probes its `nprobe` nearest lists,
  * and ADC runs over the probed lists only — scored pairs drop to
  * ~N·Q·nprobe/coarseK, and with the √N-list law
  * ([[Similarity.sqrtNStride]]) the whole search is ~N^1.5 instead of
  * N².
  */
object PQ {

  /** (id, sub, qv) integer-quantized SUB-vector rows for subspace
    * `sub` — same grid as [[KMeans.quantizeVec]], sliced before
    * quantization so dims `[sub*subDim, (sub+1)*subDim)` form the
    * subspace.
    */
  private def quantSub(
      embeds: DataFrame,
      idCol: String,
      vecCol: String,
      sub: Int,
      subDim: Int): DataFrame =
    embeds.select(
      col(idCol).cast("long").as("id"),
      lit(sub).as("sub"),
      transform(
        slice(col(vecCol), sub * subDim + 1, subDim),
        x => (floor(x.cast("double") * 1000) + 32768).cast("long")).as("qv"))

  /** Per-subspace codebook training (one Lloyd iteration: first-k init
    * → assign → integer-mean update) + corpus encoding. Returns
    * (codes = (id, sub, code), cents = (sub, cluster, cva)).
    */
  private def trainAndEncode(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      k: Int,
      subDim: Int): (DataFrame, DataFrame) = {
    val trained = (0 until m).map { s =>
      // persisted per subspace: init filter + training assign + update
      // + encode assign all read it (CacheScope lifecycle, released by
      // the query driver after materialization)
      val qv = graft.ops.CacheScope.persisted(
        quantSub(corpus, idCol, vecCol, s, subDim).drop("sub"))
      val cent0 = qv.filter(col("id") < k)
        .select(col("id").as("cluster"), col("qv").as("cva"))
      // dense-id contract, fail-loud (see KMeans.lloydCore): an empty
      // first-k init would otherwise silently produce an empty codebook.
      // Probed on the RAW corpus with limit-1 short-circuit — not a
      // count() over the quantized frame, which would materialize the
      // whole persisted qv cache at construction time.
      if (s == 0) require(!corpus.filter(col(idCol) < k).limit(1).isEmpty,
        s"first-$k init found no ids < $k in '$idCol' — PQ's id contract " +
          "is dense 0-based (renumber upstream, e.g. zipWithIndex)")
      val a1 = KMeans.assign(qv, cent0, k)
      val cent1 = KMeans.centArrays(
        KMeans.update(KMeans.explodeQv(qv), a1))
      val codes = KMeans.assign(qv, cent1, k)
        .select(col("id"), lit(s).as("sub"), col("cluster").as("code"))
      val cents = cent1.select(lit(s).as("sub"), col("cluster"), col("cva"))
      (codes, cents)
    }
    (trained.map(_._1).reduce(_.unionByName(_)),
      trained.map(_._2).reduce(_.unionByName(_)))
  }

  /** ADC lookup table: every (query sub-vector, codebook centroid)
    * exact integer squared distance — q·m·k rows, broadcast-sized by
    * construction. (qid, sub, code, d2).
    */
  private def adcLut(
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      cents: DataFrame,
      m: Int,
      subDim: Int): DataFrame = {
    val qsubs = (0 until m)
      .map(s => quantSub(queries, idCol, vecCol, s, subDim))
      .reduce(_.unionByName(_))
      .select(col("id").as("qid"), col("sub"), col("qv"))
    qsubs.join(cents, Seq("sub"))
      .select(
        col("qid"), col("sub"), col("cluster").as("code"),
        graft.functions.SqDistLong(col("qv"), col("cva")).as("d2"))
  }

  /** Rank (qid, id, adc2) rows into (query_id, rank, neighbor_id, adc2),
    * rank 1..topK ascending adc2, ties to the smaller neighbor id.
    *
    * `excludeSelf` drops rows where qid == id — correct when queries are
    * drawn from the corpus id space (the q104/q105 shape). Callers whose
    * query ids are UNRELATED to corpus ids must pass false, or a
    * legitimate neighbor whose corpus id collides with a query id is
    * silently dropped.
    */
  private def rankTopK(scored: DataFrame, topK: Int, excludeSelf: Boolean): DataFrame = {
    val win = Window.partitionBy("qid").orderBy(col("adc2").asc, col("id").asc)
    (if (excludeSelf) scored.filter(col("qid") =!= col("id")) else scored)
      .withColumn("rank", row_number().over(win).cast("long"))
      .filter(col("rank") <= topK)
      .select(
        col("qid").as("query_id"), col("rank"),
        col("id").as("neighbor_id"), col("adc2"))
  }

  /** Train per-subspace codebooks, encode the corpus, and answer
    * `queries` with EXHAUSTIVE ADC top-`topK` (every corpus vector
    * scored per query — the re-ranking-quality baseline; use
    * [[ivfAdcTopK]] when the query set scales with the corpus). Returns
    * (query_id, rank, neighbor_id, adc2) with rank 1..topK by ascending
    * approximate squared distance, ties to the smaller neighbor id;
    * self-matches excluded.
    *
    * Query-set contract: the LUT (q·m·k rows) is broadcast BY HINT —
    * its join key is only m·k-ary, so the shuffle alternative would
    * skew the whole code frame onto m·k partitions. Keep the query set
    * driver-broadcast-sized; corpus-scale query sets belong on
    * [[ivfAdcTopK]], whose query-side joins are un-hinted.
    *
    * Construction is DOCUMENTED-EAGER: building the returned plan runs
    * exactly two bounded probe jobs before the caller's first action —
    * a 1-row `size(vec)` dims probe (subspace widths are plan-time
    * literals) and a limit-1 short-circuit existence probe for the
    * dense-id init contract. Neither scans the corpus; the training
    * aggregations themselves stay lazy (see `PQLazinessSpec`).
    *
    * `excludeSelf` (default true) assumes queries share the corpus id
    * space and drops qid == id rows; pass false when query ids are
    * unrelated to corpus ids (see [[rankTopK]]).
    */
  def adcTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int = 2,
      k: Int = 4,
      topK: Int = 5,
      excludeSelf: Boolean = true): DataFrame = {
    require(m >= 1 && k >= 1 && topK >= 1, s"bad PQ params m=$m k=$k topK=$topK")
    val dims = corpus.selectExpr(s"size($vecCol)").head().getInt(0)
    require(dims % m == 0, s"dims $dims not divisible into $m subspaces")
    val subDim = dims / m
    val (codes, cents) = trainAndEncode(corpus, idCol, vecCol, m, k, subDim)
    val lut = adcLut(queries, idCol, vecCol, cents, m, subDim)
    rankTopK(
      codes
        .join(broadcast(lut), Seq("sub", "code"))
        .groupBy("qid", "id")
        .agg(sum("d2").as("adc2")),
      topK, excludeSelf)
  }

  /** IVFADC: a COARSE full-vector k-means (the [[KMeans]] trainer,
    * `coarseIters` Lloyd iterations, k = `coarseK`) partitions the
    * corpus into inverted lists; each query probes its `nprobe` nearest
    * coarse centroids by exact integer distance; ADC scores ONLY the
    * probed lists' members. Same output contract as [[adcTopK]] —
    * approximate twice over (list pruning + code quantization), which
    * is the documented PQ recall trade.
    *
    * Scale: the candidate set is the (probe, list-member) join —
    * ~N·Q·nprobe/coarseK pairs instead of N·Q; with coarseK sized by
    * the √N law the end-to-end cost curve is ~N^1.5. Both coarse frames
    * (doc lists, probe lists) are N- and Q-sized slim long rows; the
    * candidate join is an equi-join on the list id, never a nested
    * loop.
    *
    * Construction is DOCUMENTED-EAGER: exactly three bounded probe jobs
    * run before the caller's first action — a 1-row dims probe and two
    * limit-1 existence probes (coarse + sub-codebook dense-id init
    * guards). None scans the corpus; training stays lazy
    * (see `PQLazinessSpec`).
    *
    * `excludeSelf` as on [[adcTopK]].
    */
  def ivfAdcTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      coarseK: Int = 8,
      nprobe: Int = 2,
      m: Int = 2,
      k: Int = 4,
      topK: Int = 5,
      excludeSelf: Boolean = true): DataFrame = {
    require(coarseK >= 1 && nprobe >= 1, s"bad IVF params coarseK=$coarseK nprobe=$nprobe")
    require(m >= 1 && k >= 1 && topK >= 1, s"bad PQ params m=$m k=$k topK=$topK")
    val dims = corpus.selectExpr(s"size($vecCol)").head().getInt(0)
    require(dims % m == 0, s"dims $dims not divisible into $m subspaces")
    require(dims.toLong * coarseK < (1L << 31),
      s"dims * coarseK = ${dims.toLong * coarseK} overflows the packed argmin encoding")
    val subDim = dims / m

    // coarse lists: one full-vector Lloyd iteration + final assignment,
    // on the shared persisted quantized frame
    val qv = graft.ops.CacheScope.persisted(
      KMeans.quantizeVec(corpus, idCol, vecCol))
    val cc0 = qv.filter(col("id") < coarseK)
      .select(col("id").as("cluster"), col("qv").as("cva"))
    // limit-1 existence probe on the raw corpus (short-circuits; does
    // NOT materialize the persisted qv cache like a count() would)
    require(!corpus.filter(col(idCol) < coarseK).limit(1).isEmpty,
      s"coarse first-$coarseK init found no ids < $coarseK in '$idCol' — " +
        "IVFADC's id contract is dense 0-based (renumber upstream)")
    val ca1 = KMeans.assign(qv, cc0, coarseK)
    val cc1 = KMeans.centArrays(
      KMeans.update(KMeans.explodeQv(qv), ca1))
    ivfAdcCore(corpus, queries, idCol, vecCol, qv, cc1, coarseK, nprobe,
      m, k, subDim, topK, excludeSelf)
  }

  /** IVFADC against an EXTERNAL coarse quantizer — the serving half of
    * a trained index (the [[Similarity.ivfTopKWithCentroids]] precedent
    * applied to the PQ path): `centroidFrame` is any (centroid_id
    * numeric, centroid_vec array<double>) frame, e.g.
    * [[KMeans.trainedCentroids]]'s output, replacing [[ivfAdcTopK]]'s
    * internal one-iteration stand-in — same plan, better list balance,
    * and the quantizer trains ONCE upstream instead of per query.
    * Sub-codebooks still train on the corpus (they ARE the compression
    * layer). Centroids quantize to the integer grid on the way in, so
    * list assignment uses the same exact [[graft.functions.SqDistLong]]
    * arithmetic as training. Construction eagerness as [[ivfAdcTopK]]
    * plus one dim-sized centroid count probe (the argmin packing needs
    * the centroid-id bound).
    */
  def ivfAdcTopKWithCentroids(
      corpus: DataFrame,
      queries: DataFrame,
      centroidFrame: DataFrame,
      idCol: String,
      vecCol: String,
      nprobe: Int = 2,
      m: Int = 2,
      k: Int = 4,
      topK: Int = 5,
      excludeSelf: Boolean = true): DataFrame = {
    require(nprobe >= 1, s"bad IVF param nprobe=$nprobe")
    require(m >= 1 && k >= 1 && topK >= 1, s"bad PQ params m=$m k=$k topK=$topK")
    val dims = corpus.selectExpr(s"size($vecCol)").head().getInt(0)
    require(dims % m == 0, s"dims $dims not divisible into $m subspaces")
    // centroid-id bound for the packed argmin: ONE k-sized 1-row agg
    // probe that also validates the id contract — negative ids would
    // corrupt the packed argmin encoding and duplicate ids would
    // double-assign lists, both silently. GAPS are tolerated (a trained
    // quantizer legitimately loses empty Lloyd clusters); they only
    // waste encoding range, so coarseK = max+1 still bounds it — but a
    // grossly OFFSET id space (min far above 0) inflates coarseK toward
    // the dims*coarseK overflow guard, hence the fail-loud message
    // names renumbering.
    val probe = centroidFrame.agg(
      max(col("centroid_id").cast("long")),
      min(col("centroid_id").cast("long")),
      count(lit(1)),
      countDistinct(col("centroid_id"))).head()
    require(!probe.isNullAt(0), "centroidFrame is empty")
    val coarseK = probe.getLong(0).toInt + 1
    require(probe.getLong(1) >= 0L,
      s"centroid ids must be nonnegative: min=${probe.getLong(1)} — " +
        "renumber the centroid frame (KMeans.trainedCentroids emits 0-based ids)")
    require(probe.getLong(2) == probe.getLong(3),
      s"duplicate centroid ids: ${probe.getLong(2)} rows over " +
        s"${probe.getLong(3)} distinct ids")
    require(coarseK >= 1 && dims.toLong * coarseK < (1L << 31),
      s"dims * coarseK = ${dims.toLong * coarseK} overflows the packed " +
        "argmin encoding — if the centroid id space is offset (min " +
        s"${probe.getLong(1)}), renumber it dense 0-based")
    val cc1 = centroidFrame.select(
      col("centroid_id").cast("long").as("cluster"),
      transform(col("centroid_vec"),
        x => (floor(x.cast("double") * 1000) + 32768).cast("long")).as("cva"))
    val qv = graft.ops.CacheScope.persisted(
      KMeans.quantizeVec(corpus, idCol, vecCol))
    ivfAdcCore(corpus, queries, idCol, vecCol, qv, cc1, coarseK, nprobe,
      m, k, dims / m, topK, excludeSelf)
  }

  /** Shared IVFADC tail: list assignment under `cc1`, probe selection,
    * candidate restriction, PQ encode + ADC scoring, ranking.
    */
  private def ivfAdcCore(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qv: DataFrame,
      cc1: DataFrame,
      coarseK: Int,
      nprobe: Int,
      m: Int,
      k: Int,
      subDim: Int,
      topK: Int,
      excludeSelf: Boolean): DataFrame = {
    val docLists = KMeans.assign(qv, cc1, coarseK)
      .select(col("id"), col("cluster").as("list"))

    // probe lists: nprobe nearest coarse centroids per query, exact
    // integer distance, ties to the smaller centroid id
    val probeWin = Window.partitionBy("qid").orderBy(col("cdist").asc, col("list").asc)
    val probeLists = KMeans.quantizeVec(queries, idCol, vecCol)
      .select(col("id").as("qid"), col("qv"))
      .crossJoin(broadcast(cc1))
      .select(
        col("qid"), col("cluster").as("list"),
        graft.functions.SqDistLong(col("qv"), col("cva")).as("cdist"))
      .withColumn("rk", row_number().over(probeWin))
      .filter(col("rk") <= nprobe)
      .select("qid", "list")

    // candidate pairs = probed lists' members; bounded BEFORE scoring.
    // Both query-side joins are UN-HINTED on purpose: probeLists and
    // the LUT are Q-scale frames, and at corpus-scale query sets a
    // forced broadcast would collect them to the driver. AQE broadcasts
    // them while they fit; past that the joins fall back to shuffles on
    // healthy keys — `list` has coarseK (≈ √N in production) distinct
    // values and the LUT key includes qid. (adcTopK's LUT broadcast
    // stays hinted: its join key is only m·k-ary, so a shuffle there
    // would skew onto m·k partitions — that operator's contract bounds
    // Q instead.)
    val cand = docLists.join(probeLists, Seq("list"))
      .select("qid", "id")

    val (codes, cents) = trainAndEncode(corpus, idCol, vecCol, m, k, subDim)
    val lut = adcLut(queries, idCol, vecCol, cents, m, subDim)
    rankTopK(
      cand
        .join(codes, Seq("id"))
        .join(lut, Seq("qid", "sub", "code"))
        .groupBy("qid", "id")
        .agg(sum("d2").as("adc2")),
      topK, excludeSelf)
  }
}
