package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.Exchange

/** Plan-shape regression guard: the round-2 performance work fixed
  * concrete plan properties (single probe scan in FallbackJoin queries,
  * bounded shuffle count in the LSH pipeline, broadcast-only dim
  * chains). This spec pins those properties so a refactor that silently
  * reintroduces a rescan or an extra shuffle fails CI, not the bench.
  */
class PlanGuardSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // AQE wraps the physical plan in AdaptiveSparkPlanExec, whose final
  // shape only exists after execution; disable it here so the guard
  // inspects the deterministic static plan.
  private def planOf(q: String): SparkPlan = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  private def countNodes(p: SparkPlan, pred: SparkPlan => Boolean): Int = {
    var n = 0
    p.foreach(node => if (pred(node)) n += 1)
    n
  }

  private def scans(p: SparkPlan): Int =
    countNodes(p, _.nodeName.toLowerCase.contains("scan"))

  private def exchanges(p: SparkPlan): Int =
    countNodes(p, _.isInstanceOf[Exchange])

  test("driver contract: every query has an oracle and every oracle a query") {
    // A queries entry whose oracleSql key is missing (or misspelled)
    // silently downgrades to the driver's weaker rows-only check — the
    // same invisible-degradation class as the r9 dropped-row bug. Keep
    // the two maps in exact 1:1 correspondence.
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("q03 fallback join: ONE probe scan + one scan per stage dim") {
    // 1 probe (orders) + 2 dims; the remainder-cascade formulation had 6
    assert(scans(planOf("q03_fallback_join")) <= 3)
  }

  test("q29 dim chain: all three joins broadcast, no fact-side shuffle exchange") {
    val p = planOf("q29_concept_chain")
    val shuffles = countNodes(p,
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
    assert(shuffles === 0, p.toString.take(600))
  }

  test("q23 LSH pipeline: shingle corpus shuffles once (bounded exchange count)") {
    // repartition + sig groupBy + band groupBy + pairs distinct + the
    // candidate-id semi-joins + verify joins. Every exchange past the
    // signature groupBy carries CANDIDATE-sized rows only (the slim
    // index never persists shingle text); AQE turns the small ones into
    // broadcasts at runtime.
    assert(exchanges(planOf("q23_lsh_pairs")) <= 8)
  }

  test("q15 aggregation partial-merges map-side (2 HashAggregates, 1 exchange)") {
    val p = planOf("q15_scalar_stats")
    assert(exchanges(p) === 1)
    assert(countNodes(p, _.nodeName.contains("HashAggregate")) === 2)
  }

  test("q26 merge-split shuffles scalar rows only (2 exchanges, no window)") {
    val p = planOf("q26_merge_split")
    assert(exchanges(p) <= 2, p.toString.take(400))
    assert(countNodes(p, _.nodeName.toLowerCase.contains("window")) === 0)
  }

  test("q38 near-dup pairs form via band equi-join — no nested-loop/cartesian join") {
    val p = planOf("q38_embed_neardup")
    val nl = countNodes(p, n => n.nodeName.contains("BroadcastNestedLoop") ||
      n.nodeName.contains("CartesianProduct"))
    assert(nl === 0, p.toString.take(600))
  }

  test("r7 top-10 exchange budgets: q20 / q48 / q56 / q59 keep their measured plan shape") {
    // budgets = the counts `Profile plancounts` measured on the tuned
    // plans (AQE off). A refactor that adds a shuffle to any of the
    // bench's most expensive queries fails here, not in the driver run.
    val budgets = Map(
      "q20_minhash" -> 1, // the one signature hash-agg shuffle
      "q48_vcf_reconcile" -> 3, // derived-key equi-joins for the ±1 pad shifts
      // slim corpus index + batch probe + capped verify, +2 slim
      // exchanges (r9): the bucket-size prune now counts-then-joins
      // BEFORE collect_list so an exhausted band space never buffers an
      // oversized bucket — both added exchanges carry (band)/(band,id)
      // rows only, a deliberate trade for bounded aggregation buffers
      "q56_incr_dedup" -> 8,
      "q59_annot_merge" -> 2) // phase-1 + phase-2 merge groupBys
    val over = budgets.toSeq.sorted.flatMap { case (q, b) =>
      val n = exchanges(planOf(q))
      if (n > b) Some(s"$q exchanges=$n > budget $b") else None
    }
    assert(over.isEmpty, over.mkString("; "))
  }

  test("r8 query budgets: child diffs / decontam / repetition keep shape; filters stay scan-pure") {
    // q62/q63: identity-match join + child full-outer diff; q68: bench
    // distinct + broadcast + per-doc agg; q69: (id,gram) then (id)
    // aggs + stats join. q65's whole filter chain must stay INSIDE the
    // scan stage (0 exchanges) — it's the model for 100 TB pushdown.
    val budgets = Map(
      "q62_child_hgvs_diff" -> 3, "q63_child_mappos_diff" -> 3,
      "q65_carpe_filter" -> 0, "q68_decontam" -> 3, "q69_repetition" -> 3,
      "q70_boilerplate" -> 4, "q71_domain_stats" -> 2,
      // r9: q73 = full-outer diff (2) + per-aspect guard stats agg +
      // its broadcast back; q74 = two counter groupBys + union sort;
      // q75 = pure scalar chain, must stay INSIDE the scan stage
      "q73_annot_probe" -> 4, "q74_parser_skips" -> 4,
      "q75_trait_strip" -> 0,
      // r9: q76 = span-hash index agg + membership join + per-doc
      // rollup + final doc join — all slim keys (8-byte hash / doc id)
      "q76_span_dedup" -> 5,
      // r9: q77 = centroid-assign argmax agg + within-cluster self-join
      // + loser distinct + keep anti-join (its one BNLJ is the q44-style
      // broadcast of the dim-sized stride centroids). r10: +1 for the
      // slim-score assignment's per-id vector join-back — the trade
      // that keeps the N·nlist score fold in HashAggregate (vectors
      // and struct orderings out of the agg buffer)
      "q77_semdedup" -> 6,
      // r9: q78 = scan-side regex canonicalization + ONE groupBy on the
      // canonical key
      "q78_url_dedup" -> 1)
    val over = budgets.toSeq.sorted.flatMap { case (q, b) =>
      val n = exchanges(planOf(q))
      if (n > b) Some(s"$q exchanges=$n > budget $b") else None
    }
    assert(over.isEmpty, over.mkString("; "))
    // decontam's corpus side must probe a BROADCAST of the benchmark
    // grams — a refactor that shuffles the corpus on gram fails here
    val p = planOf("q68_decontam")
    assert(countNodes(p, _.nodeName.contains("BroadcastHashJoin")) === 1, p.toString.take(600))
  }

  test("r9 corpus-ops budgets: top-k stays TakeOrdered, policy filter stays scan-pure") {
    // q80: two-level agg = 2 shuffles, then the top-k must plan as
    // TakeOrderedAndProject (per-partition k to the driver) — a global
    // sort here would shuffle the whole gram table; q81: the C4 filter
    // is a pure HOF composite and must stay INSIDE the scan stage;
    // q84: bloom prefilter (scan-side UDF) + exact verify semi-join +
    // per-doc agg — the corpus grams shuffle only AFTER the prefilter
    // q85: ONE hash exchange (the pass-B group repartition of the
    // already-pruned <= n·P rows); pass A is sortWithinPartitions only.
    // q86: topKNgrams' 2 aggs + the global sketch agg's partial merge +
    // the broadcast of the 1-row sketch
    // q87: the final frame is the prefix-summed RDD (like q83); all the
    // curation exchanges happen at construction inside curate()
    // q88: ONE shuffle — the per-doc margin agg on slim (id, weight)
    val budgets = Map(
      "q80_topk_ngrams" -> 2, "q81_policy_filter" -> 0, "q84_decontam_bloom" -> 3,
      "q85_stratified_sample" -> 1, "q86_cms_heavyhitters" -> 5,
      "q87_curation_e2e" -> 0, "q88_hash_classifier" -> 1)
    val over = budgets.toSeq.sorted.flatMap { case (q, b) =>
      val n = exchanges(planOf(q))
      if (n > b) Some(s"$q exchanges=$n > budget $b") else None
    }
    assert(over.isEmpty, over.mkString("; "))
    val p80 = planOf("q80_topk_ngrams")
    assert(countNodes(p80, _.nodeName.contains("TakeOrderedAndProject")) === 1,
      p80.toString.take(600))
    // q83's output frame is the prefix-summed RDD: the shard assignment
    // itself adds NO exchange beyond the one range repartition inside
    // packByTokenBudget (which happens at construction, not in this plan)
    assert(exchanges(planOf("q83_shard_pack")) === 0)
  }

  test("r9 retrieval / k-means / adaptive-cutoff budgets") {
    // q90: branches over the CACHED postings (cache scan pinned in the
    // next test) — df/dl/stats derivations + the score agg + the
    // window's per-query exchange. q91 (iters=2): the two assign
    // passes' agg pairs + the update's (id) join pair + (cluster,dim)
    // agg, all over the cached exploded frame.
    // q92: the percentile agg + the join back — the domain frame side.
    // q93: q91's training exchanges + the IVF serving aggs; its two
    // nested-loop joins are the q44-sanctioned dim-sized centroid
    // crossJoins (assignment + probe ranking). q94: two domain-frame
    // aggs + the 1-row total + the rates join; the replication explode
    // adds no exchange.
    val budgets = Map(
      "q90_retrieval" -> 11, "q91_kmeans" -> 8, "q92_adaptive_cutoff" -> 2,
      // q93: r10 +1 — the serving assignment's slim-score join-back
      // (see q77's budget note)
      "q93_ivf_trained" -> 16, "q94_temperature_mix" -> 5)
    val over = budgets.toSeq.sorted.flatMap { case (q, b) =>
      val n = exchanges(planOf(q))
      if (n > b) Some(s"$q exchanges=$n > budget $b") else None
    }
    assert(over.isEmpty, over.mkString("; "))
    // q90: query terms and df/dl frames probe as BROADCAST hash joins —
    // the corpus-sized postings never shuffle for them; the ONLY
    // nested-loop is the sanctioned 1-row stats crossJoin
    val p90 = planOf("q90_retrieval")
    assert(countNodes(p90, _.nodeName.contains("BroadcastHashJoin")) === 3,
      p90.toString.take(800))
    assert(countNodes(p90, _.nodeName.contains("BroadcastNestedLoop")) === 1,
      p90.toString.take(800))
    // q91: both assignment passes meet the dim-sized centroid frame as
    // a BROADCAST nested loop over VECTOR rows (N·k SqDistLong rows —
    // the r11 rework; the earlier per-dim BroadcastHashJoin shape
    // pushed N·D·k rows through the aggregators), and the argmin must
    // stay inside HashAggregate — min(struct(...)) regressed to
    // SortAggregate
    val p91 = planOf("q91_kmeans")
    assert(countNodes(p91, _.nodeName.contains("BroadcastNestedLoop")) >= 2,
      p91.toString.take(800))
    assert(countNodes(p91, _.nodeName.contains("SortAggregate")) === 0,
      p91.toString.take(800))
    // q95 (trained-quantizer SemDeDup): q91's training plan + serving.
    // Same laws — the argmax/argmin aggs stay hash-based, and every
    // nested loop is a dim-sized broadcast-centroid assignment
    // crossJoin (2 training assigns + 1 serving assign); the
    // within-cluster pair join is an equi-join on centroid_id, NEVER a
    // corpus-sized nested loop.
    val p95 = planOf("q95_semdedup_trained")
    assert(countNodes(p95, _.nodeName.contains("SortAggregate")) === 0,
      p95.toString.take(800))
    assert(countNodes(p95, _.nodeName.contains("BroadcastNestedLoop")) <= 3,
      p95.toString.take(800))
  }

  test("q90/q91: the shared frame is cached, not re-derived per branch") {
    // q90's postings feed four consumers (probe/df/dl/stats), q91's
    // exploded quantized frame feeds every assign+update branch. Column
    // pruning makes each branch's subtree canonically DISTINCT, so
    // exchange reuse never fires and an unpersisted formulation
    // tokenizes / explodes a 100 TB corpus once per branch — the
    // operators persist instead (CacheScope), and the plan must show
    // the in-memory scan.
    for (q <- Seq("q90_retrieval", "q91_kmeans")) {
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
        s"$q shows no cached scan:\n" + plan.take(800))
    }
    graft.ops.CacheScope.releaseAll()
  }

  test("bestOfN (q166's selection): rank-then-filter plans as WindowGroupLimit (per-partition top-k before the shuffle)") {
    // the scale story of top-k selection: each input partition keeps a
    // running top-k per prompt BEFORE the window shuffle, so a viral
    // prompt's millions of candidates never ride the exchange — only
    // <= k per (partition, prompt). A refactor that breaks the
    // rank<=k pattern (a second window over the same key, or ranking
    // into a column and filtering later) silently loses the pushdown
    // and this guard names it. Pinned on the OPERATOR's plan: inside
    // q166 the selection sits behind bestOfNSequences' lineage-cut
    // LogicalRDD leaf, where the final plan cannot show it.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val docs = spark.read.parquet(s"$sfDir/events.parquet")
        .selectExpr("props AS prompt", "event_id AS cand",
          "props AS content", "value AS signal")
      val p = graft.scale.Dialogue
        .bestOfN(docs, "prompt", "cand", "content", "signal", 2)
        .queryExecution.executedPlan
      assert(countNodes(p, _.nodeName.contains("WindowGroupLimit")) >= 1,
        p.toString.take(800))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    graft.ops.CacheScope.releaseAll()
  }

  test("q172 curriculum: ZERO window operators — in-band positions come from the two-phase offset pass, never Window.partitionBy(bucket)") {
    // the r17 weak plan: row_number over Window.partitionBy(bucket)
    // puts corpus/buckets rows in ONE sort task (~10 TB per band at the
    // 100 TB target with the default 10 bands; buckets = 1 would be a
    // full-corpus single task). The rewrite range-sorts (bucket, md5,
    // id) and assigns dense per-band positions via the per-partition
    // offset pass, so the emitted plan is a union of LogicalRDD leaves
    // with NO window node anywhere — pinned here; a regression that
    // reintroduces any window (band-keyed or otherwise) fails by name.
    // (The internal sorts sit behind the RDD leaves and are range
    // partitioned by construction.)
    val p = planOf("q172_curriculum_order")
    assert(countNodes(p, _.nodeName.toLowerCase.contains("window")) === 0,
      p.toString.take(800))
    graft.ops.CacheScope.releaseAll()
  }

  test("q101 runs the DISTRIBUTED propagation path, q50 the driver union-find") {
    // The two CC paths are a size switch (Dedup.connectedComponents):
    // below the threshold a driver union-find parallelizes its result
    // back out, above it the per-round join+min-agg loop runs eagerly
    // and registers its locally-checkpointed final-round RDD with
    // CacheScope (the r13 lineage cut). q101 passes driverThreshold=100
    // explicitly so the distributed path is the one the DuckDB oracle
    // gates — pin each query to its path so a threshold regression
    // can't silently swap them: only the distributed loop leaves an RDD
    // in the registry.
    graft.ops.CacheScope.releaseAll()
    SparkEntry.queries("q101_cc_distributed")(spark, sfDir)
    assert(graft.ops.CacheScope.registeredRddCount >= 1,
      "q101 did not take the distributed propagation path (no checkpointed rounds)")
    graft.ops.CacheScope.releaseAll()
    SparkEntry.queries("q50_dedup_cluster")(spark, sfDir)
    assert(graft.ops.CacheScope.registeredRddCount === 0,
      "q50 did not take the driver union-find path (checkpointed rounds present)")
    graft.ops.CacheScope.releaseAll()
  }

  test("q103/q104: aggs stay hash-based; PQ nested loops are codebook broadcasts only") {
    // q103: model counts and scoring sums are string-keyed groupBys —
    // all HashAggregate (map-side partials), no window, no sort path.
    val p103 = planOf("q103_bigram_surprisal")
    assert(countNodes(p103, _.nodeName.contains("SortAggregate")) === 0,
      p103.toString.take(800))
    assert(countNodes(p103, _.nodeName.toLowerCase.contains("window")) === 0,
      p103.toString.take(800))
    // q104: the only nested loops are the 4 k-sized codebook broadcast
    // assignments (per subspace: training assign + encode assign); the
    // LUT probe is an equi-join and the packed argmin/ADC sums stay in
    // HashAggregate.
    val p104 = planOf("q104_pq_adc")
    assert(countNodes(p104, _.nodeName.contains("BroadcastNestedLoop")) === 4,
      p104.toString.take(800))
    assert(countNodes(p104, _.nodeName.contains("SortAggregate")) === 0,
      p104.toString.take(800))
    // q105 adds the coarse layer: +2 k-sized assignment broadcasts and
    // the probe crossJoin (7 total); the candidate restriction itself
    // must stay an equi-join on the list id — pinned by the global
    // CartesianProduct guard plus the exact nested-loop budget here.
    val p105 = planOf("q105_ivfadc")
    assert(countNodes(p105, _.nodeName.contains("BroadcastNestedLoop")) === 7,
      p105.toString.take(800))
    assert(countNodes(p105, _.nodeName.contains("SortAggregate")) === 0,
      p105.toString.take(800))
    graft.ops.CacheScope.releaseAll()
  }

  test("q111/q112/q113: as-of has NO join node, range join has NO nested loop, chunking is scan-pure") {
    // q111: the union-and-sweep formulation replaces the join entirely —
    // any *Join node means the range-scan regression came back
    val p111 = planOf("q111_asof_join")
    assert(countNodes(p111, _.nodeName.contains("Join")) === 0,
      p111.toString.take(800))
    // q116/q119: the multi-payload and forward sweeps must ALSO stay
    // joinless AND aggregate-free (the struct tertiary sort replaced
    // the equal-ts dedup aggregation)
    Seq("q116_asof_payload", "q119_asof_next").foreach { q =>
      val p = planOf(q)
      assert(countNodes(p, _.nodeName.contains("Join")) === 0,
        s"$q: " + p.toString.take(800))
      assert(countNodes(p, _.nodeName.contains("Aggregate")) === 0,
        s"$q: " + p.toString.take(800))
    }
    // q112: the grid-bucket formulation's entire reason to exist is the
    // equi-join plan; a BroadcastNestedLoop/CartesianProduct here means
    // Spark fell back to the inequality join
    val p112 = planOf("q112_range_join")
    assert(countNodes(p112, _.nodeName.contains("BroadcastNestedLoop")) === 0,
      p112.toString.take(800))
    assert(countNodes(p112, n =>
      n.nodeName.contains("SortMergeJoin") || n.nodeName.contains("ShuffledHashJoin") ||
        n.nodeName.contains("BroadcastHashJoin")) === 1,
      p112.toString.take(800))
    // q117: the overlap variant must keep the same single-equi-join shape
    val p117 = planOf("q117_interval_overlap")
    assert(countNodes(p117, _.nodeName.contains("BroadcastNestedLoop")) === 0,
      p117.toString.take(800))
    assert(countNodes(p117, n =>
      n.nodeName.contains("SortMergeJoin") || n.nodeName.contains("ShuffledHashJoin") ||
        n.nodeName.contains("BroadcastHashJoin")) === 1,
      p117.toString.take(800))
    // q113: chunking must stay a pure scan — the only exchange is the
    // explicit repartition in the query definition
    val p113 = planOf("q113_chunk_windows")
    assert(exchanges(p113) <= 1, p113.toString.take(800))
    assert(countNodes(p113, _.nodeName.contains("Join")) === 0,
      p113.toString.take(800))
    graft.ops.CacheScope.releaseAll()
  }

  test("q70 boilerplate: AQE broadcasts the un-hinted repeated-line index at sf0.1") {
    // The index join carries no hint (on a 100 TB crawl the repeated-
    // line set can outgrow broadcast and MUST be allowed to stay a
    // shuffle join — TextStats.boilerplateLines scaladoc). This pins
    // the other side of that contract: when the index IS small, AQE's
    // runtime rewrite must turn the probe into a broadcast-hash join —
    // a regression that pre-shuffles the lines frame for a static
    // sort-merge join fails here.
    val df = SparkEntry.queries("q70_boilerplate")(spark, "/root/testdata/sf0.1")
    df.queryExecution.executedPlan // force planning under AQE (enabled)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("BroadcastHashJoin"),
      "AQE did not broadcast the repeated-line index:\n" + finalPlan.take(800))
  }

  test("NO query plan contains a single-partition shuffle (scale-killer guard)") {
    // budgeted exemptions — both are GLOBAL AGGREGATIONS whose exchange
    // carries one partially-aggregated row per upstream partition:
    //   q07: the global delete-fraction guard over per-action counters
    //   q51: max(rgd_id) over the store for the surrogate-id base
    //   q79: the same max(rgd_id) base — q79 calls matchIdentity
    //        directly (q62/q63 hide theirs behind the pipeline cache)
    //   q82: the rank/cumsum window runs AFTER TakeOrderedAndProject
    //        cut the frame to k rows — its exchange carries <= k+1 rows
    //        at any corpus size (the vocabulary itself never rides it)
    //   q86: the global CmsSketch aggregation — the exchange carries
    //        one 8 KiB partial sketch per upstream partition
    //   q90: the global (n_docs, avgdl) stats — one partially-aggregated
    //        row per upstream partition of the cached postings
    //   q109: the same global stats agg (q90's chain + the conjunctive
    //        filter, which adds only a query-sized broadcast count)
    //   q94: the global Σ isqrt(n_domain) — over the domain-sized frame
    //   q98: the merged-sketch reassembly — the exchange carries at most
    //        depth·width (pos, count) rows (1024 here) at ANY corpus size
    //   q102: the recall report's THREE global counts (n_docs / n_true /
    //        n_lsh) — each exchange carries one partially-aggregated row
    //        per upstream partition; the report is one row by contract
    //   q106: the overlap report's three global aggs (n_grams_a /
    //        n_grams_b / bottom-k flags) — same 1-row-by-contract shape;
    //        the bottom-k cut itself is a TakeOrderedAndProject, not a
    //        global sort
    //   q118: the run-counter report — TEN global counts (one per
    //        pipeline stage, each one partial row per upstream
    //        partition); the report is ten rows by contract. Down from
    //        12 in r12: the mixture's Σ isqrt and the quantile gate's
    //        1-row agg now live below the lineage-cut stage caches
    //   q123: the incremental run's ELEVEN stage counts (q118's ten
    //        plus the incumbent-filter stage) — same 1-row contract
    //   q133/q134: DSIR's two smoothing-total aggs (Σq over the
    //        bucket-sized count frames) — 1-row stats frames feeding
    //        the broadcast constant; the selection itself is
    //        TakeOrdered, never a global sort
    //   q135: the water-fill windows run unpartitioned over the
    //        POST-AGGREGATION domain frame (domain-count-sized by
    //        contract; the corpus-sized token count upstream is a
    //        hash agg)
    //   q136: the drift totals frame — ONE global agg (ps, qs) over the
    //        bucket-sized full-joined count frame, broadcast back as
    //        the smoothing constants; corpus size only enters the two
    //        upstream keyed token aggs
    //   q137: the per-domain min-loss 1-row agg (the DoReMi "best
    //        domain" baseline) + q135's water-fill window over the
    //        domain frame — both domain-count-sized by contract
    //   q138: the min-loss agg + FOUR per-round ppm-normalization
    //        1-row aggs (rounds = 4 by the query's contract) — every
    //        one over the domain-count-sized weight frame
    //   q139: q136's drift totals frame over the two snapshot reads —
    //        the same single 1-row (ps, qs) agg class
    //   q141: the drift totals frame + the centroid-count 1-row agg
    //        (the cell-space size is data-derived, unlike q136's
    //        literal hash space) — both over bucket/dim-sized frames
    //   q145: q141's two drift-tail aggs over the TRAINED cell system
    //        (the k-means training itself is keyed aggs only)
    //   q146: the piece-vocabulary rank window — vocabulary-sized by
    //        construction (the merge-argmax size class); the stream
    //        layout itself is keyed aggs + the two-phase prefix sum
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val budgets = Map(
      "q07_guarded_delete" -> 1, "q51_insert_ids" -> 1, "q79_merge_shapes" -> 1,
      "q82_vocab_coverage" -> 1, "q86_cms_heavyhitters" -> 1, "q90_retrieval" -> 1,
      "q94_temperature_mix" -> 1, "q98_cms_merge" -> 1, "q102_lsh_recall" -> 3,
      "q106_corpus_overlap" -> 3, "q109_retrieval_conj" -> 1,
      "q118_pretrain_counters" -> 10,
      "q123_incr_counters" -> 11,
      "q133_dsir_topk" -> 2, "q134_dsir_gumbel" -> 2,
      "q135_token_budget" -> 1,
      "q136_domain_drift" -> 1, "q137_loss_aware_alloc" -> 2,
      "q138_doremi_rounds" -> 5, "q139_snapshot_drift" -> 1,
      "q141_embedding_drift" -> 2, "q145_embedding_drift_trained" -> 2,
      "q146_packed_token_ids" -> 1, "q151_sft_sequences" -> 1,
      "q153_bestfit_sequences" -> 1, "q155_sft_curate" -> 1,
      // q156: four 1-row stage-count aggs over dialogue-count-sized frames
      "q156_sft_counters" -> 4,
      // q160: the preference chain's four 1-row stage counts — each over
      // the pair-count-sized (prompt-bounded) frames; q156's contract
      "q160_pref_counters" -> 4,
      // q158/q162: the oversize policies' one 1-row max-shard agg (the
      // appended-shard offset, broadcast back) over the layout frame
      "q158_oversize_split" -> 1, "q162_oversize_truncate" -> 1,
      // q154: the two 1-row halves of the waste report (bins rollup +
      // oversize count), crossed via broadcast — both bin/doc-count-sized
      "q154_bestfit_waste" -> 2,
      // q166: the sequence packing's prefix pass over the selected
      // samples (q151's class)
      "q166_bestofn_sequences" -> 1,
      // q170: the five 1-row stage counts of the best-of-n report —
      // q156/q160's contract with the extra selected stage
      "q170_bestofn_counters" -> 5,
      // q172: the 1-row total-count agg feeding the band-cut broadcast
      // (the rank itself is range-sort + zipWithIndex — no window)
      "q172_curriculum_order" -> 1,
      // q177/q180: the manifest fscks' three 1-row SIZE aggs plus the
      // quarantine's epoch-gap max agg — the violation counters are now
      // the quarantine frame's per-label counts (a KEYED agg, off this
      // budget; r19's counters == labels refactor)
      "q177_manifest_check" -> 4, "q180_manifest_check_bestfit" -> 4,
      // q181: the quarantine frame itself — only the epoch-gap max agg
      // is global; every label branch is keyed
      "q181_manifest_quarantine" -> 1,
      // q182: the piece-vocabulary rank window inside encodeIndexedIds —
      // q146's vocabulary-sized-by-construction class; the interleave
      // and the channel materializer add keyed work only
      "q182_interleaved_sequences" -> 1,
      // q184: the same encode rank window; the boundary derivation is
      // pure per-row array expressions (no shuffle, no window)
      "q184_attention_segments" -> 1,
      // q185: one keyed agg over the FFD layout + per-row prefix-sum
      // fold — no global aggs (omit would be 0; listed for the record)
      "q185_bestfit_segments" -> 0,
      // q179: q172's 1-row total-count agg (the schedule it filters)
      "q179_curriculum_resume" -> 1,
      // q178: TWO piece-vocabulary rank windows (the round-trip's
      // explicit encode + vocab frames each rank the piece space) —
      // q146's vocabulary-sized-by-construction class
      "q178_bpe_roundtrip" -> 2,
      // q186/q187: the embedded quarantine's epoch-gap max agg (q181's
      // class); the repair itself is keyed joins, an (epoch, seq_id)
      // dedup window, and budget-bounded gap-refill windows — no
      // global aggs
      "q186_manifest_repair" -> 1,
      "q187_manifest_repair_bestfit" -> 1,
      // q188: the piece-vocabulary rank window inside encodeIndexedIds
      // (q182's class); the layout and the channel materializer are
      // keyed aggs/joins + budget-bounded windows only
      "q188_interleaved_bestfit" -> 1,
      // q190/q191: TWO curriculumOrder runs (the schedule under test +
      // the quarantine's expected re-derivation), each with q172's
      // 1-row total-count agg feeding the band-cut broadcast
      "q190_curriculum_quarantine" -> 2,
      "q191_curriculum_repair" -> 2,
      // q192: q188's encode rank window; the segment join adds one
      // keyed agg over the cut layout
      "q192_multimodal_sft" -> 1)
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { q =>
      val n = countNodes(planOf(q), {
        case e: ShuffleExchangeExec => e.outputPartitioning == SinglePartition
        case _ => false
      })
      if (n > budgets.getOrElse(q, 0)) Some(s"$q has $n single-partition shuffle(s)")
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("NO query plan contains a CartesianProduct (scale-killer guard)") {
    // The non-broadcast cartesian join is the worst scale class: |A|·|B|
    // rows with BOTH sides shuffled to every pairing task. Every
    // sanctioned cross join in the surface (1-row stats frames,
    // dim-sized centroid/plane frames) must plan as
    // BroadcastNestedLoopJoin — if one ever degrades to
    // CartesianProductExec (e.g. a broadcast hint lost in a refactor,
    // or a stats regression making Spark think both sides are big),
    // this guard names it before the driver's bench melts.
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { q =>
      val n = countNodes(planOf(q), _.nodeName.contains("CartesianProduct"))
      if (n > 0) Some(s"$q has $n CartesianProduct(s)") else None
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}
