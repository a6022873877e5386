package graft.scale

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws of the preference-pair family (q157/q160/q161): assembly
  * determinism, the PAIR-LEVEL gating contract (a gated side drops the
  * pair whole — no re-pairing), counter conservation, and the two-side
  * masked-sequence materialization.
  */
class PreferencePairsSpec extends SparkSpec {

  import spark.implicits._

  // (prompt, cand_id, content, signal)
  private def responses = Seq(
    // p1: plain best-vs-worst — chosen 12 (s=3), rejected 10 (s=1)
    ("p1", 10L, "alpha beta gamma", 1.0),
    ("p1", 11L, "beta gamma delta", 2.0),
    ("p1", 12L, "gamma delta epsilon", 3.0),
    // p2: all-equal signals — no preference evidence, no pair
    ("p2", 20L, "one two three", 5.0),
    ("p2", 21L, "two three four", 5.0),
    // p3: single candidate — nothing to contrast, no pair
    ("p3", 30L, "solo content here", 9.0),
    // p4: ties at both ends — chosen = LARGEST id among max signal,
    // rejected = SMALLEST id among min signal (struct-order contract)
    ("p4", 40L, "tie max a", 5.0),
    ("p4", 41L, "tie max b", 5.0),
    ("p4", 42L, "tie min a", 1.0),
    ("p4", 43L, "tie min b", 1.0),
    // p5: null signal is excluded — cannot win or lose
    ("p5", 50L, "null signal side", Double.NaN), // replaced with null below
    ("p5", 51L, "real low side", 1.0),
    ("p5", 52L, "real high side", 4.0)
  ).toDF("prompt", "cand", "content", "signal")
    .withColumn("signal",
      when(col("cand") === 50L, lit(null).cast("double")).otherwise(col("signal")))

  test("preferencePairs: best-vs-worst by (signal, id), strict margin, null signals excluded") {
    val out = Dialogue.preferencePairs(responses, "prompt", "cand", "content", "signal")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet === Set("p1", "p4", "p5"))
    val p1 = out("p1")
    assert(p1.getLong(1) === 3L, "n_candidates")
    assert(p1.getLong(2) === 12L && p1.getDouble(3) === 3.0)
    assert(p1.getString(4) === "gamma delta epsilon")
    assert(p1.getLong(5) === 10L && p1.getDouble(6) === 1.0)
    assert(p1.getString(7) === "alpha beta gamma")
    assert(p1.getDouble(8) === 2.0, "margin")
    val p4 = out("p4")
    assert(p4.getLong(2) === 41L, "max-signal tie -> largest id chosen")
    assert(p4.getLong(5) === 42L, "min-signal tie -> smallest id rejected")
    val p5 = out("p5")
    assert(p5.getLong(1) === 2L, "null-signal candidate not counted")
    assert(p5.getLong(2) === 52L && p5.getLong(5) === 51L)
  }

  test("gating is PAIR-LEVEL: a gated side drops the pair whole — never re-paired") {
    val emptyHoldout = Seq.empty[(Long, String)].toDF("cand", "content")
    // p1's CHOSEN (12) is invalid: the pair vanishes even though a
    // valid second-best (11, s=2) could have formed a pair with 10 —
    // re-pairing would be a different preference judgment than logged
    val invalid = Seq(12L).toDF("cand")
    val out = Dialogue.gatedPreferencePairs(
      responses, invalid, emptyHoldout, "prompt", "cand", "content", "signal")
      .collect().map(_.getString(0)).toSet
    assert(out === Set("p4", "p5"), "p1 dropped whole, not re-paired")

    // leakage on the REJECTED side only: same whole-pair drop
    val noInvalid = Seq.empty[Long].toDF("cand")
    val holdout = Seq((999L, "alpha beta gamma")).toDF("cand", "content")
    val out2 = Dialogue.gatedPreferencePairs(
      responses, noInvalid, holdout, "prompt", "cand", "content", "signal")
      .collect().map(_.getString(0)).toSet
    assert(out2 === Set("p4", "p5"), "p1 dropped for its rejected side's leak")
  }

  test("preferencePairCounters: conservation and agreement with the gated frame") {
    val invalid = Seq(41L).toDF("cand") // gates p4 (chosen side)
    val holdout = Seq((999L, "alpha beta gamma")).toDF("cand", "content") // gates p1
    val counters = Dialogue.preferencePairCounters(
      responses, invalid, holdout, "prompt", "cand", "content", "signal")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counters("pairs_total") === 3L)
    assert(counters("pairs_invalid_side") === 1L)
    assert(counters("pairs_contaminated_valid") === 1L)
    assert(counters("pairs_kept") === 1L)
    assert(counters("pairs_total") ===
      counters("pairs_invalid_side") + counters("pairs_contaminated_valid") +
        counters("pairs_kept"), "conservation")
    val kept = Dialogue.gatedPreferencePairs(
      responses, invalid, holdout, "prompt", "cand", "content", "signal").count()
    assert(kept === counters("pairs_kept"))
  }

  test("groupAdvantages: integer mean-centering, residue law, min group size, zero-spread groups emit") {
    val r = Seq(
      ("g1", 1L, "a", 1.0), ("g1", 2L, "b", 2.0), ("g1", 3L, "c", 3.0),
      ("g2", 4L, "d", 5.0), ("g2", 5L, "e", 5.0), // zero spread
      ("g3", 6L, "f", 9.0),                       // single -> dropped
      ("g4", 7L, "g", 1.0), ("g4", 8L, "h", 2.0), ("g4", 9L, "i", 2.5)
    ).toDF("prompt", "cand", "content", "signal")
    val out = Dialogue.groupAdvantages(r, "prompt", "cand", "content", "signal")
      .collect()
      .map(x => x.getLong(1) -> (x.getString(0), x.getLong(3), x.getLong(4),
        x.getLong(5), x.getLong(6)))
      .toMap
    assert(!out.contains(6L), "single-candidate group dropped")
    // g1: exact milli mean 2000, advantages -1000/0/1000, sum 0
    assert(out(1L)._5 === -1000L && out(2L)._5 === 0L && out(3L)._5 === 1000L)
    // g2: zero spread still emits, all-zero advantages
    assert(out(4L)._5 === 0L && out(5L)._5 === 0L)
    // g4: 1000+2000+2500 = 5500 div 3 = 1833 -> residue law 0 <= sum < n
    assert(out(7L)._4 === 1833L, "integral mean")
    val g4sum = Seq(7L, 8L, 9L).map(out(_)._5).sum
    assert(g4sum >= 0L && g4sum < 3L, s"residue law, got $g4sum")
    out.values.foreach { case (_, sm, n, mean, adv) =>
      assert(adv === sm - mean && n >= 2L)
    }
    // NaN / out-of-range signals fail loud (the non-ANSI cast would
    // otherwise CLAMP them into a silent group-mean shift)
    val bad = Seq(("p", 1L, "a", Double.NaN), ("p", 2L, "b", 1.0))
      .toDF("prompt", "cand", "content", "signal")
    val err = intercept[Exception] {
      Dialogue.groupAdvantages(bad, "prompt", "cand", "content", "signal").collect()
    }
    assert(err.getMessage != null)
    val big = Seq(("p", 1L, "a", 1e17), ("p", 2L, "b", 1.0))
      .toDF("prompt", "cand", "content", "signal")
    val err2 = intercept[Exception] {
      Dialogue.groupAdvantages(big, "prompt", "cand", "content", "signal").collect()
    }
    assert(err2.getMessage != null)
  }

  test("gatedGroupAdvantages: candidate-level gating RE-NORMALIZES the group (the pair-level contrast)") {
    val r = Seq(
      ("g1", 1L, "leaky content here", 1.0), ("g1", 2L, "b", 2.0),
      ("g1", 3L, "c", 3.0),
      ("g5", 4L, "only mate leaks gone", 7.0), ("g5", 5L, "solo left", 1.0)
    ).toDF("prompt", "cand", "content", "signal")
    val holdout = Seq((99L, "leaky content here"), (98L, "only mate leaks gone"))
      .toDF("cand", "content")
    val noInvalid = Seq.empty[Long].toDF("cand")
    val out = Dialogue.gatedGroupAdvantages(
      r, noInvalid, holdout, "prompt", "cand", "content", "signal")
      .collect().map(x => x.getLong(1) -> (x.getLong(4), x.getLong(5), x.getLong(6)))
      .toMap
    // g1's leaky candidate (1) is out; the mean recomputes over the TWO
    // survivors (2500), NOT the original three (2000) — re-normalization
    assert(!out.contains(1L))
    assert(out(2L) === ((2L, 2500L, -500L)) && out(3L) === ((2L, 2500L, 500L)))
    // g5 drops below 2 survivors -> gone entirely
    assert(!out.contains(4L) && !out.contains(5L))
  }

  test("preferenceSequences: both sides materialize, prompt tokens mask 0, response tokens mask 1") {
    val pairs = Dialogue.preferencePairs(
      responses, "prompt", "cand", "content", "signal")
    val promptTexts = responses.select(col("prompt")).distinct()
      .withColumn("ptext", concat(lit("prompt text for "), col("prompt")))
    val merges = Bpe.trainMergesFast(
      responses.select(col("content").as("text")), "text", 2)
    val out = ShardUtilForTest.collectSeqs(
      Dialogue.preferenceSequences(pairs, promptTexts, "prompt", "ptext",
        merges, seqLen = 8L))
    // token conservation: every side is prompt + response, encoded whole
    val sides = pairs.collect().flatMap { r =>
      val pt = s"prompt text for ${r.getString(0)}"
      Seq((r.getLong(2) * 2L, pt, r.getString(4)),
        (r.getLong(5) * 2L + 1L, pt, r.getString(7)))
    }
    def nTok(text: String): Long =
      "[a-z0-9]+".r.findAllIn(text.toLowerCase)
        .map(w => Bpe.applyMergesLocal(w, merges).length.toLong).sum
    val wantTotal = sides.map { case (_, p, c) => nTok(p) + nTok(c) }.sum
    val wantMasked = sides.map { case (_, _, c) => nTok(c) }.sum
    assert(out.map(_._2).sum === wantTotal, "token conservation")
    assert(out.map(_._6.count(_ == '1').toLong).sum === wantMasked,
      "mask 1 exactly on response tokens")
    assert(out.map(_._4).sum === sides.length.toLong, "every side starts once")
    // every non-terminal bin exactly full (the packSequences contract)
    val bins = out.map(b => b._1 -> b._2).toMap
    val lastBin = bins.keys.max
    bins.foreach { case (b, n) => if (b != lastBin) assert(n === 8L, s"bin $b full") }
  }

  test("preferenceTensors: whole sides, fixed width, mask pads 0, conservation") {
    val pairs = Dialogue.preferencePairs(
      responses, "prompt", "cand", "content", "signal")
    val promptTexts = responses.select(col("prompt")).distinct()
      .withColumn("ptext", concat(lit("prompt text for "), col("prompt")))
    val merges = Bpe.trainMergesFast(
      responses.select(col("content").as("text")), "text", 2)
    val seqLen = 64L
    val out = Dialogue.preferenceTensors(pairs, promptTexts, "prompt", "ptext",
        merges, seqLen, shardBudget = 128L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getSeq[Long](5), r.getSeq[Long](6)))
    val sides = pairs.collect().flatMap { r =>
      val pt = s"prompt text for ${r.getString(0)}"
      Seq((r.getLong(2) * 2L, pt, r.getString(4)),
        (r.getLong(5) * 2L + 1L, pt, r.getString(7)))
    }
    def pieces(text: String): Seq[Long] = {
      // local reference: vocab ids are the lexicographic rank over ALL
      // side-turn pieces (prompt + response contents)
      val allPieces = sides.flatMap { case (_, p, c) =>
        Seq(p, c).flatMap(t => "[a-z0-9]+".r.findAllIn(t.toLowerCase)
          .flatMap(w => Bpe.applyMergesLocal(w, merges)))
      }.distinct.sorted
      val ids = allPieces.zipWithIndex.toMap
      "[a-z0-9]+".r.findAllIn(text.toLowerCase)
        .flatMap(w => Bpe.applyMergesLocal(w, merges))
        .map(pc => ids(pc).toLong).toSeq
    }
    val wantBySide = sides.map { case (sid, p, c) =>
      sid -> (pieces(p) ++ pieces(c), pieces(p).map(_ => 0L) ++ pieces(c).map(_ => 1L))
    }.toMap
    // fixed width + mask pads 0 + conservation
    assert(out.map(_._4).sum === wantBySide.values.map(_._1.length.toLong).sum)
    out.foreach { case (sh, bn, _, fill, pad, tids, mask) =>
      assert(tids.length.toLong === seqLen && mask.length.toLong === seqLen,
        s"bin ($sh,$bn) fixed width")
      assert(pad === seqLen - fill)
      assert(tids.drop(fill.toInt).forall(_ === -1L), "token pad suffix")
      assert(mask.drop(fill.toInt).forall(_ === 0L), "mask pad suffix")
    }
    // WHOLE sides: each side's (token, mask) run appears contiguously
    // in exactly one bin
    val binStreams = out.map(b => (b._6.take(b._4.toInt), b._7.take(b._4.toInt)))
    wantBySide.foreach { case (sid, (toks, msk)) =>
      val hits = binStreams.count { case (ts, ms) =>
        ts.sliding(toks.length).zip(ms.sliding(msk.length).to(Iterable))
          .exists { case (tw, mw) => tw == toks && mw == msk }
      }
      assert(hits >= 1, s"side $sid contiguous in some bin")
    }
    // every side starts in exactly one bin overall (n_docs sums to sides)
    assert(out.map(_._3).sum === sides.length.toLong)
  }

  test("preferenceTensors: an oversize side fails the whole plan loud") {
    val pairs = Seq(
      ("p", 2L, 7L, 5.0, Seq.fill(30)("word").mkString(" "), 3L, 1.0, "tiny"))
      .toDF("prompt", "n_candidates", "chosen_id", "chosen_signal",
        "chosen_content", "rejected_id", "rejected_signal", "rejected_content")
      .withColumn("margin", col("chosen_signal") - col("rejected_signal"))
    val texts = Seq(("p", "the prompt")).toDF("prompt", "ptext")
    val err = intercept[Exception] {
      Dialogue.preferenceTensors(pairs, texts, "prompt", "ptext",
        Bpe.trainMergesFast(Seq("a b").toDF("text"), "text", 1),
        seqLen = 8L, shardBudget = 64L).collect()
    }
    assert(err.getMessage != null)
  }

  test("pairSideStream contracts: zero-token side, missing prompt text, duplicate prompt text all refuse") {
    val merges = Bpe.trainMergesFast(Seq("alpha beta").toDF("text"), "text", 1)
    def onePair(chosenContent: String) = Seq(
      ("p", 2L, 7L, 5.0, chosenContent, 3L, 1.0, "beta alpha"))
      .toDF("prompt", "n_candidates", "chosen_id", "chosen_signal",
        "chosen_content", "rejected_id", "rejected_signal", "rejected_content")
      .withColumn("margin", col("chosen_signal") - col("rejected_signal"))
    val texts = Seq(("p", "alpha prompt")).toDF("prompt", "ptext")
    // a side with NO tokenizable content would silently vanish from any
    // layout while its partner materializes alone — must refuse. The
    // prompt turn has tokens; the chosen RESPONSE turn has none, but the
    // side still has tokens, so this one passes; "???" prompt AND
    // response is the vanishing case
    val err = intercept[Exception] {
      Dialogue.preferenceSequences(
        onePair("???"), Seq(("p", "!!!")).toDF("prompt", "ptext"),
        "prompt", "ptext", merges, 8L).collect()
    }
    assert(err.getMessage != null, "zero-token side must refuse")
    // missing prompt text: the pair would silently vanish via an inner
    // join — must refuse instead
    val err2 = intercept[Exception] {
      Dialogue.preferenceSequences(
        onePair("alpha"), Seq(("other", "alpha prompt")).toDF("prompt", "ptext"),
        "prompt", "ptext", merges, 8L).collect()
    }
    assert(err2.getMessage != null, "uncovered prompt must refuse")
    // duplicate prompt text rows would double the turns — must refuse
    val err3 = intercept[Exception] {
      Dialogue.preferenceSequences(
        onePair("alpha"),
        Seq(("p", "alpha prompt"), ("p", "alpha prompt")).toDF("prompt", "ptext"),
        "prompt", "ptext", merges, 8L).collect()
    }
    assert(err3.getMessage != null, "duplicate promptTexts must refuse")
    // and the clean case still materializes both sides
    assert(Dialogue.preferenceSequences(
      onePair("alpha beta"), texts, "prompt", "ptext", merges, 8L)
      .count() > 0)
    // the ALL-zero-token case, pinned WITH AQE ENABLED: when every side
    // of every pair tokenizes to zero tokens the encoded stream is
    // EMPTY, and AQE's empty-relation propagation replans the
    // enc⋈turnStarts join to empty without executing the turn side — a
    // guard column there would never evaluate and the run would
    // silently emit nothing. The guard is a union branch precisely so
    // this case still fails loud.
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true",
      "this test exists to pin the guard under AQE")
    val allZero = Seq(
      ("p", 2L, 7L, 5.0, "???", 3L, 1.0, "!!!"))
      .toDF("prompt", "n_candidates", "chosen_id", "chosen_signal",
        "chosen_content", "rejected_id", "rejected_signal", "rejected_content")
      .withColumn("margin", col("chosen_signal") - col("rejected_signal"))
    val err4 = intercept[Exception] {
      Dialogue.preferenceSequences(
        allZero, Seq(("p", "...")).toDF("prompt", "ptext"),
        "prompt", "ptext", merges, 8L)
        .collect()
    }
    assert(err4.getMessage != null, "all-zero-token sides must refuse under AQE")
  }

  test("preferencePairs: NaN signal fails loud (would always be crowned chosen)") {
    val bad = Seq(("p", 1L, "a", Double.NaN), ("p", 2L, "b", 1.0))
      .toDF("prompt", "cand", "content", "signal")
    val err = intercept[Exception] {
      Dialogue.preferencePairs(bad, "prompt", "cand", "content", "signal").collect()
    }
    assert(err.getMessage != null)
    // integer signals skip the NaN guard and still assemble
    val ints = Seq(("p", 1L, "a", 1L), ("p", 2L, "b", 2L))
      .toDF("prompt", "cand", "content", "signal")
    assert(Dialogue.preferencePairs(
      ints, "prompt", "cand", "content", "signal").count() === 1L)
  }

  test("preferenceSequences: side_id packing fails loud out of range") {
    val pairs = Seq(
      ("p", 2L, Long.MaxValue / 4 + 10L, 5.0, "big id content",
        1L, 1.0, "small side")).toDF(
      "prompt", "n_candidates", "chosen_id", "chosen_signal", "chosen_content",
      "rejected_id", "rejected_signal", "rejected_content")
      .withColumn("margin", col("chosen_signal") - col("rejected_signal"))
    val texts = Seq(("p", "the prompt")).toDF("prompt", "ptext")
    val err = intercept[Exception] {
      Dialogue.preferenceSequences(pairs, texts, "prompt", "ptext",
        Bpe.trainMergesFast(Seq("a b").toDF("text"), "text", 1), 8L).collect()
    }
    assert(err.getMessage != null)
  }

  test("groupAdvantagesStd: exact integer variance/isqrt laws, milli-σ normalization, zero-spread, range guard") {
    val r = Seq(
      ("g1", 1L, "a", 1.0), ("g1", 2L, "b", 2.0), ("g1", 3L, "c", 3.0),
      ("g2", 4L, "d", 5.0), ("g2", 5L, "e", 5.0), // zero spread
      ("g4", 7L, "g", 1.0), ("g4", 8L, "h", 2.0), ("g4", 9L, "i", 2.5)
    ).toDF("prompt", "cand", "content", "signal")
    val out = Dialogue.groupAdvantagesStd(r, "prompt", "cand", "content", "signal")
      .collect()
      .map(x => x.getLong(1) -> (x.getLong(3), x.getLong(4), x.getLong(5),
        x.getLong(6), x.getLong(7), x.getLong(8), x.getLong(9)))
      .toMap
    // g1: mean 2000, deviations (-1000, 0, 1000) -> V = 2000000/3 =
    // 666666, isqrt = 816 (816² = 665856 <= V < 817² = 667489)
    assert(out(1L)._4 === 666666L && out(1L)._5 === 816L)
    assert(out(1L)._7 === -1000L * 1000L / 816L, "milli-σ advantage")
    // the isqrt law on every group: std² <= V < (std+1)²
    out.values.foreach { case (_, _, _, v, s, _, _) =>
      assert(s * s <= v && v < (s + 1) * (s + 1), s"isqrt law V=$v std=$s")
    }
    // zero spread: V 0, std 0, all norms 0 (still a valid GRPO sample)
    assert(out(4L)._4 === 0L && out(4L)._5 === 0L && out(4L)._7 === 0L)
    // g4: integer mean 1833, deviations (-833, 167, 667) -> exact
    // Σd² = 693889 + 27889 + 444889 = 1166667, V = 388889, isqrt 623
    assert(out(7L)._3 === 1833L && out(7L)._4 === 388889L && out(7L)._5 === 623L)
    // the advantage column equals q164's mean-centered one (the twin law)
    val plain = Dialogue.groupAdvantages(r, "prompt", "cand", "content", "signal")
      .collect().map(x => x.getLong(1) -> x.getLong(6)).toMap
    out.foreach { case (c, t) => assert(t._6 === plain(c), s"cand $c twin law") }
    // range guard: a reward past 2^30 milli would break deviation-square
    // exactness — refuses loud (tighter than groupAdvantages' bound)
    val big = Seq(("p", 1L, "a", 2e6), ("p", 2L, "b", 1.0))
      .toDF("prompt", "cand", "content", "signal")
    val err = intercept[Exception] {
      Dialogue.groupAdvantagesStd(big, "prompt", "cand", "content", "signal").collect()
    }
    assert(err.getMessage != null)
    // gated twin: mean AND std re-normalize over survivors
    val holdout = Seq((99L, "leak me now please")).toDF("cand", "content")
    val r2 = Seq(
      ("g", 1L, "leak me now please", 9.0), ("g", 2L, "b", 1.0),
      ("g", 3L, "c", 3.0)
    ).toDF("prompt", "cand", "content", "signal")
    val gated = Dialogue.gatedGroupAdvantagesStd(
      r2, Seq.empty[Long].toDF("cand"), holdout,
      "prompt", "cand", "content", "signal")
      .collect().map(x => x.getLong(1) -> (x.getLong(5), x.getLong(7))).toMap
    // survivors 2,3: mean 2000, V = 1000000, std exactly 1000
    assert(!gated.contains(1L))
    assert(gated(2L) === ((2000L, 1000L)) && gated(3L) === ((2000L, 1000L)))
  }

  test("binaryFeedback: class-balance weights, one-class prompts survive, gated re-balancing (the KTO shape)") {
    val r = Seq(
      // p1: 3 desirable vs 1 undesirable — majority downweights to
      // 1000·1 div 3 = 333, minority stays 1000
      ("p1", 1L, "a", 9.0), ("p1", 2L, "b", 8.0), ("p1", 3L, "c", 7.0),
      ("p1", 4L, "d", 1.0),
      // p2: one-class (all desirable) — weight 1000, n_undesirable 0
      ("p2", 5L, "e", 9.0), ("p2", 6L, "f", 8.0),
      // p3: boundary — signal == threshold labels DESIRABLE (>=)
      ("p3", 7L, "g", 5.0), ("p3", 8L, "h", 1.0)
    ).toDF("prompt", "cand", "content", "signal")
    val out = Dialogue.binaryFeedback(r, "prompt", "cand", "content", "signal", 5.0)
      .collect()
      .map(x => x.getLong(1) -> (x.getBoolean(4), x.getLong(5), x.getLong(6),
        x.getLong(7)))
      .toMap
    assert(out(1L) === ((true, 3L, 1L, 333L)) && out(4L) === ((false, 3L, 1L, 1000L)))
    assert(out(5L) === ((true, 2L, 0L, 1000L)), "one-class prompt survives at 1000")
    assert(out(7L)._1 === true, "threshold boundary labels desirable (>=)")
    // balance law: |Σ_D w − Σ_U w| < max(n_D, n_U) on two-class prompts
    val p1 = Seq(1L, 2L, 3L, 4L).map(out)
    val sd = p1.filter(_._1).map(_._4).sum
    val su = p1.filterNot(_._1).map(_._4).sum
    assert(math.abs(sd - su) < 3L, s"balance law, got D=$sd U=$su")
    // NaN fails loud (it would silently label undesirable)
    val err = intercept[Exception] {
      Dialogue.binaryFeedback(
        r.withColumn("signal",
          when(col("cand") === 1L, Double.NaN).otherwise(col("signal"))),
        "prompt", "cand", "content", "signal", 5.0).collect()
    }
    assert(err.getMessage != null)
    // gated: removing p1's undesirable makes it one-class — weights
    // RE-BALANCE over survivors (1000 everywhere), the candidate law
    val gated = Dialogue.gatedBinaryFeedback(
      r, Seq(Tuple1(4L)).toDF("cand"),
      Seq((99L, "no grams match this")).toDF("cand", "content"),
      "prompt", "cand", "content", "signal", 5.0)
      .collect().map(x => x.getLong(1) -> (x.getLong(6), x.getLong(7))).toMap
    assert(!gated.contains(4L))
    assert(gated(1L) === ((0L, 1000L)), "weights re-balance over survivors")
  }

  test("preferenceTensorManifest: q159's conservation laws hold verbatim on the pair-side layout") {
    val merges = Bpe.trainMergesFast(responses, "content", 3)
    val pairs = Dialogue.preferencePairs(responses, "prompt", "cand", "content", "signal")
    val texts = responses.select(col("prompt")).distinct()
      .withColumn("ptext", col("prompt"))
    val epochs = 2
    val fileBudget = 40L
    val out = Dialogue.preferenceTensorManifest(
      pairs, texts, "prompt", "ptext", merges,
      seqLen = 32L, shardBudget = 128L, fileBudget = fileBudget, epochs = epochs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(out.nonEmpty)
    val n = out.length / epochs
    (0L until epochs.toLong).foreach { e =>
      val slice = out.filter(_._7 == e)
      assert(slice.length === n, s"epoch $e covers every sequence exactly once")
      val ordered = slice.sortBy(r => (r._1, r._2))
      assert(ordered.map(_._5).toSeq === (0L until n.toLong),
        s"epoch $e seq_id contiguous in (shard, bin) order")
      var cum = 0L
      ordered.foreach { r =>
        assert(r._6 === cum / fileBudget, s"file rule at seq ${r._5}")
        cum += r._3
      }
      slice.groupBy(_._1).foreach { case (sh, ss) =>
        assert(ss.map(_._8).sorted.toSeq === (0L until ss.length.toLong),
          s"epoch $e shard $sh pos dense")
      }
    }
    // the resume contract composes unchanged: consumed ∪ rest == the
    // whole run, disjoint, for a mid-manifest (epoch, shard, pos) cursor
    val manifest = Dialogue.preferenceTensorManifest(
      pairs, texts, "prompt", "ptext", merges,
      seqLen = 32L, shardBudget = 128L, fileBudget = fileBudget, epochs = epochs)
    val all = out.map(r => (r._7, r._1, r._8)).toSet // (epoch, shard, pos)
    val cursor = all.toSeq.sorted.apply(all.size / 2)
    val rest = ShardPack.resumeAfterEpoch(manifest, cursor._1, cursor._2, cursor._3)
      .collect().map(r => (r.getLong(6), r.getLong(0), r.getLong(7))).toSet
    val consumed = all.filter(k => implicitly[Ordering[(Long, Long, Long)]].lteq(k, cursor))
    assert(rest.intersect(consumed).isEmpty && (rest ++ consumed) === all,
      "consumed ∪ rest == the whole run, disjoint")
    // the q163 oversize law carries over: a side longer than seqLen
    // fails the manifest loud (never a silently smaller sequence set)
    val err = intercept[Exception] {
      Dialogue.preferenceTensorManifest(
        pairs, texts, "prompt", "ptext", merges,
        seqLen = 2L, shardBudget = 64L, fileBudget = fileBudget, epochs = 1).collect()
    }
    assert(err.getMessage != null, "oversize side must refuse")
  }

  // ---- best-of-n / rejection sampling (q166/q170) ----------------------

  test("bestOfN: k=1 agrees with preferencePairs' chosen side; rank order and single-candidate prompts") {
    val top1 = Dialogue.bestOfN(responses, "prompt", "cand", "content", "signal", 1)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // agreement law: on every prompt that forms a pair, the k=1
    // selection IS the chosen candidate (same (signal, id) order)
    val chosen = Dialogue.preferencePairs(responses, "prompt", "cand", "content", "signal")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    chosen.foreach { case (p, c) =>
      assert(top1(p) === c, s"prompt $p: bestOfN(1) != preferencePairs chosen")
    }
    // and bestOfN additionally emits what a pair cannot: the
    // single-candidate prompt and the zero-margin prompt
    assert(top1.contains("p3") && top1("p3") === 30L, "single candidate selected")
    assert(top1.contains("p2") && top1("p2") === 21L, "zero-margin tie -> largest id")
    // k=2: ranks are (signal desc, id desc), n_candidates rides along
    val top2 = Dialogue.bestOfN(responses, "prompt", "cand", "content", "signal", 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(5)))
      .toMap
    assert(top2(("p1", 1L))._1 === 12L && top2(("p1", 2L))._1 === 11L)
    assert(top2(("p4", 1L))._1 === 41L && top2(("p4", 2L))._1 === 40L,
      "tie ranks by id desc")
    assert(top2(("p1", 1L))._2 === 3L, "n_candidates = graded candidates")
    // null-signal candidates neither rank nor count
    assert(top2(("p5", 1L))._1 === 52L && top2(("p5", 1L))._2 === 2L)
    // NaN fails loud (would always rank first)
    val err = intercept[Exception] {
      Dialogue.bestOfN(
        responses.withColumn("signal",
          when(col("cand") === 10L, Double.NaN).otherwise(col("signal"))),
        "prompt", "cand", "content", "signal", 1).collect()
    }
    assert(err.getMessage != null)
  }

  test("gatedBestOfN re-ranks over survivors (the candidate-level contrast to pair gating); counters conserve") {
    // gate p1's best candidate 12 -> 11 is PROMOTED to rank 1 (a pair
    // would have dropped the prompt whole)
    val invalid = Seq(Tuple1(12L)).toDF("cand")
    val holdout = spark.emptyDataFrame
      .sparkSession.createDataFrame(Seq((999L, "no such grams here")))
      .toDF("cand", "content")
    val out = Dialogue.gatedBestOfN(
      responses, invalid, holdout, "prompt", "cand", "content", "signal", 1)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("p1") === 11L, "next-best survivor promoted")
    // counters: total = invalid + contaminated_valid + kept, and
    // selected = sum of min(k, per-prompt kept)
    val leakyHoldout = Seq((999L, "alpha beta gamma")).toDF("cand", "content")
    val counters = Dialogue.bestOfNCounters(
      responses, invalid, leakyHoldout, "prompt", "cand", "content", "signal",
      k = 1).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counters("candidates_total") ===
      counters("candidates_invalid") + counters("candidates_contaminated_valid") +
        counters("candidates_kept"), "conservation")
    // graded candidates: 12 (cand 50's null signal excluded); cand 12
    // invalid; cand 10 leaks ("alpha beta gamma") and is valid
    assert(counters("candidates_total") === 12L)
    assert(counters("candidates_invalid") === 1L)
    assert(counters("candidates_contaminated_valid") === 1L)
    assert(counters("candidates_kept") === 10L)
    // kept per prompt: p1 {11}, p2 {20,21}, p3 {30}, p4 {40..43},
    // p5 {51,52}; k=1 -> one per prompt with any survivor
    assert(counters("candidates_selected") === 5L)
  }

  // ---- turn-level (process-reward) advantages (q165) -------------------

  // trajectories: (group, traj, signal_milli) — g1 has three, g2 one
  // (dropped: no relative signal), g3 a null-signal member + two real
  private def trajSignals = Seq(
    ("g1", 1L, Some(7000L)), ("g1", 2L, Some(1000L)), ("g1", 3L, Some(1600L)),
    ("g2", 4L, Some(5000L)),
    ("g3", 5L, None), ("g3", 6L, Some(2000L)), ("g3", 7L, Some(1000L))
  ).toDF("grp", "traj", "signal_milli")

  // turns: (traj, ts, id, role) — traj 1 has 3, traj 2 has 2, traj 3
  // has 3; g3's trajs have 1 each; the dropped trajs (4, 5) have turns
  // too (they must emit nothing)
  private def trajTurns = Seq(
    (1L, 0L, 100L, "user"), (1L, 1L, 101L, "assistant"), (1L, 2L, 102L, "user"),
    (2L, 0L, 200L, "user"), (2L, 1L, 201L, "assistant"),
    (3L, 0L, 300L, "user"), (3L, 1L, 301L, "assistant"), (3L, 2L, 302L, "user"),
    (4L, 0L, 400L, "user"),
    (5L, 0L, 500L, "user"),
    (6L, 0L, 600L, "assistant"),
    (7L, 0L, 700L, "assistant")
  ).toDF("traj", "ts", "id", "role")

  test("turnAdvantages: conservation for BOTH policies, ±1-milli uniformity, excluded trajectories emit nothing") {
    val out = Dialogue.turnAdvantages(
      trajTurns, trajSignals, "grp", "traj", "ts", "id", "role",
      "signal_milli").collect()
      .map(r => (r.getLong(1), r.getLong(2)) ->
        (r.getString(0), r.getBoolean(4), r.getLong(6), r.getLong(9),
          r.getLong(10), r.getLong(11), r.getLong(12)))
      .toMap
    // g1: mean = 9600 div 3 = 3200; advantages 3800 / -2200 / -1600.
    // g2 (singleton) and g3's null-signal traj 5 emit nothing; g3's
    // mean over the two real = 1500, advantages +500 / -500.
    assert(!out.keySet.exists { case (t, _) => t == 4L || t == 5L },
      "singleton-group and null-signal trajectories emit no rows")
    val byTraj = out.groupBy(_._1._1)
    // conservation, both policies, every emitted trajectory
    for ((t, rows) <- byTraj) {
      val adv = rows.values.head._5
      assert(rows.values.map(_._6).sum === adv, s"traj $t uniform conservation")
      assert(rows.values.map(_._7).sum === adv, s"traj $t last conservation")
      // uniform: all attributed shares within 1 milli of each other
      val shares = rows.values.filter(_._2).map(_._6)
      assert(shares.max - shares.min <= 1L, s"traj $t ±1 uniformity")
      // last: exactly one carrier when adv != 0
      if (adv != 0L)
        assert(rows.values.count(_._7 != 0L) === 1, s"traj $t single last carrier")
    }
    // hand-checked arithmetic: traj 1 adv 3800 over 3 turns (attrRoles
    // None => all attributed) = 1267, 1267, 1266 in turn order; traj 3
    // adv -1600 = -534, -533, -533 (negative residue to the FIRST turn)
    assert(out((1L, 0L))._6 === 1267L && out((1L, 1L))._6 === 1267L &&
      out((1L, 2L))._6 === 1266L, "positive residue spreads over first turns")
    assert(out((3L, 0L))._6 === -534L && out((3L, 1L))._6 === -533L &&
      out((3L, 2L))._6 === -533L, "negative residue spreads over first turns")
    // last policy: the whole advantage on the LAST turn
    assert(out((1L, 2L))._7 === 3800L && out((1L, 0L))._7 === 0L)
    // group stats ride every row
    assert(out((6L, 0L))._4 === 1500L && out((6L, 0L))._5 === 500L)
    assert(out((7L, 0L))._5 === -500L)
  }

  test("turnAdvantages: attrRoles restricts attribution; missing attributable turn and floating signals refuse") {
    val out = Dialogue.turnAdvantages(
      trajTurns.filter(col("traj").isin(1L, 2L, 3L)),
      trajSignals.filter(col("grp") === "g1"),
      "grp", "traj", "ts", "id", "role", "signal_milli",
      attrRoles = Some(Set("assistant"))).collect()
      .map(r => (r.getLong(1), r.getLong(2)) ->
        (r.getBoolean(4), r.getLong(6), r.getLong(11), r.getLong(12)))
      .toMap
    // traj 1: ONE assistant turn (turn 1) — carries the whole 3800
    // under both policies; user turns attributed=false, 0
    assert(out((1L, 1L))._1 && out((1L, 1L))._3 === 3800L &&
      out((1L, 1L))._4 === 3800L)
    assert(!out((1L, 0L))._1 && out((1L, 0L))._3 === 0L && out((1L, 0L))._4 === 0L)
    assert(out((1L, 0L))._2 === 1L, "n_attr_turns counts assistant turns only")
    // a trajectory whose advantage has NO attributable turn fails loud
    val noAttr = Seq((1L, 0L, 100L, "user"), (2L, 0L, 200L, "assistant"))
      .toDF("traj", "ts", "id", "role")
    val sig = Seq(("g", 1L, 1000L), ("g", 2L, 3000L)).toDF("grp", "traj", "signal_milli")
    val err = intercept[Exception] {
      Dialogue.turnAdvantages(noAttr, sig, "grp", "traj", "ts", "id", "role",
        "signal_milli", attrRoles = Some(Set("assistant"))).collect()
    }
    assert(err.getMessage != null, "no attributable turn must refuse")
    // a trajectory with an advantage but NO turn rows at all fails loud
    val err2 = intercept[Exception] {
      Dialogue.turnAdvantages(
        noAttr.filter(col("traj") === 1L), sig,
        "grp", "traj", "ts", "id", "role", "signal_milli").collect()
    }
    assert(err2.getMessage != null, "turnless trajectory must refuse")
    // floating trajectory signals refuse at plan time (a floating
    // reduction is partition-order-dependent)
    val errF = intercept[IllegalArgumentException] {
      Dialogue.turnAdvantages(noAttr,
        Seq(("g", 1L, 1.5)).toDF("grp", "traj", "signal_milli"),
        "grp", "traj", "ts", "id", "role", "signal_milli")
    }
    assert(errF.getMessage.contains("integral"))
    // an explicitly empty attrRoles set refuses (pass None for "all")
    val errE = intercept[IllegalArgumentException] {
      Dialogue.turnAdvantages(noAttr, sig, "grp", "traj", "ts", "id", "role",
        "signal_milli", attrRoles = Some(Set.empty))
    }
    assert(errE.getMessage.contains("attrRoles"))
    // duplicate trajSignals rows refuse eagerly: each would double-count
    // its group's stats AND duplicate its turn rows — a silent
    // conservation break (Σ turn adv = 2× the trajectory's)
    val errD = intercept[IllegalArgumentException] {
      Dialogue.turnAdvantages(noAttr,
        sig.unionByName(sig.limit(1)),
        "grp", "traj", "ts", "id", "role", "signal_milli")
    }
    assert(errD.getMessage.contains("duplicate"))
  }

  test("gatedTurnAdvantages: trajectory-level gates re-normalize the group over survivors") {
    val turns = Seq(
      (1L, 0L, 100L, "user", "clean alpha content"),
      (2L, 0L, 200L, "user", "the secret bench prompt leaks"),
      (3L, 0L, 300L, "user", "clean gamma content"),
      (4L, 0L, 400L, "user", "clean delta content")
    ).toDF("traj", "ts", "id", "role", "content")
    val sig = Seq(
      ("g", 1L, 1000L), ("g", 2L, 9000L), ("g", 3L, 3000L), ("g", 4L, 5000L)
    ).toDF("grp", "traj", "signal_milli")
    val holdout = Seq((900L, "secret bench prompt")).toDF("id", "content")
    val invalid = Seq(Tuple1(4L)).toDF("traj")
    val out = Dialogue.gatedTurnAdvantages(
      turns, sig, invalid, holdout,
      "grp", "traj", "ts", "id", "role", "content", "signal_milli").collect()
      .map(r => r.getLong(1) -> (r.getLong(8), r.getLong(9), r.getLong(10)))
      .toMap
    // traj 2 leaks (3-gram vs holdout), traj 4 is invalid — the group
    // re-normalizes over survivors 1 and 3: mean = 2000, adv ±1000.
    // A pair-level-style whole-drop would have killed the group.
    assert(out.keySet === Set(1L, 3L))
    assert(out(1L) === ((2L, 2000L, -1000L)) && out(3L) === ((2L, 2000L, 1000L)))
    // gates reduce the group below 2 -> drops entirely
    val out2 = Dialogue.gatedTurnAdvantages(
      turns, sig, Seq(Tuple1(4L), Tuple1(3L)).toDF("traj"), holdout,
      "grp", "traj", "ts", "id", "role", "content", "signal_milli").count()
    assert(out2 === 0L, "a group reduced below 2 survivors drops")
  }

  test("prmTokenStream: every token carries its turn's uniform credit; mask = attribution; exclusions and zero-token turns hold (q176)") {
    // merges from a tiny corpus; contents chosen so piece counts are
    // known: every word is one piece absent merges beyond "a b"
    val merges = Bpe.trainMergesFast(Seq("alpha beta").toDF("text"), "text", 1)
    // g1: traj 1 (7000) and traj 2 (1000) — mean 4000, adv +3000/-3000;
    // traj 1: user turn (2 words), assistant turn (1 word), zero-token
    // assistant turn (punctuation only); traj 2: one assistant turn
    val turns = Seq(
      (1L, 0L, 100L, "user", "alpha beta"),
      (1L, 1L, 101L, "assistant", "gamma"),
      (1L, 2L, 102L, "assistant", "???"),
      (2L, 0L, 200L, "assistant", "delta epsilon zeta"),
      (3L, 0L, 300L, "user", "dropped singleton")
    ).toDF("traj", "ts", "id", "role", "content")
      .withColumn("grp", when(col("traj").isin(1L, 2L), "g1").otherwise("g2"))
    val sig = Seq(("g1", 1L, 7000L), ("g1", 2L, 1000L), ("g2", 3L, 500L))
      .toDF("grp", "traj", "signal_milli")
    val out = Dialogue.prmTokenStream(
      turns, sig, "grp", "traj", "ts", "id", "role", "content",
      "signal_milli", merges, attrRoles = Some(Set("assistant")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // traj 3 is a singleton group — excluded, no tokens
    assert(!out.keySet.exists(_._1 == 3L), "excluded trajectories emit nothing")
    // traj 1: attributable turns = {101, 102}; 102 has ZERO tokens.
    // n_attr = 2, adv 3000 -> turn 101 gets 1500, turn 102 gets 1500
    // (which has no tokens to label — documented). Tokens: "alpha
    // beta" = 2 words but the trained merge may fuse; recover counts
    // from the stream itself: user tokens mask 0 value 0; assistant
    // token(s) mask 1 value 1500.
    val t1 = out.filter(_._1._1 == 1L).toSeq.sortBy(_._1._2)
    assert(t1.nonEmpty)
    // tok_idx dense 0..n-1 even with the zero-token tail turn
    assert(t1.map(_._1._2) === (0L until t1.length.toLong))
    val (userToks, asstToks) = t1.partition(_._2._2 == 0L)
    assert(userToks.nonEmpty && asstToks.nonEmpty)
    assert(userToks.forall(_._2._3 === 0L), "unattributed tokens carry 0 value")
    assert(asstToks.forall(_._2._3 === 1500L),
      "each attributed token carries its turn's uniform credit share")
    // user tokens come FIRST in the stream (turn order by (ts, id))
    assert(userToks.map(_._1._2).max < asstToks.map(_._1._2).min)
    // traj 2: one attributable turn carries the whole -3000 on each token
    val t2 = out.filter(_._1._1 == 2L).toSeq
    assert(t2.nonEmpty && t2.forall(_._2._2 === 1L) &&
      t2.forall(_._2._3 === -3000L))
    // the multi-channel materialization: token/mask arrays equal the
    // mask-only form; the value channel rides the same position order
    val stream = Dialogue.prmTokenStream(
      turns, sig, "grp", "traj", "ts", "id", "role", "content",
      "signal_milli", merges, attrRoles = Some(Set("assistant")))
    val multi = graft.scale.ShardPack.materializeSequencesWithChannels(
      stream, "traj", Seq("mask", "value_milli"), 4L)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](4), r.getSeq[Long](5), r.getSeq[Long](6)))
    val maskOnly = graft.scale.ShardPack.materializeSequencesWithMask(
      stream.drop("value_milli"), "traj", "mask", 4L)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](4), r.getSeq[Long](5)))
      .sortBy(_._1)
    assert(multi.sortBy(_._1).map(t => (t._1, t._2, t._3)).toSeq ===
      maskOnly.map(t => (t._1, t._2, t._3)).toSeq,
      "channel form degrades to the mask form on the shared columns")
    // every value token in the packed rows matches its mask (value != 0
    // only where mask == 1, by the fixture's nonzero advantages)
    multi.foreach { case (_, _, m, v) =>
      m.zip(v).foreach { case (mk, vv) =>
        if (mk == 0L) assert(vv === 0L, "unattributed packed token value 0")
      }
    }
  }

  test("turnSignalReduce: quantize-then-sum law, null rewards, all-null trajectories vanish, NaN refuses (q174)") {
    // per-turn rewards: traj 1 = 1.0017 + 2.9995 -> 1001 + 2999 = 4000
    // (quantize FIRST: floor(4.0012·1000) = 4001 would be the wrong,
    // float-sum-then-quantize answer), traj 2 mixes a null (skipped),
    // traj 3 all-null (vanishes), traj 4 negative rewards
    val rewards = Seq(
      ("g1", 1L, Some(1.0017)), ("g1", 1L, Some(2.9995)),
      ("g1", 2L, Some(0.5)), ("g1", 2L, None), ("g1", 2L, Some(0.25)),
      ("g1", 3L, None),
      ("g2", 4L, Some(-1.0001)), ("g2", 4L, Some(-0.5))
    ).toDF("grp", "traj", "reward")
    val out = Dialogue.turnSignalReduce(rewards, "grp", "traj", "reward")
      .collect()
      .map(r => r.getLong(1) -> (r.getString(0), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.keySet === Set(1L, 2L, 4L), "all-null trajectory vanishes")
    assert(out(1L) === (("g1", 4000L, 2L)), "quantize-then-sum, not sum-then-quantize")
    assert(out(2L) === (("g1", 750L, 2L)), "null rewards skipped, counted out")
    // floor truncates toward -inf: -1.0001 -> -1001, -0.5 -> -500
    assert(out(4L) === (("g2", -1501L, 2L)))
    // NaN refuses loud (the family guard)
    val errN = intercept[Exception] {
      Dialogue.turnSignalReduce(
        Seq(("g", 1L, Double.NaN)).toDF("grp", "traj", "reward"),
        "grp", "traj", "reward").collect()
    }
    assert(errN.getMessage != null, "NaN reward must refuse")
  }

  test("turnAdvantagesFromRewards == turnAdvantages over pre-reduced signals (composition law); inconsistent groups refuse") {
    // per-turn rewards whose reductions are EXACTLY the trajSignals
    // fixture: traj 1 = 7000, 2 = 1000, 3 = 1600, 4 = 5000, 6 = 2000,
    // 7 = 1000 (traj 5's null signal = an all-null reward trajectory)
    val rewards = Seq(
      ("g1", 1L, Some(3.0)), ("g1", 1L, Some(4.0)),
      ("g1", 2L, Some(1.0)),
      ("g1", 3L, Some(0.6)), ("g1", 3L, Some(1.0)),
      ("g2", 4L, Some(5.0)),
      ("g3", 5L, None),
      ("g3", 6L, Some(2.0)), ("g3", 7L, Some(1.0))
    ).toDF("grp", "traj", "reward")
    val composed = Dialogue.turnAdvantagesFromRewards(
      trajTurns, rewards, "grp", "traj", "ts", "id", "role", "reward")
    val direct = Dialogue.turnAdvantages(
      trajTurns, trajSignals, "grp", "traj", "ts", "id", "role",
      "signal_milli")
    assert(composed.columns.toSeq === direct.columns.toSeq)
    val c = composed.collect().map(_.toSeq).toSet
    val d = direct.collect().map(_.toSeq).toSet
    assert(c === d, "composed chain equals turnAdvantages on pre-reduced signals")
    // a trajectory whose reward rows disagree on the group key reduces
    // to TWO (group, traj) rows — the eager duplicate-trajectory
    // contract names it instead of silently double-counting
    val split = Seq(("gA", 1L, 1.0), ("gB", 1L, 2.0), ("gA", 2L, 3.0))
      .toDF("grp", "traj", "reward")
    val errG = intercept[IllegalArgumentException] {
      Dialogue.turnAdvantagesFromRewards(
        trajTurns, split, "grp", "traj", "ts", "id", "role", "reward")
    }
    assert(errG.getMessage.contains("duplicate"))
  }

  test("turnReturnsToGo: quantize-then-horner EXACT integers (float diverges on the pinned fixture); γ=1 ≡ suffix sum ≡ turnSignalReduce; γ=0 ≡ per-turn (q183)") {
    val rewards = Seq(
      // traj 1: q = (−1, −3) at γ=0.5 → R1 = −3, R0 = −1 + trunc(−1.5)
      // = −2. The FLOAT pipeline (discount in doubles, quantize last)
      // gives floor(−0.0025·1000) = −3 — the divergence this pins.
      ("g", 1L, 10L, 100L, Some(-0.001)), ("g", 1L, 20L, 101L, Some(-0.003)),
      // traj 2: q = (1001, 0 [null], 2999); γ=0.5 → R2 = 2999,
      // R1 = 0 + trunc(1499.5) = 1499, R0 = 1001 + trunc(749.5) = 1750.
      // The null-reward turn contributes 0 but OCCUPIES its discount
      // step (a decision happened; its measured reward is absent).
      ("g", 2L, 10L, 200L, Some(1.0017)),
      ("g", 2L, 20L, 201L, None: Option[Double]),
      ("g", 2L, 30L, 202L, Some(2.9995))
    ).toDF("grp", "traj", "ts", "id", "reward")
    def run(gammaPpm: Long) =
      Dialogue.turnReturnsToGo(rewards, "grp", "traj", "ts", "id", "reward",
        gammaPpm)
        .collect()
        .map(r => (r.getLong(1), r.getLong(2)) ->
          (r.getString(0), r.getLong(3), r.getLong(4), r.getLong(5)))
        .toMap
    val half = run(500000L)
    assert(half((1L, 100L)) === (("g", 0L, -1L, -2L)),
      "trunc-toward-zero at EVERY step: −1 + trunc(−1.5) = −2, not the float −3")
    assert(half((1L, 101L)) === (("g", 1L, -3L, -3L)))
    assert(half((2L, 200L)) === (("g", 0L, 1001L, 1750L)))
    assert(half((2L, 201L)) === (("g", 1L, 0L, 1499L)),
      "a null-reward turn contributes 0 but keeps its discount step")
    assert(half((2L, 202L)) === (("g", 2L, 2999L, 2999L)))
    // γ = 1: returns are exact suffix sums, and turn 0's return equals
    // turnSignalReduce's trajectory signal (the composition law)
    val full = run(1000000L)
    assert(full((2L, 200L))._4 === 4000L && full((2L, 201L))._4 === 2999L)
    val signals = Dialogue.turnSignalReduce(rewards, "grp", "traj", "reward")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    Seq(1L, 2L).foreach(t =>
      assert(full((t, if (t == 1L) 100L else 200L))._4 === signals(t),
        s"γ=1 return-at-turn-0 == turnSignalReduce signal for traj $t"))
    // γ = 0: each turn keeps only its own reward
    val zero = run(0L)
    zero.foreach { case (_, (_, _, q, r)) => assert(q === r) }
    // guards: γ outside [0, 1e6] refuses; NaN refuses; a Horner step
    // that would overflow a long refuses BY NAME, never wraps
    intercept[IllegalArgumentException] {
      Dialogue.turnReturnsToGo(rewards, "grp", "traj", "ts", "id", "reward",
        1000001L)
    }
    val errN = intercept[Exception] {
      Dialogue.turnReturnsToGo(
        Seq(("g", 1L, 1L, 1L, Double.NaN)).toDF("grp", "traj", "ts", "id", "reward"),
        "grp", "traj", "ts", "id", "reward", 500000L).collect()
    }
    assert(errN.getMessage != null)
    val errO = intercept[Exception] {
      Dialogue.turnReturnsToGo(
        Seq(("g", 1L, 1L, 1L, 8.0e15), ("g", 1L, 2L, 2L, 8.0e15))
          .toDF("grp", "traj", "ts", "id", "reward"),
        "grp", "traj", "ts", "id", "reward", 1000000L).collect()
    }
    assert(Option(errO.getMessage).getOrElse(errO.toString)
      .contains("turnReturnsToGo"),
      s"overflow must refuse by name: ${errO.getMessage}")
  }

  test("prmReturnsTokenStream: per-token R_t targets — γ laws lift to tokens, role mask, structural row law vs prmTokenStream (q189)") {
    val merges = Bpe.trainMergesFast(Seq("alpha beta").toDF("text"), "text", 1)
    // one group, two trajectories (both survive the advantage gate, so
    // the structural law binds); traj 1 has a null-reward assistant
    // turn whose TOKENS still emit (value 0 at γ=1 — the return of
    // nothing-after), and a user turn (mask 0)
    val turns = Seq(
      (1L, 0L, 100L, "user", "alpha beta"),
      (1L, 1L, 101L, "assistant", "gamma"),
      (1L, 2L, 102L, "assistant", "delta"),
      (2L, 0L, 200L, "assistant", "epsilon zeta")
    ).toDF("traj", "ts", "id", "role", "content")
      .withColumn("grp", lit("g1"))
    val rewards = Seq(
      (1L, 100L, Some(1.0)), (1L, 101L, Some(2.0)),
      (1L, 102L, None: Option[Double]), (2L, 200L, Some(-1.5))
    ).toDF("traj", "id", "reward")
      .join(turns.select(col("traj"), col("id"), col("ts"), col("grp")),
        Seq("traj", "id"))
    def run(gammaPpm: Long) = Dialogue.prmReturnsTokenStream(
      turns, rewards, "grp", "traj", "ts", "id", "role", "content",
      "reward", gammaPpm, merges, attrRoles = Some(Set("assistant")))
    // γ=1: suffix sums per turn, repeated per token. traj 1 returns:
    // turn 100 → 3000, 101 → 2000, 102 → 0; traj 2 → −1500. Recover
    // turn membership from the mask/value pattern.
    val full = run(1000000L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(3), r.getLong(4)))
      .toMap
    val t1 = full.filter(_._1._1 == 1L).toSeq.sortBy(_._1._2)
    assert(t1.map(_._1._2) === (0L until t1.length.toLong),
      "tok_idx dense per trajectory")
    val (userToks, asstToks) = t1.partition(_._2._1 == 0L)
    assert(userToks.nonEmpty && asstToks.nonEmpty)
    assert(userToks.forall(_._2._2 === 3000L),
      "γ=1: turn 0's tokens carry the WHOLE trajectory signal (the " +
        "turnSignalReduce composition law, lifted per token)")
    assert(asstToks.map(_._2._2).toSet === Set(2000L, 0L),
      "later turns carry their suffix sums; the null-reward tail turn " +
        "targets 0")
    val t2 = full.filter(_._1._1 == 2L).toSeq
    assert(t2.nonEmpty && t2.forall(_._2 === ((1L, -1500L))),
      "a single-turn trajectory targets its own reward (mask 1)")
    // γ=0: each token targets its OWN turn's reward
    val zero = run(0L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    val z1 = zero.filter(_._1._1 == 1L).toSeq.sortBy(_._1._2).map(_._2)
    assert(z1.toSet === Set(1000L, 2000L, 0L))
    // structural law: same (traj, tok_idx, token_id, mask) rows as the
    // advantage stream when every trajectory survives its group gate
    val sig = Dialogue.turnSignalReduce(rewards, "grp", "traj", "reward")
    val advStream = Dialogue.prmTokenStream(
      turns, sig, "grp", "traj", "ts", "id", "role", "content",
      "signal_milli", merges, attrRoles = Some(Set("assistant")))
      .select("traj", "tok_idx", "token_id", "mask").collect()
      .map(_.toSeq).toSet
    val rtgStream = run(900000L)
      .select("traj", "tok_idx", "token_id", "mask").collect()
      .map(_.toSeq).toSet
    assert(advStream === rtgStream,
      "one substitution in the shared core: token rows identical, only " +
        "the value channel differs")
    // a turn absent from the reward log emits nothing
    val partial = Dialogue.prmReturnsTokenStream(
      turns, rewards.filter(col("id") =!= 200L), "grp", "traj", "ts", "id",
      "role", "content", "reward", 1000000L, merges)
    assert(partial.filter(col("traj") === 2L).count() === 0L,
      "no return to target, no rows")
  }
}

/** Small helper shared by packing-family specs: collect the
  * materialized-sequence frame to a comparable tuple form.
  */
object ShardUtilForTest {
  def collectSeqs(df: org.apache.spark.sql.DataFrame)
    : Array[(Long, Long, Long, Long, String, String)] =
    df.select(col("bin"), col("n_tokens"), col("n_docs"), col("n_doc_starts"),
      concat_ws(" ", col("token_ids")).as("tid"),
      concat_ws("", col("mask")).as("m"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
}
