package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over an events-shaped stream
  * (event_id, ts, user_id, event_type, value).
  *
  * The reference is a daily batch with CDC-vs-snapshot semantics
  * (SURVEY §2.10: no streaming for parity) — these operators are the
  * forward-looking streaming surface of the engine: the same
  * aggregation shapes (counter buckets K7, newest-wins A3, per-entity
  * running merge) expressed as incremental plans. `readStream` on the
  * same parquet layout turns any batch query here into a continuous
  * one; watermarks bound state so a 100 TB/day stream doesn't grow
  * executor state without bound.
  */
object StreamingOps {

  final case class Event(eventId: Long, ts: java.sql.Timestamp, userId: Long,
      eventType: String, value: Double)

  final case class UserState(nEvents: Long, total: Double, lastTs: Long)

  final case class UserUpdate(userId: Long, nEvents: Long, total: Double, lastTs: Long)

  /** Tumbling-window event-type counts with a watermark: the streaming
    * form of the counter-bucket aggregation (q11/K7). Late rows beyond
    * the watermark are dropped and their window state is reclaimed.
    */
  def windowedCounts(
      events: DataFrame,
      windowLength: String = "10 minutes",
      watermarkDelay: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Per-user running totals via mapGroupsWithState — the streaming
    * form of the per-entity accumulator collections (A5-A7 shape:
    * state merged per key across arrivals). Processing-time timeout
    * reclaims idle users' state.
    */
  def userRunningTotals(
      events: Dataset[Event],
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout): Dataset[UserUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .mapGroupsWithState[UserState, UserUpdate](timeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0d, Long.MinValue))
          val next = rows.foldLeft(prev) { (s, e) =>
            UserState(s.nEvents + 1, s.total + e.value, math.max(s.lastTs, e.ts.getTime))
          }
          state.update(next)
          UserUpdate(userId, next.nEvents, next.total, next.lastTs)
      }
  }

  final case class SessionState(start: Long, end: Long, n: Long, total: Double)

  final case class SessionOut(userId: Long, sessionStart: Long, sessionEnd: Long,
      nEvents: Long, totalValue: Double)

  final case class DialogueQcState(start: Long, end: Long, nTurns: Long,
      roles: Seq[String], lastRole: String, violations: Long)

  final case class DialogueQcOut(userId: Long, sessionStart: Long, sessionEnd: Long,
      nTurns: Long, nRoles: Long, nAlternationViolations: Long,
      validDialogue: Boolean)

  /** Gap-based sessionization via flatMapGroupsWithState: events from
    * one user belong to the same session while consecutive arrivals are
    * within `gapMs` of each other (event time); a longer silence CLOSES
    * the session, which is then emitted and the state restarts. An
    * event-time timeout flushes the final open session when the
    * watermark passes it — state never grows without bound.
    */
  def sessionize(
      events: Dataset[Event],
      gapMs: Long = 30 * 60 * 1000L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.start, s.end, s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.eventId))
            val closed = scala.collection.mutable.ArrayBuffer[SessionOut]()
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed += SessionOut(userId, s.start, s.end, s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.iterator
          }
      }
  }

  /** Streaming DIALOGUE QC — the continuous twin of
    * [[graft.scale.Dialogue.dialogueStats]] (q144): dialogues close by
    * gap or watermark timeout exactly as [[sessionize]], and each
    * closed dialogue emits its chat-template QC row (turn count,
    * distinct roles, same-role alternation violations, validity) the
    * moment it closes — a curation team sees a bad logging deploy
    * within one watermark horizon instead of at the next batch run.
    *
    * State per user is ONE open dialogue's summary: start/end, counts,
    * the last role (the only order-dependent piece — within a
    * micro-batch rows sort by (ts, id), matching the batch window
    * order), and the dialogue's distinct role list (bounded by the
    * role vocabulary — event types here, a handful by contract; the
    * state never holds turns). Late events beyond the watermark drop,
    * the same contract as [[sessionize]]. stream == batch pinned on a
    * replayed slice.
    *
    * ORDERING CONTRACT (weaker than a blanket "stream == batch"): the
    * batch equivalence holds when each dialogue's turns arrive in one
    * micro-batch, or across batches in (ts, id) order. An in-watermark
    * late event landing in a LATER batch is folded in arrival order —
    * the lastRole comparison (violations) and sessionStart (never
    * lowered below the first-seen ts) can then diverge from the batch
    * [[graft.scale.Dialogue.dialogueStats]], because a summary state
    * cannot re-sort turns it no longer holds. Sources that can reorder
    * within the watermark should pre-sort per key upstream (e.g. a
    * Kafka key = user partitioning preserves per-key order by
    * construction, the production deployment shape).
    */
  def dialogueQcStream(
      events: Dataset[Event],
      gapMs: Long = 30 * 60 * 1000L): Dataset[DialogueQcOut] = {
    import events.sparkSession.implicits._
    def emit(userId: Long, s: DialogueQcState) =
      DialogueQcOut(userId, s.start, s.end, s.nTurns, s.roles.size.toLong,
        s.violations, s.violations == 0L)
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.userId)
      .flatMapGroupsWithState[DialogueQcState, DialogueQcOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[DialogueQcState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(emit(userId, s))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.eventId))
            val closed = scala.collection.mutable.ArrayBuffer[DialogueQcOut]()
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              val role = e.eventType
              cur match {
                case Some(s) if t - s.end <= gapMs =>
                  cur = Some(DialogueQcState(s.start, math.max(s.end, t),
                    s.nTurns + 1,
                    if (s.roles.contains(role)) s.roles else s.roles :+ role,
                    role,
                    s.violations + (if (s.lastRole == role) 1L else 0L)))
                case Some(s) =>
                  closed += emit(userId, s)
                  cur = Some(DialogueQcState(t, t, 1L, Seq(role), role, 0L))
                case None =>
                  cur = Some(DialogueQcState(t, t, 1L, Seq(role), role, 0L))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.iterator
          }
      }
  }

  /** The streaming newest-wins head (A3/q10 shape): latest event per
    * user in each micro-batch epoch, intended for `update` output mode
    * into an upsert sink — the continuous version of the CDC merge.
    */
  def latestPerUser(events: DataFrame, watermarkDelay: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("latest"))
      .select(
        col("user_id"),
        col("latest.ts").as("last_ts"),
        col("latest.event_id").as("last_event_id"),
        col("latest.value").as("last_value"))

  /** Streaming exact-dedup — the continuous form of the q16 hash-dedup:
    * an arriving document drops if a document with the same content
    * fingerprint (md5 of normalized text, [[graft.scale.TextStats
    * .fingerprint]]) was already seen within the watermark horizon.
    *
    * `dropDuplicatesWithinWatermark` is what makes this 100 TB-safe:
    * state holds only the horizon's fingerprints and the watermark
    * EVICTS older ones, where a plain streaming `dropDuplicates` would
    * accumulate every fingerprint ever seen until the executors OOM.
    * The horizon is the semantic knob: duplicates farther apart than
    * `watermarkDelay` pass — cross-horizon dedup belongs to the batch
    * path (q16 / q56's corpus index) downstream.
    */
  def dedupStream(
      docs: DataFrame,
      tsCol: String = "ts",
      textCol: String = "text",
      watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fingerprint", graft.scale.TextStats.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Streaming decontamination — the continuous form of q68's
    * [[graft.scale.Dedup.decontaminate]]: flag arriving documents that
    * share any word n-gram with a static benchmark set.
    *
    * Deliberately STATELESS: a document arrives whole in one row, so
    * contamination is decidable per-row — the benchmark's distinct
    * grams collect to the driver once (the SAME driver-sized regime as
    * the batch operator's broadcast; a benchmark too big for this goes
    * to the Bloom regime) and the probe is a codegen'd
    * `array_intersect` against the shingle set, no watermark, no state
    * store, no shuffle. `n_hits` = distinct shared grams — identical to
    * the batch operator's count (StreamingOpsSpec pins equality).
    */
  def decontaminateStream(
      docs: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    import graft.scale.Dedup
    val grams = benchmark
      .select(explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .distinct().collect().map(_.getString(0)).toSeq.sorted
    docs
      .select(
        col(idCol),
        size(array_intersect(Dedup.shingles(col(textCol), n), typedlit(grams)))
          .cast("long").as("n_hits"))
      .filter(col("n_hits") > 0)
  }

  /** Streaming classifier serving — score an arriving document stream
    * with a TRAINED hashed-feature linear model (the continuous form of
    * [[graft.scale.TextStats.scoreWithWeights]], fed by
    * `perceptronTrain`'s (feature_id, weight) output frozen at stream
    * start). STATELESS by the same argument as [[decontaminateStream]]:
    * a document arrives whole, its margin is a per-row fold of its own
    * tokens against the dim-bounded weight map (driver-sized by
    * contract — `dim` ≤ 2^20 and in practice tiny) — no watermark, no
    * state store, no shuffle. Integer weights keep the margin
    * bit-identical to the batch operator (StreamingOpsSpec pins
    * equality). Model refresh = restart the query with a new snapshot,
    * the standard frozen-model serving contract.
    */
  def classifyStream(
      docs: DataFrame,
      weights: DataFrame,
      idCol: String,
      textCol: String,
      dim: Int = 64): DataFrame = {
    val w: Map[Long, Long] = weights
      .select(col("feature_id").cast("long"), col("weight").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wMap = typedlit(w)
    docs
      .select(
        col(idCol),
        filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0).as("toks"))
      // token-less documents emit NO row, matching the batch operator
      // exactly (scoreWithWeights' explode+filter leaves them rowless) —
      // without this the stream==batch pin held only because the test
      // corpus had no empty/whitespace-only texts
      .filter(size(col("toks")) > 0)
      .select(
        col(idCol),
        aggregate(
          col("toks"),
          lit(0L),
          (acc, t) => acc + coalesce(
            element_at(wMap,
              graft.scale.TextStats.hashBucket(t, dim)), lit(0L)))
          .as("margin"))
      .withColumn("label", (col("margin") > 0).cast("long"))
  }

  /** Streaming LM-surprisal scoring — the continuous serving form of
    * `TextStats.surprisalWithModel` (an in-domain reference corpus
    * trains `TextStats.bigramModel` once; arriving documents score
    * against the frozen snapshot). STATELESS by the
    * [[classifyStream]] argument: a document arrives whole, its score
    * is a per-row fold of its own bigrams against the collected model
    * map (driver-sized by contract — a corpus-trained bigram model is
    * vocabulary-bounded and Zipf-concentrated; cap it with a min-count
    * floor upstream when it isn't). Bigrams absent from the model
    * don't score and docs with no known bigram emit NO row — exactly
    * the batch operator's inner-join semantics (StreamingOpsSpec pins
    * stream == batch). Integer sums keep the margin bit-identical.
    */
  def surprisalStream(
      docs: DataFrame,
      model: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val m: Map[String, Long] = model
      .select(col("w1"), col("w2"), col("surp").cast("long"))
      .collect().map(r => (r.getString(0) + "\u0000" + r.getString(1)) -> r.getLong(2))
      .toMap
    val mMap = typedlit(m)
    docs
      .select(
        col(idCol),
        regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)).as("t"))
      .filter(size(col("t")) >= 2)
      .select(
        col(idCol),
        filter(
          zip_with(
            slice(col("t"), lit(1), size(col("t")) - 1),
            slice(col("t"), lit(2), size(col("t")) - 1),
            (a, b) => concat(a, lit("\u0000"), b)),
          k => element_at(mMap, k).isNotNull).as("known"))
      .filter(size(col("known")) > 0)
      .select(
        col(idCol),
        aggregate(col("known"), lit(0L),
          (acc, k) => acc + element_at(mMap, k)).as("total_surp"),
        size(col("known")).cast("long").as("n_bigrams"))
      .withColumn("avg_surp", expr("total_surp div n_bigrams"))
  }

  /** Streaming retrieval — STANDING QUERIES over a document stream
    * (the alerting/routing form of q90's [[graft.scale.Retrieval]]:
    * "tell me when a document matching this benchmark prompt
    * arrives"). A static index snapshot supplies the per-(query, term)
    * integer idf weights and the corpus `avgdl`; each arriving
    * document is scored per-row with the SAME integer-milli BM25
    * surrogate — tf from its own token array, saturation from its own
    * length — so the operator is STATELESS: no watermark, no state
    * store, no shuffle, and the scores equal the batch operator's
    * under the same frozen stats (StreamingOpsSpec pins equality).
    *
    * The standing query set is driver-sized by contract (the same
    * regime as [[decontaminateStream]]'s collected grams): each
    * (query, term, idf) becomes a codegen'd filter/count over the
    * token array. Emits one row per (document, query) with at least
    * one matched term: (idCol, query_id, score).
    */
  def retrieveStream(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTermWeights: Seq[(Long, String, Long)],
      avgdl: Long): DataFrame = {
    require(avgdl >= 1, s"avgdl must be >= 1, got $avgdl")
    require(queryTermWeights.nonEmpty, "standing query set is empty")
    // truncating div for NONNEGATIVE longs via exact double math:
    // (a - a%b) is an exact multiple of b and far below 2^53 here
    def idiv(a: Column, b: Column): Column = ((a - pmod(a, b)) / b).cast("long")
    val withToks = docs
      .withColumn("toks",
        regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)))
      .withColumn("dl", size(col("toks")).cast("long"))
      .withColumn("rel_milli", idiv(lit(1000L) * col("dl"), lit(avgdl)))
    val hits = queryTermWeights.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (qid, ws) =>
        val (scores, tfs) = ws.sortBy(_._2).map { case (_, term, idfMilli) =>
          val tf = size(filter(col("toks"), x => x === lit(term))).cast("long")
          val inner = lit(250L) + idiv(lit(750L) * col("rel_milli"), lit(1000L))
          val tfsat = idiv(tf * lit(2200000L),
            tf * lit(1000L) + idiv(lit(1200L) * inner, lit(1000L)))
          (lit(idfMilli) * tfsat, tf)
        }.unzip
        struct(
          lit(qid).as("query_id"),
          scores.reduce(_ + _).as("score"),
          (tfs.reduce(_ + _) > 0).as("matched"))
    }
    withToks
      .withColumn("hit", explode(array(hits: _*)))
      .filter(col("hit.matched"))
      .select(col(idCol), col("hit.query_id").as("query_id"), col("hit.score").as("score"))
  }

  /** Streaming AS-OF enrichment — each arriving left event picks up
    * the most recent right row at or before its timestamp from a
    * FROZEN right frame (the stream-static form of
    * [[graft.ops.AsOfJoin.asOfAll]]: prices/dimensions snapshot at
    * stream start, events enrich continuously). STATELESS per row: the
    * right side packs to one sorted (ts, payload…) array per key
    * (dim-sized by contract — it rides a stream-static broadcast
    * join), and the match is "last array element with ts <= event ts",
    * which under the (ts, payload) lexicographic sort is exactly the
    * batch sweep's equal-ts max-payload winner. Unmatched events keep
    * null payloads (left-join semantics). StreamingOpsSpec pins
    * stream == batch on a replayed events slice.
    */
  def asOfStream(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      leftIdCol: String,
      payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "payloadCols must be non-empty")
    val packed = right
      .select(col(keyCol),
        struct(col(tsCol).as("ts") +: payloadCols.map(col): _*).as("e"))
      .groupBy(keyCol)
      .agg(sort_array(collect_list(col("e"))).as("arr"))
    left
      .join(packed, Seq(keyCol), "left")
      .withColumn("f",
        filter(col("arr"), e => e.getField("ts") <= col(tsCol)))
      .withColumn("m",
        when(size(col("f")) > 0, element_at(col("f"), size(col("f")))))
      .select(
        col(leftIdCol) +: col(keyCol) +: col(tsCol) +:
          payloadCols.map(c => col("m").getField(c).as(s"asof_$c")): _*)
  }

  /** Streaming pretraining chunking — split an arriving document
    * stream into fixed token windows ([[graft.scale.TextStats.chunkByTokens]]'s
    * exact semantics and columns). STATELESS like
    * [[decontaminateStream]]: a document arrives whole and its chunks
    * are a per-row explode of its own token stream — no watermark, no
    * state store, works in append mode — so the batch operator's plan
    * IS the streaming plan (scan-pure per-row work; the
    * [[graft.functions.ChunkWindows]] codegen kernel runs unchanged).
    * StreamingOpsSpec pins stream == batch on a replayed corpus.
    */
  def chunkStream(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      stride: Int): DataFrame =
    graft.scale.TextStats.chunkByTokens(docs, idCol, textCol, window, stride)

  /** Streaming BPE encoding — tokenize an arriving document stream
    * with a FROZEN trained merge table ([[graft.scale.Bpe.encode]]'s
    * exact semantics and columns). The merge table is the driver-sized
    * frozen model ([[classifyStream]]'s contract — trained offline by
    * [[graft.scale.Bpe.trainMerges]], baked into the plan as a chain of
    * literal `replace`s), so the operator is STATELESS per-row
    * projection work: no watermark, no state store, no shuffle, append
    * mode — the batch plan IS the streaming plan, and every micro-batch
    * encodes at scan speed. StreamingOpsSpec pins stream == batch on a
    * replayed corpus split across micro-batch boundaries.
    */
  def encodeBpeStream(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[graft.scale.Bpe.Merge]): DataFrame =
    graft.scale.Bpe.encode(docs, idCol, textCol, merges)

  /** Streaming count-min sketch — the [[graft.functions.CmsSketch]]
    * aggregate run as a continuous global aggregation (complete mode):
    * each micro-batch folds into the same fixed d×w counter buffer via
    * the aggregate's element-wise merge, so the sketch after any prefix
    * of the stream equals the batch sketch of the same rows
    * (StreamingOpsSpec pins this across micro-batch boundaries). State
    * is the one serialized buffer — constant regardless of stream
    * length, the whole point of sketching a stream.
    */
  def cmsSketchStream(
      values: DataFrame,
      valueCol: String,
      depth: Int = 4,
      width: Int = 256): DataFrame =
    values.agg(graft.functions.CmsSketch(col(valueCol), depth, width).as("sketch"))

  /** Streaming PREFERENCE-PAIR assembly — the continuous twin of
    * [[graft.scale.Dialogue.preferencePairs]] over a live graded
    * response log: each trigger re-emits the current best-vs-worst
    * (chosen, rejected) pair per prompt as of everything seen
    * (complete mode). The batch op is ONE hash agg with O(1) per-group
    * state (struct min/max — no candidate list), which is exactly what
    * makes it streamable unchanged: the state store holds per prompt
    * only the running (signal, id)-max and -min candidates plus a
    * count, regardless of stream length — the [[cmsSketchStream]]
    * bounded-state discipline. A viral prompt with millions of graded
    * candidates costs the same state as one with three. Two costs are
    * NOT O(1) and callers must size for them: (1) the min/max structs
    * carry the candidates' full CONTENT strings, so per-prompt state is
    * content-sized (two responses' text), and total state grows with
    * PROMPT CARDINALITY — an unbounded prompt keyspace grows the state
    * store without bound (no watermark evicts complete-mode agg state);
    * (2) complete mode re-emits the ENTIRE pair frame every trigger, so
    * sink write cost per trigger is pair-count-sized, not delta-sized.
    * This complete-mode form fits bounded prompt keyspaces (a grading
    * campaign, an eval set) where the CURRENT pair of every prompt is
    * the product; for an open-ended prompt firehose use
    * [[preferencePairsFinalStream]], which holds state only for active
    * prompts and emits each prompt's FINAL pair once on quiescence
    * (append mode, delta-sized writes). Strict-margin
    * and null-exclusion laws carry over verbatim; stream == batch at
    * every micro-batch prefix is spec-pinned. Pair-level GATING stays
    * batch-side on the polled sink ([[graft.scale.Dialogue.gatedPreferencePairs]]'s
    * decontaminate + validity probes need joins against the pair
    * frame's own derivation — a second aggregation over the streaming
    * agg's output, which Structured Streaming does not allow in one
    * query).
    *
    * @return streaming [[graft.scale.Dialogue.preferencePairs]] frame,
    *         complete-mode
    */
  def preferencePairsStream(
      responses: DataFrame,
      promptCol: String,
      candCol: String,
      contentCol: String,
      signalCol: String): DataFrame =
    graft.scale.Dialogue.preferencePairs(
      responses, promptCol, candCol, contentCol, signalCol)

  /** One graded response with its event time — the typed row
    * [[preferencePairsFinalStream]]'s state machine consumes. candId
    * and content are Options: the BATCH operator tolerates null ids
    * and null content (they ride the comparison struct with Spark's
    * null-smallest field order), so the stream must too — a primitive
    * field would kill the encoder on exactly those rows.
    */
  final case class GradedResponse(prompt: String, candId: Option[Long],
      content: Option[String], signal: Double, ts: java.sql.Timestamp)

  /** Per-prompt running pair state: candidate count, last event time,
    * and the running (signal, id, content)-max and -min candidates —
    * the batch operator's O(1) agg state made explicit.
    */
  final case class PairState(n: Long, lastSeen: Long,
      chS: Double, chI: Option[Long], chC: Option[String],
      rjS: Double, rjI: Option[Long], rjC: Option[String])

  final case class FinalPair(prompt: String, n_candidates: Long,
      chosen_id: Option[Long], chosen_signal: Double,
      chosen_content: Option[String],
      rejected_id: Option[Long], rejected_signal: Double,
      rejected_content: Option[String],
      margin: Double)

  // the batch struct order, exactly: (signal, id, content) compared
  // field by field with NULL SMALLEST (Spark's struct ordering) and
  // content as UTF-8 BYTES (Spark's UTF8String order; Java's compareTo
  // is UTF-16 code-unit order and disagrees above U+FFFF)
  private def structGt(s1: Double, i1: Option[Long], c1: Option[String],
      s2: Double, i2: Option[Long], c2: Option[String]): Boolean = {
    if (s1 != s2) return s1 > s2
    (i1, i2) match {
      case (Some(a), Some(b)) if a != b => return a > b
      case (Some(_), None) => return true
      case (None, Some(_)) => return false
      case _ => ()
    }
    (c1, c2) match {
      case (Some(a), Some(b)) => utf8Gt(a, b)
      case (Some(_), None) => true
      case _ => false
    }
  }

  private def utf8Gt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d > 0
      i += 1
    }
    x.length > y.length
  }

  /** The EVICTING preference-pair assembler — the unbounded-keyspace
    * answer [[preferencePairsStream]] cannot give: a prompt's state
    * lives only while the prompt is ACTIVE, and after `quiesceMs` of
    * event-time silence the prompt CLOSES — its final best-vs-worst
    * pair is emitted ONCE (append mode, delta-sized sink writes) and
    * its state is dropped. An open-ended prompt firehose thus holds
    * state only for the prompts inside the quiescence horizon, not for
    * every prompt ever seen — the [[sessionize]] discipline applied to
    * the preference family.
    *
    * Emission semantics: the closed prompt's pair equals the BATCH
    * [[graft.scale.Dialogue.preferencePairs]] row over exactly the
    * rows that arrived before it closed (spec-pinned on a replayed
    * log): the state machine maintains the same (signal, id, content)
    * struct-max/min with the same strict-margin law (no-contrast
    * prompts close silently — they never had a pair), the same
    * null-signal exclusion, and the same NaN fail-loud. A row arriving
    * AFTER its prompt closed (but inside the watermark's allowed
    * lateness) REOPENS the prompt as a fresh group — the same
    * split-session behavior [[sessionize]] has for a post-gap event;
    * rows older than the watermark drop, as everywhere.
    *
    * Per-prompt state is the batch agg's O(1) state made explicit:
    * two (signal, id, content) candidates plus two longs —
    * content-sized like the batch struct state, but held only for
    * ACTIVE prompts and reclaimed on close.
    *
    * @return streaming [[graft.scale.Dialogue.preferencePairs]]-shaped
    *         frame, append-mode; one row per CLOSED prompt with a
    *         strict margin
    */
  def preferencePairsFinalStream(
      responses: DataFrame,
      promptCol: String,
      candCol: String,
      contentCol: String,
      signalCol: String,
      tsCol: String,
      quiesceMs: Long,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    require(quiesceMs > 0, s"quiesceMs must be positive, got $quiesceMs")
    val spark = responses.sparkSession
    import spark.implicits._
    val typed = graft.scale.Dialogue.signalGated(
      responses, signalCol, "preferencePairsFinalStream",
      "a NaN would always win the pair")
      // a null event time has no place in a time-based protocol: it
      // cannot set a timeout or compare to the watermark. The batch op
      // has no time column, so this is the one documented divergence —
      // the stream's law quantifies over rows THAT CARRY an event time.
      .filter(col(tsCol).isNotNull)
      .select(
        col(promptCol).cast("string").as("prompt"),
        col(candCol).cast("long").as("candId"),
        col(contentCol).cast("string").as("content"),
        col(signalCol).cast("double").as("signal"),
        col(tsCol).as("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[GradedResponse]
    typed
      .groupByKey(_.prompt)
      .flatMapGroupsWithState[PairState, FinalPair](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (prompt: String, rows: Iterator[GradedResponse], state: GroupState[PairState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            // the batch strict-margin law: no contrast, no pair
            if (s.chS > s.rjS)
              Iterator(FinalPair(prompt, s.n, s.chI, s.chS, s.chC,
                s.rjI, s.rjS, s.rjC, s.chS - s.rjS))
            else Iterator.empty
          } else {
            var s = state.getOption.orNull
            rows.foreach { e =>
              val t = e.ts.getTime
              s =
                if (s == null)
                  PairState(1L, t, e.signal, e.candId, e.content,
                    e.signal, e.candId, e.content)
                else {
                  val ch =
                    if (structGt(e.signal, e.candId, e.content, s.chS, s.chI, s.chC))
                      (e.signal, e.candId, e.content)
                    else (s.chS, s.chI, s.chC)
                  val rj =
                    if (structGt(s.rjS, s.rjI, s.rjC, e.signal, e.candId, e.content))
                      (e.signal, e.candId, e.content)
                    else (s.rjS, s.rjI, s.rjC)
                  PairState(s.n + 1L, math.max(s.lastSeen, t),
                    ch._1, ch._2, ch._3, rj._1, rj._2, rj._3)
                }
            }
            state.update(s)
            // the timeout must sit strictly past the current watermark
            // (Spark refuses otherwise, e.g. for an almost-late row)
            state.setTimeoutTimestamp(
              math.max(s.lastSeen + quiesceMs, state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
      .toDF()
  }

  /** The LIVE feedback-balance monitor — running per-prompt CLASS
    * COUNTS of a binary-feedback stream (the
    * [[graft.scale.Dialogue.binaryFeedback]] front half as a continuous
    * aggregation, complete mode): per prompt the running count of
    * desirable (signal ≥ threshold) and undesirable candidates. Unlike
    * [[preferencePairsStream]]'s content-carrying min/max state, the
    * per-prompt state here is TWO LONGS — O(1) and slim, the cleanest
    * bounded-state story in the preference family (total state grows
    * with prompt cardinality in this complete-mode form — the LIVE
    * monitor's trade; [[feedbackClassCountsFinalStream]] is the
    * evicting form for an unbounded prompt firehose). The
    * per-candidate labels and balance weights stay batch-side on the
    * polled sink (the weight needs a counts⋈labels join — a second
    * stage over the streaming agg, the [[preferencePairsStream]]
    * two-stage recipe; spec pins the composition == the batch
    * [[graft.scale.Dialogue.binaryFeedback]] frame). Null signals are
    * excluded and NaN fails loud exactly as in the batch op (an
    * unguarded NaN compares false and silently lands undesirable).
    *
    * @return streaming (promptCol, n_desirable, n_undesirable),
    *         complete-mode
    */
  def feedbackClassCountsStream(
      responses: DataFrame,
      promptCol: String,
      signalCol: String,
      threshold: Double): DataFrame = {
    val base = graft.scale.Dialogue.signalGated(
      responses, signalCol, "feedbackClassCountsStream",
      "it would silently count undesirable")
    base.groupBy(col(promptCol))
      .agg(
        sum(when(col(signalCol) >= lit(threshold), 1L).otherwise(0L))
          .as("n_desirable"),
        sum(when(col(signalCol) < lit(threshold), 1L).otherwise(0L))
          .as("n_undesirable"))
  }

  /** One graded response with its event time — the typed row the
    * feedback eviction machine consumes.
    */
  final case class FeedbackEvent(prompt: String, desirable: Boolean,
      ts: java.sql.Timestamp)

  /** Per-prompt running class counts + last event time. */
  final case class FeedbackState(nd: Long, nu: Long, lastSeen: Long)

  final case class FinalCounts(prompt: String, n_desirable: Long,
      n_undesirable: Long)

  /** The EVICTING feedback-balance monitor —
    * [[feedbackClassCountsStream]]'s unbounded-keyspace answer via the
    * [[preferencePairsFinalStream]] quiescence recipe: a prompt's two
    * counter longs live only while the prompt is ACTIVE; after
    * `quiesceMs` of event-time silence the prompt CLOSES, its final
    * (n_desirable, n_undesirable) row emits ONCE (append mode) and the
    * state drops. The closed row equals the complete-mode aggregation
    * over exactly the rows that arrived before the close (spec-pinned);
    * a row arriving after the close (inside the watermark) REOPENS the
    * prompt as a fresh group; null signals are excluded and NaN fails
    * loud exactly as in batch. The one documented divergence: rows
    * with a NULL event time are excluded — a time-based protocol
    * cannot place them.
    *
    * @return streaming (prompt, n_desirable, n_undesirable),
    *         append-mode; one row per CLOSED prompt
    */
  def feedbackClassCountsFinalStream(
      responses: DataFrame,
      promptCol: String,
      signalCol: String,
      threshold: Double,
      tsCol: String,
      quiesceMs: Long,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    require(quiesceMs > 0, s"quiesceMs must be positive, got $quiesceMs")
    val spark = responses.sparkSession
    import spark.implicits._
    val typed = graft.scale.Dialogue.signalGated(
      responses, signalCol, "feedbackClassCountsFinalStream",
      "it would silently count undesirable")
      .filter(col(tsCol).isNotNull)
      .select(
        col(promptCol).cast("string").as("prompt"),
        (col(signalCol) >= lit(threshold)).as("desirable"),
        col(tsCol).as("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[FeedbackEvent]
    typed
      .groupByKey(_.prompt)
      .flatMapGroupsWithState[FeedbackState, FinalCounts](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (prompt: String, rows: Iterator[FeedbackEvent], state: GroupState[FeedbackState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(FinalCounts(prompt, s.nd, s.nu))
          } else {
            var s = state.getOption.getOrElse(FeedbackState(0L, 0L, Long.MinValue))
            rows.foreach { e =>
              s = FeedbackState(
                s.nd + (if (e.desirable) 1L else 0L),
                s.nu + (if (e.desirable) 0L else 1L),
                math.max(s.lastSeen, e.ts.getTime))
            }
            state.update(s)
            state.setTimeoutTimestamp(
              math.max(s.lastSeen + quiesceMs, state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
      .toDF()
  }

  /** The LIVE trajectory-signal reducer —
    * [[graft.scale.Dialogue.turnSignalReduce]] as a continuous
    * aggregation (complete mode): per (group, trajectory) the running
    * quantize-then-sum milli signal and reward-turn count over an
    * arriving per-turn reward stream — the PRM front half kept current
    * while grading runs. The batch op is ONE hash agg with O(1)
    * per-trajectory state (a decimal sum + a long count), which is
    * exactly what makes it streamable unchanged; the quantize-FIRST
    * law matters doubly here (a floating running sum would also drift
    * with arrival order). NaN fails loud and the overflow guard rides
    * the output exactly as in batch. Total state grows with trajectory
    * cardinality (complete mode) — the LIVE monitor's trade;
    * [[trajectorySignalFinalStream]] is the evicting form for an
    * unbounded trajectory firehose. Stream == batch at every
    * micro-batch prefix, spec-pinned.
    *
    * @return streaming (groupCol, trajCol, signal_milli,
    *         n_reward_turns), complete-mode
    */
  def trajectorySignalStream(
      turnRewards: DataFrame,
      groupCol: String,
      trajCol: String,
      rewardCol: String): DataFrame =
    graft.scale.Dialogue.turnSignalReduce(turnRewards, groupCol, trajCol, rewardCol)

  /** One quantized per-turn reward with its event time — the typed row
    * the trajectory eviction machine consumes (the reward is ALREADY
    * milli-quantized in-plan: quantize-FIRST is the batch law, and the
    * state machine must fold the same integers).
    */
  final case class RewardEvent(grp: String, traj: Long, qMilli: Long,
      ts: java.sql.Timestamp)

  /** Per-trajectory running (sum, count) + last event time. The sum is
    * an exact DECIMAL, not a long — the batch decimal(38,0) analogue:
    * a long fold would fail on a TRANSIENT overflow (partials past
    * 2^63 whose final sum fits), and whether that happens would depend
    * on arrival order — breaking the closed == batch law on exactly
    * the inputs batch handles (the r19 self-review finding). Partials
    * are exact up to the state codec's 10^20 integral capacity
    * (Decimal(38,18)); past it the machine fails BY NAME.
    */
  final case class TrajState(sum: scala.math.BigDecimal, n: Long, lastSeen: Long)

  final case class FinalSignal(grp: String, traj: Long,
      signal_milli: Long, n_reward_turns: Long)

  /** The EVICTING trajectory-signal reducer —
    * [[trajectorySignalStream]]'s unbounded-keyspace answer via the
    * [[preferencePairsFinalStream]] quiescence recipe: a (group,
    * trajectory)'s state is TWO LONGS plus a timestamp, held only
    * while the trajectory is ACTIVE; after `quiesceMs` of event-time
    * silence it CLOSES, its final [[graft.scale.Dialogue.turnSignalReduce]]
    * row emits ONCE (append mode) and the state drops — a grading
    * firehose holds state only for dialogues inside the quiescence
    * horizon. The closed row equals the batch reduction over exactly
    * the rows that arrived before the close (spec-pinned): the same
    * quantize-FIRST law (each reward ⌊·1000⌋ in-plan, exact decimals
    * fold in the state machine — see [[TrajState]]), the same
    * null-reward exclusion (an all-null trajectory never opens state
    * and closes silently, exactly the batch omission), the same NaN
    * fail-loud, and the same final-sum-only long-cast guard — an
    * overflowing trajectory fails BY NAME at close, transient partials
    * never fail where batch succeeds. A late row
    * inside the watermark REOPENS the trajectory as a fresh group.
    * Two documented divergences from batch: rows with a NULL event
    * time are excluded (a time-based protocol cannot place them), and
    * a null or non-long-castable TRAJECTORY KEY fails by name (batch
    * [[graft.scale.Dialogue.turnSignalReduce]] keeps a null-key group;
    * a long-keyed state machine cannot represent one, and silently
    * dropping it would hide a broken upstream id packing).
    *
    * @return streaming (grp, traj, signal_milli, n_reward_turns),
    *         append-mode; one row per CLOSED trajectory
    */
  def trajectorySignalFinalStream(
      turnRewards: DataFrame,
      groupCol: String,
      trajCol: String,
      rewardCol: String,
      tsCol: String,
      quiesceMs: Long,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    require(quiesceMs > 0, s"quiesceMs must be positive, got $quiesceMs")
    val spark = turnRewards.sparkSession
    import spark.implicits._
    val typed = turnRewards
      .filter(col(rewardCol).isNotNull && col(tsCol).isNotNull)
      .select(
        col(groupCol).cast("string").as("grp"),
        // a null (or non-long-castable) trajectory key fails BY NAME:
        // the eviction machine keys by a long, and an unguarded null
        // would surface as an anonymous non-nullable-encoder error —
        // the second documented batch divergence (batch turnSignalReduce
        // keeps a null-key group; a keyed state machine cannot)
        graft.ops.Guards.guardedLong(trajCol, "trajectorySignalFinalStream",
          "numeric trajectory key").as("traj"),
        graft.ops.Guards.quantizedMilli(rewardCol,
          "trajectorySignalFinalStream").as("qMilli"),
        col(tsCol).as("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[RewardEvent]
    typed
      .groupByKey(e => (e.grp, e.traj))
      .flatMapGroupsWithState[TrajState, FinalSignal](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: (String, Long), rows: Iterator[RewardEvent], state: GroupState[TrajState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            // the batch long-cast guard, applied to the FINAL sum only
            // (exactly where batch applies it)
            if (s.sum.abs >= scala.math.BigDecimal("9223372036854775808"))
              throw new IllegalArgumentException(
                "trajectorySignalFinalStream: trajectory milli sum exceeds " +
                  "a long — the reduction would wrap silently; rescale the " +
                  "rewards")
            Iterator(FinalSignal(key._1, key._2, s.sum.toLongExact, s.n))
          } else {
            var s = state.getOption.getOrElse(
              TrajState(scala.math.BigDecimal(0L), 0L, Long.MinValue))
            rows.foreach { e =>
              val sum = s.sum + scala.math.BigDecimal(e.qMilli)
              // the state codec's (38,18) integral capacity — named,
              // never a silent encoder truncation
              if (sum.abs >= scala.math.BigDecimal("1e20"))
                throw new IllegalArgumentException(
                  "trajectorySignalFinalStream: a running trajectory milli " +
                    "sum exceeds the state codec's exact range (10^20); " +
                    "rescale the rewards")
              s = TrajState(sum, s.n + 1L, math.max(s.lastSeen, e.ts.getTime))
            }
            state.update(s)
            state.setTimeoutTimestamp(
              math.max(s.lastSeen + quiesceMs, state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
      .toDF()
  }

  /** The LIVE half of the drift monitor: running per-feature-bucket
    * token counts over the arriving target-era stream — the exact
    * count frame [[graft.scale.Sampling.domainDriftContributors]]
    * builds for a batch corpus, kept current in complete mode (one
    * keyed aggregation over at most `buckets` groups: state is
    * bucket-sized regardless of stream length, the cmsSketchStream
    * discipline — PER ERA; a firehose of ROLLING snapshots accretes a
    * bucket set per snapshot forever, which is
    * [[driftBucketCountsFinalStream]]'s evicting territory). The drift
    * TAIL runs batch-side on the polled sink —
    * `Sampling.driftFromBucketCounts(sink, refCounts, smooth)` against
    * the FROZEN reference-era counts — because the tail needs a second
    * global aggregation over the streaming agg's output, which
    * Structured Streaming does not allow in one query; the spec pins
    * the composition equal to the batch monitor after every
    * micro-batch.
    *
    * @return streaming (b, p_cnt), complete-mode
    */
  def driftBucketCountsStream(
      docs: DataFrame,
      textCol: String,
      buckets: Int = 4096): DataFrame =
    graft.scale.Sampling.tokenBucketCounts(docs, textCol, buckets, "p_cnt")

  /** One (snapshot, bucket) token observation with its event time —
    * the typed row the drift eviction machine consumes (the bucket is
    * ALREADY hashed in-plan: the state machine folds counts only).
    */
  final case class BucketEvent(snap: String, b: Long, ts: java.sql.Timestamp)

  /** Per-(snapshot, bucket) running count + last event time. */
  final case class BucketState(cnt: Long, lastSeen: Long)

  final case class FinalBucketCount(snap: String, b: Long, p_cnt: Long)

  /** The EVICTING drift-count monitor — [[driftBucketCountsStream]]'s
    * rolling-snapshot answer via the [[preferencePairsFinalStream]]
    * quiescence recipe, closing the r18 gap's LAST complete-mode
    * monitor: the stream carries a SNAPSHOT column (the era / ingest
    * batch / crawl slice under measurement), each ACTIVE
    * (snapshot, bucket) holds one long + a timestamp, and after
    * `quiesceMs` of event-time silence the key CLOSES, its final
    * `(snapshot, b, p_cnt)` row emits ONCE (append mode) and the state
    * drops — the drift tail then runs batch-side per closed snapshot
    * (`Sampling.driftFromBucketCounts` against the frozen reference),
    * exactly the live form's composition with the snapshot as the
    * grouping key. Total state is bounded by
    * active-snapshots · buckets, whatever the firehose's history. The
    * closed counts equal [[graft.scale.Sampling.tokenBucketCounts]]
    * over exactly the snapshot's pre-close rows (spec-pinned); a late
    * row inside the watermark REOPENS its (snapshot, bucket) as a
    * fresh key. The one documented divergence: rows with a NULL event
    * time are excluded — a time-based protocol cannot place them.
    *
    * @return streaming (snap, b, p_cnt), append-mode; one row per
    *         CLOSED (snapshot, bucket)
    */
  def driftBucketCountsFinalStream(
      docs: DataFrame,
      textCol: String,
      snapshotCol: String,
      tsCol: String,
      quiesceMs: Long,
      buckets: Int = 4096,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    require(buckets > 0 && buckets <= (1 << 24),
      "buckets must fit the md5 bucket space")
    require(quiesceMs > 0, s"quiesceMs must be positive, got $quiesceMs")
    val spark = docs.sparkSession
    import spark.implicits._
    val typed = docs
      .filter(col(tsCol).isNotNull)
      .select(col(snapshotCol).cast("string").as("snap"),
        explode(regexp_extract_all(
          lower(col(textCol)), lit("[a-z0-9]+"), lit(0))).as("tok"),
        col(tsCol).as("ts"))
      .select(col("snap"),
        graft.scale.TextStats.hashBucket(col("tok"), buckets).as("b"),
        col("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[BucketEvent]
    typed
      .groupByKey(e => (e.snap, e.b))
      .flatMapGroupsWithState[BucketState, FinalBucketCount](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: (String, Long), rows: Iterator[BucketEvent], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(FinalBucketCount(key._1, key._2, s.cnt))
          } else {
            var s = state.getOption.getOrElse(BucketState(0L, Long.MinValue))
            rows.foreach { e =>
              s = BucketState(s.cnt + 1L, math.max(s.lastSeen, e.ts.getTime))
            }
            state.update(s)
            state.setTimeoutTimestamp(
              math.max(s.lastSeen + quiesceMs, state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
      .toDF()
  }

  /** Streaming incremental near-dup detection — the continuous form of
    * [[graft.scale.Dedup.nearDupAgainstSignatures]]: arriving documents
    * probe the FROZEN corpus signature index and emit every VERIFIED
    * near-dup match (idCol, corp_id, jaccard). A downstream gate drops
    * docs that produced any match (the batch operator's anti-join,
    * which needs a per-doc reduction the consumer owns); re-ingesting
    * an indexed corpus therefore streams out a match per duplicate —
    * the real-time twin of [[graft.scale.Curation.pretrainCurateIncrement]]'s
    * incumbent filter.
    *
    * STATELESS: no watermark, no state store, no stream-side
    * aggregation. Per arriving row, the md5-bijection MinHash
    * signature and band keys compute as column expressions (mirroring
    * [[graft.scale.Dedup.minhashSignatures]] bit-for-bit — the spec
    * pins stream == batch), then TWO stream-static equi-joins: the
    * exploded band keys probe `index`
    * ([[graft.scale.Dedup.signatureBandIndex]] — capped buckets whose
    * members carry their signatures), and verified candidates fetch
    * the corpus shingle set by id for the exact-Jaccard check. A
    * (doc, corp) pair colliding in several bands is emitted ONCE
    * without any distinct(): each joined row reads the member's
    * PRECOMPUTED band keys from the index and keeps the row only in
    * the FIRST shared band (the RangeJoin emit-once-cell rule applied
    * to LSH bands).
    *
    * Scale — the SERVING RECIPE (century-measured, `Profile
    * incrstream`): both static sides must be PERSISTED by the caller
    * pre-partitioned AND sorted on their join keys —
    * `index.repartition(col("band")).sortWithinPartitions("band")` and
    * `corpusShingles.repartition(col("corp_id"))
    * .sortWithinPartitions("corp_id")` — because a stream-static join
    * re-executes the static plan EVERY micro-batch: with an unaligned
    * cache each trigger re-shuffles (and re-sorts) the store-sized
    * index, a fixed per-trigger tax that dwarfs the batch-sized probe
    * work; with the cache's partitioning and ordering matching the
    * join requirement, both the exchange and the sort elide and a
    * trigger pays only probe-sized work. Index refresh = restart the
    * query with the new snapshot, the [[classifyStream]] frozen-model
    * contract.
    *
    * @param corpusShingles static (corp_id, shb array<string>) — e.g.
    *   `corpus.select(col(id).as("corp_id"), Dedup.shingles(col(text), n).as("shb"))`
    * @param index [[graft.scale.Dedup.signatureBandIndex]] of the
    *   corpus signature frame, same numHashes/bands
    */
  def nearDupMatchesStream(
      docs: DataFrame,
      corpusShingles: DataFrame,
      index: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      bands: Int = 8,
      threshold: Double = 0.2): DataFrame = {
    import graft.scale.Dedup
    val rowsPerBand = numHashes / bands
    require(rowsPerBand * bands == numHashes,
      s"bands $bands must divide numHashes $numHashes")
    val groups = (numHashes + 15) / 16
    // per-row signature: the exact minhashSignatures arithmetic as
    // column expressions (48-bit md5 prefix per hash group, odd-
    // multiplier bijections, min over the shingle set)
    // drop shingle-less docs on the CHEAP predicate before any minhash
    // arithmetic exists in the plan: a later h0-isNotNull filter gets
    // pushed to the scan with its full expression tree re-expanded —
    // measured at the century as ~17 word_shingles evaluations PER ROW
    // in the scan filter (the r14 incrstream finding)
    val sh0 = docs.select(
      col(idCol), Dedup.shingles(col(textCol), shingleSize).as("sha"))
      .filter(size(col("sha")) > 0)
    val withHg = (0 until groups).foldLeft(sh0) { (df, g) =>
      df.withColumn(s"hg$g",
        transform(col("sha"), s =>
          graft.functions.Md5PrefixLong(concat(lit(s"$g:"), s), 6)))
    }
    val withH = (0 until numHashes).foldLeft(withHg) { (df, s) =>
      df.withColumn(s"h$s",
        array_min(transform(col(s"hg${s / 16}"),
          h => (lit(Dedup.MinhashMultipliers(s % 16)) * h) % lit(Dedup.MinhashMod))))
    }
    def bandKeysFrom(h: Int => Column): Column = array((0 until bands).map { b =>
      val slice = (0 until rowsPerBand).map(r => h(b * rowsPerBand + r))
      md5(concat(lit(s"$b:"), concat_ws(",", slice: _*)).cast("binary"))
    }: _*)
    val probes = withH
      .withColumn("bkeys", bandKeysFrom(s => col(s"h$s")))
      // explode a FOLDABLE band-index sequence, not the bkeys array:
      // exploding bkeys makes the optimizer infer a size(bkeys) > 0
      // scan filter whose pushed-down form re-expands the whole 8-md5
      // expression tree per row; sequence(0, bands-1) folds, so no
      // filter is inferred and bkeys is evaluated once in the project
      .select(col(idCol), col("sha"), col("bkeys"),
        explode(sequence(lit(0), lit(bands - 1))).as("band_idx"))
      .withColumn("band", element_at(col("bkeys"), col("band_idx") + 1))
    val cand = probes
      .join(index, Seq("band"))
      .select(col(idCol), col("sha"), col("bkeys"), col("band_idx"),
        explode(col("members")).as("m"))
      // member band keys are PRECOMPUTED in the index (one md5 pass per
      // member at build) — per-candidate work is an array lookup, not
      // 8 md5s per candidate per micro-batch
      .withColumn("corp_keys", col("m.bkeys"))
      // emit-once: keep the pair only in the FIRST band both share
      .filter(col("band_idx") ===
        element_at(
          filter(sequence(lit(0), lit(bands - 1)),
            b => element_at(col("bkeys"), b + 1) === element_at(col("corp_keys"), b + 1)),
          1))
      .select(col(idCol), col("sha"), col("m.id").as("corp_id"))
    cand
      .join(corpusShingles, Seq("corp_id"))
      .withColumn("jaccard", Dedup.jaccard(col("sha"), col("shb")))
      .filter(col("jaccard") >= threshold)
      .select(col(idCol), col("corp_id"), col("jaccard"))
  }

  /** Streaming DSIR scoring — the ingest-gate form of
    * [[graft.scale.Sampling.dsirScores]]: a frozen
    * [[graft.scale.Sampling.dsirModelDense]] snapshot (one milli-log2
    * llr per feature bucket, smoothing constant folded in, DENSE over
    * the bucket domain so even never-trained buckets score at the
    * smoothed floor) collects to a driver map (`buckets` entries by
    * contract — 4096-ary default, ≤ 2²⁴ hard cap) and each arriving
    * document scores as a per-row fold of its own hashed tokens.
    * STATELESS: no watermark, no state store, no shuffle; token-less
    * docs emit NO row and scores are bit-identical to the batch
    * operator's on the training corpus (StreamingOpsSpec pins both).
    * Output (idCol, n_tokens, score_milli) — [[Sampling.dsirScores]]'s
    * exact schema, so a threshold gate downstream is the same filter in
    * both worlds.
    */
  def dsirScoreStream(
      docs: DataFrame,
      model: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 4096): DataFrame = {
    val m: Map[Long, Long] = model
      .select(col("b").cast("long"), col("llr_k").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    require(m.size == buckets,
      s"dense DSIR model must cover all $buckets buckets, got ${m.size}")
    val mMap = typedlit(m)
    docs
      .select(
        col(idCol),
        regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(
        col(idCol),
        size(col("toks")).cast("long").as("n_tokens"),
        aggregate(
          col("toks"),
          lit(0L),
          (acc, t) => acc + element_at(mMap,
            graft.scale.TextStats.hashBucket(t, buckets)))
          .as("score_milli"))
  }

  /** Required output mode per operator (documented contract for sinks). */
  val OutputModes: Map[String, OutputMode] = Map(
    "windowedCounts" -> OutputMode.Append(), // closed windows only
    "userRunningTotals" -> OutputMode.Update(),
    "dedupStream" -> OutputMode.Append(),
    "latestPerUser" -> OutputMode.Update(),
    "decontaminateStream" -> OutputMode.Append(), // stateless
    "retrieveStream" -> OutputMode.Append(), // stateless
    "nearDupMatchesStream" -> OutputMode.Append(), // stateless
    "dsirScoreStream" -> OutputMode.Append(), // stateless
    "preferencePairsFinalStream" -> OutputMode.Append(), // eviction
    "feedbackClassCountsFinalStream" -> OutputMode.Append(), // eviction
    "trajectorySignalFinalStream" -> OutputMode.Append(), // eviction
    "driftBucketCountsFinalStream" -> OutputMode.Append(), // eviction
    "cmsSketchStream" -> OutputMode.Complete())
}
