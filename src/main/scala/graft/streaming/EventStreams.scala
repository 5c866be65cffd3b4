package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table shape
  * (SURVEY.md §2b row "Streaming": absent from the reference — the only
  * time concept there is the mapper barrier at `master.py:128-134` — so
  * this is pure extension surface, built on watermarks + windowed aggs +
  * `flatMapGroupsWithState`).
  *
  * The transformations are shared with the batch path: q21 in
  * graft.queries.Relational runs the same grouping logic through the
  * DuckDB oracle; StreamingSpec proves stream/batch equivalence by pushing
  * the events fixture through `readStream` + memory sink.
  *
  * Scale notes: watermark + windowed agg is incremental state in the state
  * store, partitioned by group key — the 1000-executor shape is identical
  * to the batch shuffle. Sessionization state is one small case class per
  * user; `GroupStateTimeout.EventTimeTimeout` evicts sessions when the
  * watermark passes the gap, so state is bounded by active users, not
  * history.
  */
object EventStreams {

  /** The events schema as stored (ts arrives as nanos int64; see
    * graft.io.Tables — same conversion applied here for streams).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Far-future (2100-01-01) event time in epoch NANOS — the sentinel
    * planted by finite-stream queries to push the watermark past every
    * real event and flush pending state. Written to raw-INT64 sentinel
    * parquet files, so it re-enters [[readStream]] as a literal long and
    * the shared unit guard (magnitude ≥ Tables.NanosGuard ⇒ nanos)
    * converts it to the 2100 instant regardless of which unit the REAL
    * fixture column surfaces as.
    */
  val FlushSentinelNanos: Long = 4102444800000000000L

  /** Streaming read of an events parquet directory. `ts` becomes
    * TimestampType (not NTZ): watermarks require an event-time column of
    * TIMESTAMP type; with the UTC session timezone the wall-clock values
    * match the batch path's timestamp_ntz reads.
    *
    * The epoch-long → timestamp conversion is the SAME unit-guarded
    * expression the batch reader uses (graft.io.Tables.epochLongToTsSql):
    * the streaming file source under this explicit LongType schema
    * surfaces the fixture's TIMESTAMP(NANOS) column already in MICROS on
    * Spark 4.1.2, while sentinel files written as raw INT64 carry nanos —
    * a fixed `div 1000` is wrong for one of them no matter which you
    * pick (round 7 shipped the nanos assumption and every 2024 event
    * time collapsed to 1970-01-20, breaking 10 streaming gates).
    *
    * `globFilter` selects files inside `path` (the streaming file source
    * requires a directory — a bare file path fails with "basePath must
    * be a directory").
    */
  def readStream(spark: SparkSession, path: String,
                 globFilter: Option[String] = None): DataFrame = {
    val reader = spark.readStream.schema(rawSchema)
    globFilter.foreach(g => reader.option("pathGlobFilter", g))
    reader
      .parquet(path)
      .withColumn("ts", expr(graft.io.Tables.epochLongToTsSql("ts")))
  }

  /** Tumbling 1-hour windowed counts with a 2-hour watermark — the
    * streaming twin of batch q21.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("sum_value"))

  /** One event on the stateful-session path. `ts` (TimestampType) exists
    * for the watermark; `ts_us` carries the same instant as epoch MICROS
    * because session-gap math must see sub-millisecond precision —
    * `java.sql.Timestamp.getTime` is millis, and a gap of 3600.0005s
    * must still read as > 1 hour (the batch twin q29 compares fractional
    * epoch seconds).
    */
  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, ts_us: Long,
                          event_id: Long, value: Double)

  /** One finalized session, in the batch-sessionization (q29) output
    * shape: `session_idx` is the 1-based ordinal of the session within
    * its user's event-time order.
    */
  case class SessionOut(user_id: Long, session_idx: Long, n_events: Long,
                        session_value: Double)

  /** One session-in-progress (a maximal run of events with inter-event
    * gaps ≤ gap). Public only because the state encoder's generated code
    * must reach the accessors — not part of the API.
    */
  case class SessionSpan(firstUs: Long, lastUs: Long, n: Long, value: Double)

  /** Keyed state: the user's not-yet-sealed session spans (disjoint,
    * separated by > gap, kept sorted) plus how many sessions have
    * already been emitted — so every emission carries its per-user
    * ordinal without post-hoc renumbering.
    */
  case class SessionsState(closed: Long, spans: Seq[SessionSpan])

  private def round2(v: Double): Double =
    java.math.BigDecimal.valueOf(v).setScale(2, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** Custom stateful GAP sessionization via `flatMapGroupsWithState`
    * (the reference's "bring your own reducer" idea, streaming edition)
    * — the streaming twin of batch q29: a session ends when the gap to
    * the next event exceeds `gap` (strictly), sessions are numbered per
    * user in event-time order, and each session is emitted EXACTLY ONCE
    * (append semantics, no running updates).
    *
    * Emission is strictly WATERMARK-DRIVEN, never eager: a session is
    * emitted only once `last + gap < watermark`, i.e. once no legally
    * late event (the engine admits anything ≥ watermark) could still
    * extend it, start before it, or bridge into it. An earlier design
    * emitted a span the moment a later event split away from it — wrong
    * under multi-batch late arrival: an admissible late event landing
    * BETWEEN an already-emitted span and the open one would silently
    * merge into the wrong session (caught in round-4 review). Until the
    * watermark seals them, finished-looking spans wait in state; each
    * batch merges its (event-time-sorted) events into the span list —
    * gap-sessionization of a point set is one sorted merge pass, so late
    * events within the watermark fall into exactly the session batch
    * q29 would give them.
    *
    * State per ACTIVE user is a handful of spans bounded by the
    * watermark horizon (everything older is sealed and emitted — the
    * event-time timeout fires at the earliest `last + gap`). After a
    * user's spans all seal, a counter-only tombstone (16 bytes) remains
    * so a returning user's `session_idx` continues the batch-equivalent
    * numbering — which means state grows with the number of distinct
    * users EVER seen, unbounded on a long-running stream. Pipelines that
    * key sessions by (user, first_ts) instead of ordinals should pass
    * `dropIdleTombstones = true`: state is then removed outright once a
    * user's spans all seal (strictly active-user-bounded), at the
    * documented cost that a user returning after going fully idle
    * restarts `session_idx` at 1.
    */
  /** One typed event on the conversion-tracking path (view or purchase). */
  case class FlowEvent(user_id: Long, ts: java.sql.Timestamp, ts_us: Long,
                       event_id: Long, event_type: String)

  /** The decided fate of one view: did a purchase follow within the
    * window? `lag_us` is first-purchase latency (None when unconverted).
    */
  case class ConversionOut(user_id: Long, view_event_id: Long,
                           converted: Boolean, lag_us: Option[Long])

  /** Keyed state: undecided views + the purchases that could still
    * convert an undecided or legally-late view. Both lists are bounded
    * by the watermark horizon: a view seals (and leaves) once
    * `ts + window < watermark`, a purchase is useless (and dropped) once
    * `ts + window ≤ watermark` — no admissible view could still precede
    * it within the window. */
  case class FlowState(views: Seq[(Long, Long)], purchases: Seq[Long])

  /** Per-view conversion detection with timeout semantics — the
    * "abandoned flow" op (cart abandonment, un-actioned alerts,
    * SLA-breach detection): every `view` is decided EXACTLY ONCE as
    * converted (a purchase by the same user followed within `window`)
    * or timed out, decided only when the watermark proves no admissible
    * purchase can still arrive. Unlike [[gapSessions]] (one evolving
    * span set per user) this is per-ITEM timeout state: the state is
    * the set of undecided views plus the watermark-horizon purchases —
    * both evicted as the watermark advances, so state per user is
    * horizon-bounded, never history-bounded. A stream-stream left-outer
    * join gives the converted half; the decided-false half — the
    * business signal — is exactly what the join cannot emit per-row
    * without this state shape (it emits nulls only at state eviction,
    * with no first-match-only semantics).
    */
  def conversionTimeouts(events: Dataset[FlowEvent],
                         window: java.time.Duration =
                           java.time.Duration.ofMinutes(30)): Dataset[ConversionOut] = {
    import events.sparkSession.implicits._
    val winUs = window.toMillis * 1000L
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FlowState, ConversionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[FlowEvent], state: GroupState[FlowState]) =>
          val prev = state.getOption.getOrElse(FlowState(Seq.empty, Seq.empty))
          val evts = batch.toArray
          val views = prev.views ++ evts.filter(_.event_type == "view")
            .map(e => (e.ts_us, e.event_id))
          val purchases = prev.purchases ++
            evts.filter(_.event_type == "purchase").map(_.ts_us)
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // decide: no admissible purchase (ts >= watermark) can land in
          // (v, v + window] anymore once v + window < watermark
          val (ready, pending) = views.partition { case (ts, _) =>
            ts + winUs < wmUs }
          val out = ready.sortBy { case (ts, id) => (ts, id) }.map {
            case (vts, vid) =>
              val hit = purchases.filter(p => p > vts && p - vts <= winUs)
              ConversionOut(uid, vid, hit.nonEmpty,
                if (hit.nonEmpty) Some(hit.min - vts) else None)
          }
          // a purchase at p converts only views in [p - window, p); all
          // such views are decided once p + window <= watermark
          val keepP = purchases.filter(p => p + winUs > wmUs)
          if (pending.isEmpty && keepP.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(FlowState(pending, keepP))
            val nextUs =
              if (pending.nonEmpty) pending.map(_._1).min + winUs
              else keepP.max + winUs
            state.setTimeoutTimestamp(
              math.max(nextUs / 1000L + 1L, state.getCurrentWatermarkMs() + 1L))
          }
          out.iterator
      }
  }

  /** One valued event keyed by event type (running-moments path). */
  case class MomentsEvent(etype: String, ts: java.sql.Timestamp, ts_us: Long,
                          event_id: Long, value: Double)

  /** Final running moments for one key at stream flush. */
  case class MomentsOut(event_type: String, n: Long, mean: Double, m2: Double)

  /** Keyed moments state: the carried (n, mean, M2) triple — O(1) per
    * key forever — plus the watermark-pending buffer. */
  case class MomentsState(n: Double, mean: Double, m2: Double,
                          pending: Seq[(Long, Long, Double)])

  /** Event-time micros past which a key treats the stream as flushed
    * (the 2100 sentinel minus its 2 h watermark lag is far beyond this
    * 2090-01-01 mark, every real event far below). */
  val FlushedThresholdUs: Long = 3786912000000000L

  /** Streaming running moments — q233's Chan merge run continuously:
    * each event folds into the carried (n, mean, M2) triple as a
    * single-element Chan merge (δ = x − mean; mean' = (mean·n + x)/
    * (n+1); M2' = M2 + δ²·n/(n+1)), in watermark-proven (ts, id) order
    * (the [[rateLimit]] buffer discipline), and the final triple emits
    * once the watermark passes [[FlushedThresholdUs]] (the flush
    * sentinel's doing). This is the per-key streaming aggregate whose
    * state never grows with history — the shape a 100 TB stream keeps
    * per key where a windowed agg would keep per (key, window).
    */
  def runningMoments(events: Dataset[MomentsEvent]): Dataset[MomentsOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.etype)
      .flatMapGroupsWithState[MomentsState, MomentsOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, batch: Iterator[MomentsEvent], state: GroupState[MomentsState]) =>
          val prev = state.getOption.getOrElse(
            MomentsState(0.0, 0.0, 0.0, Seq.empty))
          val pend = prev.pending ++
            batch.map(e => (e.ts_us, e.event_id, e.value))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, rest) = pend.partition(_._1 < wmUs)
          var n = prev.n; var mean = prev.mean; var m2 = prev.m2
          ready.sortBy(e => (e._1, e._2)).foreach { case (_, _, x) =>
            // the SAME op sequence as q233's merge lambda with nb = 1,
            // so batch-merged and stream-folded moments agree to ulps
            val d = x - mean
            m2 = m2 + d * d * n / (n + 1.0)
            mean = (mean * n + x) / (n + 1.0)
            n = n + 1.0
          }
          val out =
            if (wmUs > FlushedThresholdUs && rest.isEmpty && n > 0.0) {
              if (state.exists) state.remove()
              Seq(MomentsOut(key, n.toLong, mean, m2))
            } else {
              state.update(MomentsState(n, mean, m2, rest))
              state.setTimeoutTimestamp(math.max(
                if (rest.nonEmpty) rest.map(_._1).min / 1000L + 1L else 0L,
                state.getCurrentWatermarkMs() + 1L))
              Nil
            }
          out.iterator
      }
  }

  /** One reached funnel stage for one user (emitted at most once per
    * (user, stage) — stage decisions are final by construction). */
  case class FunnelOut(user_id: Long, stage: String)

  /** Keyed funnel state: the decided stage timestamps (−1 = not yet
    * reached; micros) plus the watermark-pending buffer. The decided
    * triple is 3 longs per user forever (the same bounded carry-over
    * class as [[rateLimit]]'s token bucket; an idle-key TTL is the
    * deployment eviction knob); pending is watermark-horizon-bounded.
    */
  case class FunnelState(vTs: Long, cTs: Long, pTs: Long,
                         pending: Seq[(Long, Long, String)])

  /** Streaming ordered funnel — batch q72's rule ("first view, first
    * click after that view, first purchase after that click") run as
    * per-user incremental state. A later-arriving EARLIER view can
    * change which clicks qualify, so events buffer until the watermark
    * proves nothing can precede them and fold in (ts, id) order (the
    * [[rateLimit]] secondary-sort discipline); each fold step advances
    * the 3-long stage triple and emits the stage transition exactly
    * once. Folding in complete ts order makes every decision final:
    * vTs is the true min view ts, cTs the min click ts strictly after
    * it, pTs the min purchase ts strictly after that — identical to
    * the batch three-join.
    */
  def funnelStages(events: Dataset[FlowEvent]): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[FlowEvent], state: GroupState[FunnelState]) =>
          val prev = state.getOption.getOrElse(
            FunnelState(-1L, -1L, -1L, Seq.empty))
          val pend = prev.pending ++
            batch.map(e => (e.ts_us, e.event_id, e.event_type))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // same-ts arrivals may still precede a row at ts == watermark
          val (ready, rest) = pend.partition(_._1 < wmUs)
          var v = prev.vTs; var c = prev.cTs; var p = prev.pTs
          val out = ready.sortBy(e => (e._1, e._2)).flatMap {
            case (ts, _, tpe) => tpe match {
              case "view" if v == -1L =>
                v = ts; Seq(FunnelOut(uid, "1_view"))
              case "click" if v != -1L && c == -1L && ts > v =>
                c = ts; Seq(FunnelOut(uid, "2_click"))
              case "purchase" if c != -1L && p == -1L && ts > c =>
                p = ts; Seq(FunnelOut(uid, "3_purchase"))
              case _ => Nil
            }
          }
          if (rest.isEmpty && v == -1L && c == -1L && p == -1L) {
            if (state.exists) state.remove()
          } else {
            state.update(FunnelState(v, c, p, rest))
            if (rest.nonEmpty)
              state.setTimeoutTimestamp(math.max(
                rest.map(_._1).min / 1000L + 1L,
                state.getCurrentWatermarkMs() + 1L))
          }
          out.iterator
      }
  }

  def gapSessions(events: Dataset[SessionEvent],
                  gap: java.time.Duration = java.time.Duration.ofHours(1),
                  dropIdleTombstones: Boolean = false): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gap.toMillis * 1000L
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionsState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[SessionEvent], state: GroupState[SessionsState]) =>
          val prev = state.getOption.getOrElse(SessionsState(0L, Seq.empty))
          // merge new events (as unit spans) into the span list: sort,
          // then combine neighbors whose gap is ≤ gapUs — exactly the
          // batch gap rule, late events included
          val units = batch.toArray.sortBy(e => (e.ts_us, e.event_id))
            .map(e => SessionSpan(e.ts_us, e.ts_us, 1L, e.value))
          val merged = (prev.spans ++ units).sortBy(s => (s.firstUs, s.lastUs))
            .foldLeft(List.empty[SessionSpan]) {
              case (acc @ (cur :: rest), s) if s.firstUs - cur.lastUs <= gapUs =>
                SessionSpan(cur.firstUs, math.max(cur.lastUs, s.lastUs),
                  cur.n + s.n, cur.value + s.value) :: rest
              case (acc, s) => s :: acc
            }
            .reverse
          // seal: STRICTLY below the watermark — an event at exactly
          // ts == last + gap == watermark is still admissible and still
          // extends the session
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, open) = merged.partition(s => s.lastUs + gapUs < wmUs)
          val out = ready.zipWithIndex.map { case (s, i) =>
            SessionOut(uid, prev.closed + i + 1, s.n, round2(s.value))
          }
          if (open.isEmpty && dropIdleTombstones) {
            // fully-idle user: drop the counter tombstone so total state
            // is bounded by ACTIVE users, not users-ever-seen (numbering
            // restarts if this user returns — the caller opted in)
            if (state.exists) state.remove()
          } else {
            state.update(SessionsState(prev.closed + ready.size, open))
            if (open.nonEmpty) {
              // fire when the earliest retained span could seal; must be
              // strictly beyond the current watermark
              val nextMs = (open.map(_.lastUs).min + gapUs) / 1000L + 1L
              state.setTimeoutTimestamp(math.max(nextMs, state.getCurrentWatermarkMs() + 1L))
            }
          }
          out.iterator
      }
  }

  /** One event on the rate-limiting path. */
  case class RateEvent(user_id: Long, ts: java.sql.Timestamp, ts_us: Long,
                       event_id: Long)

  /** One valued event on the anomaly path. */
  case class ValueEvent(user_id: Long, ts: java.sql.Timestamp, ts_us: Long,
                        event_id: Long, value: Double)

  /** An anomaly alert: `value` deviated from the pre-event EWMA. */
  case class AnomalyAlert(user_id: Long, event_id: Long, value: Double,
                          ewma_before: Double)

  /** Keyed EWMA state: `n` events folded, `acc` the running EWMA,
    * `pending` the not-yet-decidable (ts_us, event_id, value) rows. */
  case class EwmaState(n: Long, acc: Double,
                       pending: Seq[(Long, Long, Double)])

  /** Streaming EWMA anomaly detection — q105's α = 1/2 fold (exact
    * halving, the identical IEEE op sequence the batch oracle replays)
    * run continuously per user, emitting an alert whenever an event
    * deviates from the PRE-event EWMA by more than `threshold` after a
    * warm-up of `warmup` events. Same ordering discipline as
    * [[rateLimit]]: arrivals buffer until the watermark proves nothing
    * can precede them, then fold in (ts, id) order; carried state is
    * (n, acc) — O(1) per key, pending bounded by the watermark horizon.
    */
  def ewmaAnomalies(events: Dataset[ValueEvent], threshold: Double = 50.0,
                    warmup: Long = 3L): Dataset[AnomalyAlert] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaState, AnomalyAlert](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[ValueEvent], state: GroupState[EwmaState]) =>
          val prev = state.getOption.getOrElse(EwmaState(0L, 0.0, Seq.empty))
          val pend = prev.pending ++
            batch.map(e => (e.ts_us, e.event_id, e.value))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, rest) = pend.partition(_._1 < wmUs)
          var n = prev.n
          var acc = prev.acc
          val out = ready.sortBy(e => (e._1, e._2)).flatMap {
            case (_, id, v) =>
              val alert =
                if (n >= warmup && math.abs(v - acc) > threshold)
                  Seq(AnomalyAlert(uid, id, v,
                    math.floor(acc * 1e6 + 0.5) / 1e6))
                else Nil
              acc = if (n == 0L) v else acc * 0.5 + v * 0.5
              n += 1
              alert
          }
          if (rest.isEmpty && n == 0L) {
            if (state.exists) state.remove()
          } else {
            state.update(EwmaState(n, acc, rest))
            if (rest.nonEmpty)
              state.setTimeoutTimestamp(math.max(
                rest.map(_._1).min / 1000L + 1L,
                state.getCurrentWatermarkMs() + 1L))
          }
          out.iterator
      }
  }

  /** One Bernoulli observation on the sequential-test path. */
  case class SprtEvent(variant: Long, ts: java.sql.Timestamp, ts_us: Long,
                       event_id: Long, success: Boolean)

  /** Final SPRT report for one variant at stream flush: `llr9` is the
    * 1e-9-grid LONG log-likelihood ratio at the decision point (0 when
    * the walk never crossed). */
  case class SprtOut(variant: Long, n_total: Long, n_success: Long,
                     n_at_decision: Long, decision: String, llr9: Long)

  /** Keyed SPRT state: observations folded (n), successes (k), the
    * decision point if crossed (nDec = −1 until then, cumDec the LLR
    * there) — O(1) per key forever — plus the watermark-pending buffer.
    */
  case class SprtState(n: Long, k: Long, nDec: Long, cumDec: Long,
                       pending: Seq[(Long, Long, Boolean)])

  /** Streaming SPRT — batch q264's sequential probability ratio walk
    * run as per-variant incremental state: each observation folds in
    * watermark-proven (ts, id) order (the [[rateLimit]] buffer
    * discipline) stepping the integer-grid LLR cum9 = k·a9 + (n−k)·b9;
    * the FIRST threshold crossing freezes the decision (exactly the
    * early-stopping semantics — later drift cannot un-decide), and the
    * final report emits once at sentinel flush. This is the shape an
    * experimentation platform actually runs: O(1) live state per
    * variant, decisions available the moment the watermark passes the
    * crossing, here read out at flush so the finite gate has one row
    * per variant.
    */
  def sprtWalk(events: Dataset[SprtEvent], a9: Long, b9: Long,
               t9: Long): Dataset[SprtOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.variant)
      .flatMapGroupsWithState[SprtState, SprtOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (variant: Long, batch: Iterator[SprtEvent], state: GroupState[SprtState]) =>
          val prev = state.getOption.getOrElse(
            SprtState(0L, 0L, -1L, 0L, Seq.empty))
          val pend = prev.pending ++
            batch.map(e => (e.ts_us, e.event_id, e.success))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, rest) = pend.partition(_._1 < wmUs)
          var n = prev.n; var k = prev.k
          var nDec = prev.nDec; var cumDec = prev.cumDec
          ready.sortBy(e => (e._1, e._2)).foreach { case (_, _, succ) =>
            n += 1L
            if (succ) k += 1L
            if (nDec == -1L) {
              val cum = k * a9 + (n - k) * b9
              if (cum >= t9 || cum <= -t9) { nDec = n; cumDec = cum }
            }
          }
          val out =
            if (wmUs > FlushedThresholdUs && rest.isEmpty && n > 0L) {
              if (state.exists) state.remove()
              val dec =
                if (nDec == -1L) "continue"
                else if (cumDec >= t9) "accept_h1"
                else "accept_h0"
              Seq(SprtOut(variant, n, k, nDec, dec,
                if (nDec == -1L) 0L else cumDec))
            } else {
              state.update(SprtState(n, k, nDec, cumDec, rest))
              state.setTimeoutTimestamp(math.max(
                if (rest.nonEmpty) rest.map(_._1).min / 1000L + 1L else 0L,
                state.getCurrentWatermarkMs() + 1L))
              Nil
            }
          out.iterator
      }
  }

  /** The admit/deny decision for one event. */
  case class RateDecision(user_id: Long, event_id: Long, allowed: Boolean)

  /** Keyed bucket state: `tokens == -1` means no event folded yet (the
    * first event finds a full bucket); `pending` holds events at or
    * above the watermark, which may still be preceded by a late arrival
    * and so cannot be decided yet. */
  case class RateState(tokens: Long, lastRefill: Long,
                       pending: Seq[(Long, Long)])

  /** Streaming token-bucket rate limiting — the q160 batch semantics
    * (capacity `cap`, one token per `periodUs`, whole periods credited,
    * the partial period banked via `lastRefill += k·period`) run as a
    * continuous stateful operator. The decision at event i depends on
    * every ADMIT before it, so events are decided IN (ts, id) ORDER and
    * only once the watermark proves nothing can precede them: arrivals
    * buffer in `pending` until `ts < watermark`, then fold through the
    * bucket in order. Per-key live state is two longs plus the pending
    * buffer — and pending is bounded by the watermark horizon (2 h of
    * one key's events), NOT the key's history; the fold output and the
    * (tokens, lastRefill) carry-over are O(1). Late events beyond the
    * watermark are dropped by the watermark contract (the price of a
    * bounded buffer; the batch twin q160 is the backfill-exact path).
    * All arithmetic is integer micros — bit-identical to the batch
    * oracle's recursive-CTE walk.
    */
  def rateLimit(events: Dataset[RateEvent], cap: Long = 3L,
                periodUs: Long = 600000000L): Dataset[RateDecision] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RateState, RateDecision](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[RateEvent], state: GroupState[RateState]) =>
          val prev = state.getOption.getOrElse(RateState(-1L, 0L, Seq.empty))
          val pend = prev.pending ++ batch.map(e => (e.ts_us, e.event_id))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // an event at exactly ts == watermark may still be preceded by
          // a same-ts arrival: only strictly-below-watermark rows fold
          val (ready, rest) = pend.partition(_._1 < wmUs)
          var tokens = prev.tokens
          var last = prev.lastRefill
          val out = ready.sorted.map { case (ts, id) =>
            if (tokens == -1L) { tokens = cap; last = ts }
            else {
              // defensive clamp at 0: Spark 4.1 drops beyond-watermark
              // rows before flatMapGroupsWithState (Extension13Spec
              // demonstrates it), but that filter is version-sensitive —
              // if a straggler ever reaches the fold it must read as
              // zero elapsed, not rewind the banked-credit clock
              val k = math.max(0L, (ts - last) / periodUs)
              tokens = math.min(cap, tokens + k)
              last += k * periodUs
            }
            val allowed = tokens > 0L
            if (allowed) tokens -= 1L
            RateDecision(uid, id, allowed)
          }
          if (rest.isEmpty && tokens == -1L) {
            if (state.exists) state.remove()
          } else {
            state.update(RateState(tokens, last, rest))
            if (rest.nonEmpty)
              // fire once the earliest pending row can have cleared the
              // watermark; must be strictly beyond the current watermark
              state.setTimeoutTimestamp(math.max(
                rest.map(_._1).min / 1000L + 1L,
                state.getCurrentWatermarkMs() + 1L))
            // no pending: the (tokens, lastRefill) carry-over stays
            // without a timeout — any future event re-opens the key; at
            // deployment scale an idle-key TTL is the eviction knob
          }
          out.iterator
      }
  }

  /** One event of a multi-shard ingest, keyed by user: `arr_us` is the
    * modeled ARRIVAL instant (event time + the shard's transport lag —
    * the q249 Kafka-partition-skew model), `ts_us` the event time. The
    * watermark runs on `arr` because the router's decisions depend on
    * arrival order, not event-time order. */
  case class LateEvent(user_id: Long, arr: java.sql.Timestamp,
                       arr_us: Long, ts_us: Long, event_id: Long)
  case class LateState(runmax: Long, nEv: Long, nAdmit: Long,
                       maxLate: Long, pending: Seq[(Long, Long, Long)])
  case class LateOut(user_id: Long, n_events: Long, n_admit: Long,
                     n_drop: Long, max_late_us: Long)

  /** Streaming lateness router — the admit/drop decision an ingest
    * stage makes per event under a bounded-lateness contract: an event
    * is DROPPED when it arrives more than `toleranceUs` behind the
    * maximum event time already observed for its key (the per-key
    * watermark proxy), the q249 audit run as a live operator instead
    * of a post-hoc report. Decisions depend on arrival order, so
    * events buffer until the ARRIVAL watermark proves their position
    * (the [[rateLimit]] discipline, ordered by (arr_us, event_id));
    * live state per key is three counters + a running max + the
    * watermark-bounded pending buffer. One summary row per key at
    * sentinel flush. All arithmetic is integer micros — bit-identical
    * to the batch oracle's per-key window replay.
    */
  def latenessRouter(events: Dataset[LateEvent],
                     toleranceUs: Long = 60000000L): Dataset[LateOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("arr", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LateState, LateOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[LateEvent], state: GroupState[LateState]) =>
          val prev = state.getOption.getOrElse(
            LateState(Long.MinValue, 0L, 0L, 0L, Seq.empty))
          val pend = prev.pending ++
            batch.map(e => (e.arr_us, e.event_id, e.ts_us))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, rest) = pend.partition(_._1 < wmUs)
          var runmax = prev.runmax
          var nEv = prev.nEv; var nAdmit = prev.nAdmit
          var maxLate = prev.maxLate
          ready.sortBy(e => (e._1, e._2)).foreach { case (_, _, tsUs) =>
            val late =
              if (runmax == Long.MinValue || runmax - tsUs < 0L) 0L
              else runmax - tsUs
            nEv += 1L
            if (late <= toleranceUs) nAdmit += 1L
            if (late > maxLate) maxLate = late
            if (tsUs > runmax) runmax = tsUs
          }
          val out =
            if (wmUs > FlushedThresholdUs && rest.isEmpty && nEv > 0L) {
              if (state.exists) state.remove()
              Seq(LateOut(uid, nEv, nAdmit, nEv - nAdmit, maxLate))
            } else {
              state.update(LateState(runmax, nEv, nAdmit, maxLate, rest))
              state.setTimeoutTimestamp(math.max(
                if (rest.nonEmpty) rest.map(_._1).min / 1000L + 1L else 0L,
                state.getCurrentWatermarkMs() + 1L))
              Nil
            }
          out.iterator
      }
  }

  /** One event of the cadence monitor, keyed by user: gaps are
    * EVENT-TIME differences, so the fold must see events in (ts_us,
    * event_id) order — the watermark-buffered pending discipline of
    * [[latenessRouter]], with the watermark on `ts` itself. */
  case class CadenceEvent(user_id: Long, ts: java.sql.Timestamp,
                          ts_us: Long, event_id: Long)
  case class CadenceState(lastUs: Long, n: Long, sg: Long, sg2: Long,
                          pending: Seq[(Long, Long)])
  case class CadenceOut(user_id: Long, n_gaps: Long, sg: Long, sg2: Long)

  /** Streaming inter-event cadence monitor — the q310 bot audit as a
    * live per-key operator: carries (last event time, gap count, Σgap,
    * Σgap²) so the exact-integer CV sqrt(n·Σg² − S²)/S is computable
    * the moment a key flushes, with O(1) live state per key beyond the
    * watermark-bounded pending buffer. Gaps are second-granularity
    * LONGs ((ts−prev) div 1e6 on micros) — bit-identical to the batch
    * lag replay, which is the oracle. One summary row per key at
    * sentinel flush; the caller derives mean/CV from the exact sums.
    */
  def cadenceMonitor(events: Dataset[CadenceEvent]): Dataset[CadenceOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CadenceState, CadenceOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[CadenceEvent],
         state: GroupState[CadenceState]) =>
          val prev = state.getOption.getOrElse(
            CadenceState(Long.MinValue, 0L, 0L, 0L, Seq.empty))
          val pend = prev.pending ++ batch.map(e => (e.ts_us, e.event_id))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, rest) = pend.partition(_._1 < wmUs)
          var last = prev.lastUs
          var n = prev.n; var sg = prev.sg; var sg2 = prev.sg2
          ready.sorted.foreach { case (tsUs, _) =>
            if (last != Long.MinValue) {
              val g = (tsUs - last) / 1000000L
              n += 1L; sg += g; sg2 += g * g
            }
            last = tsUs
          }
          val out =
            if (wmUs > FlushedThresholdUs && rest.isEmpty && n > 0L) {
              if (state.exists) state.remove()
              Seq(CadenceOut(uid, n, sg, sg2))
            } else if (wmUs > FlushedThresholdUs && rest.isEmpty) {
              // n == 0: a single-event user has no gaps and emits no
              // summary row — but keeping its state would re-register a
              // timeout at wm+1 every trigger FOREVER in a continuous
              // deployment. Drop the key entirely once flushed.
              if (state.exists) state.remove()
              Nil
            } else {
              state.update(CadenceState(last, n, sg, sg2, rest))
              state.setTimeoutTimestamp(math.max(
                if (rest.nonEmpty) rest.map(_._1).min / 1000L + 1L else 0L,
                state.getCurrentWatermarkMs() + 1L))
              Nil
            }
          out.iterator
      }
  }

  /** One event of the streaming ledger, keyed by user: `dx` is the
    * signed integer-cent delta (deposits positive, consumption
    * negative), pre-computed by the caller so the fold is pure LONG
    * arithmetic. */
  case class BalanceEvent(user_id: Long, ts: java.sql.Timestamp,
                          ts_us: Long, event_id: Long, dx: Long)
  case class BalanceState(bal: Long, peak: Long, hits: Long, n: Long,
                          pending: Seq[(Long, Long, Long)])
  case class BalanceOut(user_id: Long, n_tx: Long, final_cents: Long,
                        peak_cents: Long, floor_hits: Long)

  /** Streaming clamped running balance — the SEQUENTIAL twin of batch
    * q354: per user, b := max(0, b + dx) folded in (ts_us, event_id)
    * order over the watermark-buffered pending events (the
    * [[cadenceMonitor]] ordering discipline), carrying (balance, peak,
    * floor hits, count) as O(1) live state per key. The batch side
    * computes the SAME recurrence through its associative parallel-scan
    * identity (b_i = S_i − min(0, min prefix S)); this operator IS the
    * recurrence — the shared DuckDB oracle proves the two formulations
    * agree bit-for-bit, which is the point of the pair. One summary row
    * per key at sentinel flush; keys that flush empty drop their state
    * (no immortal timeouts in a continuous deployment).
    */
  def clampedBalance(events: Dataset[BalanceEvent]): Dataset[BalanceOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[BalanceState, BalanceOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[BalanceEvent],
         state: GroupState[BalanceState]) =>
          val prev = state.getOption.getOrElse(
            BalanceState(0L, 0L, 0L, 0L, Seq.empty))
          val pend = prev.pending ++
            batch.map(e => (e.ts_us, e.event_id, e.dx))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, rest) = pend.partition(_._1 < wmUs)
          var bal = prev.bal; var peak = prev.peak
          var hits = prev.hits; var n = prev.n
          ready.sorted.foreach { case (_, _, dx) =>
            bal = math.max(0L, bal + dx)
            if (bal > peak) peak = bal
            if (bal == 0L && dx < 0L) hits += 1L
            n += 1L
          }
          val out =
            if (wmUs > FlushedThresholdUs && rest.isEmpty && n > 0L) {
              if (state.exists) state.remove()
              Seq(BalanceOut(uid, n, bal, peak, hits))
            } else if (wmUs > FlushedThresholdUs && rest.isEmpty) {
              if (state.exists) state.remove()
              Nil
            } else {
              state.update(BalanceState(bal, peak, hits, n, rest))
              state.setTimeoutTimestamp(math.max(
                if (rest.nonEmpty) rest.map(_._1).min / 1000L + 1L else 0L,
                state.getCurrentWatermarkMs() + 1L))
              Nil
            }
          out.iterator
      }
  }
}
