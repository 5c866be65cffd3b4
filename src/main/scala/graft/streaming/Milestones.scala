package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-user milestone emitter on the `transformWithState` API — Spark
  * 4.x's arbitrary-state operator (SPARK-45939, the successor to
  * `flatMapGroupsWithState`) with its typed state variables and
  * event-time TIMERS, none of which the engine exercised before: the
  * older API holds ONE state value per key; here the processor
  * composes a ListState (event-time reorder buffer), a ValueState
  * (running counter), and watermark-driven timers.
  *
  * Semantics: for each user, walking their events in event-time order
  * `(ts, event_id)`, emit a row at every k-th event carrying the
  * running cents total — "alert every 4th purchase with lifetime
  * spend". Streaming input gives NO intra-key ordering (micro-batch
  * splits and shuffle order are arbitrary), so correctness needs an
  * event-time reorder buffer: events append to ListState, and a timer
  * at the max buffered event time fires once the WATERMARK passes it —
  * at that point no earlier event can still arrive (later rows would be
  * watermark-late and dropped), so the buffered prefix up to the
  * watermark is final: sort it, roll the counter forward, emit the
  * milestones, clear what was flushed.
  *
  * Scale: state per user is the reorder buffer bounded by the watermark
  * horizon (events older than the watermark flush on the next timer) +
  * one counter — NOT the user's history. Keyed state shards across
  * executors on user_id exactly like a shuffle, and the engine runs it
  * on the RocksDB provider (required by transformWithState), so state
  * capacity scales with executor disk.
  */
object Milestones {

  /** Input event: `ts_us` carries the instant in epoch micros (same
    * rationale as [[EventStreams.SessionEvent]] — millis-grain
    * Timestamp accessors would collapse sub-ms order).
    */
  case class MsEvent(user_id: Long, ts: java.sql.Timestamp, ts_us: Long,
                     event_id: Long, value: Double)

  /** One emitted milestone: the user's n-th event and cents-exact
    * running total at that point.
    */
  case class MsOut(user_id: Long, milestone: Long, cum_cents: Long)

  /** Running per-user counter across already-finalized events. */
  case class MsCounter(n: Long, cents: Long)

  private def cents(v: Double): Long = math.floor(v * 100 + 0.5).toLong

  class MilestoneProcessor(k: Long)
      extends StatefulProcessor[Long, MsEvent, MsOut] {

    @transient private var buf: ListState[MsEvent] = _
    @transient private var counter: ValueState[MsCounter] = _
    @transient private var maxTsMs: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[MsEvent]("buf",
        Encoders.product[MsEvent], TTLConfig.NONE)
      counter = getHandle.getValueState[MsCounter]("counter",
        Encoders.product[MsCounter], TTLConfig.NONE)
      maxTsMs = getHandle.getValueState[Long]("maxTsMs",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[MsEvent],
                                 timerValues: TimerValues): Iterator[MsOut] = {
      var mx = if (maxTsMs.exists()) maxTsMs.get() else Long.MinValue
      rows.foreach { e =>
        buf.appendValue(e)
        mx = math.max(mx, e.ts_us / 1000)
      }
      maxTsMs.update(mx)
      // one timer at the max buffered event time: fires when the
      // watermark passes it. Re-registering a later expiry as later
      // batches arrive is fine — an earlier timer firing with an
      // already-flushed buffer emits nothing.
      getHandle.registerTimer(mx + 1)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[MsOut] = {
      val wmMs = timerValues.getCurrentWatermarkInMs()
      val all = buf.get().toVector
      // final prefix: nothing at-or-before the watermark can arrive now
      val (ripe, pending) = all.partition(_.ts_us / 1000 <= wmMs)
      if (ripe.isEmpty) return Iterator.empty
      var st = if (counter.exists()) counter.get() else MsCounter(0L, 0L)
      val out = Vector.newBuilder[MsOut]
      ripe.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        st = MsCounter(st.n + 1, st.cents + cents(e.value))
        if (st.n % k == 0) out += MsOut(key, st.n, st.cents)
      }
      counter.update(st)
      if (pending.isEmpty) buf.clear() else buf.put(pending.toArray)
      // no re-arm needed for the retained suffix: this firing was a
      // STALE timer (its expiry predates the key's current max event
      // time, or pending would be empty), and handleInputRows always
      // registered a newer timer at maxTs+1 ≥ pending.max+1 when those
      // events arrived — that live timer flushes them once the
      // watermark passes
      out.result().iterator
    }
  }

  /** Milestone stream: every k-th event per user with the running cents
    * total, event-time ordered regardless of arrival order. Input must
    * carry a watermark on `ts`.
    */
  def milestones(events: Dataset[MsEvent], k: Long): Dataset[MsOut] = {
    require(k > 0, s"milestone interval must be positive, got $k")
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new MilestoneProcessor(k),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
