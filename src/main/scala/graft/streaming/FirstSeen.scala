package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-user event-type dictionary on `transformWithState` MAP state —
  * the third typed state variable of the Spark 4.x arbitrary-state API
  * (q466/Milestones exercises ListState + ValueState): for each user,
  * a MapState keyed by event_type accumulates `(count, first-seen
  * micros)` — the streaming form of "vocabulary with first-seen
  * provenance" a curation pipeline keeps per source. Both accumulators
  * are order-insensitive (count and min), so no reorder buffer is
  * needed; the map updates in place as batches arrive in any order.
  *
  * Emission: one row per (user, event_type) when the watermark passes
  * the user's LAST buffered event — the map is final then, because any
  * later-arriving row at-or-before the watermark would be dropped as
  * late, and the guard in handleExpiredTimer re-arms instead of
  * flushing if newer events landed after the timer was set.
  *
  * Scale: state per user is one map entry per DISTINCT event type
  * (vocabulary-sized, not event-count-sized) — the property that makes
  * a per-key dictionary viable over an unbounded stream. MapState's
  * per-entry point writes mean one RocksDB put per (user, type) per
  * batch, not a rewrite of the user's whole dictionary (the reason to
  * use MapState over a ValueState[Map]).
  */
object FirstSeen {

  case class FsEvent(user_id: Long, ts: java.sql.Timestamp, ts_us: Long,
                     event_type: String)

  case class FsEntry(n: Long, first_us: Long)

  case class FsOut(user_id: Long, event_type: String, n: Long,
                   first_us: Long)

  class FirstSeenProcessor
      extends StatefulProcessor[Long, FsEvent, FsOut] {

    @transient private var dict: MapState[String, FsEntry] = _
    @transient private var maxTsMs: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      dict = getHandle.getMapState[String, FsEntry]("dict",
        Encoders.STRING, Encoders.product[FsEntry], TTLConfig.NONE)
      maxTsMs = getHandle.getValueState[Long]("maxTsMs",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[FsEvent],
                                 timerValues: TimerValues): Iterator[FsOut] = {
      var mx = if (maxTsMs.exists()) maxTsMs.get() else Long.MinValue
      rows.foreach { e =>
        val cur =
          if (dict.containsKey(e.event_type)) dict.getValue(e.event_type)
          else FsEntry(0L, Long.MaxValue)
        dict.updateValue(e.event_type,
          FsEntry(cur.n + 1, math.min(cur.first_us, e.ts_us)))
        mx = math.max(mx, e.ts_us / 1000)
      }
      maxTsMs.update(mx)
      getHandle.registerTimer(mx + 1)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[FsOut] = {
      // a stale timer (newer events arrived after it was set) must not
      // flush a still-growing dictionary — the mx+1 timer registered
      // with those events will fire once the watermark passes them
      if (timerValues.getCurrentWatermarkInMs() <= maxTsMs.get())
        return Iterator.empty
      val out = dict.iterator().map { case (t, e) =>
        FsOut(key, t, e.n, e.first_us)
      }.toVector
      dict.clear()
      out.iterator
    }
  }

  /** First-seen dictionary stream: per (user, event_type) count and
    * first-seen micros, emitted when the watermark passes the user's
    * last event. Input must carry a watermark on `ts`.
    */
  def firstSeen(events: Dataset[FsEvent]): Dataset[FsOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new FirstSeenProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
