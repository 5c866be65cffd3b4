package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessorWithInitialState, TimeMode, TimerValues, TTLConfig,
  ValueState}

/** Batch-to-streaming state BOOTSTRAP on
  * `StatefulProcessorWithInitialState` — the migration primitive the
  * plain processor lacks: when a batch rollup moves to streaming, the
  * stream must continue FROM the historical totals without reprocessing
  * history. `handleInitialState` seeds each user's ValueState from a
  * batch-computed frame BEFORE the first micro-batch; streamed events
  * then accumulate on top, and every seeded-or-streamed user reports
  * exactly once when the watermark passes `flushAtMs` — including
  * history-only users the stream never mentions (their timer comes from
  * the seeding pass itself).
  *
  * Scale: the seed frame is group-count-sized (an MV, not the fact
  * history); per-user state is one counter; accumulation is
  * order-insensitive so no reorder buffer is needed.
  */
object WarmStart {

  case class WsEvent(user_id: Long, ts: java.sql.Timestamp, ts_us: Long,
                     cents: Long)

  /** One seeded group of the historical rollup. */
  case class WsInit(user_id: Long, n: Long, cents: Long)

  case class WsAcc(n: Long, cents: Long)

  case class WsOut(user_id: Long, n: Long, total_cents: Long)

  class WarmStartProcessor(flushAtMs: Long)
      extends StatefulProcessorWithInitialState[Long, WsEvent, WsOut, WsInit] {

    @transient private var acc: ValueState[WsAcc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      acc = getHandle.getValueState[WsAcc]("acc",
        Encoders.product[WsAcc], TTLConfig.NONE)
    }

    override def handleInitialState(key: Long, initialState: WsInit,
                                    timerValues: TimerValues): Unit = {
      acc.update(WsAcc(initialState.n, initialState.cents))
      // history-only users flush too: their only timer is this one
      getHandle.registerTimer(flushAtMs)
    }

    override def handleInputRows(key: Long, rows: Iterator[WsEvent],
                                 timerValues: TimerValues): Iterator[WsOut] = {
      var a = if (acc.exists()) acc.get() else WsAcc(0L, 0L)
      rows.foreach(e => a = WsAcc(a.n + 1, a.cents + e.cents))
      acc.update(a)
      getHandle.registerTimer(flushAtMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[WsOut] = {
      if (!acc.exists()) return Iterator.empty
      val a = acc.get()
      acc.clear()
      Iterator.single(WsOut(key, a.n, a.cents))
    }
  }

  /** Lifetime totals continuing from `history`: each user's final
    * (count, cents) over history + stream, reported once when the
    * watermark passes `flushAtMs` (pick a time at-or-after the last
    * real event). Input must carry a watermark on `ts`.
    */
  def lifetimeTotals(events: Dataset[WsEvent],
                     history: KeyValueGroupedDataset[Long, WsInit],
                     flushAtMs: Long): Dataset[WsOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new WarmStartProcessor(flushAtMs),
        TimeMode.EventTime(), OutputMode.Append(), history)
  }
}
