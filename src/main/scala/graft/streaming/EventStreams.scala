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

  /** Streaming read of an events parquet directory. `ts` becomes
    * TimestampType (not NTZ): watermarks require an event-time column of
    * TIMESTAMP type; with the UTC session timezone the wall-clock values
    * match the batch path's timestamp_ntz reads.
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
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
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

  /** Keyed state: the user's open session plus how many sessions have
    * already been closed (so every emission carries its ordinal without
    * any post-hoc renumbering). Public only because the state encoder's
    * generated code must reach the accessors — not part of the API.
    */
  case class OpenSession(closed: Long, n: Long, value: Double, lastUs: Long)

  private def round2(v: Double): Double =
    java.math.BigDecimal.valueOf(v).setScale(2, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** Custom stateful GAP sessionization via `flatMapGroupsWithState`
    * (the reference's "bring your own reducer" idea, streaming edition)
    * — the streaming twin of batch q29: a session ends when the gap to
    * the next event exceeds `gap` (strictly), sessions are numbered per
    * user in event-time order, and each session is emitted EXACTLY ONCE
    * when it closes (append semantics, no running updates):
    *
    *  - within a batch, the group's events are sorted by (ts, event_id)
    *    — the same total order as the batch window — and gap-split
    *    eagerly, so a batch containing several sessions emits every
    *    closed one immediately;
    *  - the still-open session waits in state with an event-time timeout
    *    at `last + gap`; when the watermark (applied here, 2 hours)
    *    passes it, the session is finalized and the state evicted.
    *
    * State is BOUNDED: one small OpenSession per ACTIVE user — idle
    * users cost nothing after gap+watermark, exactly the property that
    * lets keyed session state survive 100 TB event history (state scales
    * with concurrent users, not events). Events later than the watermark
    * are dropped by the engine before reaching the function, which is
    * consistent: any event that could legally arrive (≤ 2 h late) either
    * extends a session whose timeout has not yet fired or starts a new
    * one.
    *
    * Cross-batch assumption (standard for event-time sessionization):
    * within a user, batches arrive in non-decreasing event-time order up
    * to the watermark slack — an event older than the open session's
    * last timestamp merges as if it were next (its contribution to
    * n/value is correct; only a sub-gap reordering straddling a batch
    * boundary could mis-split, and the watermark bounds that window).
    */
  def gapSessions(events: Dataset[SessionEvent],
                  gap: java.time.Duration = java.time.Duration.ofHours(1)): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gap.toMillis * 1000L
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(SessionOut(uid, st.closed + 1, st.n, round2(st.value)))
          } else {
            val evs = batch.toArray.sortBy(e => (e.ts_us, e.event_id))
            var st = state.getOption.orNull
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            evs.foreach { e =>
              if (st == null)
                st = OpenSession(0L, 1L, e.value, e.ts_us)
              else if (e.ts_us - st.lastUs > gapUs) {
                out += SessionOut(uid, st.closed + 1, st.n, round2(st.value))
                st = OpenSession(st.closed + 1, 1L, e.value, e.ts_us)
              } else
                st = OpenSession(st.closed, st.n + 1, st.value + e.value,
                  math.max(st.lastUs, e.ts_us))
            }
            if (st != null) {
              state.update(st)
              // ceil to ms so the timeout never lands before last+gap
              state.setTimeoutTimestamp((st.lastUs + gapUs + 999L) / 1000L)
            }
            out.iterator
          }
      }
  }
}
