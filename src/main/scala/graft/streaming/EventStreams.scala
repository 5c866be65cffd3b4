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

  case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class UserSession(user_id: Long, n_events: Long, total_value: Double,
                         first_ts: java.sql.Timestamp,
                         last_ts: java.sql.Timestamp)

  /** Custom stateful aggregation: running per-user session summary via
    * `flatMapGroupsWithState` (the reference's "bring your own reducer"
    * idea, streaming edition).
    *
    * State is BOUNDED: event-time timeout set to `gap` past each user's
    * last event — once the watermark (applied here, 2 hours) passes it,
    * the state store evicts the user and the final session summary is
    * emitted. Idle users therefore cost nothing after gap+watermark;
    * state tracks active users, not history.
    */
  def userSessions(events: Dataset[UserEvent],
                   gap: java.time.Duration = java.time.Duration.ofHours(1)): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val gapMs = gap.toMillis
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserSession, UserSession](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[UserSession]) =>
          if (state.hasTimedOut) {
            val finalSession = state.get
            state.remove()
            Iterator.single(finalSession)
          } else {
            val evs = batch.toSeq
            if (evs.isEmpty) Iterator.empty
            else {
              val prev = state.getOption
              val first = (prev.map(_.first_ts) ++ evs.map(_.ts)).minBy(_.getTime)
              val last = (prev.map(_.last_ts) ++ evs.map(_.ts)).maxBy(_.getTime)
              val next = UserSession(
                uid,
                prev.map(_.n_events).getOrElse(0L) + evs.size,
                prev.map(_.total_value).getOrElse(0.0) + evs.map(_.value).sum,
                first, last)
              state.update(next)
              state.setTimeoutTimestamp(last.getTime + gapMs)
              Iterator.single(next)
            }
          }
      }
  }
}
