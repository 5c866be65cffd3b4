package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.streaming.EventStreams

/** Streaming/batch equivalence: the events fixture pushed through
  * `readStream` + memory sink must produce exactly the batch aggregation
  * (q21's grouping), and the stateful session path must match a batch
  * groupBy summary. FileStreamSource wants a directory, so the fixture
  * file is staged into a temp dir.
  */
class StreamingSpec extends SparkSpec {

  import spark.implicits._

  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("graft_events")
    Files.copy(
      Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("streaming hourly counts == batch hourly counts (complete mode)") {
    val q = EventStreams.hourlyCounts(EventStreams.readStream(spark, eventsDir))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("hourly")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val got = spark.table("hourly")
      .select(date_format(col("hour"), "yyyy-MM-dd HH:mm").as("h"),
        col("event_type"), col("n"), col("sum_value"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet

    val batch = Tables.load(spark, sf0001, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(date_format(col("hour"), "yyyy-MM-dd HH:mm").as("h"),
        col("event_type"), col("n"), col("sum_value"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet

    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("stateful user sessions (flatMapGroupsWithState) == batch summary") {
    val stream = EventStreams.readStream(spark, eventsDir)
      .selectExpr("user_id", "ts", "value")
      .as[EventStreams.UserEvent]
    val q = EventStreams.userSessions(stream)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("sessions")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    // single batch → exactly one update row per user
    val got = spark.table("sessions")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), math.round(r.getDouble(2) * 100)))
      .toMap

    val batch = Tables.load(spark, sf0001, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("tv"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), math.round(r.getDouble(2) * 100)))
      .toMap

    assert(got == batch)
    assert(got.nonEmpty)
  }
}
