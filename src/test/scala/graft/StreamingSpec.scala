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

  test("stateful gap sessions (flatMapGroupsWithState) == batch sessionization") {
    // the registered q76 pipeline (real stream + sentinel watermark
    // flush) must equal the registered batch q29 pipeline row-for-row
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        math.round(r.getDouble(3) * 100)))
      .toSeq

    val got = canon(SparkEntry.queries("q76_streaming_sessions")(spark, sf0001))
    val batch = canon(SparkEntry.queries("q29_sessionization")(spark, sf0001))
    assert(got == batch)
    assert(got.nonEmpty)
    // multiple sessions per user must actually occur in the fixture —
    // otherwise the gap-split path was never exercised
    assert(got.exists(_._2 > 1))
  }
}
