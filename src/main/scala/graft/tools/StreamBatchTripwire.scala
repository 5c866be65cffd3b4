package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.streaming.EventStreams

/** The stream==batch timestamp-unit tripwire.
  *
  * The unit of an epoch long surfaced from parquet is a property of the
  * READER PATH, not the file (see Tables.NanosGuard): round 7 shipped with
  * the streaming reader assuming nanos while Spark 4.1.2's explicit-LONG
  * streaming scan already delivered micros, which silently collapsed every
  * 2024 event time to 1970-01-20 and turned 10 oracle gates red at once.
  * This probe makes the next such environment shift a loud, seconds-fast
  * failure: it streams the events fixture through the REAL
  * EventStreams.readStream path, takes the global min/max event time, and
  * compares them to the batch reader's — any unit divergence is a 1000×
  * disagreement, impossible to miss. StreamingSpec runs it on every test
  * invocation.
  */
object StreamBatchTripwire {

  /** (min, max) event time in epoch micros, as seen by each reader path.
    */
  final case class Envelope(streamMinUs: Long, streamMaxUs: Long,
                            batchMinUs: Long, batchMaxUs: Long) {
    def consistent: Boolean =
      streamMinUs == batchMinUs && streamMaxUs == batchMaxUs
  }

  /** Probe `eventsDir` (a directory holding the staged events.parquet —
    * the streaming file source needs a directory) against the batch read
    * of `sfDir/events.parquet`.
    */
  def probe(spark: SparkSession, eventsDir: String, sfDir: String): Envelope = {
    val name = s"graft_ts_tripwire_${System.nanoTime()}"
    val q = EventStreams.readStream(spark, eventsDir, globFilter = Some("*.parquet"))
      .agg(min(unix_micros(col("ts"))).as("lo"),
        max(unix_micros(col("ts"))).as("hi"))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val s = spark.table(name).head()
    val b = Tables.load(spark, sfDir, "events")
      .agg(min(unix_micros(col("ts").cast("timestamp"))).as("lo"),
        max(unix_micros(col("ts").cast("timestamp"))).as("hi"))
      .head()
    val env = Envelope(s.getLong(0), s.getLong(1), b.getLong(0), b.getLong(1))
    spark.catalog.dropTempView(name)
    env
  }
}
