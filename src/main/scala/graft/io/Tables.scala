package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * Columnar parquet scans replace the reference's whole-file-in-driver-memory
  * text read (`/root/reference/master.py:34-36`): Spark's vectorized parquet
  * reader gives per-split streaming scans with predicate pushdown and column
  * pruning, so a 100 TB table is read as independent splits, never
  * materialized on one node.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Required on every session that reads `events`: Spark 4 rejects
    * parquet TIMESTAMP(NANOS) outright; with this legacy flag the column
    * arrives as LongType nanos and [[load]] converts it to timestamp_ntz
    * (microsecond truncation — the same thing DuckDB does on read, so the
    * oracle sees identical values).
    */
  val requiredConfs: Map[String, String] =
    Map("spark.sql.legacy.parquet.nanosAsLong" -> "true")

  /** Epoch longs at or above this magnitude are nanoseconds; below,
    * microseconds. 3e17 nanos ≈ 1979-07; 3e17 micros ≈ year 11,476 — any
    * real event time lands unambiguously on one side. The guard exists
    * because the UNIT of an epoch long read from parquet is a property of
    * the reader path, not the file: the batch reader (nanosAsLong flag)
    * surfaces the fixture's TIMESTAMP(NANOS) column as nanos, while the
    * streaming file source under an explicit LongType schema surfaces the
    * SAME column already down-converted to micros (observed on Spark
    * 4.1.2 — assuming nanos there collapsed 2024 event times to 1970 and
    * broke every streaming gate in round 7). Deriving the unit per value
    * makes both paths, plus raw-INT64 sentinel files, converge on the
    * same instant.
    */
  val NanosGuard: Long = 300000000000000000L

  /** Embedding dimensionality of the `embeddings` fixture. Spark-side
    * pipelines derive the dim at runtime (SimilaritySearch.deriveDim);
    * DuckDB oracle SQL is authored as a static string and cannot, so
    * oracles that unroll per-component expressions use THIS constant.
    * FixtureSpec pins it against the actual parquet, so a fixture dim
    * change fails loudly instead of silently diverging the oracles
    * (e.g. a 64-wide meanList over a 32-dim fixture computes NULL
    * centroid components).
    */
  val EmbeddingDim: Int = 64

  /** SQL for the shared unit-guarded epoch-long → TimestampType(micros)
    * conversion. Both the batch ([[load]]) and streaming
    * (graft.streaming.EventStreams.readStream) readers MUST route their
    * `ts` conversion through this one expression.
    */
  def epochLongToTsSql(colName: String): String =
    s"timestamp_micros(CASE WHEN abs($colName) >= ${NanosGuard}L " +
      s"THEN $colName div 1000 ELSE $colName END)"

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", expr(epochLongToTsSql("ts")).cast("timestamp_ntz"))
    else df
  }
}
