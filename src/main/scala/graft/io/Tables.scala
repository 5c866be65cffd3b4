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

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz"))
    else df
  }
}
