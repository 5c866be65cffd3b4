package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Dev diagnostic: prove the RocksDB state store provider is ENGAGED
  * (not silently falling back to heap) for the stateful streaming shapes
  * q74/q76 run, and measure its keyed-state footprint.
  *
  * Runs the q74-shaped dedup (every event planted twice →
  * `dropDuplicatesWithinWatermark` holds one state row per event_id) at
  * the given SF dir under
  * `spark.sql.streaming.stateStore.providerClass=RocksDBStateStoreProvider`
  * and prints the final progress's state-operator metrics: RocksDB-only
  * custom metrics (sst file size, memtable size) are non-zero ONLY when
  * the provider is real — a heap fallback would report none.
  *
  * Usage: sbt "runMain graft.tools.RocksDbStateProbe [sfDir]"
  */
object RocksDbStateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.Engine.session(appName = "rocksdb-state-probe")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckptDir = Files.createTempDirectory("rocksdb_probe_ckpt")
    val q = EventStreams.readStream(spark, sfDir, globFilter = Some("events.parquet"))
      .withColumn("__copy", explode(array(lit(1), lit(2))))
      .drop("__copy")
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
      .select("event_id", "user_id", "event_type", "value")
      .writeStream
      .format("noop")
      .outputMode("append")
      .option("checkpointLocation", ckptDir.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val progress = q.recentProgress.filter(_.stateOperators.nonEmpty).lastOption
    q.stop()
    progress match {
      case None => println("ROCKSDB_PROBE no stateful progress recorded — FAIL")
      case Some(p) =>
        p.stateOperators.foreach { op =>
          println(s"ROCKSDB_OP name=${op.operatorName} rowsTotal=${op.numRowsTotal} " +
            s"stateMemBytes=${op.memoryUsedBytes}")
          val custom = op.customMetrics
          val keys = Seq("rocksdbSstFileSize", "rocksdbTotalMemoryUsageBytes",
            "rocksdbCommitCompactLatency", "rocksdbFilesCopied",
            "rocksdbBytesCopied", "rocksdbTotalBytesWritten")
          keys.foreach { k =>
            if (custom.containsKey(k)) println(s"ROCKSDB_METRIC $k=${custom.get(k)}")
          }
          val engaged = custom.keySet().toArray.exists(_.toString.startsWith("rocksdb"))
          println(s"ROCKSDB_ENGAGED=$engaged")
        }
    }
    spark.stop()
  }
}
