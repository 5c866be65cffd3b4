package graft.tools

import org.apache.spark.sql.functions._

/** Dev diagnostic (round 15): decompose the per-gate streaming floor.
  *
  * Every stateful streaming gate pays a fixed 2.5–3.5s that three rounds
  * of isolation runs attributed in aggregate to "stream start/stop +
  * RocksDB + checkpoint fsync" — but nothing ever measured WHERE inside
  * one gate the seconds go. This probe times each phase of a
  * representative gate (q76-shaped: sentinel + union + fMGWS + memory
  * sink) and prints the StreamingQueryProgress durationMs breakdown per
  * micro-batch, plus an A/B of the sentinel-write implementations:
  *
  *   1. sentinel parquet written via a Spark job (the current pattern:
  *      Seq(..).toDF.coalesce(1).write.parquet — full job + commit
  *      protocol for ONE constant row)
  *   2. sentinel parquet written driver-side via ParquetWriter (no job)
  *   3. the stream itself under RocksDB vs heap state (attribution only;
  *      heap is a prohibited local-only config, never shipped)
  *
  * Usage: sbt "runMain graft.tools.StreamFloorProbe [sfDir]"
  */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Engine.session(appName = "stream-floor-probe")
    import spark.implicits._

    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"PROBE ${label}%-44s ${(System.nanoTime() - t0) / 1e9}%.3fs")
      r
    }

    // ---- phase 1: sentinel write, Spark job vs direct ParquetWriter ----
    val sparkDir = java.nio.file.Files.createTempDirectory("probe_sent_spark")
    (1 to 3).foreach { i =>
      t(s"sentinel write: spark job #$i") {
        Seq((-1L, graft.streaming.EventStreams.FlushSentinelNanos, -1L,
          "__flush", 0.0, "{}"))
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
          .coalesce(1).write.mode("overwrite").parquet(sparkDir.toString)
      }
    }
    val directDir = java.nio.file.Files.createTempDirectory("probe_sent_direct")
    (1 to 3).foreach { i =>
      t(s"sentinel write: direct writer #$i") {
        graft.streaming.SentinelFiles.writeFlushSentinel(directDir)
      }
    }
    // sanity: both must read back identically under the stream schema
    val a = spark.read.schema(graft.streaming.EventStreams.rawSchema)
      .parquet(sparkDir.toString).collect().toSeq
    val b = spark.read.schema(graft.streaming.EventStreams.rawSchema)
      .parquet(directDir.toString).collect().toSeq
    println(s"PROBE sentinel equal: ${a == b}  spark=$a direct=$b")

    // ---- phase 2: one representative stateful gate, instrumented ----
    def runGate(label: String, heap: Boolean): Unit = {
      val confs = if (heap) Seq("spark.sql.shuffle.partitions" -> "8")
      else Seq(
        "spark.sql.streaming.stateStore.providerClass" ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true",
        "spark.sql.shuffle.partitions" -> "8")
      val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val ckpt = java.nio.file.Files.createTempDirectory("probe_gate_ckpt")
        val sent = java.nio.file.Files.createTempDirectory("probe_gate_sent")
        t(s"$label: sentinel") {
          graft.streaming.SentinelFiles.writeFlushSentinel(sent)
        }
        val stream = graft.streaming.EventStreams
          .readStream(spark, sfDir, globFilter = Some("events.parquet"))
          .unionByName(graft.streaming.EventStreams
            .readStream(spark, sent.toString, globFilter = Some("*.parquet")))
          .selectExpr("user_id", "ts", "unix_micros(ts) AS ts_us",
            "event_id", "value")
          .as[graft.streaming.EventStreams.SessionEvent]
        val name = s"probe_gate_${System.nanoTime()}"
        val q = t(s"$label: build+start") {
          graft.streaming.EventStreams.gapSessions(stream)
            .filter(col("user_id") >= 0)
            .writeStream.format("memory").queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt.toString)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
        }
        t(s"$label: awaitTermination") { q.awaitTermination() }
        q.recentProgress.foreach { p =>
          println(s"PROBE_PROGRESS $label batch=${p.batchId} " +
            s"rows=${p.numInputRows} durations=${p.durationMs}")
        }
        t(s"$label: stop+cleanup") {
          q.stop()
          graft.io.FsUtil.deleteRecursively(ckpt)
          graft.io.FsUtil.deleteRecursively(sent)
        }
        spark.catalog.dropTempView(name)
      } finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    // warmup once (codegen/JIT), then measure both providers twice
    runGate("gate[rocksdb] warmup", heap = false)
    runGate("gate[rocksdb] #1", heap = false)
    runGate("gate[rocksdb] #2", heap = false)
    runGate("gate[heap]    #1", heap = true)
    runGate("gate[heap]    #2", heap = true)

    graft.io.FsUtil.deleteRecursively(sparkDir)
    graft.io.FsUtil.deleteRecursively(directDir)
    spark.stop()
  }
}
