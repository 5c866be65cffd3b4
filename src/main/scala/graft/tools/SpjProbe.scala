package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.VersionedTable

/** Standalone probe for the storage-partitioned join (q494): prints
  * the executed plans of the same two-table join with the key-grouped
  * planner on and off — the on-plan must carry zero Exchange, the
  * off-plan one per side. Run: sbt "runMain graft.tools.SpjProbe".
  */
object SpjProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val p1 = "/tmp/spj_probe_a"; val p2 = "/tmp/spj_probe_b"
    VersionedTable.init((0L until 1000L).map(i => (i % 8, i, i * 2L)).toDF("pk", "id", "cents").repartition(4), p1)
    VersionedTable.compactPartitioned(spark, p1, "pk")
    VersionedTable.init((0L until 8L).map(k => (k, k * 100L)).toDF("pk", "factor").repartition(2), p2)
    VersionedTable.compactPartitioned(spark, p2, "pk")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    for (b <- Seq("true", "false")) {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", b)
      val t1 = spark.read.format("graft-versioned").load(p1)
      val t2 = spark.read.format("graft-versioned").load(p2)
      val j = t1.join(t2, "pk")
      println(s"=== bucketing=$b ===")
      println(j.queryExecution.executedPlan.toString.take(2200))
    }
    // DPP probe
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    val pd = "/tmp/spj_probe_dim"
    VersionedTable.init((0L until 8L).map(k => (k, k % 4)).toDF("pk", "tag").repartition(1), pd)
    val fact = spark.read.format("graft-versioned").load(p1)
    val dim = spark.read.format("graft-versioned").load(pd).where(col("tag") === 0)
    val j = fact.join(broadcast(dim), "pk")
    println("=== DPP optimized ===")
    println(j.queryExecution.optimizedPlan.toString.take(1800))
    println("=== DPP executed ===")
    println(j.collect().length)
    val scan = j.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
        if b.scan.isInstanceOf[graft.sources.GraftPartitionedScan] =>
        b.scan.asInstanceOf[graft.sources.GraftPartitionedScan]
    }.get
    println("predicates: " + scan.lastRuntimePredicates.mkString(" | "))
    println("splits: " + scan.splitCounts)
    // shuffle-free aggregation probe
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val agg = spark.read.format("graft-versioned").load(p1)
      .groupBy("pk").agg(sum("cents"))
    println("=== keyed AGG executed ===")
    println(agg.queryExecution.executedPlan.toString.take(1200))
    // measured: SPJ vs shuffled join on the sf0.1 fact (per leg:
    // median of 3 after warmup)
    val sf01 = "/tmp/spj_probe_sf01_fact"
    val sf01d = "/tmp/spj_probe_sf01_dim"
    val ev01 = graft.io.Tables.load(spark, "/root/testdata/sf0.1", "events")
      .select((col("event_id") % 64).as("pk"), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    VersionedTable.init(ev01.repartition(8), sf01)
    VersionedTable.compactPartitioned(spark, sf01, "pk")
    VersionedTable.init(ev01.groupBy("pk")
      .agg(count(lit(1)).cast("long").as("factor")), sf01d)
    VersionedTable.compactPartitioned(spark, sf01d, "pk")
    def timeJoin(spjOn: Boolean): Double = {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", spjOn.toString)
      val times = (0 until 4).map { _ =>
        val t0 = System.nanoTime()
        spark.read.format("graft-versioned").load(sf01)
          .join(spark.read.format("graft-versioned").load(sf01d), "pk")
          .agg(sum(col("cents") + col("factor"))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      times.tail.sorted.apply(1) // median of the 3 post-warmup runs
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val tOff = timeJoin(false)
    val tOn = timeJoin(true)
    println(f"SPJ_MEASURED sf0.1 64-key fact-dim join: shuffled=$tOff%.3fs spj=$tOn%.3fs speedup=${tOff / tOn}%.2fx")
    // measured: dynamic partition pruning end-to-end (selective dim
    // keeps 16 of 64 keys; broadcast join) with DPP on vs off
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    def timeDpp(on: Boolean): Double = {
      spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled", on.toString)
      val times = (0 until 4).map { _ =>
        val t0 = System.nanoTime()
        spark.read.format("graft-versioned").load(sf01)
          .join(broadcast(spark.read.format("graft-versioned").load(sf01d)
            .where(col("pk") % 4 === 0)), "pk")
          .agg(sum("cents")).collect()
        (System.nanoTime() - t0) / 1e9
      }
      times.tail.sorted.apply(1)
    }
    val dOff = timeDpp(false)
    val dOn = timeDpp(true)
    println(f"DPP_MEASURED sf0.1 16-of-64-key probe: off=$dOff%.3fs on=$dOn%.3fs speedup=${dOff / dOn}%.2fx")
    spark.stop()
  }
}
