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
    spark.stop()
  }
}
