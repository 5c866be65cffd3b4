package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft.SparkEntry

/** Dev diagnostic: run queries once and report how many stages/tasks
  * actually executed — the runtime ground truth for whether AQE stage
  * reuse deduplicated a statically-duplicated subtree (the formatted
  * explain cannot show this). Usage:
  *   sbt "runMain graft.tools.StageCountProbe [sfDir] q1 [q2 ...]"
  */
object StageCountProbe {
  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.nonEmpty && args.head.startsWith("/")) args.head
      else "/root/testdata/sf0.1"
    val names = args.dropWhile(_.startsWith("/")).toSeq
    val spark = graft.Engine.session(appName = "graft-stage-count")
    val stages = new AtomicLong(0)
    val tasks = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(
          e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(e.stageInfo.numTasks)
      }
    })
    val byName = SparkEntry.all.map(q => q.name -> q).toMap
    names.foreach { n =>
      val q = byName.getOrElse(n, sys.error(s"unknown query: $n"))
      q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      // listener events are delivered asynchronously — drain the bus
      // deterministically before resetting and before reading (r14
      // advice: a fixed sleep could still miscount under load)
      org.apache.spark.sql.graftbridge.Bridge
        .waitListenerBusEmpty(spark.sparkContext)
      stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graftbridge.Bridge
        .waitListenerBusEmpty(spark.sparkContext)
      println(f"STAGE_COUNT $n%-28s stages=${stages.get} tasks=${tasks.get} time=$dt%.2fs")
    }
    spark.stop()
  }
}
