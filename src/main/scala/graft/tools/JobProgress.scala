package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Completion-callback parity (SURVEY.md §2a op 15): the reference's
  * workers RPC `give_status("mapper_i")` to the master
  * (`master.py:24-27`, `mapper_word_count.py:61-65`); Spark's equivalent
  * is the listener bus — zero worker code, exact per-task/stage events.
  * This listener keeps cheap atomic counters; attach around a job to
  * observe its stage/task completions.
  */
class JobProgress extends SparkListener {
  val tasksCompleted = new AtomicInteger(0)
  val stagesCompleted = new AtomicInteger(0)
  val recordsRead = new AtomicLong(0L)

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    tasksCompleted.incrementAndGet()
    val m = taskEnd.taskMetrics
    if (m != null) recordsRead.addAndGet(m.inputMetrics.recordsRead)
    ()
  }

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    stagesCompleted.incrementAndGet()
    ()
  }
}

object JobProgress {
  /** Run `body` with a progress listener attached; returns (result,
    * listener with final counts).
    */
  def observe[T](spark: SparkSession)(body: => T): (T, JobProgress) = {
    val l = new JobProgress
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      // the listener bus is async (and its drain method is
      // private[spark]); poll until the counters go quiet
      var prev = -1
      var same = 0
      var waited = 0
      while (same < 2 && waited < 5000) {
        val cur = l.tasksCompleted.get() + l.stagesCompleted.get()
        if (cur == prev) same += 1 else { same = 0; prev = cur }
        Thread.sleep(100)
        waited += 100
      }
      (r, l)
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
