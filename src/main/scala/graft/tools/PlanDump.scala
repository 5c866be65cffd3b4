package graft.tools

import java.nio.file.{Files, Paths}

import graft.SparkEntry

/** Dev diagnostic: dump `.explain("formatted")` for selected queries to
  * files — the round-deliverable plan snapshots (plans/rNN/<q>_before.txt
  * / _after.txt) are captured with this so the committed text is exactly
  * what the optimizer produced, not a hand-copied excerpt.
  *
  * Usage:
  *   sbt "runMain graft.tools.PlanDump <outDir> <suffix> <sfDir> q1 [q2 ...]"
  * writes <outDir>/<qname>_<suffix>.txt per query.
  *
  * NOTE: building a query's DataFrame runs any table-setup side effects
  * (the versioned gates commit to tmp tables while constructing their
  * result frame) but never executes the final plan.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanDump <outDir> <suffix> <sfDir> q1 [q2 ...]")
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = args(2)
    val names = args.drop(3).toSeq
    Files.createDirectories(Paths.get(outDir))
    val spark = graft.Engine.session(appName = "graft-plan-dump")
    val byName = SparkEntry.all.map(q => q.name -> q).toMap
    names.foreach { n =>
      val q = byName.getOrElse(n, sys.error(s"unknown query: $n"))
      val df = q.fn(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/${n}_$suffix.txt"), txt)
      println(s"PLAN_DUMP $n -> $outDir/${n}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
