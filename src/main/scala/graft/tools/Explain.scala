package graft.tools

import graft.SparkEntry

/** Dev diagnostic: print formatted physical plans for selected queries
  * (all bench-flagged ones by default). Usage:
  *   sbt "runMain graft.tools.Explain [sfDir] [name1 name2 ...]"
  * Review checklist per the build rules: PushedFilters reach the parquet
  * scan, ReadSchema is pruned, small dims broadcast, WholeStageCodegen
  * spans are wide, no accidental cartesian or single-partition exchange.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.benchQueries.map(_.name)
    val spark = graft.Engine.session(appName = "graft-explain")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
