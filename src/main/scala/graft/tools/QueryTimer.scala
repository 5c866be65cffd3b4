package graft.tools

import graft.SparkEntry

/** Dev diagnostic: time specific registered queries at a scale factor
  * without running the whole bench suite. Same measurement discipline as
  * graft.Bench (noop sink, warmup pass, min-of-n).
  *
  * Usage: sbt "runMain graft.tools.QueryTimer [sfDir] name1 [name2 ...]"
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.nonEmpty && args.head.startsWith("/")) args.head
      else "/root/testdata/sf0.1"
    val names = args.dropWhile(_.startsWith("/")).toSeq
    require(names.nonEmpty, "usage: QueryTimer [sfDir] name1 [name2 ...]")
    val spark = graft.Engine.session(appName = "graft-query-timer")
    val byName = SparkEntry.all.map(q => q.name -> q).toMap
    names.foreach { n =>
      val q = byName.getOrElse(n, sys.error(s"unknown query: $n"))
      def runOnce(): Unit =
        q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      runOnce() // warmup: codegen/JIT/FS cache
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        runOnce()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QUERY_TIME $n%-28s min=${times.min}%.2fs runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
