package graft.tools

import org.apache.spark.sql.functions._

import graft.io.{Sources, Tables}

/** Dev diagnostic: drive the partitioned-write path and show the
  * hive-style layout plus partition pruning at read time.
  */
object IoDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Engine.session(appName = "io-demo")
    val dir = java.nio.file.Files.createTempDirectory("graft_iodemo").toString
    Sources.writePartitionedParquet(
      Tables.load(spark, sfDir, "orders"), s"$dir/orders_p", "o_orderstatus")
    println("LAYOUT=" + new java.io.File(s"$dir/orders_p").list().sorted.mkString(","))
    val back = Sources.readParquet(spark, s"$dir/orders_p")
      .filter(col("o_orderstatus") === "F")
    val scanLine = back.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .linesIterator.find(_.contains("PartitionFilters")).getOrElse("NONE")
    println("SCAN=" + scanLine.trim)
    println("ROWS_F=" + back.count())
    spark.stop()
  }
}
