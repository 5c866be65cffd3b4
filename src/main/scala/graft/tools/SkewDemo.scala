package graft.tools

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.SkewJoin

/** Dev diagnostic: drive SkewJoin.salted end-to-end and show that it
  * reproduces the plain join while spreading the key space.
  */
object SkewDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.Engine.session(appName = "skew-demo")
    val o = Tables.load(spark, sfDir, "orders")
      .select(col("o_custkey").as("custkey"), col("o_totalprice"))
    val c = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
    val salted = SkewJoin.salted(o, c, "custkey", buckets = 8)
    println("SALTED_ROWS=" + salted.count())
    println("PLAIN_ROWS=" + o.join(c, "custkey").count())
    println("SALT_IN_JOIN_KEY=" +
      salted.queryExecution.executedPlan.toString.contains("__salt"))
    println("SALT_LEAKED_TO_OUTPUT=" + salted.columns.contains("__salt"))
    println("BUCKETS1_ROWS=" + SkewJoin.salted(o, c, "custkey", buckets = 1).count())
    spark.stop()
  }
}
