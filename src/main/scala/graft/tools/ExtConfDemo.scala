package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: load GraftExtensions the spark-submit way — via the
  * spark.sql.extensions conf, no graft code touched before the session.
  */
object ExtConfDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("ext-conf-demo")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("CONF_POLY=" + spark.sql("SELECT poly_hash('abc')").first().getLong(0))
    println("DESCRIBE=" + spark.sql("DESCRIBE FUNCTION cosine_sim")
      .collect().map(_.getString(0)).mkString(" | "))
    spark.stop()
  }
}
