package graft.tools

/** Dev diagnostic: the SQL entry point — views + custom functions from
  * plain spark.sql, as an engine user would call them.
  */
object SqlDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Engine.session(appName = "sql-demo") // registers functions
    graft.Engine.registerViews(spark, sfDir)
    spark.sql(
      """SELECT e.vec_id, round(cosine_sim(e.embedding, f.embedding), 4) AS cos,
        |  poly_hash(cast(e.vec_id AS STRING)) AS ph
        |FROM embeddings e JOIN embeddings f ON f.vec_id = e.vec_id + 1
        |ORDER BY e.vec_id LIMIT 3""".stripMargin).show()
    // probe: wrong arg type
    try spark.sql("SELECT cosine_sim('oops', 1)").show()
    catch { case e: Exception => println("TYPE_ERROR=" + e.getMessage.linesIterator.next()) }
    spark.stop()
  }
}
