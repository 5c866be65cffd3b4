package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries41

/** Semantics tests for the round-8 sixteenth continuation wave. */
class Extension41Spec extends SparkSpec {

  test("q318 gains table covers the corpus, ends at gain 1.0, and " +
    "lift is rate over base rate") {
    val out = ExtensionQueries41.queries.find(_.name == "q318_decile_lift")
      .get.fn(spark, sf0001).orderBy("bucket").collect()
    assert(out.nonEmpty && out.length <= 10)
    val corpus = graft.io.Tables.load(spark, sf0001, "documents").count()
    assert(out.map(_.getLong(1)).sum == corpus)
    val gains = out.map(_.getDouble(5))
    assert(gains.zip(gains.tail).forall { case (a, b) => b >= a })
    assert(math.abs(gains.last - 1.0) < 1e-6)
    val totPos = out.map(_.getLong(2)).sum.toDouble
    val base = totPos / corpus
    out.foreach { r =>
      assert(math.abs(r.getDouble(4) - r.getDouble(3) / base) < 1e-3,
        s"bucket ${r.getLong(0)}: lift != rate/base")
    }
  }

  test("q319 HITS emits 20 ranked rows per side with scores in (0,1] " +
    "and the top authority is a well-connected part") {
    val out = ExtensionQueries41.queries.find(_.name ==
      "q319_hits_copurchase").get.fn(spark, sf0001).collect()
    assert(out.length == 40)
    Seq("authority", "hub").foreach { side =>
      val rows = out.filter(_.getString(0) == side)
      assert(rows.length == 20, s"$side has ${rows.length} rows")
      val scores = rows.map(_.getDouble(2))
      assert(scores.forall(v => v > 0.0 && v <= 1.0))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // semantic sanity: the #1 authority part is bought by at least the
    // median number of distinct customers
    val topAuth = out.filter(_.getString(0) == "authority")
      .maxBy(_.getDouble(2)).getLong(1)
    val deg = graft.io.Tables.load(spark, sf0001, "orders")
      .join(graft.io.Tables.load(spark, sf0001, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_partkey")),
        "o_orderkey")
      .groupBy("l_partkey")
      .agg(countDistinct("o_custkey").as("d"))
      .select("l_partkey", "d").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val degs = deg.values.toSeq.sorted
    val median = degs(degs.length / 2)
    assert(deg(topAuth) >= median,
      s"top authority $topAuth degree ${deg(topAuth)} below median $median")
  }
}
