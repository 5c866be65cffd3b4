package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.ExtensionQueries29

/** Semantics tests for the q278–q282 wave: each statistic recomputed
  * from scratch on the collected sf0.001 fixture (per-row midranks for
  * Mann-Whitney, a literal sorted-scan AP, the textbook JSD formula)
  * and compared against the engine's grouped/windowed formulation, plus
  * the CDC chunking partition invariant the oracle can't see.
  */
class Extension29Spec extends SparkSpec {

  private def run(name: String) =
    ExtensionQueries29.queries.find(_.name == name).get.fn(spark, sf0001)

  private lazy val docs: Seq[(Long, String, String, String, Long)] =
    Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
      .toSeq

  test("q281: grouped-midrank U == brute per-row midrank U") {
    val got = run("q281_mann_whitney")
      .select("source", "u").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.nonEmpty)
    for ((src, u) <- got) {
      val vs = docs.filter(_._4 == src).map(d => (d._5, d._3 == "en"))
      // brute: midrank of each value over the FULL per-source sample
      val sorted = vs.map(_._1).sorted
      def midrank(v: Long): Double = {
        val less = sorted.count(_ < v)
        val eq = sorted.count(_ == v)
        less + (eq + 1) / 2.0
      }
      val r1 = vs.filter(_._2).map(d => midrank(d._1)).sum
      val n1 = vs.count(_._2)
      val brute = r1 - n1 * (n1 + 1) / 2.0
      assert(u == brute, s"source=$src engine U=$u brute=$brute")
    }
  }

  test("q280: windowed AP == brute sorted-scan AP") {
    val got = run("q280_average_precision")
      .select("source", "avg_precision").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.nonEmpty)
    for ((src, ap) <- got) {
      val ranked = docs.filter(_._4 == src)
        .sortBy(d => (-d._5, d._1)) // n_chars DESC, doc_id
        .map(_._3 == "en")
      var pk = 0
      var sum = 0.0
      for ((rel, i) <- ranked.zipWithIndex if rel) {
        pk += 1
        sum += pk.toDouble / (i + 1)
      }
      val brute = sum / ranked.count(identity)
      assert(math.abs(ap - brute) < 2e-6,
        s"source=$src engine AP=$ap brute=$brute")
    }
  }

  test("q278: JSD matches textbook formula and lands in [0, ln 2]") {
    val got = run("q278_jsd_drift")
      .select("source", "jsd_nats").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.nonEmpty)
    val nAll = docs.size.toDouble
    val glob = docs.groupBy(_._3).view.mapValues(_.size / nAll).toMap
    for ((src, jsd) <- got) {
      val mine = docs.filter(_._4 == src)
      val ns = mine.size.toDouble
      val p = mine.groupBy(_._3).view.mapValues(_.size / ns).toMap
      val brute = glob.keys.map { lang =>
        val pi = p.getOrElse(lang, 0.0)
        val qi = glob(lang)
        val m = (pi + qi) / 2.0
        (if (pi > 0) pi * math.log(pi / m) else 0.0) +
          qi * math.log(qi / m)
      }.sum / 2.0
      assert(jsd >= 0.0 && jsd <= math.log(2.0) + 1e-9,
        s"source=$src jsd=$jsd out of [0, ln 2]")
      assert(math.abs(jsd - brute) < 2e-6,
        s"source=$src engine JSD=$jsd brute=$brute")
    }
  }

  test("q282: chunks partition each document's token sequence") {
    // rebuild the per-doc chunk decomposition with the query's exact
    // boundary rule and check it tiles the token count
    val toks = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"),
        size(expr("filter(split(text, ' '), t -> t != '')")).as("n_tok"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val perDoc = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"),
        posexplode(expr("filter(split(text, ' '), t -> t != '')"))
          .as(Seq("pos", "w")))
      .withColumn("wh", graft.functions.PolyHash(col("w")))
      .withColumn("b", when(col("wh") % 32 === 0, 1L).otherwise(0L))
      .groupBy("doc_id")
      .agg(sum("b").as("n_bound"), count(lit(1)).as("n_tok"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(perDoc.nonEmpty)
    val chunks = {
      import org.apache.spark.sql.expressions.Window
      val t = Tables.load(spark, sf0001, "documents")
        .select(col("doc_id"),
          posexplode(expr("filter(split(text, ' '), t -> t != '')"))
            .as(Seq("pos", "w")))
        .withColumn("wh", graft.functions.PolyHash(col("w")))
        .withColumn("b", when(col("wh") % 32 === 0, 1L).otherwise(0L))
      val wC = Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
      t.withColumn("chunk", coalesce(sum("b").over(wC), lit(0L)))
        .groupBy("doc_id", "chunk").agg(count(lit(1)).as("len"))
        .groupBy("doc_id")
        .agg(sum("len").as("tok_sum"), count(lit(1)).as("n_chunks"),
          max("chunk").as("max_chunk"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    }
    for ((docId, tokSum, nChunks, maxChunk) <- chunks) {
      assert(tokSum == toks(docId).toLong,
        s"doc $docId: chunk lengths ${tokSum} != token count ${toks(docId)}")
      assert(maxChunk == nChunks - 1,
        s"doc $docId: chunk ids not contiguous 0..${nChunks - 1}")
    }
    // boundary count ties chunk count: chunks = boundaries + (0 or 1)
    val nb = perDoc.map(t => t._1 -> t._2).toMap
    for ((docId, _, nChunks, _) <- chunks) {
      val bounds = nb(docId)
      assert(nChunks == bounds || nChunks == bounds + 1,
        s"doc $docId: $nChunks chunks vs $bounds boundaries")
    }
  }
}
