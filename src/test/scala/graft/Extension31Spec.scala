package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.ExtensionQueries31

/** Semantics tests for the q287–q290 wave: tau-b against the O(n²)
  * row-pair definition, Adamic-Adar against an in-memory graph walk,
  * the span-corruption non-overlap invariant, and the LOO encoding
  * formula replayed per category.
  */
class Extension31Spec extends SparkSpec {

  private def run(name: String) =
    ExtensionQueries31.queries.find(_.name == name).get.fn(spark, sf0001)

  test("q287: grid tau-b == brute row-pair concordance count") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select(col("source"), expr("n_chars div 100").as("x"),
        expr("size(filter(split(text, ' '), t -> t != '')) div 10")
          .as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = run("q287_kendall_tau")
      .select("source", "concordant", "discordant", "tau_b").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.nonEmpty)
    for ((src, conc, disc, tau) <- got) {
      val xs = docs.filter(_._1 == src)
      var c = 0L; var d = 0L; var tx = 0L; var ty = 0L
      for (i <- xs.indices; j <- (i + 1) until xs.length) {
        val (_, x1, y1) = xs(i); val (_, x2, y2) = xs(j)
        if (x1 != x2 && y1 != y2) {
          if ((x1 < x2) == (y1 < y2)) c += 1 else d += 1
        }
        if (x1 == x2) tx += 1
        if (y1 == y2) ty += 1
      }
      assert(conc == c && disc == d,
        s"src=$src engine C/D=$conc/$disc brute=$c/$d")
      val n0 = xs.length.toLong * (xs.length - 1) / 2
      val brute = (c - d).toDouble /
        math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble)
      assert(math.abs(tau - brute) < 2e-6, s"src=$src $tau vs $brute")
    }
  }

  test("q288: Adamic-Adar == in-memory wedge walk on the same graph") {
    val li = Tables.load(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).values.map(_.map(_._2).distinct.sorted)
    val supCnt = collection.mutable.Map.empty[(Long, Long), Int]
    for (parts <- byOrder; i <- parts.indices;
         j <- (i + 1) until parts.length)
      supCnt((parts(i), parts(j))) =
        supCnt.getOrElse((parts(i), parts(j)), 0) + 1
    val allPairs = supCnt.keySet
    val edges = supCnt.filter(_._2 >= 2).keySet
    val adj = collection.mutable.Map.empty[Long, Set[Long]]
    for ((a, b) <- edges) {
      adj(a) = adj.getOrElse(a, Set.empty) + b
      adj(b) = adj.getOrElse(b, Set.empty) + a
    }
    def w9(z: Long): Long =
      math.floor(1e9 / math.log(adj(z).size.toDouble) + 0.5).toLong
    val scores = collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    for ((z, nbrs) <- adj; s <- nbrs; t <- nbrs
         if s < t && !allPairs.contains((s, t))) {
      val (n, a9) = scores.getOrElse((s, t), (0L, 0L))
      scores((s, t)) = (n + 1, a9 + w9(z))
    }
    val bruteTop = scores.toSeq
      .sortBy { case ((a, b), (_, a9)) => (-a9, a, b) }.take(20)
    val got = run("q288_adamic_adar")
      .select("da", "db", "n_common", "aa_score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == bruteTop.length)
    for (((a, b, n, sc), ((ba, bb), (bn, ba9))) <- got.zip(bruteTop)) {
      assert(a == ba && b == bb && n == bn,
        s"pair ($a,$b,$n) vs brute ($ba,$bb,$bn)")
      assert(math.abs(sc - ba9 / 1e9) < 2e-6)
    }
  }

  test("q289: spans never overlap and masked tokens sit in span heads") {
    // the layout is a pure function of (doc_id, block): recompute it
    // and check the invariants directly
    val toks = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"),
        posexplode(expr("filter(split(text, ' '), t -> t != '')"))
          .as(Seq("pos", "w")))
      .withColumn("blk", expr("pos div 5"))
      .withColumn("sel",
        graft.ext.Sampling.bucket(concat(col("doc_id").cast("string"),
          lit("_"), col("blk").cast("string")), "span1") < 3000)
      .select("doc_id", "pos", "blk", "sel")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getBoolean(3)))
    val masked = toks.filter(t => t._4 && t._2 % 5 < 3)
    assert(masked.nonEmpty)
    // no two masked positions in one doc are 3+ apart within one block
    // run; adjacent spans are separated by >= 2 unmasked positions
    val byDoc = masked.groupBy(_._1)
    for ((_, ms) <- byDoc) {
      val ps = ms.map(_._2).sorted
      for (Array(p1, p2) <- ps.sliding(2).map(_.toArray)
           if p2 - p1 > 1) {
        // a gap inside a span is impossible; gaps between spans are >= 3
        assert(p2 - p1 >= 3, s"span gap ${p2 - p1} between $p1 and $p2")
      }
    }
    val agg = run("q289_span_corruption")
      .select("n_masked", "n_spans").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val totMasked = agg.map(_._1).sum
    val totSpans = agg.map(_._2).sum
    assert(totMasked == masked.length.toLong)
    assert(totMasked <= 3 * totSpans)
  }

  test("q290: LOO encoding == (S - y + m*prior) / (n - 1 + m)") {
    val ev = Tables.load(spark, sf0001, "events")
      .select(col("event_type"),
        when(col("value") > 50.0, 1L).otherwise(0L).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val sg = ev.map(_._2).sum.toDouble
    val prior = sg / ev.length
    val byCat = ev.groupBy(_._1)
    val got = run("q290_target_encoding")
      .select("category", "y", "loo_encoding").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    for ((cat, y, enc) <- got) {
      val rows = byCat(cat)
      val s = rows.map(_._2).sum
      val brute = (s - y + 10.0 * prior) / (rows.length - 1 + 10)
      assert(math.abs(enc - brute) < 2e-6,
        s"cat=$cat y=$y enc=$enc brute=$brute")
    }
  }
}
