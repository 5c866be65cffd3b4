package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.ExtensionQueries30

/** Semantics tests for the q283–q286 wave: TextRank recomputed as a
  * from-scratch in-memory PageRank on the same co-occurrence graph,
  * IPS/SNIPS and Welch recomputed row-by-row from the collected
  * fixture, and the quantile-normalization monotonicity/pooled-value
  * invariants the oracle can't see.
  */
class Extension30Spec extends SparkSpec {

  private def run(name: String) =
    ExtensionQueries30.queries.find(_.name == name).get.fn(spark, sf0001)

  test("q283: engine TextRank == in-memory PageRank on the same graph") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select("text").collect().map(_.getString(0))
    val edges = docs.flatMap { t =>
      val ws = t.toLowerCase.split(' ').filter(_.length >= 4)
      ws.sliding(2).collect {
        case Array(a, b) if a != b =>
          if (a < b) (a, b) else (b, a)
      }
    }.distinct
    val und = edges ++ edges.map { case (a, b) => (b, a) }
    val nodes = und.map(_._1).distinct
    val n = nodes.length.toDouble
    val deg = und.groupBy(_._1).view.mapValues(_.length.toDouble).toMap
    val incoming: Map[String, Seq[String]] =
      und.groupBy(_._2).map { case (k, vs) => k -> vs.map(_._1).toSeq }
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 5) {
      rank = nodes.map { v =>
        val m = incoming.getOrElse(v, Seq.empty)
          .map(u => rank(u) / deg(u)).sum
        v -> ((1.0 - 0.85) / n + 0.85 * m)
      }.toMap
    }
    val got = run("q283_textrank_keywords")
      .select("word", "textrank").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    assert(got.length == 20)
    for ((w, tr) <- got) {
      assert(math.abs(tr - rank(w)) < 2e-6,
        s"word=$w engine=$tr brute=${rank(w)}")
    }
    // the engine's top-20 must be the brute top-20 under the same
    // round-then-(rank desc, word) order
    val bruteTop = rank.toSeq
      .map { case (w, r) => (w, math.floor(r * 1e6 + 0.5) / 1e6) }
      .sortBy { case (w, r) => (-r, w) }.take(20).map(_._1)
    assert(got.map(_._1).toSeq == bruteTop)
  }

  test("q283: vocab id assignment is partition-count invariant") {
    import spark.implicits._
    // the r9 swap (single-partition Window.orderBy -> two-pass global
    // rank) must hand EVERY word the same dense id regardless of how
    // the vocab frame is partitioned — ids feed the edge list, so any
    // placement dependence would silently rewire the graph
    val words = (1 to 500).map(i => f"word$i%03d").toDF("word")
    def ids(partitions: Int): Map[String, Long] =
      graft.ext.Ranking.withGlobalRank(
          words.repartition(partitions), Seq(col("word")), partitions)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val p2 = ids(2)
    assert(p2 == ids(17) && p2 == ids(1),
      "vocab ids depend on partitioning")
    // dense 1..N in lexicographic order — exactly what the oracle's
    // row_number() OVER (ORDER BY word) assigns
    val sorted = p2.keys.toSeq.sorted
    sorted.zipWithIndex.foreach { case (w, i) =>
      assert(p2(w) == i + 1L, s"$w got ${p2(w)}, expected ${i + 1}")
    }
  }

  test("q284: IPS/SNIPS == brute weighted replay") {
    val ev = Tables.load(spark, sf0001, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"),
        graft.ext.Sampling.bucket(col("event_id"), "ips1").as("bkt"))
      .collect()
      .map(r => (r.getLong(0) % 4, r.getLong(4) < 3000,
        r.getString(2) == "purchase" && r.getDouble(3) > 20.0,
        r.getDouble(3) > 50.0))
    val w1 = math.floor(1e9 / 0.3 + 0.5).toLong
    val w0 = math.floor(1e9 / 0.7 + 0.5).toLong
    val got = run("q284_ips_offline_eval")
      .select("segment", "ips", "snips").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.nonEmpty)
    for ((seg, ips, snips) <- got) {
      val rows = ev.filter(_._1 == seg)
      val num9 = rows.map { case (_, a, r, pi) =>
        if (pi == a && r) (if (a) w1 else w0) else 0L
      }.sum
      val den9 = rows.map { case (_, a, _, pi) =>
        if (pi == a) (if (a) w1 else w0) else 0L
      }.sum
      val bIps = num9.toDouble / rows.length / 1e9
      val bSnips = num9.toDouble / den9.toDouble
      assert(math.abs(ips - bIps) < 2e-6, s"seg=$seg ips $ips vs $bIps")
      assert(math.abs(snips - bSnips) < 2e-6,
        s"seg=$seg snips $snips vs $bSnips")
    }
  }

  test("q285: Welch t/df == brute two-sample computation") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select("source", "lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1) == "en", r.getLong(2)))
    val got = run("q285_welch_ttest")
      .select("source", "t", "df").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(got.nonEmpty)
    for ((src, t, df) <- got) {
      val g1 = docs.filter(d => d._1 == src && d._2).map(_._3.toDouble)
      val g2 = docs.filter(d => d._1 == src && !d._2).map(_._3.toDouble)
      def meanVar(xs: Array[Double]) = {
        val m = xs.sum / xs.length
        (m, xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
      }
      val (m1, v1) = meanVar(g1)
      val (m2, v2) = meanVar(g2)
      val se1 = v1 / g1.length
      val se2 = v2 / g2.length
      val bt = (m1 - m2) / math.sqrt(se1 + se2)
      val bdf = (se1 + se2) * (se1 + se2) /
        (se1 * se1 / (g1.length - 1) + se2 * se2 / (g2.length - 1))
      assert(math.abs(t - bt) < 1e-5, s"src=$src t=$t brute=$bt")
      assert(math.abs(df - bdf) < 1e-4, s"src=$src df=$df brute=$bdf")
    }
  }

  test("q286: normalization maps onto pooled order statistics") {
    val lens = Tables.load(spark, sf0001, "documents")
      .select("source", "n_chars", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(0 + 2)))
    val pooledSorted = lens.map(_._2).sorted
    val nTotal = pooledSorted.length.toLong
    def pooledQ(g: Long): Long = {
      val idx = ((2 * g + 1) * nTotal + 199) / 200
      pooledSorted((idx - 1).toInt) // idx is 1-based order statistic
    }
    val got = run("q286_quantile_normalize")
      .select("source", "n_docs", "sum_chars", "sum_norm").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    val bySource = lens.groupBy(_._1)
    for ((src, nDocs, sumChars, sumNorm) <- got) {
      val mine = bySource(src).sortBy(d => (d._2, d._3))
      assert(nDocs == mine.length.toLong)
      assert(sumChars == mine.map(_._2).sum)
      val bruteNorm = mine.zipWithIndex.map { case (_, i) =>
        pooledQ(i.toLong * 100 / mine.length)
      }.sum
      assert(sumNorm == bruteNorm,
        s"src=$src sum_norm=$sumNorm brute=$bruteNorm")
    }
  }
}
