package graft

import graft.queries.ExtensionQueries39

/** Semantics tests for the round-8 fourteenth continuation wave. */
class Extension39Spec extends SparkSpec {

  test("q312 block bootstrap emits one positive, sane summary row") {
    val out = ExtensionQueries39.queries.find(_.name ==
      "q312_block_bootstrap").get.fn(spark, sf0001).collect()
    assert(out.length == 1)
    val r = out.head
    val n = r.getLong(0)
    val l = r.getLong(1)
    assert(l == (n / 7) * 7 && l > 0)
    val naive = r.getDouble(2)
    val block = r.getDouble(3)
    val ratio = r.getDouble(4)
    assert(naive > 0.0 && block > 0.0)
    // the ratio column must actually be their quotient (round6 of it)
    assert(math.abs(ratio - block / naive) < 1e-3)
    // a sane bootstrap lands within an order of magnitude of naive
    assert(ratio > 0.2 && ratio < 5.0, s"se_ratio $ratio")
  }

  test("q313 decomposition: 7 weekday rows, strength in [0,1], " +
    "seasonal components cancel in the weighted sum") {
    val out = ExtensionQueries39.queries.find(_.name == "q313_stl_dow")
      .get.fn(spark, sf0001).collect()
    assert(out.length == 7)
    assert(out.map(_.getLong(0)).sorted.toSeq == (1L to 7L))
    val strength = out.map(_.getDouble(3)).distinct
    assert(strength.length == 1)
    assert(strength.head >= 0.0 && strength.head <= 1.0)
    // sum over groups of n_g * seasonal_g = (Σ d7)/7 over full-window
    // days — bounded by the window-edge remainder, near zero relative
    // to the series scale
    val weighted = out.map(r => r.getLong(1) * r.getDouble(2)).sum
    val totalDays = out.map(_.getLong(1)).sum
    assert(math.abs(weighted / totalDays) < 1.0,
      s"weighted seasonal mean $weighted over $totalDays days")
  }

  test("q314 W1 satisfies metric properties and matches an independent " +
    "CDF-integral computation") {
    val out = ExtensionQueries39.queries.find(_.name ==
      "q314_wasserstein_1d").get.fn(spark, sf0001).collect()
    assert(out.length == 190) // C(20,2) source pairs
    assert(out.forall(_.getDouble(2) >= 0.0))
    val w = out.map(r =>
      (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    def dist(a: String, b: String): Double =
      if (a < b) w((a, b)) else w((b, a))
    val sources = out.map(_.getString(0)).distinct.sorted.take(8)
    for (a <- sources; b <- sources; c <- sources
         if a < b && b < c) {
      assert(dist(a, c) <= dist(a, b) + dist(b, c) + 2e-6,
        s"triangle violated for ($a,$b,$c)")
    }
    // independent replay of one pair straight from the raw lengths
    val docs = graft.io.Tables.load(spark, sf0001, "documents")
      .select("source", "n_chars").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val (sa, sb) = (out.head.getString(0), out.head.getString(1))
    val la = docs.filter(_._1 == sa).map(_._2).sorted
    val lb = docs.filter(_._1 == sb).map(_._2).sorted
    val grid = (la ++ lb).distinct.sorted
    var wd = 0.0
    grid.zip(grid.tail).foreach { case (v, nv) =>
      val fa = la.count(_ <= v).toDouble / la.length
      val fb = lb.count(_ <= v).toDouble / lb.length
      wd += math.abs(fa - fb) * (nv - v)
    }
    assert(math.abs(w((sa, sb)) - wd) < 1e-4,
      s"pair ($sa,$sb): engine ${w((sa, sb))} vs independent $wd")
  }
}
