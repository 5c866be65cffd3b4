package graft

import graft.queries.ExtensionQueries38

/** Semantics tests for the round-8 thirteenth continuation wave. */
class Extension38Spec extends SparkSpec {

  test("q308 MRR is bounded by the hit rate from both sides") {
    val out = ExtensionQueries38.queries.find(_.name ==
      "q308_retrieval_mrr").get.fn(spark, sf0001).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val nQ = r.getLong(1)
      val nHit = r.getLong(2)
      val mrr = r.getDouble(3)
      assert(nHit <= nQ)
      assert(mrr >= 0.0 && mrr <= 1.0)
      // each hit contributes rr in [1/10, 1]
      assert(mrr <= nHit.toDouble / nQ + 1e-6)
      assert(mrr >= nHit.toDouble / (10.0 * nQ) - 1e-6)
    }
  }

  test("q309 RBO is bounded by the truncated-at-10 maximum (identical " +
    "rankings ceiling)") {
    val maxRbo = 0.1 * (1 to 10).map(d => math.pow(0.9, d - 1)).sum
    val out = ExtensionQueries38.queries.find(_.name ==
      "q309_rank_biased_overlap").get.fn(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val rbo = r.getDouble(1)
      assert(rbo >= 0.0 && rbo <= maxRbo + 1e-6,
        s"${r.getString(0)}: $rbo outside [0, $maxRbo]")
    }
  }

  test("q310's exact integer CV formula equals the naive two-pass " +
    "population CV") {
    val cases = Seq(
      Seq(10L, 10L, 10L, 10L, 10L), // constant cadence -> cv 0
      Seq(1L, 2L, 3L, 4L, 100L),
      Seq(7L, 13L, 42L, 5L, 5L, 5L, 90L),
      Seq(3600L, 3600L, 3599L, 3601L, 3600L))
    cases.foreach { gs =>
      val n = gs.length.toLong
      val s = gs.sum
      val s2 = gs.map(g => g * g).sum
      val exact = math.sqrt((n * s2 - s * s).toDouble) / s.toDouble
      val mean = s.toDouble / n
      val naive = math.sqrt(
        gs.map(g => (g - mean) * (g - mean)).sum / n) / mean
      assert(math.abs(exact - naive) < 1e-9, s"$gs: $exact vs $naive")
    }
  }

  test("q310 output is cv-sorted and the most regular users sit on top") {
    val out = ExtensionQueries38.queries.find(_.name == "q310_bot_cadence")
      .get.fn(spark, sf0001).collect()
    assert(out.nonEmpty)
    val cvs = out.map(_.getDouble(3))
    assert(cvs.forall(_ >= 0.0))
    assert(cvs.zip(cvs.tail).forall { case (a, b) => a <= b })
  }
}
