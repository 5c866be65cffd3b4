package graft

import org.apache.spark.sql.functions._

import graft.io.Tables

/** Semantics tests for the q386–q389 wave: LSH S-curve monotonicity
  * and replay, the modularity identity, the Bloom audit's internal
  * consistency, and feature replays.
  */
class Extension62Spec extends SparkSpec {

  test("q386: recall is monotone in band count, thresholds rise with " +
    "row count, and the 8x8 recall replays from the pair list") {
    val rows = SparkEntry.queries("q386_lsh_planner")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.map(_._1).toSeq == Seq(4L, 8L, 16L))
    // more, narrower bands catch more at every j: recall(16x4) >=
    // recall(8x8) >= recall(4x16); S-curve threshold moves opposite
    val byBands = rows.map(r => r._1 -> r).toMap
    assert(byBands(16L)._4 >= byBands(8L)._4 &&
      byBands(8L)._4 >= byBands(4L)._4)
    assert(byBands(16L)._5 <= byBands(8L)._5 &&
      byBands(8L)._5 <= byBands(4L)._5)
    val js = graft.ext.Dedup.nearDupPairs(
        Tables.load(spark, sf0001, "documents"), "text", "doc_id", 0.3)
      .select("jaccard").collect().map(_.getDouble(0))
    assert(js.length == byBands(8L)._3)
    val p6s = js.map { j =>
      val j8 = { var x = j; for (_ <- 1 to 3) x = x * x; x }
      val miss8 = { var x = 1.0 - j8; for (_ <- 1 to 3) x = x * x; x }
      math.floor((1.0 - miss8) * 1e6 + 0.5).toLong
    }
    val expect = math.floor(
      p6s.sum.toDouble / js.length.toDouble / 1e6 * 1e6 + 0.5) / 1e6
    assert(byBands(8L)._4 == expect,
      s"8x8 recall ${byBands(8L)._4} != replay $expect")
  }

  test("q387: per-brand contributions sum to the modularity and Q is " +
    "in the Newman bounds") {
    val rows = SparkEntry.queries("q387_brand_modularity")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    val q = rows.head.getDouble(4)
    assert(rows.forall(_.getDouble(4) == q))
    val sum = rows.map(_.getDouble(3)).sum
    assert(math.abs(sum - q) <= rows.length * 2e-6,
      s"contributions $sum vs modularity $q")
    assert(q >= -0.5 && q <= 1.0)
    // degree mass accounts for every edge endpoint
    val m2 = rows.map(_.getLong(2)).sum
    val eIn = rows.map(_.getLong(1)).sum
    assert(eIn * 2 <= m2)
  }

  test("q388: the Bloom audit is internally consistent") {
    val r = SparkEntry.queries("q388_bloom_fp_audit")(spark, sf0001)
      .head()
    val (nEval, nProbes, bits, fh) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nEval > 0 && nProbes > 0)
    assert(bits <= 7L * nEval, "more bits set than positions hashed")
    assert(fh <= nProbes)
    assert(r.getDouble(4) ==
      math.floor(fh.toDouble / nProbes.toDouble * 1e6 + 0.5) / 1e6)
    assert(r.getBoolean(6), "measured FP rate outside the declared band")
  }

  test("q389: features replay for every user at sf0.001") {
    val e = Tables.load(spark, sf0001, "events")
      .selectExpr("user_id", "event_type", "cast(ts as date)", "value")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2).toLocalDate,
        r.getDouble(3)))
    val mxd = e.map(_._3).max(Ordering.by((d: java.time.LocalDate) =>
      d.toEpochDay))
    val rows = SparkEntry.queries("q389_user_features")(spark, sf0001)
      .collect()
    assert(rows.length == e.map(_._1).distinct.length)
    rows.foreach { r =>
      val uid = r.getLong(0)
      val es = e.filter(_._1 == uid)
      assert(r.getLong(2) == es.length.toLong)
      val lastDay = es.map(_._3).max(
        Ordering.by((d: java.time.LocalDate) => d.toEpochDay))
      assert(r.getLong(1) == mxd.toEpochDay - lastDay.toEpochDay)
      val purch = es.filter(_._2 == "purchase")
      assert(r.getLong(3) ==
        purch.map(x => math.floor(x._4 * 100 + 0.5).toLong).sum)
      assert(r.getLong(4) == es.map(_._3).distinct.length.toLong)
      val dom = es.groupBy(_._2).toSeq
        .map { case (t, xs) => (t, xs.length) }
        .sortBy { case (t, c) => (-c, t) }.head._1
      assert(r.getString(5) == dom, s"dominant type for $uid")
      val share = purch.length.toDouble / es.length.toDouble
      assert(r.getDouble(6) == math.floor(share * 1e6 + 0.5) / 1e6)
    }
  }
}
