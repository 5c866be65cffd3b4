package graft

import org.apache.spark.sql.functions._

import graft.io.Tables

/** Semantics tests for the q394–q397 wave: coverage monotonicity,
  * Hurst fit replay, OOV monotonicity, and reconciliation accounting.
  */
class Extension64Spec extends SparkSpec {

  test("q394: coverage is monotone in the train slice and bounded by " +
    "[0, 1]") {
    val rows = SparkEntry.queries("q394_coverage_scaling")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Seq(25L, 50L, 100L))
    rows.sliding(2).foreach(w => assert(w(0)._2 <= w(1)._2,
      "coverage must not shrink as the train slice grows"))
    rows.foreach { r =>
      assert(r._2 <= r._3)
      assert(r._4 >= 0.0 && r._4 <= 1.0)
    }
    val tot = rows.map(_._3).distinct
    assert(tot.length == 1, "eval bigram universe must be constant")
  }

  test("q395: the Hurst slope replays from the three (ln w, mean ln " +
    "R/S) points and sits in (0, 1)") {
    val rows = SparkEntry.queries("q395_hurst_rs")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Seq(10L, 15L, 30L))
    assert(rows.map(_._2).toSeq == Seq(3L, 2L, 1L))
    val h = rows.head._4
    assert(rows.forall(_._4 == h))
    val pts = rows.map(r => (math.log(r._1.toDouble), r._3))
    val m = pts.length.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    assert(math.abs(h - slope) < 2e-6, s"hurst $h vs replay $slope")
    assert(h > 0.0 && h < 1.0, s"implausible Hurst exponent $h")
  }

  test("q396: OOV rate shrinks with the vocab cap and matches a " +
    "rank-sorted replay at 1k") {
    val words = Tables.load(spark, sf0001, "documents")
      .select(explode(graft.ops.Text.words(
        graft.ops.Text.clean(col("text")))).as("w"))
      .collect().map(_.getString(0))
    val ranked = words.groupBy(identity).toSeq
      .map { case (w, os) => (w, os.length.toLong) }
      .sortBy { case (w, c) => (-c, w) }
    val total = words.length.toLong
    val kept1k = ranked.take(1000).map(_._2).sum
    val rows = SparkEntry.queries("q396_vocab_truncation_sweep")(
      spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.map(_._1).toSeq == Seq(1000L, 5000L, 10000L))
    rows.sliding(2).foreach(w => assert(w(0)._5 >= w(1)._5))
    val r1k = rows.head
    assert(r1k._3 == kept1k && r1k._4 == total)
    assert(r1k._5 ==
      math.floor((1.0 - kept1k.toDouble / total.toDouble) * 1e6 + 0.5) / 1e6)
  }

  test("q397: buckets partition the order universe and shares sum to 1") {
    val nOrders = Tables.load(spark, sf0001, "orders").count()
    val rows = SparkEntry.queries("q397_order_reconciliation")(
      spark, sf0001).collect()
    assert(rows.map(_.getLong(1)).sum == nOrders)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-5)
    // the fixture's known orphans land in the no-lineitems bucket
    val orphan = rows.find(_.getString(0) == "0_no_lineitems")
    assert(orphan.exists(_.getLong(1) > 0))
  }
}
