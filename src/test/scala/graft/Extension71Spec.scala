package graft

import org.apache.spark.sql.functions._

import graft.io.Tables

/** Semantics tests for the q422–q425 wave: influence-filter replay, the
  * Bradley-Terry fixed point, stationarity, and CV accounting.
  */
class Extension71Spec extends SparkSpec {

  test("q422: emitted rows are exactly the D > 4/n set under the naive " +
    "OLS replay") {
    val rows = SparkEntry.queries("q422_cooks_distance")(spark, sf0001)
      .collect()
    val li = Tables.load(spark, sf0001, "lineitem")
      .select(col("l_quantity").cast("long"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
      .collect().map(r => (r.getLong(0).toDouble, r.getLong(1).toDouble))
    val n = li.length.toDouble
    val xbar = li.map(_._1).sum / n
    val ybar = li.map(_._2).sum / n
    val sxx = li.map(p => (p._1 - xbar) * (p._1 - xbar)).sum
    val b1 = li.map(p => (p._1 - xbar) * (p._2 - ybar)).sum / sxx
    val b0 = ybar - b1 * xbar
    val s2 = li.map { p =>
      val e = p._2 - b0 - b1 * p._1; e * e
    }.sum / (n - 2)
    def cook(x: Double, y: Double): Double = {
      val e = y - b0 - b1 * x
      val h = 1.0 / n + (x - xbar) * (x - xbar) / sxx
      e * e * h / (2 * s2 * (1 - h) * (1 - h))
    }
    val expected = li.count(p => cook(p._1, p._2) > 4.0 / n)
    assert(rows.length == expected,
      s"${rows.length} influential rows vs naive $expected")
    rows.foreach { r =>
      val d = cook(r.getLong(2).toDouble, r.getLong(3).toDouble)
      assert(math.abs(r.getDouble(6) - d) < 1e-3)
      assert(d > 4.0 / n)
    }
  }

  test("q423: strengths normalize to 1 and satisfy the MM fixed point") {
    val rows = SparkEntry.queries("q423_bradley_terry")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-3)
    // win share and strength must rank-correlate positively
    val byShare = rows.sortBy(r => r._3.toDouble / r._2).map(_._1)
    val byStrength = rows.sortBy(_._4).map(_._1)
    val pos = byShare.zipWithIndex.toMap
    val concordant = byStrength.zipWithIndex.map {
      case (b, i) => math.abs(pos(b) - i)
    }.sum
    assert(concordant < rows.length * rows.length / 2,
      "strength order diverges wildly from win-share order")
    // every brand participates and wins less than it plays
    rows.foreach(r => assert(r._3 <= r._2 && r._2 > 0))
  }

  test("q424: the stationary vector is a distribution matching the " +
    "empirical occupancy closely") {
    val rows = SparkEntry.queries("q424_markov_stationary")(spark, sf0001)
      .collect()
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-3)
    val nAll = rows.map(_.getLong(1)).sum.toDouble
    rows.foreach { r =>
      val emp = r.getLong(1) / nAll
      assert(math.abs(r.getDouble(3)
        - math.floor(emp * 1e6 + 0.5) / 1e6) < 1e-9)
      assert(r.getDouble(4) < 0.05,
        s"${r.getString(0)} stationary far from empirical")
      assert(math.abs(r.getDouble(4)
        - math.floor(math.abs(r.getDouble(2) - emp) * 1e6 + 0.5) / 1e6)
        < 2e-6)
    }
  }

  test("q425: folds partition the orders, train means are leakage-safe, " +
    "and the per-priority model is competitive with the pooled mean") {
    val rows = SparkEntry.queries("q425_kfold_cv")(spark, sf0001)
      .collect()
    assert(rows.length == 5)
    val nOrders = Tables.load(spark, sf0001, "orders").count()
    assert(rows.map(_.getLong(1)).sum == nOrders)
    rows.foreach { r =>
      assert(r.getDouble(2) > 0 && r.getDouble(3) > 0)
      // per-priority means barely differ from pooled on this fixture —
      // the skill must be small either way, never catastrophic
      assert(math.abs(r.getDouble(4)) < 0.5)
      assert(math.abs(1.0 - r.getDouble(2) / r.getDouble(3)
        - r.getDouble(4)) < 1e-4)
    }
  }
}
