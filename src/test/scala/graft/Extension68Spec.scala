package graft

import org.apache.spark.sql.functions._

import graft.io.Tables

/** Semantics tests for the q410–q413 wave: fold replay, folding-ratio
  * replay, hierarchy identities, and index bracketing.
  */
class Extension68Spec extends SparkSpec {

  private def daily(eventType: Option[String]): Array[(String, Long)] = {
    val base = Tables.load(spark, sf0001, "events")
    val f = eventType.map(t => base.where(col("event_type") === t))
      .getOrElse(base)
    f.groupBy(to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("x"))
      .orderBy("day")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
  }

  test("q410: the Holt state replays the snapped recurrence and the " +
    "first forecast is null") {
    val rows = SparkEntry.queries("q410_holt_linear")(spark, sf0001)
      .collect()
    val xs = daily(Some("purchase"))
    assert(rows.length == xs.length)
    def snap3(v: Double): Double = math.floor(v * 1000.0 + 0.5) / 1000.0
    var l = xs.head._2.toDouble
    var b = 0.0
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getDate(0).toString == xs(i)._1)
      assert(r.getLong(1) == xs(i)._2)
      if (i == 0) {
        assert(r.isNullAt(2))
        assert(r.getDouble(3) == l && r.getDouble(4) == 0.0)
      } else {
        val f = snap3(l + b)
        val lNew = snap3(0.5 * xs(i)._2.toDouble + 0.5 * (l + b))
        val bNew = snap3(0.3 * (lNew - l) + 0.7 * b)
        l = lNew; b = bNew
        assert(r.getDouble(2) == f, s"t=$i forecast")
        assert(r.getDouble(3) == l && r.getDouble(4) == b, s"t=$i state")
      }
    }
  }

  test("q411: folding ratios are variance shares in [0,1], exactly one " +
    "period wins, and p=2 replays naively") {
    val rows = SparkEntry.queries("q411_epoch_folding")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(rows.map(_._1).toSeq == (2L to 10L))
    rows.foreach(r => assert(r._2 >= 0.0 && r._2 <= 1.0))
    assert(rows.count(_._3) == 1)
    assert(rows.filter(_._3).map(_._2).head == rows.map(_._2).max)
    val xs = daily(None).map(_._2)
    val mean = xs.sum.toDouble / xs.length
    val sst = xs.map(x => (x - mean) * (x - mean)).sum
    val byPhase = xs.zipWithIndex.groupBy(_._2 % 2).values
    val ssb = byPhase.map { g =>
      val m = g.map(_._1).sum.toDouble / g.length
      g.length * (m - mean) * (m - mean)
    }.sum
    assert(math.abs(rows.head._2 - ssb / sst) < 1e-6)
  }

  test("q412: the hierarchy identities hold — top-down forecasts sum to " +
    "the total and the winner matches the errors") {
    val rows = SparkEntry.queries("q412_hierarchical_forecast")(
      spark, sf0001).collect()
    assert(rows.length == 5)
    // Σ td_fc = Σ bu_fc (both distribute the same seasonal-naive total)
    val tdSum = rows.map(_.getDouble(3)).sum
    val buSum = rows.map(_.getLong(2)).sum.toDouble
    assert(math.abs(tdSum - buSum) < 1e-2,
      s"td sum $tdSum vs bu sum $buSum")
    rows.foreach { r =>
      val (bu, td) = (r.getDouble(4), r.getDouble(5))
      assert(r.getString(6) == (if (bu <= td) "bottom_up" else "top_down"))
      assert(math.abs(r.getDouble(4)
        - math.abs(r.getLong(1) - r.getLong(2))) < 1e-6)
    }
  }

  test("q413: Fisher is the geometric mean bracketed by Laspeyres and " +
    "Paasche, replayed from per-part price relatives") {
    val r = SparkEntry.queries("q413_price_indices")(spark, sf0001)
      .collect().head
    val (l, p, f) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(l > 0 && p > 0 && f > 0)
    assert(f >= math.min(l, p) - 1e-9 && f <= math.max(l, p) + 1e-9)
    assert(math.abs(f - math.sqrt(l * p)) < 1e-4)
    // naive replay from collected lineitem
    val li = Tables.load(spark, sf0001, "lineitem")
      .select(col("l_partkey"), year(col("l_shipdate")).as("yr"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("e"),
        col("l_quantity").cast("long").as("q"))
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getLong(2),
        x.getLong(3)))
    val y0 = li.map(_._2).min
    val y1 = li.map(_._2).max
    def per(y: Int) = li.filter(_._2 == y).groupBy(_._1).view
      .mapValues(g => (g.map(_._3).sum, g.map(_._4).sum)).toMap
    val b = per(y0); val c = per(y1)
    val common = b.keySet intersect c.keySet
    assert(common.size.toLong == r.getLong(2))
    val lNum = common.toSeq.map(k =>
      c(k)._1.toDouble / c(k)._2 * b(k)._2).sum
    val lDen = common.toSeq.map(k => b(k)._1).sum.toDouble
    assert(math.abs(l - lNum / lDen) < 1e-4)
  }
}
