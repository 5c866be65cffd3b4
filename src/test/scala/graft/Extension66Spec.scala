package graft

import org.apache.spark.sql.functions._

import graft.io.Tables

/** Semantics tests for the q402–q405 wave: ring invariants, feature
  * replay, advisor arithmetic, and CI bracketing.
  */
class Extension66Spec extends SparkSpec {

  test("q402: loads partition the key universe, the departed node's " +
    "keys are the only movers, and vnodes keep imbalance bounded") {
    val rows = SparkEntry.queries("q402_hash_ring_balance")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.map(_._1).toSeq == (0L to 7L))
    val nDocs = Tables.load(spark, sf0001, "documents").count()
    assert(rows.map(_._2).sum == nDocs)
    val moved = rows.head._5
    assert(rows.forall(_._5 == moved))
    // consistent hashing: exactly node 3's keys move when node 3 leaves
    val node3Share = rows.find(_._1 == 3L).get._3
    assert(math.abs(moved - node3Share) < 1e-9,
      s"moved share $moved != node-3 load $node3Share")
    // 64 vnodes keep every node within ~3x of fair share on this corpus
    rows.foreach(r => assert(r._4 > 0.1 && r._4 < 3.0,
      s"node ${r._1} balance factor ${r._4} out of band"))
  }

  test("q403: lag and rolling features replay from the daily series") {
    val daily = Tables.load(spark, sf0001, "events")
      .where(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("x"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .sortBy(_._1.toEpochDay)
    val xs = daily.map(_._2)
    val rows = SparkEntry.queries("q403_ts_feature_matrix")(spark, sf0001)
      .collect()
    assert(rows.length == daily.length)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(1) == xs(i))
      if (i >= 1) assert(r.getLong(2) == xs(i - 1)) else assert(r.isNullAt(2))
      if (i >= 7) {
        assert(r.getLong(3) == xs(i - 7))
        val w = xs.slice(i - 7, i)
        val mean = w.sum.toDouble / 7.0
        assert(r.getDouble(4) ==
          math.floor(mean / 100.0 * 1e6 + 0.5) / 1e6)
        val sd = math.sqrt(w.map(v => v.toDouble * v).sum / 7.0
          - mean * mean)
        assert(r.getDouble(5) ==
          math.floor(sd / 100.0 * 1e6 + 0.5) / 1e6)
      } else {
        assert(r.isNullAt(4) && r.isNullAt(5))
      }
    }
  }

  test("q404: the advisor picks the filtered-first order (cost model " +
    "arithmetic replays)") {
    val rows = SparkEntry.queries("q404_join_order_advisor")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.length == 2)
    val byName = rows.map(r => r._1 -> r).toMap
    // the final join output is order-invariant
    assert(byName("customer_first")._3 == byName("lineitem_first")._3)
    // exactly the cheaper order is advised
    val cheaper = rows.minBy(_._4)._1
    rows.foreach(r => assert(r._5 == (r._1 == cheaper)))
    // on TPC-H shapes the selective-customer order must win
    assert(cheaper == "customer_first")
  }

  test("q405: the CI brackets the median and widths shrink with n " +
    "in relative terms") {
    val rows = SparkEntry.queries("q405_median_ci")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (t, n, lo, med, hi) =>
      assert(lo <= med && med <= hi, s"$t CI does not bracket the median")
      assert(n > 0)
    }
  }
}
