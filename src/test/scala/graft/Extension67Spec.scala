package graft

import org.apache.spark.sql.functions._

import graft.io.Tables

/** Semantics tests for the q406–q409 wave: each statistic replays from a
  * naive driver-side computation over the collected fixture.
  */
class Extension67Spec extends SparkSpec {

  private def cents(xs: Array[Double]): Array[Long] =
    xs.map(v => math.floor(v * 100 + 0.5).toLong)

  test("q406: F and eta-squared replay from a naive two-pass ANOVA") {
    val rows = SparkEntry.queries("q406_anova_oneway")(spark, sf0001)
      .collect()
    val data = Tables.load(spark, sf0001, "orders")
      .select(col("o_orderpriority"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), math.floor(r.getDouble(1) * 100
        + 0.5)))
    val byG = data.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val n = data.length.toDouble
    val k = byG.size.toDouble
    val mean = data.map(_._2).sum / n
    val ssw = byG.values.map { xs =>
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum
    }.sum
    val sst = data.map(x => (x._2 - mean) * (x._2 - mean)).sum
    val f = ((sst - ssw) / (k - 1)) / (ssw / (n - k))
    val eta = (sst - ssw) / sst
    rows.foreach { r =>
      assert(math.abs(r.getDouble(3) - f) < 1e-3,
        s"F ${r.getDouble(3)} vs naive $f")
      assert(math.abs(r.getDouble(4) - eta) < 1e-6)
      assert(r.getLong(5) == (k - 1).toLong)
      assert(r.getLong(6) == (n - k).toLong)
      val m = byG(r.getString(0))
      assert(math.abs(r.getDouble(2) - m.sum / m.length / 100.0) < 1e-5)
    }
    assert(rows.map(_.getLong(1)).sum == data.length)
  }

  test("q407: rank sums cover the rank universe and H replays naively") {
    val rows = SparkEntry.queries("q407_kruskal_wallis")(spark, sf0001)
      .collect()
    val data = Tables.load(spark, sf0001, "events")
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0),
        math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    val nL = data.length
    // naive mid-ranks: sort all, average rank per tied value
    val ranked = data.map(_._2).sorted.zipWithIndex
      .groupBy(_._1).view
      .mapValues(g => g.map(_._2 + 1).sum.toDouble / g.length).toMap
    val rg = data.groupBy(_._1).view
      .mapValues(xs => (xs.length, xs.map(x => ranked(x._2)).sum)).toMap
    // Σ n_g · mean_rank_g must equal N(N+1)/2
    val total = rows.map(r => r.getLong(1) * r.getDouble(2)).sum
    assert(math.abs(total - nL.toDouble * (nL + 1) / 2.0) < 1e-3)
    val sumterm = rg.values.map { case (ng, rs) => rs * rs / ng }.sum
    val h = 12.0 / (nL.toDouble * (nL + 1)) * sumterm - 3.0 * (nL + 1)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(3) - h) < 1e-4,
        s"H ${r.getDouble(3)} vs naive $h")
      // ties only inflate: C ≤ 1 so H/C ≥ H
      assert(r.getDouble(4) >= r.getDouble(3) - 1e-9)
      assert(r.getLong(5) == rg.size.toLong - 1)
      val (ng, rs) = rg(r.getString(0))
      assert(r.getLong(1) == ng.toLong)
      assert(math.abs(r.getDouble(2) - rs / ng) < 1e-6)
    }
  }

  test("q408: skewness/kurtosis match Spark's population aggregates and " +
    "the uniform-ish value column rejects normality") {
    val rows = SparkEntry.queries("q408_jarque_bera")(spark, sf0001)
      .collect()
    val agg = Tables.load(spark, sf0001, "events")
      .select(col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("x"))
      .groupBy("event_type")
      .agg(skewness(col("x").cast("double")).as("sk"),
        kurtosis(col("x").cast("double")).as("ku"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    rows.foreach { r =>
      val (sk, ku) = agg(r.getString(0))
      assert(math.abs(r.getDouble(2) - sk) < 1e-4,
        s"skew ${r.getDouble(2)} vs builtin $sk")
      assert(math.abs(r.getDouble(3) - ku) < 1e-4,
        s"kurt ${r.getDouble(3)} vs builtin $ku")
      // p = exp(-JB/2) in [0, 1] — stableRound6 snaps sub-1e-6 p to 0.0
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
      // a near-uniform value distribution is platykurtic: JB is huge
      assert(r.getBoolean(6) == (r.getDouble(4) > 5.991464547107979))
    }
    // uniform-ish fixture: every event type rejects normality at 95%
    assert(rows.forall(_.getBoolean(6)))
  }

  test("q409: group medians and mean |dev| replay; W is the ANOVA F on " +
    "median-centered deviations") {
    val rows = SparkEntry.queries("q409_brown_forsythe")(spark, sf0001)
      .collect()
    val data = Tables.load(spark, sf0001, "events")
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0),
        math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    val byG = data.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val zs = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    rows.foreach { r =>
      val g = r.getString(0)
      val xs = byG(g)
      val med = xs((xs.length + 1) / 2 - 1)
      assert(r.getLong(2) == med, s"$g median ${r.getLong(2)} vs $med")
      val devs = xs.map(x => math.abs(x - med).toDouble)
      assert(math.abs(r.getDouble(3) - devs.sum / devs.length) < 1e-5)
      devs.foreach(z => zs += ((g, z)))
      assert(r.getLong(5) == byG.size.toLong - 1)
    }
    val n = zs.length.toDouble
    val k = byG.size.toDouble
    val mean = zs.map(_._2).sum / n
    val ssw = zs.groupBy(_._1).values.map { g =>
      val m = g.map(_._2).sum / g.length
      g.map(z => (z._2 - m) * (z._2 - m)).sum
    }.sum
    val sst = zs.map(z => (z._2 - mean) * (z._2 - mean)).sum
    val w = ((sst - ssw) / (k - 1)) / (ssw / (n - k))
    rows.foreach(r => assert(math.abs(r.getDouble(4) - w) < 1e-4,
      s"W ${r.getDouble(4)} vs naive $w"))
  }
}
