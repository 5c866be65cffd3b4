package graft

import org.apache.spark.sql.functions._

import graft.io.Tables

/** Semantics tests for the q426–q429 wave: Shapley axioms, ITS replay,
  * MoM identities, and the sampler bake-off.
  */
class Extension72Spec extends SparkSpec {

  test("q426: efficiency (sum of Shapley = grand coalition) and " +
    "submodular bounds hold") {
    val rows = SparkEntry.queries("q426_shapley_coverage")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    val pr = Tables.load(spark, sf0001, "lineitem")
      .where(col("l_quantity") >= 45)
      .join(Tables.load(spark, sf0001, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.load(spark, sf0001, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.load(spark, sf0001, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables.load(spark, sf0001, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("l_partkey")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byR = pr.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val full = pr.map(_._2).toSet.size
    // efficiency axiom
    assert(math.abs(rows.map(_._3).sum - full) < 1e-2,
      s"sum phi ${rows.map(_._3).sum} vs v(N) $full")
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-3)
    rows.foreach { r =>
      // solo coverage replays exactly
      assert(r._2 == byR(r._1).size.toLong)
      // coverage games are submodular: phi_i <= v({i}) and
      // phi_i >= v(N) - v(N \ {i})
      assert(r._3 <= r._2 + 1e-6)
      val without = byR.filter(_._1 != r._1).values.flatten.toSet.size
      assert(r._3 >= (full - without).toDouble - 1e-6)
    }
  }

  test("q427: both segment fits replay the naive closed form") {
    val r = SparkEntry.queries("q427_interrupted_ts")(spark, sf0001)
      .collect().head
    val daily = Tables.load(spark, sf0001, "events")
      .where(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("y"))
      .orderBy("day").collect().map(_.getLong(1))
    val cut = daily.length / 2
    assert(r.getLong(0) == cut.toLong)
    def fit(seg: Array[(Double, Double)]): (Double, Double) = {
      val n = seg.length.toDouble
      val mt = seg.map(_._1).sum / n
      val my = seg.map(_._2).sum / n
      val b1 = seg.map(p => (p._1 - mt) * (p._2 - my)).sum /
        seg.map(p => (p._1 - mt) * (p._1 - mt)).sum
      (my - b1 * mt, b1)
    }
    val idx = daily.zipWithIndex.map { case (y, i) =>
      (i.toDouble, y.toDouble) }
    val (pb0, pb1) = fit(idx.filter(_._1 < cut))
    val (qb0, qb1) = fit(idx.filter(_._1 >= cut))
    assert(math.abs(r.getDouble(1) - pb0) < 1e-2)
    assert(math.abs(r.getDouble(2) - pb1) < 1e-3)
    assert(math.abs(r.getDouble(3) - qb0) < 1e-2)
    assert(math.abs(r.getDouble(4) - qb1) < 1e-3)
    assert(math.abs(r.getDouble(5)
      - ((qb0 + qb1 * cut) - (pb0 + pb1 * cut))) < 1e-2)
    assert(math.abs(r.getDouble(6) - (qb1 - pb1)) < 1e-3)
  }

  test("q428: the MoM identity m = r(1-p)/p holds wherever the fit " +
    "exists and the dispersion verdict matches") {
    val rows = SparkEntry.queries("q428_negbin_fit")(spark, sf0001)
      .collect()
    rows.foreach { r =>
      val (m, v) = (r.getDouble(2), r.getDouble(3))
      assert(math.abs(r.getDouble(4) - v / m) < 1e-4)
      assert(r.getBoolean(7) == (v > m))
      if (!r.isNullAt(5)) {
        val (nr, np) = (r.getDouble(5), r.getDouble(6))
        assert(math.abs(nr * (1 - np) / np - m) < 1e-2,
          s"${r.getString(0)}: r(1-p)/p != m")
      } else {
        assert(!r.getBoolean(7))
      }
    }
  }

  test("q429: estimates are pairs x scale and universe sampling beats " +
    "Bernoulli on this join") {
    val rows = SparkEntry.queries("q429_sampled_join_estimate")(
      spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.length == 2)
    val exact = Tables.load(spark, sf0001, "orders")
      .join(Tables.load(spark, sf0001, "lineitem"),
        col("o_orderkey") === col("l_orderkey")).count()
    rows.foreach { r =>
      assert(r._5 == exact)
      assert(r._4 == r._2 * r._3)
      assert(math.abs(r._6
        - math.floor((r._4 - r._5).toDouble / r._5 * 1e6 + 0.5) / 1e6)
        < 1e-9)
    }
    val byName = rows.map(r => r._1 -> math.abs(r._6)).toMap
    assert(byName("universe") < byName("bernoulli"),
      s"universe ${byName("universe")} not tighter than bernoulli " +
        s"${byName("bernoulli")}")
  }
}
