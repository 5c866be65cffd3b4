package graft

import org.apache.spark.sql.functions._

import graft.io.Tables

/** Semantics tests for the q454–q457 wave: MoM replay, elasticity
  * replay, ABC accounting, and service-level guarantees.
  */
class Extension79Spec extends SparkSpec {

  test("q454: the Gumbel moments replay from the collected maxima and " +
    "the 100-block return level extrapolates upward") {
    val r = SparkEntry.queries("q454_gumbel_block_maxima")(spark, sf0001)
      .collect().head
    val mx = Tables.load(spark, sf0001, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")))
      .agg(max(floor(col("o_totalprice") * 100 + 0.5).cast("long")))
      .collect().map(_.getLong(1).toDouble)
    assert(r.getLong(0) == mx.length.toLong)
    val m = mx.sum / mx.length
    val sd = math.sqrt(mx.map(x => (x - m) * (x - m)).sum / mx.length)
    assert(math.abs(r.getDouble(1) - m / 100.0) < 1e-3)
    assert(math.abs(r.getDouble(2) - sd / 100.0) < 1e-3)
    val sigma = sd * math.sqrt(6.0) / math.Pi
    val mu = m - 0.5772156649015329 * sigma
    assert(math.abs(r.getDouble(3) - mu / 100.0) < 1e-2)
    // the 1-in-100 block level sits above the mean block maximum
    assert(r.getDouble(5) > r.getDouble(1))
  }

  test("q455: elasticity replays from snapped per-part logs and the " +
    "independent-price fixture is inelastic") {
    val r = SparkEntry.queries("q455_price_elasticity")(spark, sf0001)
      .collect().head
    val per = Tables.load(spark, sf0001, "lineitem")
      .groupBy("l_partkey")
      .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
        .as("e"), sum(col("l_quantity").cast("long")).as("q"))
      .collect().map { x =>
        val lp = math.floor(math.log(x.getLong(1).toDouble
          / x.getLong(2)) * 1e9 + 0.5) / 1e9
        val lq = math.floor(math.log(x.getLong(2).toDouble)
          * 1e9 + 0.5) / 1e9
        (lp, lq)
      }
    assert(r.getLong(0) == per.length.toLong)
    val n = per.length.toDouble
    val (sp, sq) = (per.map(_._1).sum, per.map(_._2).sum)
    val spp = per.map(p => math.floor(p._1 * p._1 * 1e9 + 0.5) / 1e9).sum
    val spq = per.map(p => math.floor(p._1 * p._2 * 1e9 + 0.5) / 1e9).sum
    val beta = (spq - sp * sq / n) / (spp - sp * sp / n)
    assert(math.abs(r.getDouble(3) - beta) < 1e-4,
      s"beta ${r.getDouble(3)} vs naive $beta")
    assert(r.getBoolean(4) && math.abs(r.getDouble(3)) < 1.0)
  }

  test("q456: revenue shares partition to 1 and the A band carries the " +
    "largest share per part") {
    val rows = SparkEntry.queries("q456_abc_xyz")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4)
    val nParts = Tables.load(spark, sf0001, "lineitem")
      .select(countDistinct("l_partkey")).collect().head.getLong(0)
    assert(rows.map(_._3).sum == nParts)
    val byAbc = rows.groupBy(_._1).view
      .mapValues(g => (g.map(_._3).sum, g.map(_._4).sum)).toMap
    // A: fewest parts, most revenue per part
    val aDensity = byAbc("A")._2 / byAbc("A")._1
    val cDensity = byAbc("C")._2 / byAbc("C")._1
    assert(aDensity > cDensity,
      "A parts must out-earn C parts per unit")
    // sparse per-part demand: everything is intermittent (Z)
    assert(rows.forall(_._2 == "Z"))
  }

  test("q457: each stocking level covers at least its target and the " +
    "levels/shortfalls are monotone") {
    val rows = SparkEntry.queries("q457_newsvendor_quantile")(
      spark, sf0001).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).sortBy(_._1)
    assert(rows.length == 3)
    rows.foreach(r => assert(r._3 >= r._1 - 1e-9,
      s"target ${r._1} not covered: ${r._3}"))
    assert(rows.toSeq.sliding(2).forall {
      case Seq(a, b) => b._2 >= a._2 && b._4 <= a._4
      case _ => true
    })
    // exact replay of the 0.8 level
    val daily = Tables.load(spark, sf0001, "events")
      .where(col("event_type") === "purchase")
      .groupBy(to_date(col("ts"))).count()
      .collect().map(_.getLong(1)).sorted
    val lvl = daily(math.ceil(daily.length * 0.8).toInt - 1)
    assert(rows.find(_._1 == 0.8).get._2 == lvl)
  }
}
