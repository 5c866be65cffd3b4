package graft

import org.apache.spark.sql.functions._

import graft.functions.PolyHash
import graft.io.Tables

/** Semantics tests for the q442–q445 wave: assignment feasibility and
  * optimality, capture identities, segment error bounds, and
  * shortest-path axioms.
  */
class Extension76Spec extends SparkSpec {

  test("q442: both assignments are feasible permutations and the " +
    "exhaustive optimum is never beaten by greedy") {
    val rows = SparkEntry.queries("q442_optimal_assignment")(spark, sf0001)
      .collect()
    assert(rows.length == 5)
    val opt = rows.map(_.getString(1))
    val grd = rows.map(_.getString(2))
    assert(opt.distinct.length == 5 && grd.distinct.length == 5)
    val (ot, gt) = (rows.head.getDouble(4), rows.head.getDouble(5))
    assert(ot <= gt + 1e-9, "greedy beat the exhaustive optimum")
    rows.foreach(r => assert(r.getBoolean(6) == (gt <= ot + 1e-9)))
    // cell cost replay for the first region
    val r0 = rows.head
    val naive = Tables.load(spark, sf0001, "lineitem")
      .join(Tables.load(spark, sf0001, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.load(spark, sf0001, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.load(spark, sf0001, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables.load(spark, sf0001, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === r0.getString(0) &&
        col("o_orderpriority") === r0.getString(1))
      .agg(avg(datediff(col("l_shipdate"), col("o_orderdate"))
        .cast("double")))
      .collect().head.getDouble(0)
    assert(math.abs(r0.getDouble(3) - naive) < 1e-4)
  }

  test("q443: capture counts nest, Chapman replays, and the estimate " +
    "can never undershoot what was seen") {
    val r = SparkEntry.queries("q443_capture_recapture")(spark, sf0001)
      .collect().head
    val (n1, n2, m) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(m <= math.min(n1, n2))
    val chap = (n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0
    assert(math.abs(r.getDouble(5)
      - math.floor(chap * 1e6 + 0.5) / 1e6) < 1e-9)
    assert(r.getDouble(5) >= math.max(n1, n2).toDouble - 1.0)
    if (!r.isNullAt(4)) assert(r.getDouble(4) >= m.toDouble)
    assert(r.getLong(3) >= math.max(n1, n2))
  }

  test("q444: hashed keys give a sqrt-scale global bound and every " +
    "segment fit tightens or matches it") {
    val rows = SparkEntry.queries("q444_learned_index_audit")(
      spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
      .sortBy(_._1)
    val global = rows.find(_._1 == -1L).get
    val segs = rows.filter(_._1 >= 0L)
    assert(segs.map(_._2).sum == global._2)
    segs.foreach(s => assert(s._3 <= global._3 + 1e-6,
      s"segment ${s._1} err ${s._3} exceeds global ${global._3}"))
    // hashed keys are not pathological: the bound is well under n/2
    assert(global._3 < global._2 / 2.0)
    assert(global._3 > 0.0, "hashed keys cannot be perfectly linear")
  }

  test("q445: source distance is zero, distances are nonnegative and " +
    "never exceed the direct edge") {
    val rows = SparkEntry.queries("q445_minplus_shortest_path")(
      spark, sf0001).collect()
    val src = rows.map(_.getString(0)).min
    val byB = rows.map(r => r.getString(0) ->
      (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(byB(src).contains(0.0))
    byB.values.flatten.foreach(d => assert(d >= 0.0))
    // direct-edge upper bound replay
    val br = Tables.load(spark, sf0001, "lineitem")
      .join(Tables.load(spark, sf0001, "part"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val pairs = br.groupBy(_._1).values.flatMap { g =>
      val bs = g.map(_._2).distinct.sorted
      for (i <- bs.indices; j <- i + 1 until bs.length)
        yield (bs(i), bs(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nMax = pairs.values.max
    pairs.foreach { case ((a, c), n) =>
      val w = -math.log(n.toDouble / nMax)
      if (a == src && byB(c).isDefined)
        assert(byB(c).get <= w + 1e-6,
          s"dist to $c ${byB(c).get} exceeds direct edge $w")
    }
  }
}
