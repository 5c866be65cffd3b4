package graft

import org.apache.spark.sql.functions._

import graft.io.Tables

/** Semantics tests for the q390–q393 wave: halving-schedule structure,
  * exact QTE order statistics, the recall theorem, and reach bounds.
  */
class Extension63Spec extends SparkSpec {

  test("q390: rounds shrink 20 -> 10 -> 5 and survivors nest") {
    val rows = SparkEntry.queries("q390_successive_halving")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    val byRound = rows.groupBy(_._1)
    assert(byRound(1L).length == 20)
    assert(byRound(2L).length == 10)
    assert(byRound(3L).length == 5)
    assert(byRound(1L).count(_._5) == 10)
    assert(byRound(2L).count(_._5) == 5)
    assert(byRound(3L).count(_._5) == 3)
    // each round's population is exactly the prior round's survivors
    assert(byRound(2L).map(_._2).toSet ==
      byRound(1L).filter(_._5).map(_._2).toSet)
    assert(byRound(3L).map(_._2).toSet ==
      byRound(2L).filter(_._5).map(_._2).toSet)
    // survivors are the top-k by mean within each round
    byRound.foreach { case (_, rs) =>
      val k = rs.count(_._5)
      val top = rs.sortBy(r => (-r._4, r._2)).take(k).map(_._2).toSet
      assert(rs.filter(_._5).map(_._2).toSet == top)
    }
  }

  test("q391: per-arm deciles are the exact order statistics of an " +
    "in-memory replay") {
    import graft.functions.PolyHash
    val cs = Tables.load(spark, sf0001, "events")
      .where(col("event_type") === "purchase")
      .selectExpr("user_id", "value").collect()
      .map { r =>
        val h = PolyHash.hash(s"exp7#${r.getLong(0)}")
        val treat = (h * h % 1000000007L) % 10000L < 5000L
        (treat, math.floor(r.getDouble(1) * 100 + 0.5).toLong)
      }
    def decile(treat: Boolean, q: Int): Long = {
      val xs = cs.filter(_._1 == treat).map(_._2).sorted
      xs(((q * xs.length + 9) / 10 - 1).toInt)
    }
    val rows = SparkEntry.queries("q391_quantile_treatment_effect")(
      spark, sf0001).collect()
    assert(rows.length == 9)
    rows.foreach { r =>
      val q = (r.getLong(0) / 10).toInt
      assert(r.getLong(1) == decile(true, q), s"treat q$q")
      assert(r.getLong(2) == decile(false, q), s"control q$q")
      assert(r.getLong(3) == r.getLong(1) - r.getLong(2))
    }
    // deciles are monotone within each arm
    rows.sliding(2).foreach(w => assert(w(0).getLong(1) <= w(1).getLong(1)
      && w(0).getLong(2) <= w(1).getLong(2)))
  }

  test("q392: sampled recall is exactly 1.0 (the DL >= length-" +
    "difference theorem), the sample is corpus-independent-bounded, " +
    "and pruning is real") {
    val r = SparkEntry.queries("q392_blocking_quality")(spark, sf0001)
      .head()
    val nAll = r.getLong(0)
    val nPairs = r.getLong(1)
    val nTruth = r.getLong(2)
    val nCand = r.getLong(3)
    val nCaught = r.getLong(4)
    // 64 rows per brand max -> <= 25 * 64*63/2 audited pairs, ever
    assert(nPairs <= 25L * 64 * 63 / 2, s"sample pair space $nPairs")
    assert(nPairs <= nAll)
    assert(r.getDouble(5) == 1.0, "length-band blocking lost a true pair")
    assert(nCaught == nTruth)
    assert(nCand <= nPairs)
    assert(r.getDouble(6) > 0.0 && r.getDouble(6) <= 1.0)
    assert(r.getDouble(7) >= 0.0 && r.getDouble(7) < 1.0)
  }

  test("q393: reach2 is bounded below by degree and above by the " +
    "graph order, and replays for the top node") {
    val rows = SparkEntry.queries("q393_two_hop_reach")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, deg, reach) =>
      assert(reach >= deg, "two-hop reach below one-hop degree")
    }
    // replay the top row from the explicit edge set
    val li = Tables.load(spark, sf0001, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cnt = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val adj = (cnt ++ cnt.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val (top, deg, reach) = rows.head
    assert(deg == adj(top).size.toLong)
    val r2 = adj(top) ++ adj(top).flatMap(m => adj(m)) - top
    assert(reach == r2.size.toLong,
      s"reach2 for $top: $reach vs replay ${r2.size}")
  }
}
