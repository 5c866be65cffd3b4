package graft

import org.apache.spark.sql.functions._

import graft.io.Tables

/** Semantics tests for the q354–q357 wave: the clamped-balance
  * associative identity vs a literal sequential fold, assortativity and
  * Borda ranks vs in-memory replays, UCB1 score recomputation.
  */
class Extension54Spec extends SparkSpec {

  private def cents(v: Double): Long = math.floor(v * 100 + 0.5).toLong

  test("q354: parallel-scan identity matches the literal sequential " +
    "clamp recurrence for every user") {
    val rows = Tables.load(spark, sf0001, "events")
      .where(col("event_type").isin("purchase", "click", "view"))
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")),
        col("event_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val expected = rows.groupBy(_._1).map { case (uid, es) =>
      var b = 0L; var peak = 0L; var hits = 0L
      es.sortBy(e => (e._2, e._3)).foreach { e =>
        val dx = if (e._4 == "purchase") cents(e._5) else -cents(e._5)
        b = math.max(0L, b + dx)
        peak = math.max(peak, b)
        if (b == 0L && dx < 0L) hits += 1
      }
      uid -> ((es.length.toLong, b, peak, hits))
    }
    val got = SparkEntry.queries("q354_clamped_running_balance")(
      spark, sf0001).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (uid, e) =>
      assert(got(uid) == e, s"user $uid: got ${got(uid)}, expected $e")
    }
  }

  test("q355: assortativity recomputes from the explicit edge list") {
    val li = Tables.load(spark, sf0001, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val co = li.groupBy(_._1).values.flatMap { parts =>
      val ps = parts.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        yield (ps(i), ps(j))
    }.toSeq.groupBy(identity)
      // NB: .collect { case (e, _) => e } here would rebuild a Map and
      // collapse pairs sharing a first element — keys keeps every edge
      .filter(_._2.size >= 2).keys.toSeq
    val und = co ++ co.map(e => (e._2, e._1))
    val deg = und.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val m2 = und.size.toLong
    val sx = und.map(e => deg(e._1)).sum
    val sxx = und.map(e => deg(e._1) * deg(e._1)).sum
    val sxy = und.map(e => deg(e._1) * deg(e._2)).sum
    val r = (m2 * sxy - sx * sx).toDouble / (m2 * sxx - sx * sx).toDouble
    val expect = math.floor(r * 1e6 + 0.5) / 1e6
    val row = SparkEntry.queries("q355_degree_assortativity")(
      spark, sf0001).head()
    assert(row.getLong(0) == deg.size.toLong)
    assert(row.getLong(1) == co.size.toLong)
    assert(row.getDouble(2) == expect,
      s"assortativity ${row.getDouble(2)} != replay $expect")
  }

  test("q356: Borda top-10 matches an in-memory full-population replay") {
    val li = Tables.load(spark, sf0001, "lineitem")
      .select(col("l_suppkey"), col("l_partkey"), col("l_extendedprice"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val f = li.groupBy(_._1).map { case (sk, ls) =>
      (sk, ls.map(l => cents(l._3)).sum, ls.map(_._2).distinct.size.toLong,
        ls.length.toLong)
    }.toSeq
    val n = f.size.toLong
    def ranks(metric: ((Long, Long, Long, Long)) => Long)
        : Map[Long, Long] = {
      val sorted = f.sortBy(t => (-metric(t), t._1))
      sorted.zipWithIndex.map { case (t, i) => t._1 -> (i + 1).toLong }.toMap
    }
    val r1 = ranks(_._2); val r2 = ranks(_._3); val r3 = ranks(_._4)
    // full-population Borda (every supplier) — the query's candidate
    // union must contain the true top-10, so the outputs must agree
    val full = f.map(t => (t._1, 3 * n - r1(t._1) - r2(t._1) - r3(t._1)))
      .sortBy(t => (-t._2, t._1)).take(10)
    val got = SparkEntry.queries("q356_borda_fusion")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.length == 10)
    got.zip(full).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._5 == e._2,
        s"borda row mismatch: got $g, full-population ${e}")
      assert(g._2 == r1(g._1) && g._3 == r2(g._1) && g._4 == r3(g._1),
        s"rank columns for supplier ${g._1} disagree with replay")
    }
  }

  test("q357: UCB1 scores recompute and the chosen arms are exactly " +
    "the max-score arms") {
    val rows = SparkEntry.queries("q357_ucb1_allocation")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    val nn = rows.map(_._2).sum
    rows.foreach { case (_, na, mean, bonus, ucb, _) =>
      assert(mean >= 0.0 && mean <= 1.0)
      val eb = math.sqrt(2.0 * math.log(nn.toDouble) / na.toDouble)
      assert(math.abs(bonus - eb) < 1e-6, s"bonus $bonus vs $eb")
      assert(math.abs(ucb - (mean + bonus)) < 2e-6)
    }
    val mx = rows.map(_._5).max
    rows.foreach { r =>
      assert(r._6 == (r._5 == mx), s"chosen flag wrong for $r")
    }
    assert(rows.count(_._6) >= 1)
  }
}
