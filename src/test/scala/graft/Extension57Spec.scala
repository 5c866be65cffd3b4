package graft

import org.apache.spark.sql.functions._

import graft.io.Tables

/** Semantics tests for the q366–q369 wave: stream==batch duality for
  * the clamped balance, Kendall's W replay, the Oaxaca identity, and
  * the overlap-sketch audit.
  */
class Extension57Spec extends SparkSpec {

  test("q366: the streaming sequential fold equals the batch " +
    "parallel-scan identity row-for-row") {
    val stream = SparkEntry.queries("q366_streaming_balance")(
      spark, sf0001).collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("q354_clamped_running_balance")(
      spark, sf0001).collect().map(_.toSeq).toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"stream/batch divergence: ${stream.diff(batch).take(3)} vs " +
        s"${batch.diff(stream).take(3)}")
  }

  test("q367: Kendall's W replays from in-memory exact ranks and is " +
    "in [0, 1]") {
    val li = Tables.load(spark, sf0001, "lineitem")
      .select(col("l_suppkey"), col("l_partkey"), col("l_extendedprice"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val f = li.groupBy(_._1).map { case (sk, ls) =>
      (sk, ls.map(l => math.floor(l._3 * 100 + 0.5).toLong).sum,
        ls.map(_._2).distinct.size.toLong, ls.length.toLong)
    }.toSeq
    val n = f.size.toLong
    def ranks(metric: ((Long, Long, Long, Long)) => Long): Map[Long, Long] =
      f.sortBy(t => (-metric(t), t._1)).zipWithIndex
        .map { case (t, i) => t._1 -> (i + 1).toLong }.toMap
    val (r1, r2, r3) = (ranks(_._2), ranks(_._3), ranks(_._4))
    val s4 = f.map { t =>
      val d = 2L * (r1(t._1) + r2(t._1) + r3(t._1)) - 3L * (n + 1L)
      d * d
    }.sum
    val w = s4.toDouble / (3.0 * (n * n * n - n).toDouble)
    val expect = math.floor(w * 1e6 + 0.5) / 1e6
    val row = SparkEntry.queries("q367_rank_concordance")(spark, sf0001)
      .head()
    assert(row.getLong(0) == n)
    assert(row.getDouble(1) == expect,
      s"W ${row.getDouble(1)} != replay $expect")
    assert(row.getDouble(1) >= 0.0 && row.getDouble(1) <= 1.0)
  }

  test("q368: mix + rate effects sum to the total mean shift " +
    "(the Oaxaca identity, to grid precision)") {
    val rows = SparkEntry.queries("q368_mean_shift_decomposition")(
      spark, sf0001).collect()
    assert(rows.nonEmpty)
    val total = rows.head.getDouble(7)
    assert(rows.forall(_.getDouble(7) == total))
    val parts = rows.map(r => r.getDouble(5) + r.getDouble(6)).sum
    // each of the 2·n_types effect terms is on the 1e-6 grid
    assert(math.abs(parts - total) <= rows.length * 2e-6 + 1e-9,
      s"identity violated: sum(effects) $parts vs total $total")
    // shares are distributions
    assert(math.abs(rows.map(_.getDouble(1)).sum - 1.0) < 1e-5)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-5)
  }

  test("q369: exact intersections replay and the sketch estimate is " +
    "inside its declared band on every pair") {
    val u = Tables.load(spark, sf0001, "events")
      .select(col("event_type"), col("user_id")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byType = u.groupBy(_._1).map { case (t, es) =>
      t -> es.map(_._2).toSet
    }
    val got = SparkEntry.queries("q369_hll_intersection")(spark, sf0001)
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val inter = (byType(a) intersect byType(b)).size.toLong
      assert(r.getLong(2) == byType(a).size.toLong)
      assert(r.getLong(3) == byType(b).size.toLong)
      assert(r.getLong(4) == inter, s"intersection $a/$b")
      assert(r.getBoolean(6), s"sketch estimate out of band for $a/$b")
      val j = inter.toDouble /
        (byType(a).size + byType(b).size - inter).toDouble
      assert(r.getDouble(5) == math.floor(j * 1e6 + 0.5) / 1e6)
    }
  }
}
