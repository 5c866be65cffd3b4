package graft

import org.apache.spark.sql.functions._

import graft.io.Tables

/** Semantics tests for the q398–q401 wave: the growth-accounting
  * identity, burn-rate arithmetic, scorecard cross-checks against the
  * underlying per-metric queries, and ESS bounds.
  */
class Extension65Spec extends SparkSpec {

  test("q398: active = new + retained + resurrected on every day, and " +
    "flows replay from the (user, day) set") {
    val rows = SparkEntry.queries("q398_growth_accounting")(spark, sf0001)
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r._2 == r._3 + r._4 + r._5, s"identity broken on ${r._1}")
    }
    val ud = Tables.load(spark, sf0001, "events")
      .selectExpr("user_id", "cast(ts as date)").distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate)).toSet
    val byDay = ud.groupBy(_._2).map { case (d, es) =>
      d -> es.map(_._1)
    }
    val firstSeen = ud.groupBy(_._1).map { case (u, es) =>
      u -> es.map(_._2).minBy(_.toEpochDay)
    }
    rows.foreach { case (d, active, nNew, nRet, nRes, nChurn) =>
      val today = byDay(d)
      assert(active == today.size.toLong)
      assert(nNew == today.count(u => firstSeen(u) == d).toLong)
      val prev = byDay.getOrElse(d.minusDays(1), Set.empty[Long])
      assert(nRet == today.count(u =>
        prev.contains(u) && firstSeen(u) != d).toLong)
      assert(nChurn == prev.count(u => !today.contains(u)).toLong)
      assert(nRes == active - nNew - nRet)
    }
  }

  test("q399: burn rate is share/budget and the alert fires exactly " +
    "above 2x") {
    val rows = SparkEntry.queries("q399_slo_burn")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      val share = r.getDouble(3)
      assert(math.abs(r.getDouble(4) - share / 0.05) < 1e-4)
      assert(r.getBoolean(5) == (r.getDouble(4) > 2.0))
    }
  }

  test("q400: scorecard columns agree with the per-metric queries " +
    "(q360 readability, q401 volume) on every source") {
    val sc = SparkEntry.queries("q400_source_scorecard")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r).toMap
    val flesch = SparkEntry.queries("q360_flesch_readability")(
      spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(sc.keySet == flesch.keySet)
    sc.foreach { case (src, r) =>
      assert(r.getLong(1) == flesch(src)._1, s"$src n_docs")
      assert(r.getDouble(4) == flesch(src)._2, s"$src mean_flesch")
      assert(r.getDouble(6) > 0.0 && r.getDouble(6) <= 1.0)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("q401: ESS is bounded by (0, n] and the ratio by (0, 1], with " +
    "equal-weight sources at the top") {
    val rows = SparkEntry.queries("q401_effective_sample_size")(
      spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, ess, ratio) =>
      assert(ess > 0.0 && ess <= n.toDouble + 1e-6, s"$src ess $ess")
      assert(ratio > 0.0 && ratio <= 1.0 + 1e-9, s"$src ratio $ratio")
    }
  }
}
