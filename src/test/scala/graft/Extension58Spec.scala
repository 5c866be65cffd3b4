package graft

import org.apache.spark.sql.functions._

import graft.io.Tables

/** Semantics tests for the q370–q373 wave: tolerance as-of replay,
  * window-funnel depth replay, business-day arithmetic vs java.time,
  * and the dictionary advisor's byte model.
  */
class Extension58Spec extends SparkSpec {

  private lazy val events: Array[(Long, Long, Long, String, Double)] =
    Tables.load(spark, sf0001, "events")
      .selectExpr("user_id", "unix_micros(cast(ts as timestamp))",
        "event_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))

  test("q370: every fill is within the 3-day tolerance and matches the " +
    "latest-in-window purchase replay") {
    val tolUs = 3L * 86400L * 1000000L
    val purchases = events.filter(_._4 == "purchase")
    val expected = events.filter(_._4 == "error").flatMap { e =>
      val inWin = purchases.filter(p =>
        p._1 == e._1 && p._2 <= e._2 && p._2 >= e._2 - tolUs)
      if (inWin.isEmpty) None
      else {
        val best = inWin.maxBy(p => (p._2, p._3))
        Some(e._3 -> ((best._2, inWin.length.toLong, best._3)))
      }
    }.toMap
    val got = SparkEntry.queries("q370_asof_tolerance")(spark, sf0001)
      .selectExpr("event_id", "unix_micros(cast(asof_time as timestamp))",
        "n_prior", "asof_event_id")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet == expected.keySet,
      s"fill set differs: ${got.keySet.diff(expected.keySet).take(3)} / " +
        s"${expected.keySet.diff(got.keySet).take(3)}")
    expected.foreach { case (id, e) =>
      assert(got(id) == e, s"error $id: got ${got(id)}, expected $e")
    }
    assert(got.nonEmpty)
  }

  test("q371: funnel depth histogram replays from an in-memory greedy " +
    "chain walk") {
    val h = 86400000000L
    val byUser = events.groupBy(_._1)
    val depths = byUser.map { case (_, es) =>
      val views = es.filter(_._4 == "view").map(_._2)
      val clicks = es.filter(_._4 == "click").map(_._2)
      val purch = es.filter(_._4 == "purchase").map(_._2)
      if (views.isEmpty) 0L
      else views.map { v =>
        val c1 = clicks.filter(c => c > v && c <= v + h)
        if (c1.isEmpty) 1L
        else {
          val c = c1.min
          if (purch.exists(p => p > c && p <= v + h)) 3L else 2L
        }
      }.max
    }.filter(_ > 0L)
    val expected = depths.groupBy(identity)
      .map { case (d, os) => d -> os.size.toLong }
    val got = SparkEntry.queries("q371_window_funnel")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, s"got $got, expected $expected")
  }

  test("q372: business-day counts replay against a literal java.time " +
    "weekday walk") {
    val li = Tables.load(spark, sf0001, "lineitem")
      .selectExpr("l_orderkey", "cast(l_shipdate as date)")
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val o = Tables.load(spark, sf0001, "orders")
      .selectExpr("o_orderkey", "cast(o_orderdate as date)",
        "o_orderpriority")
      .collect()
      .map(r => r.getLong(0) -> ((r.getDate(1).toLocalDate, r.getString(2))))
      .toMap
    val byPrio = li.flatMap { case (ok, ship) =>
      o.get(ok).flatMap { case (od, prio) =>
        if (ship.isBefore(od)) None
        else {
          var d = od.plusDays(1); var b = 0L
          while (!d.isAfter(ship)) {
            if (d.getDayOfWeek.getValue <= 5) b += 1
            d = d.plusDays(1)
          }
          Some(prio -> b)
        }
      }
    }.groupBy(_._1)
    val expected = byPrio.map { case (p, vs) =>
      p -> ((vs.length.toLong, vs.map(_._2).sum, vs.map(_._2).max))
    }
    val got = SparkEntry.queries("q372_business_days")(spark, sf0001)
      .collect()
    got.foreach { r =>
      val e = expected(r.getString(0))
      assert(r.getLong(1) == e._1)
      val avg = math.floor(e._2.toDouble / e._1.toDouble * 1e6 + 0.5) / 1e6
      assert(r.getDouble(2) == avg,
        s"${r.getString(0)}: avg ${r.getDouble(2)} != $avg")
      assert(r.getLong(3) == e._3)
    }
    assert(got.length == expected.size)
  }

  test("q373: dictionary byte model replays for p_brand and the ratio " +
    "is plain/dict") {
    val vs = Tables.load(spark, sf0001, "part")
      .select(col("p_brand")).collect().map(_.getString(0))
    val n = vs.length.toLong
    val dom = vs.groupBy(identity)
    val d = dom.size.toLong
    val plain = vs.map(_.length.toLong).sum
    val bits = java.lang.Long.toBinaryString(math.max(0L, d - 1)).length.toLong
    // NB: dom.keys is a Set — map(_.length) there would dedupe lengths
    val dict = dom.keys.iterator.map(_.length.toLong).sum +
      (n * bits + 7L) / 8L
    val row = SparkEntry.queries("q373_dictionary_audit")(spark, sf0001)
      .where(col("column") === "p_brand").head()
    assert(row.getLong(1) == n && row.getLong(2) == d)
    assert(row.getLong(3) == plain, s"plain ${row.getLong(3)} != $plain")
    assert(row.getLong(4) == dict, s"dict ${row.getLong(4)} != $dict")
    val ratio = math.floor(plain.toDouble / dict.toDouble * 1e6 + 0.5) / 1e6
    assert(row.getDouble(5) == ratio)
  }
}
