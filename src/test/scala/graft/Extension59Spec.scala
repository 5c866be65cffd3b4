package graft

import org.apache.spark.sql.functions._

import graft.io.Tables

/** Semantics tests for the q374–q377 wave: the hitting-time fixed
  * point, the join-size audit identity, the Theil decomposition
  * identity, and KMV's exact-regime behavior.
  */
class Extension59Spec extends SparkSpec {

  private lazy val events: Array[(Long, Long, Long, String)] =
    Tables.load(spark, sf0001, "events")
      .selectExpr("user_id", "unix_micros(cast(ts as timestamp))",
        "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  test("q374: the 60-iteration value is a near-fixed-point of " +
    "h = 1 + P·h computed from an independent transition replay") {
    val tr = events.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val o = es.sortBy(e => (e._2, e._3)).map(_._4)
      o.zip(o.drop(1))
    }
    val cnt = tr.groupBy(identity).map { case (k, os) => k -> os.length.toLong }
    val states = tr.flatMap(t => Seq(t._1, t._2)).distinct.sorted
    val nOut = states.map(si =>
      si -> states.map(sj => cnt.getOrElse((si, sj), 0L)).sum).toMap
    val rows = SparkEntry.queries("q374_markov_hitting_time")(
      spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(rows.keySet == states.toSet)
    assert(rows("purchase")._2 == 0.0)
    states.foreach(st => assert(rows(st)._1 == nOut(st), s"n_out $st"))
    states.filter(_ != "purchase").foreach { si =>
      val h = rows(si)._2
      assert(h > 1.0, s"$si expected steps must exceed 1")
      val rhs = 1.0 + states.map { sj =>
        val p = cnt.getOrElse((si, sj), 0L).toDouble / nOut(si).toDouble
        p * rows(sj)._2
      }.sum
      assert(math.abs(h - rhs) < 1e-3,
        s"$si not a fixed point: h=$h vs 1+Ph=$rhs")
    }
  }

  test("q375: exact totals replay and the head component has zero " +
    "estimation error") {
    val exact = events.groupBy(_._1).values
      .map(es => es.length.toLong).map(n => n * n).sum
    val rows = SparkEntry.queries("q375_join_size_estimate")(spark, sf0001)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(rows("total")._1 == exact,
      s"exact pairs ${rows("total")._1} != replay $exact")
    assert(rows("head")._1 == rows("head")._2 && rows("head")._3 == 0.0)
    assert(rows("head")._1 + rows("tail")._1 == rows("total")._1)
    assert(rows("head")._2 + rows("tail")._2 == rows("total")._2)
  }

  test("q376: Theil additivity — total = between + Σ weight·within " +
    "to grid precision, and weights sum to 1") {
    val rows = SparkEntry.queries("q376_theil_decomposition")(
      spark, sf0001).collect()
    assert(rows.nonEmpty)
    val total = rows.head.getDouble(6)
    val between = rows.head.getDouble(5)
    assert(rows.forall(r =>
      r.getDouble(6) == total && r.getDouble(5) == between))
    val within = rows.map(r => r.getDouble(4) * r.getDouble(3)).sum
    assert(math.abs(total - (between + within)) < 1e-3,
      s"additivity: total $total vs between $between + within $within")
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-5)
    assert(total >= 0.0 && between >= 0.0)
  }

  test("q377: KMV holds small groups exactly (sf0.001 regime) and " +
    "exact counts replay") {
    val byType = events.map(e => (e._4, e._1)).distinct
      .groupBy(_._1).map { case (t, es) => t -> es.length.toLong }
    val rows = SparkEntry.queries("q377_kmv_distinct")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getString(0)
      assert(r.getLong(1) == byType(t), s"exact for $t")
      if (byType(t) <= 32L) {
        assert(r.getDouble(2) == byType(t).toDouble,
          s"$t in exact regime must report exactly")
        assert(r.getDouble(3) == 0.0)
      }
    }
  }
}
