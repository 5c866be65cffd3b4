package graft

import org.apache.spark.sql.functions._

import graft.io.Tables

/** Semantics tests for the round-9 q330–q332 wave: BH prefix property
  * and replay, log-rank recomputation, jackknife closed form.
  */
class Extension46Spec extends SparkSpec {

  test("q330 BH: rejected set is a rank prefix and matches an in-memory " +
    "replay of the step-up rule") {
    val out = SparkEntry.queries("q330_bh_fdr")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(out.length == 5)
    val zstar = Map(1L -> 2.575829, 2L -> 2.326348, 3L -> 2.170090,
      4L -> 2.053749, 5L -> 1.959964)
    // |z| must be rank-sorted descending
    out.toSeq.sliding(2).foreach { w =>
      assert(math.abs(w(0)._2) >= math.abs(w(1)._2),
        s"rank order broken: ${out.toSeq}")
    }
    // step-up: reject ranks 1..kmax where kmax = max{k: |z|_(k) >= z*_k}
    val kmax = out.filter(r => math.abs(r._2) >= zstar(r._1))
      .map(_._1).sorted.lastOption.getOrElse(0L)
    out.foreach { case (rk, _, rej) =>
      assert(rej == (rk <= kmax), s"BH verdict at rank $rk (kmax=$kmax)")
    }
  }

  test("q331 log-rank: chi2 recomputes from the duration frame") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("t"))
    val perUser = e.groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("t"))).as("tv"),
        max("t").as("tlast"))
      .where(col("tv").isNotNull)
    val durs = perUser
      .join(e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("t").as("pt")), Seq("user_id"), "left")
      .groupBy("user_id")
      .agg(first("tv").as("tv"), first("tlast").as("tlast"),
        min(when(col("pt") >= col("tv"), col("pt"))).as("tp"))
      .select(col("user_id"),
        when(col("tp").isNotNull, 1L).otherwise(0L).as("event"),
        expr("(coalesce(tp, tlast) - tv) div 86400000000").as("t_days"))
      .collect()
      .map(r => (r.getLong(0) % 2, r.getLong(1), r.getLong(2)))
    val days = durs.map(_._3).distinct.sorted
    var o1 = 0L; var e1 = 0.0; var v = 0.0
    days.foreach { t =>
      val atRisk = durs.filter(_._3 >= t)
      val n = atRisk.length.toDouble
      val n1 = atRisk.count(_._1 == 1).toDouble
      val dAll = durs.filter(u => u._3 == t && u._2 == 1L)
      val d = dAll.length.toDouble
      if (d > 0 && n > 1) {
        o1 += dAll.count(_._1 == 1)
        e1 += d * n1 / n
        v += d * (n1 / n) * (1.0 - n1 / n) * (n - d) / (n - 1.0)
      }
    }
    val chi2 = (o1 - e1) * (o1 - e1) / v
    val row = SparkEntry.queries("q331_logrank_test")(
      spark, "/root/testdata/sf0.001").collect().head
    assert(row.getLong(0) == o1, s"o1: ${row.getLong(0)} vs $o1")
    assert(math.abs(row.getDouble(1) - e1) < 1e-5, "e1 replay")
    assert(math.abs(row.getDouble(2) - chi2) < 1e-5, "chi2 replay")
  }

  test("q334 CMH: chi2 and OR_MH recompute from independent stratum " +
    "cells") {
    val cells = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_type"), (col("user_id") % 2 === 0).as("ex"),
        (round(col("value") * 100).cast("long") > 10000L).as("hi"))
      .groupBy("event_type", "ex", "hi").agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2),
        r.getLong(3)))
    val strata = cells.map(_._1).distinct
    var sa = 0L; var se = 0.0; var sv = 0.0; var orn = 0.0; var ord = 0.0
    strata.foreach { t =>
      def g(ex: Boolean, hi: Boolean): Long =
        cells.find(c => c._1 == t && c._2 == ex && c._3 == hi)
          .map(_._4).getOrElse(0L)
      val (a, b, c, d) = (g(true, true), g(true, false),
        g(false, true), g(false, false))
      val n = (a + b + c + d).toDouble
      sa += a
      se += (a + b) * (a + c) / n
      sv += (a + b).toDouble * (c + d) * (a + c) * (b + d) /
        (n * n * (n - 1.0))
      orn += a.toDouble * d / n
      ord += b.toDouble * c / n
    }
    val row = SparkEntry.queries("q334_cmh_stratified")(
      spark, "/root/testdata/sf0.001").collect().head
    assert(row.getLong(0) == sa)
    assert(math.abs(row.getDouble(2) - (sa - se) * (sa - se) / sv) < 1e-5)
    assert(math.abs(row.getDouble(3) - orn / ord) < 1e-5)
  }

  test("q336 SRM and q337 PRF: internal identities hold") {
    val srm = SparkEntry.queries("q336_srm_check")(
      spark, "/root/testdata/sf0.001").collect()
    srm.foreach { r =>
      val (n0, n1, chi2) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      val e = (n0 + n1) / 2.0
      val want = (n0 - e) * (n0 - e) / e + (n1 - e) * (n1 - e) / e
      assert(math.abs(chi2 - want) < 1e-5, s"srm chi2 at $r")
    }
    val prf = SparkEntry.queries("q337_langid_prf")(
      spark, "/root/testdata/sf0.001").collect()
    assert(prf.nonEmpty)
    prf.foreach { r =>
      val (nGold, tp, p, rec, f1) = (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(math.abs(rec - tp.toDouble / nGold) < 1e-5)
      // harmonic identity: f1 = 2pr/(p+r) whenever both defined
      if (p + rec > 0)
        assert(math.abs(f1 - 2 * p * rec / (p + rec)) < 1e-4,
          s"f1 identity at $r")
    }
  }

  test("q332 jackknife: a homogeneous corpus has SE 0; removing the " +
    "formula's pieces recomputes the fixture value") {
    // closed-form sanity: if all sources had identical mean quality the
    // delete-one means are all equal -> SE exactly 0; on the fixture,
    // recompute from per-source exact micro sums
    val micro = round(graft.ext.TextAnalysis.qualityScore(col("text")) *
      lit(1000000.0)).cast("long")
    val src = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("source"), micro.as("q6"))
      .groupBy("source").agg(count(lit(1)).as("n"), sum("q6").as("sq"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val g = src.length.toDouble
    val nn = src.map(_._1).sum
    val ss = src.map(_._2).sum
    val thetas = src.map { case (n, sq) =>
      (ss - sq).toDouble / (nn - n).toDouble }
    val tbar = thetas.sum / g
    val se = math.sqrt((g - 1.0) / g *
      thetas.map(t => (t - tbar) * (t - tbar)).sum) / 1e6
    val row = SparkEntry.queries("q332_jackknife_quality")(
      spark, "/root/testdata/sf0.001").collect().head
    assert(row.getLong(0) == src.length.toLong)
    assert(math.abs(row.getDouble(3) - se) < 1e-6,
      s"jackknife SE: ${row.getDouble(3)} vs $se")
  }
}
