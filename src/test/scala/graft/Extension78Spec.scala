package graft

import org.apache.spark.sql.functions._

import graft.io.Tables

/** Semantics tests for the q450–q453 wave: duality replay, outlier
  * recount, shrinkage monotonicity, and the alpha closed form.
  */
class Extension78Spec extends SparkSpec {

  test("q450: the reported max-flow is the true minimum over all " +
    "enumerated cuts and respects both trivial bounds") {
    val rows = SparkEntry.queries("q450_mincut_maxflow")(spark, sf0001)
      .collect()
    val flow = rows.head.getLong(4)
    val segs = rows.filter(_.getString(1) == "segment")
    val pris = rows.filter(_.getString(1) == "priority")
    assert(segs.length == 5 && pris.length == 5)
    assert(flow <= segs.map(_.getLong(3)).sum)
    assert(flow <= pris.map(_.getLong(3)).sum)
    // naive re-enumeration
    val cnt = Tables.load(spark, sf0001, "orders")
      .join(Tables.load(spark, sf0001, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "o_orderpriority").count()
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val sNames = segs.map(_.getString(0)).sorted
    val pNames = pris.map(_.getString(0)).sorted
    val capS = sNames.map(g =>
      g -> cnt.filter(_._1._1 == g).values.sum * 7 / 10).toMap
    val capT = pNames.map(p =>
      p -> cnt.filter(_._1._2 == p).values.sum * 7 / 10).toMap
    val best = (0 until 1024).map { m =>
      var c = 0L
      sNames.zipWithIndex.foreach { case (g, i) =>
        if ((m & (1 << i)) == 0) c += capS(g) }
      pNames.zipWithIndex.foreach { case (p, j) =>
        if ((m & (1 << (5 + j))) != 0) c += capT(p) }
      sNames.zipWithIndex.foreach { case (g, i) =>
        pNames.zipWithIndex.foreach { case (p, j) =>
          if ((m & (1 << i)) != 0 && (m & (1 << (5 + j))) == 0)
            c += cnt.getOrElse((g, p), 0L) } }
      c
    }.min
    assert(flow == best, s"flow $flow vs naive min cut $best")
  }

  test("q451: the outlier set recounts naively and bounded-uniform " +
    "features keep d2 under 9") {
    val rows = SparkEntry.queries("q451_mahalanobis_outliers")(
      spark, sf0001).collect()
    assert(rows.nonEmpty, "threshold should select near-corner rows")
    rows.foreach(r => assert(r.getDouble(5) > 8.0
      && r.getDouble(5) < 9.01))
    // recount via Spark built-in covariances
    val li = Tables.load(spark, sf0001, "lineitem")
      .select(col("l_quantity").cast("double").as("x"),
        (col("l_discount") * 10000).as("y"),
        (col("l_tax") * 10000).as("z"))
    val st = li.agg(avg("x"), avg("y"), avg("z"),
      var_pop("x"), covar_pop("x", "y"), covar_pop("x", "z"),
      var_pop("y"), covar_pop("y", "z"), var_pop("z")).collect().head
    val (mx, my, mz) = (st.getDouble(0), st.getDouble(1), st.getDouble(2))
    val (a, b, c) = (st.getDouble(3), st.getDouble(4), st.getDouble(5))
    val (d, e, f) = (st.getDouble(6), st.getDouble(7), st.getDouble(8))
    val det = a * (d * f - e * e) - b * (b * f - e * c) +
      c * (b * e - d * c)
    val (i11, i12, i13) = ((d * f - e * e) / det, (c * e - b * f) / det,
      (b * e - c * d) / det)
    val (i22, i23, i33) = ((a * f - c * c) / det, (b * c - a * e) / det,
      (a * d - b * b) / det)
    val pts = li.collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    val recount = pts.count { case (x, yv, zv) =>
      val (vx, vy, vz) = (x - mx, yv - my, zv - mz)
      val d2 = vx * (i11 * vx + i12 * vy + i13 * vz) +
        vy * (i12 * vx + i22 * vy + i23 * vz) +
        vz * (i13 * vx + i23 * vy + i33 * vz)
      d2 > 8.0
    }
    assert(math.abs(recount - rows.length) <= 1,
      s"recount $recount vs ${rows.length}")
  }

  test("q452: lambda=0 reproduces OLS, shrinkage starts at 1 and " +
    "decreases monotonically") {
    val rows = SparkEntry.queries("q452_ridge_path")(spark, sf0001)
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).sortBy(_._1)
    assert(rows.head._1 == 0.0 && math.abs(rows.head._4 - 1.0) < 1e-6)
    assert(rows.toSeq.sliding(2).forall {
      case Seq(a, b) => b._4 <= a._4 + 1e-9
      case _ => true
    })
    // coefficient magnitudes shrink too
    assert(math.abs(rows.last._2) <= math.abs(rows.head._2) + 1e-9)
  }

  test("q453: alpha replays from naive per-user item counts") {
    val rows = SparkEntry.queries("q453_cronbach_alpha")(spark, sf0001)
      .collect()
    assert(rows.length == 5)
    val alpha = rows.head.getDouble(3)
    rows.foreach(r => assert(r.getDouble(3) == alpha))
    val per = Tables.load(spark, sf0001, "events")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val users = per.map(_._1).distinct
    val types = per.map(_._2).distinct.sorted
    val mat = users.map(u => types.map(t =>
      per.count(p => p._1 == u && p._2 == t).toDouble))
    def varP(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    val vis = types.indices.map(i => varP(mat.toSeq.map(_(i))))
    val vt = varP(mat.toSeq.map(_.sum))
    val naive = 5.0 / 4.0 * (1.0 - vis.sum / vt)
    assert(math.abs(alpha - naive) < 1e-4,
      s"alpha $alpha vs naive $naive")
    // per-item variances replay
    rows.foreach { r =>
      val i = types.indexOf(r.getString(0))
      assert(math.abs(r.getDouble(1) - vis(i)) < 1e-4)
    }
  }
}
