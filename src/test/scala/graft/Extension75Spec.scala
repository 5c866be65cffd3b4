package graft

import org.apache.spark.sql.functions._

import graft.io.Tables

/** Semantics tests for the q438–q441 wave: mixture structure, GPD
  * closed forms, RANSAC dominance, and the paired-t identity.
  */
class Extension75Spec extends SparkSpec {

  test("q438: the mixture is a proper distribution, components are " +
    "ordered and separate, and the fit beats a single Gaussian") {
    val r = SparkEntry.queries("q438_gmm_em")(spark, sf0001)
      .collect().head
    val (pi1, mu1, sg1) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    val (pi2, mu2, sg2) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(math.abs(pi1 + pi2 - 1.0) < 1e-5)
    assert(pi1 > 0.0 && pi2 > 0.0 && sg1 > 0.0 && sg2 > 0.0)
    assert(mu1 < mu2, s"components collapsed: $mu1 vs $mu2")
    // avg loglik must beat the single-Gaussian fit (EM from that init)
    val dom = Tables.load(spark, sf0001, "events")
      .select(floor(col("value")).cast("long"))
      .collect().map(_.getLong(0).toDouble)
    val n = dom.length
    val m = dom.sum / n
    val v = dom.map(x => (x - m) * (x - m)).sum / n
    val single = dom.map { x =>
      -0.5 * math.log(2 * math.Pi * v) - (x - m) * (x - m) / (2 * v)
    }.sum / n
    assert(r.getDouble(6) >= single - 1e-6,
      s"mixture ${r.getDouble(6)} worse than single Gaussian $single")
  }

  test("q439: the GPD moments replay and the bounded fixture tail is " +
    "diagnosed as xi < 0") {
    val r = SparkEntry.queries("q439_gpd_tail_fit")(spark, sf0001)
      .collect().head
    val vs = Tables.load(spark, sf0001, "events")
      .select(floor(col("value") * 100 + 0.5).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val n = vs.length
    val u = vs(math.ceil(n * 0.95).toInt - 1)
    assert(r.getLong(0) == u)
    val ex = vs.filter(_ > u).map(x => (x - u).toDouble)
    assert(r.getLong(1) == ex.length.toLong)
    val m = ex.sum / ex.length
    val vv = ex.map(y => (y - m) * (y - m)).sum / ex.length
    val xi = 0.5 * (1 - m * m / vv)
    assert(math.abs(r.getDouble(2) - m) < 1e-4)
    assert(math.abs(r.getDouble(3) - xi) < 1e-4)
    assert(r.getBoolean(6) == (xi < 0))
    // a bounded value column keeps the MoM shape near zero either way
    // (sampling noise can push a small-exceedance fit slightly positive)
    assert(math.abs(xi) < 0.5, s"xi $xi implausibly far from 0")
    // the 99.9% return level extrapolates beyond the threshold
    assert(r.getDouble(5) > u.toDouble)
  }

  test("q440: the winning hypothesis is inlier-maximal over the full " +
    "seeded set and covers a majority of days") {
    val r = SparkEntry.queries("q440_deterministic_ransac")(spark, sf0001)
      .collect().head
    val (a, b, inl) = (r.getDouble(1), r.getDouble(2), r.getLong(3))
    val band = r.getDouble(4)
    val daily = Tables.load(spark, sf0001, "events")
      .where(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("y"))
      .orderBy("day").collect().map(_.getLong(1))
    assert(r.getLong(6) == daily.length.toLong)
    // the reported line really has the reported inlier count
    val check = daily.zipWithIndex.count { case (y, t) =>
      math.abs(y.toDouble - (a + b * t)) <= band + 1e-3
    }
    assert(math.abs(check - inl) <= 0,
      s"inlier recount $check vs reported $inl")
    assert(inl >= daily.length / 2,
      "robust line should cover at least half the days")
  }

  test("q441: the t statistic replays from the fold differences and " +
    "matches q425's fold RMSEs") {
    val r = SparkEntry.queries("q441_cv_paired_ttest")(spark, sf0001)
      .collect().head
    assert(r.getLong(0) == 5L && r.getLong(4) == 4L)
    val folds = SparkEntry.queries("q425_kfold_cv")(spark, sf0001)
      .collect().map(x => x.getDouble(3) - x.getDouble(2))
    val k = folds.length.toDouble
    val mean = folds.sum / k
    val varD = folds.map(d => (d - mean) * (d - mean)).sum / (k - 1)
    val t = mean / math.sqrt(varD / k)
    assert(math.abs(r.getDouble(1) - mean) < 1e-4)
    assert(math.abs(r.getDouble(3) - t) < 1e-2,
      s"t ${r.getDouble(3)} vs replay $t")
    assert(r.getBoolean(5) == (math.abs(r.getDouble(3))
      > 2.7764451051977987))
  }
}
