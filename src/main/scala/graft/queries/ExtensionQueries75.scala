package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.{PolyHash, Rounding}
import graft.io.Tables
import DriverSide._

/** Round-9 thirty-third wave: Gaussian-mixture EM (q438), generalized
  * Pareto tail fitting (q439), deterministic RANSAC line fitting
  * (q440), and the cross-validated paired t-test (q441).
  */
object ExtensionQueries75 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q438: 2-component Gaussian mixture by EM over the dollar VALUE
    // DOMAIN — mixture-model fitting as a first-class operator: 15
    // E/M iterations where the E-step responsibilities are closed-form
    // per (value, count) row and every M-step sufficient statistic
    // snaps to the 1e-9 LONG grid BEFORE summation (so the parameter
    // trajectory is bit-identical in both engines despite exp() being
    // a libm call), parameters snapped per iteration. Deterministic
    // init: μ at the exact p25/p75 order statistics, shared σ from the
    // exact moment sums, π = ½. The oracle unrolls the 15 steps as
    // MATERIALIZED CTEs (the q431/q437 discipline). Scale: the corpus
    // collapses to the ≤ ~561-row domain in one aggregation; EM cost
    // is domain-sized, corpus-independent.
    Q(
      "q438_gmm_em",
      (s, dir) => {
        val dom = Tables.load(s, dir, "events")
          .groupBy(floor(col("value")).cast("long").as("d"))
          .agg(count(lit(1)).as("c"))
          .orderBy("d")
          .collectBounded("value-domain histogram")
          .map(r => (r.getLong(0), r.getLong(1)))
        val n = dom.map(_._2).sum
        def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
        def orderStat(rank: Long): Long = {
          var cum = 0L
          dom.find { case (_, c) => cum += c; cum >= rank }.get._1
        }
        val s1 = dom.map(x => x._1 * x._2).sum
        val s2 = dom.map(x => x._1 * x._1 * x._2).sum
        val varAll = s2.toDouble / n - (s1.toDouble / n) * (s1.toDouble / n)
        var mu1 = orderStat((n + 3) / 4).toDouble
        var mu2 = orderStat(3 * n / 4).toDouble
        var sg1 = snap9(math.sqrt(varAll))
        var sg2 = sg1
        var pi2 = 0.5
        for (_ <- 1 to 15) {
          var tw = 0L; var twd = 0L; var twd2 = 0L
          var uw = 0L; var uwd = 0L; var uwd2 = 0L
          dom.foreach { case (d, c) =>
            val dd = d.toDouble
            val f1 = math.exp(-(dd - mu1) * (dd - mu1)
              / (2.0 * sg1 * sg1)) / sg1
            val f2 = math.exp(-(dd - mu2) * (dd - mu2)
              / (2.0 * sg2 * sg2)) / sg2
            val r2 = pi2 * f2 / ((1.0 - pi2) * f1 + pi2 * f2)
            tw += math.floor(c * r2 * 1e9 + 0.5).toLong
            twd += math.floor(c * r2 * dd * 1e6 + 0.5).toLong
            twd2 += math.floor(c * r2 * dd * dd * 1e3 + 0.5).toLong
            val r1 = 1.0 - r2
            uw += math.floor(c * r1 * 1e9 + 0.5).toLong
            uwd += math.floor(c * r1 * dd * 1e6 + 0.5).toLong
            uwd2 += math.floor(c * r1 * dd * dd * 1e3 + 0.5).toLong
          }
          pi2 = snap9(tw.toDouble / 1e9 / n)
          mu2 = snap9(twd.toDouble / 1e6 / (tw.toDouble / 1e9))
          sg2 = snap9(math.sqrt(twd2.toDouble / 1e3
            / (tw.toDouble / 1e9) - mu2 * mu2))
          mu1 = snap9(uwd.toDouble / 1e6 / (uw.toDouble / 1e9))
          sg1 = snap9(math.sqrt(uwd2.toDouble / 1e3
            / (uw.toDouble / 1e9) - mu1 * mu1))
        }
        val c0 = 2.5066282746310002 // sqrt(2*pi)
        val ll9 = dom.map { case (d, c) =>
          val dd = d.toDouble
          val f1 = math.exp(-(dd - mu1) * (dd - mu1)
            / (2.0 * sg1 * sg1)) / (sg1 * c0)
          val f2 = math.exp(-(dd - mu2) * (dd - mu2)
            / (2.0 * sg2 * sg2)) / (sg2 * c0)
          math.floor(c * math.log((1.0 - pi2) * f1 + pi2 * f2)
            * 1e6 + 0.5).toLong
        }.sum
        import s.implicits._
        Seq((
          math.floor((1.0 - pi2) * 1e6 + 0.5) / 1e6,
          math.floor(mu1 * 1e6 + 0.5) / 1e6,
          math.floor(sg1 * 1e6 + 0.5) / 1e6,
          math.floor(pi2 * 1e6 + 0.5) / 1e6,
          math.floor(mu2 * 1e6 + 0.5) / 1e6,
          math.floor(sg2 * 1e6 + 0.5) / 1e6,
          math.floor(ll9.toDouble / 1e6 / n * 1e6 + 0.5) / 1e6))
          .toDF("pi1", "mu1_dollars", "sigma1", "pi2", "mu2_dollars",
            "sigma2", "avg_loglik")
      },
      Some {
        def step(i: Int): String = {
          val prev = if (i == 1) "p0" else s"p${i - 1}"
          s"""r$i AS MATERIALIZED (
             |  SELECT d, c,
             |    p.pi2 * (exp(-(d::DOUBLE - p.mu2) * (d::DOUBLE - p.mu2)
             |      / (2.0 * p.sg2 * p.sg2)) / p.sg2)
             |    / ((1.0 - p.pi2) * (exp(-(d::DOUBLE - p.mu1)
             |        * (d::DOUBLE - p.mu1) / (2.0 * p.sg1 * p.sg1))
             |        / p.sg1)
             |      + p.pi2 * (exp(-(d::DOUBLE - p.mu2)
             |        * (d::DOUBLE - p.mu2) / (2.0 * p.sg2 * p.sg2))
             |        / p.sg2)) AS r2
             |  FROM dom CROSS JOIN $prev p),
             |a$i AS MATERIALIZED (
             |  SELECT
             |    CAST(sum(CAST(floor(c * r2 * 1000000000 + 0.5)
             |      AS BIGINT)) AS BIGINT) AS tw,
             |    CAST(sum(CAST(floor(c * r2 * d::DOUBLE * 1000000 + 0.5)
             |      AS BIGINT)) AS BIGINT) AS twd,
             |    CAST(sum(CAST(floor(c * r2 * d::DOUBLE * d::DOUBLE
             |      * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS twd2,
             |    CAST(sum(CAST(floor(c * (1.0 - r2) * 1000000000 + 0.5)
             |      AS BIGINT)) AS BIGINT) AS uw,
             |    CAST(sum(CAST(floor(c * (1.0 - r2) * d::DOUBLE
             |      * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS uwd,
             |    CAST(sum(CAST(floor(c * (1.0 - r2) * d::DOUBLE
             |      * d::DOUBLE * 1000 + 0.5) AS BIGINT)) AS BIGINT)
             |      AS uwd2
             |  FROM r$i),
             |p$i AS MATERIALIZED (
             |  SELECT
             |    floor(tw::DOUBLE / 1000000000 / nn.n::DOUBLE
             |      * 1000000000 + 0.5) / 1000000000 AS pi2,
             |    floor(twd::DOUBLE / 1000000
             |      / (tw::DOUBLE / 1000000000) * 1000000000 + 0.5)
             |      / 1000000000 AS mu2,
             |    floor(sqrt(twd2::DOUBLE / 1000
             |      / (tw::DOUBLE / 1000000000)
             |      - (floor(twd::DOUBLE / 1000000
             |        / (tw::DOUBLE / 1000000000) * 1000000000 + 0.5)
             |        / 1000000000)
             |      * (floor(twd::DOUBLE / 1000000
             |        / (tw::DOUBLE / 1000000000) * 1000000000 + 0.5)
             |        / 1000000000)) * 1000000000 + 0.5) / 1000000000
             |      AS sg2,
             |    floor(uwd::DOUBLE / 1000000
             |      / (uw::DOUBLE / 1000000000) * 1000000000 + 0.5)
             |      / 1000000000 AS mu1,
             |    floor(sqrt(uwd2::DOUBLE / 1000
             |      / (uw::DOUBLE / 1000000000)
             |      - (floor(uwd::DOUBLE / 1000000
             |        / (uw::DOUBLE / 1000000000) * 1000000000 + 0.5)
             |        / 1000000000)
             |      * (floor(uwd::DOUBLE / 1000000
             |        / (uw::DOUBLE / 1000000000) * 1000000000 + 0.5)
             |        / 1000000000)) * 1000000000 + 0.5) / 1000000000
             |      AS sg1
             |  FROM a$i CROSS JOIN nn)""".stripMargin
        }
        val steps = (1 to 15).map(step).mkString(",\n")
        s"""WITH dom AS MATERIALIZED (
           |  SELECT CAST(floor(value) AS BIGINT) AS d,
           |    CAST(count(*) AS BIGINT) AS c
           |  FROM events GROUP BY 1),
           |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n,
           |  CAST(sum(c * d) AS BIGINT) AS s1,
           |  CAST(sum(c * d * d) AS BIGINT) AS s2 FROM dom),
           |cum AS (
           |  SELECT d, sum(c) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
           |    AS cm
           |  FROM dom),
           |p0 AS MATERIALIZED (
           |  SELECT
           |    (SELECT min(d)::DOUBLE FROM cum CROSS JOIN nn
           |     WHERE cm >= (n + 3) // 4) AS mu1,
           |    (SELECT min(d)::DOUBLE FROM cum CROSS JOIN nn
           |     WHERE cm >= 3 * n // 4) AS mu2,
           |    floor(sqrt(s2::DOUBLE / n::DOUBLE
           |      - (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE))
           |      * 1000000000 + 0.5) / 1000000000 AS sg1,
           |    floor(sqrt(s2::DOUBLE / n::DOUBLE
           |      - (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE))
           |      * 1000000000 + 0.5) / 1000000000 AS sg2,
           |    0.5::DOUBLE AS pi2
           |  FROM nn),
           |$steps,
           |ll AS (
           |  SELECT CAST(sum(CAST(floor(c * ln(
           |    (1.0 - p.pi2) * (exp(-(d::DOUBLE - p.mu1)
           |      * (d::DOUBLE - p.mu1) / (2.0 * p.sg1 * p.sg1))
           |      / (p.sg1 * 2.5066282746310002))
           |    + p.pi2 * (exp(-(d::DOUBLE - p.mu2)
           |      * (d::DOUBLE - p.mu2) / (2.0 * p.sg2 * p.sg2))
           |      / (p.sg2 * 2.5066282746310002))) * 1000000 + 0.5)
           |    AS BIGINT)) AS BIGINT) AS l9
           |  FROM dom CROSS JOIN p15 p)
           |SELECT
           |  floor((1.0 - p.pi2) * 1000000 + 0.5) / 1000000 AS pi1,
           |  floor(p.mu1 * 1000000 + 0.5) / 1000000 AS mu1_dollars,
           |  floor(p.sg1 * 1000000 + 0.5) / 1000000 AS sigma1,
           |  floor(p.pi2 * 1000000 + 0.5) / 1000000 AS pi2,
           |  floor(p.mu2 * 1000000 + 0.5) / 1000000 AS mu2_dollars,
           |  floor(p.sg2 * 1000000 + 0.5) / 1000000 AS sigma2,
           |  floor(ll.l9::DOUBLE / 1000000 / nn.n::DOUBLE
           |    * 1000000 + 0.5) / 1000000 AS avg_loglik
           |FROM p15 p CROSS JOIN ll CROSS JOIN nn""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q439: generalized Pareto tail fit (peaks-over-threshold) — the
    // extreme-value companion to q262's Hill index: exceedances of the
    // event-value cents over the exact p95 order statistic, GPD
    // method-of-moments ξ = ½(1 − m²/v), σ = ½m(m²/v + 1), and the
    // 99.9% return level u + σ/ξ·((n_u/(n·0.001))^ξ − 1). Exceedances
    // are exact LONGs so m/v come from exact sums; the one pow() is
    // written exp(ξ·ln(·)) identically in both engines. The bounded
    // fixture keeps ξ near zero (negative at sf0.01's exceedance count;
    // small-sample noise can push a ~50-exceedance fit slightly
    // positive) — the bounded_tail verdict column reports the sign.
    Q(
      "q439_gpd_tail_fit",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select(floor(col("value") * 100 + 0.5).cast("long").as("v"))
        val dom = e.groupBy("v").agg(count(lit(1)).as("c"))
          .withColumn("cum", sum("c").over(
            org.apache.spark.sql.expressions.Window.orderBy("v")
              .rowsBetween(org.apache.spark.sql.expressions.Window
                .unboundedPreceding, 0)))
        val nT = e.agg(count(lit(1)).as("n"),
          expr("CAST(ceil(count(1) * 0.95) AS BIGINT)").as("r95"))
        val u = dom.crossJoin(broadcast(nT))
          .where(col("cum") >= col("r95"))
          .agg(min("v").as("u"), first("n").as("n"))
        val ex = e.crossJoin(broadcast(u))
          .where(col("v") > col("u"))
          .select((col("v") - col("u")).as("y"), col("u"), col("n"))
        val g = ex.groupBy("u", "n").agg(count(lit(1)).as("n_u"),
            sum("y").as("sy"),
            sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"))
          .withColumn("m", col("sy").cast("double") / col("n_u").cast("double"))
          .withColumn("vv", col("syy").cast("double")
            / col("n_u").cast("double") - col("m") * col("m"))
          .withColumn("xi", lit(0.5) * (lit(1.0)
            - col("m") * col("m") / col("vv")))
          .withColumn("sg", lit(0.5) * col("m")
            * (col("m") * col("m") / col("vv") + 1.0))
          .withColumn("rl", col("u").cast("double") + col("sg") / col("xi")
            * (exp(col("xi") * log(col("n_u").cast("double")
              / (col("n").cast("double") * 0.001))) - 1.0))
        g.select(col("u").as("threshold_cents"), col("n_u").as("n_exceed"),
          Rounding.stableRound6(col("m")).as("mean_excess"),
          Rounding.stableRound6(col("xi")).as("xi_shape"),
          Rounding.stableRound6(col("sg")).as("sigma_scale"),
          Rounding.stableRound6(col("rl")).as("return_level_999"),
          (col("xi") < 0.0).as("bounded_tail"))
      },
      Some(s"""WITH e AS (
             |  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
             |  FROM events),
             |nt AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |  CAST(ceil(count(*) * 0.95) AS BIGINT) AS r95 FROM e),
             |dom AS (
             |  SELECT v, sum(count(*)) OVER (ORDER BY v
             |    ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM e GROUP BY v),
             |u AS (
             |  SELECT CAST(min(v) AS BIGINT) AS u, any_value(n) AS n
             |  FROM dom CROSS JOIN nt WHERE cum >= r95),
             |ex AS (
             |  SELECT e.v - u.u AS y, u.u, u.n
             |  FROM e CROSS JOIN u WHERE e.v > u.u),
             |g AS (
             |  SELECT u, n, CAST(count(*) AS BIGINT) AS n_u,
             |    CAST(sum(y) AS BIGINT) AS sy, sum(y * y) AS syy
             |  FROM ex GROUP BY u, n),
             |st AS (
             |  SELECT *, sy::DOUBLE / n_u::DOUBLE AS m,
             |    syy::DOUBLE / n_u::DOUBLE
             |      - (sy::DOUBLE / n_u::DOUBLE) * (sy::DOUBLE / n_u::DOUBLE)
             |      AS vv
             |  FROM g),
             |fit AS (
             |  SELECT *,
             |    0.5 * (1.0 - m * m / vv) AS xi,
             |    0.5 * m * (m * m / vv + 1.0) AS sg
             |  FROM st)
             |SELECT u AS threshold_cents, n_u AS n_exceed,
             |  ${Rounding.duckSql("m")} AS mean_excess,
             |  ${Rounding.duckSql("xi")} AS xi_shape,
             |  ${Rounding.duckSql("sg")} AS sigma_scale,
             |  ${Rounding.duckSql(
                  "u::DOUBLE + sg / xi * (exp(xi * ln(n_u::DOUBLE " +
                    "/ (n::DOUBLE * 0.001))) - 1.0)")}
             |    AS return_level_999,
             |  xi < 0.0 AS bounded_tail
             |FROM fit""".stripMargin)),

    // ------------------------------------------------------------------
    // q440: DETERMINISTIC RANSAC — robust line fitting where the
    // "random" minimal sets are PolyHash-seeded (64 seeds, two distinct
    // day indices each), so both engines evaluate the identical
    // hypothesis set: score = inliers within a 2·MAD band, winner by
    // (max inliers, min seed). Contrast column: the OLS slope, which
    // outliers can drag. Everything runs on the 30-row day frame
    // crossed with 64 seeds — 1,920 hypothesis evaluations at any
    // corpus size.
    Q(
      "q440_deterministic_ransac",
      (s, dir) => {
        val daily = Tables.load(s, dir, "events")
          .where(col("event_type") === "purchase")
          .groupBy(to_date(col("ts")).as("day"))
          .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("y"))
          .orderBy("day")
          .collectBounded("daily series").map(_.getLong(1))
        val nD = daily.length
        // robust band: 2 * median(|y - median(y)|)
        val med = daily.sorted.apply((nD + 1) / 2 - 1)
        val devs = daily.map(y => math.abs(y - med)).sorted
        val mad = devs((nD + 1) / 2 - 1)
        val band = 2.0 * mad
        def pick(seed: Int, slot: Int, m: Int): Int =
          (((PolyHash.hash(s"ransac#$seed#$slot")
            * PolyHash.hash(s"ransac#$seed#$slot")) % PolyHash.Mod)
            % m).toInt
        val hyps = (0 until 64).map { seed =>
          val i = pick(seed, 1, nD)
          val j0 = pick(seed, 2, nD - 1)
          val j = if (j0 >= i) j0 + 1 else j0
          val b = (daily(j) - daily(i)).toDouble / (j - i).toDouble
          val a = daily(i).toDouble - b * i.toDouble
          val inl = daily.zipWithIndex.count { case (y, t) =>
            math.abs(y.toDouble - (a + b * t)) <= band
          }
          (seed.toLong, a, b, inl.toLong)
        }
        val best = hyps.maxBy(h => (h._4, -h._1))
        // OLS contrast
        val mt = (nD - 1).toDouble / 2.0
        val my = daily.map(_.toDouble).sum / nD
        val b1 = daily.zipWithIndex.map { case (y, t) =>
          (t - mt) * (y - my) }.sum /
          daily.indices.map(t => (t - mt) * (t - mt)).sum
        import s.implicits._
        Seq((best._1, math.floor(best._2 * 1e6 + 0.5) / 1e6,
          math.floor(best._3 * 1e6 + 0.5) / 1e6, best._4,
          band, math.floor(b1 * 1e6 + 0.5) / 1e6, nD.toLong))
          .toDF("best_seed", "intercept_cents", "slope_cents_per_day",
            "n_inliers", "band_cents", "ols_slope", "n_days")
      },
      Some {
        val h1 = PolyHash.duckSql(
          "'ransac#' || s.seed::VARCHAR || '#1'")
        val h2 = PolyHash.duckSql(
          "'ransac#' || s.seed::VARCHAR || '#2'")
        s"""WITH daily AS (
           |  SELECT CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
           |      AS BIGINT) AS y,
           |    row_number() OVER (ORDER BY CAST(ts AS DATE)) - 1 AS t
           |  FROM events WHERE event_type = 'purchase'
           |  GROUP BY CAST(ts AS DATE)),
           |nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
           |med AS (
           |  SELECT y AS med FROM (
           |    SELECT y, row_number() OVER (ORDER BY y) AS rn
           |    FROM daily) CROSS JOIN nd
           |  WHERE rn = (n + 1) // 2),
           |mad AS (
           |  SELECT dev AS mad FROM (
           |    SELECT abs(y - med) AS dev,
           |      row_number() OVER (ORDER BY abs(y - med)) AS rn
           |    FROM daily CROSS JOIN med) CROSS JOIN nd
           |  WHERE rn = (n + 1) // 2),
           |seeds AS (SELECT CAST(unnest(range(64)) AS BIGINT) AS seed),
           |picks AS (
           |  SELECT s.seed,
           |    $h1 * $h1 % ${PolyHash.Mod} % nd.n AS i,
           |    $h2 * $h2 % ${PolyHash.Mod} % (nd.n - 1) AS j0
           |  FROM seeds s CROSS JOIN nd),
           |hyp AS (
           |  SELECT seed, i,
           |    CASE WHEN j0 >= i THEN j0 + 1 ELSE j0 END AS j
           |  FROM picks),
           |lines AS (
           |  SELECT hyp.seed,
           |    (dj.y - di.y)::DOUBLE / (hyp.j - hyp.i)::DOUBLE AS b,
           |    di.y::DOUBLE - ((dj.y - di.y)::DOUBLE
           |      / (hyp.j - hyp.i)::DOUBLE) * hyp.i::DOUBLE AS a
           |  FROM hyp
           |  JOIN daily di ON di.t = hyp.i
           |  JOIN daily dj ON dj.t = hyp.j),
           |scored AS (
           |  SELECT l.seed, l.a, l.b,
           |    CAST(sum(CASE WHEN abs(d.y::DOUBLE - (l.a + l.b
           |      * d.t::DOUBLE)) <= 2.0 * mad.mad THEN 1 ELSE 0 END)
           |      AS BIGINT) AS inl
           |  FROM lines l CROSS JOIN daily d CROSS JOIN mad
           |  GROUP BY l.seed, l.a, l.b),
           |best AS (
           |  SELECT * FROM scored
           |  ORDER BY inl DESC, seed LIMIT 1),
           |ols AS (
           |  SELECT sum((t::DOUBLE - mt) * (y::DOUBLE - my))
           |    / sum((t::DOUBLE - mt) * (t::DOUBLE - mt)) AS b1
           |  FROM daily CROSS JOIN (
           |    SELECT (max(t))::DOUBLE / 2.0 AS mt,
           |      sum(y)::DOUBLE / count(*) AS my
           |    FROM daily))
           |SELECT best.seed AS best_seed,
           |  floor(best.a * 1000000 + 0.5) / 1000000 AS intercept_cents,
           |  floor(best.b * 1000000 + 0.5) / 1000000
           |    AS slope_cents_per_day,
           |  best.inl AS n_inliers,
           |  (2.0 * mad.mad)::DOUBLE AS band_cents,
           |  floor(ols.b1 * 1000000 + 0.5) / 1000000 AS ols_slope,
           |  nd.n AS n_days
           |FROM best CROSS JOIN mad CROSS JOIN ols CROSS JOIN nd""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q441: cross-validated paired t-test — does the per-priority mean
    // model SIGNIFICANTLY beat the pooled mean, or is q425's skill
    // noise? The five paired fold-RMSE differences (same leakage-safe
    // fold construction and exact decimal residual squares as q425)
    // feed a paired t with df = k−1 = 4. On this fixture the priorities
    // barely separate, so the honest answer is "not significant" — the
    // test exists to say exactly that.
    Q(
      "q441_cv_paired_ttest",
      (s, dir) => {
        val h = PolyHash(concat(lit("cv#"), col("o_orderkey").cast("string")))
        val o = Tables.load(s, dir, "orders")
          .select(col("o_orderpriority").as("priority"),
            floor(col("o_totalprice") * 100 + 0.5).cast("long").as("y"),
            (h * h % lit(PolyHash.Mod) % lit(5L)).as("fold"))
        val fp = o.groupBy("fold", "priority")
          .agg(count(lit(1)).as("n_fp"), sum("y").as("s_fp"))
          .localCheckpoint()
        val pTot = fp.groupBy("priority")
          .agg(sum("n_fp").as("n_p"), sum("s_fp").as("s_p"))
        val fTot = fp.groupBy("fold")
          .agg(sum("n_fp").as("n_f"), sum("s_fp").as("s_f"))
        val gTot = fp.agg(sum("n_fp").as("n_g"), sum("s_fp").as("s_g"))
        val trainMean = fp.join(broadcast(pTot), "priority")
          .withColumn("mu", (col("s_p") - col("s_fp")).cast("double")
            / (col("n_p") - col("n_fp")).cast("double"))
          .select("fold", "priority", "mu")
        val baseMean = fTot.crossJoin(broadcast(gTot))
          .withColumn("mu0", (col("s_g") - col("s_f")).cast("double")
            / (col("n_g") - col("n_f")).cast("double"))
          .select("fold", "mu0")
        val perFold = o.join(broadcast(trainMean), Seq("fold", "priority"))
          .join(broadcast(baseMean), "fold")
          .withColumn("e3", floor((col("y").cast("double") - col("mu"))
            * 1000.0 + 0.5).cast("decimal(19,0)"))
          .withColumn("b3", floor((col("y").cast("double") - col("mu0"))
            * 1000.0 + 0.5).cast("decimal(19,0)"))
          .groupBy("fold")
          .agg(count(lit(1)).as("n_test"),
            sum(col("e3") * col("e3")).as("se2"),
            sum(col("b3") * col("b3")).as("sb2"))
          .withColumn("dd", sqrt(col("sb2").cast("double")
            / col("n_test").cast("double")) / 100000.0
            - sqrt(col("se2").cast("double")
              / col("n_test").cast("double")) / 100000.0)
        val t = perFold.agg(count(lit(1)).as("k"),
            sum("dd").as("sd0"), sum(col("dd") * col("dd")).as("sdd"))
          .withColumn("kd", col("k").cast("double"))
          .withColumn("mean_d", col("sd0") / col("kd"))
          .withColumn("var_d", greatest(lit(0.0),
            (col("sdd") - col("sd0") * col("sd0")
              / col("kd")) / (col("kd") - 1.0)))
          .withColumn("t_stat", col("mean_d")
            / sqrt(col("var_d") / col("kd")))
        t.select(col("k").as("n_folds"),
          Rounding.stableRound6(col("mean_d")).as("mean_rmse_gain"),
          Rounding.stableRound6(sqrt(col("var_d"))).as("sd_rmse_gain"),
          Rounding.stableRound6(col("t_stat")).as("t_stat"),
          (col("k") - 1L).cast("long").as("df"),
          (abs(col("t_stat")) > 2.7764451051977987).as("significant_95"))
      },
      Some {
        val h = PolyHash.duckSql("'cv#' || o_orderkey::VARCHAR")
        s"""WITH o AS (
           |  SELECT o_orderpriority AS priority,
           |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y,
           |    $h * $h % ${PolyHash.Mod} % 5 AS fold
           |  FROM orders),
           |fp AS (
           |  SELECT fold, priority, CAST(count(*) AS BIGINT) AS n_fp,
           |    CAST(sum(y) AS BIGINT) AS s_fp
           |  FROM o GROUP BY 1, 2),
           |pt AS (SELECT priority, CAST(sum(n_fp) AS BIGINT) AS n_p,
           |  CAST(sum(s_fp) AS BIGINT) AS s_p FROM fp GROUP BY 1),
           |ft AS (SELECT fold, CAST(sum(n_fp) AS BIGINT) AS n_f,
           |  CAST(sum(s_fp) AS BIGINT) AS s_f FROM fp GROUP BY 1),
           |gt AS (SELECT CAST(sum(n_fp) AS BIGINT) AS n_g,
           |  CAST(sum(s_fp) AS BIGINT) AS s_g FROM fp),
           |tm AS (
           |  SELECT fold, fp.priority,
           |    (s_p - s_fp)::DOUBLE / (n_p - n_fp)::DOUBLE AS mu
           |  FROM fp JOIN pt ON pt.priority = fp.priority),
           |bm AS (
           |  SELECT fold, (s_g - s_f)::DOUBLE / (n_g - n_f)::DOUBLE
           |    AS mu0
           |  FROM ft CROSS JOIN gt),
           |pf AS (
           |  SELECT o.fold, count(*) AS n_test,
           |    sum(CAST(floor((o.y::DOUBLE - tm.mu) * 1000.0 + 0.5)
           |      AS HUGEINT) * CAST(floor((o.y::DOUBLE - tm.mu)
           |      * 1000.0 + 0.5) AS HUGEINT)) AS se2,
           |    sum(CAST(floor((o.y::DOUBLE - bm.mu0) * 1000.0 + 0.5)
           |      AS HUGEINT) * CAST(floor((o.y::DOUBLE - bm.mu0)
           |      * 1000.0 + 0.5) AS HUGEINT)) AS sb2
           |  FROM o
           |  JOIN tm ON tm.fold = o.fold AND tm.priority = o.priority
           |  JOIN bm ON bm.fold = o.fold
           |  GROUP BY o.fold),
           |dd AS (
           |  SELECT fold,
           |    sqrt(sb2::DOUBLE / n_test::DOUBLE) / 100000.0
           |      - sqrt(se2::DOUBLE / n_test::DOUBLE) / 100000.0 AS d
           |  FROM pf),
           |t AS (
           |  SELECT CAST(count(*) AS BIGINT) AS k,
           |    sum(d) AS sd0, sum(d * d) AS sdd
           |  FROM dd),
           |st AS (
           |  SELECT *, sd0 / k::DOUBLE AS mean_d,
           |    greatest(0.0, (sdd - sd0 * sd0 / k::DOUBLE)
           |      / (k::DOUBLE - 1.0)) AS var_d
           |  FROM t)
           |SELECT k AS n_folds,
           |  ${Rounding.duckSql("mean_d")} AS mean_rmse_gain,
           |  ${Rounding.duckSql("sqrt(var_d)")} AS sd_rmse_gain,
           |  ${Rounding.duckSql(
                "mean_d / sqrt(var_d / k::DOUBLE)")} AS t_stat,
           |  CAST(k - 1 AS BIGINT) AS df,
           |  abs(mean_d / sqrt(var_d / k::DOUBLE))
           |    > 2.7764451051977987 AS significant_95
           |FROM st""".stripMargin
      })
  )
}
