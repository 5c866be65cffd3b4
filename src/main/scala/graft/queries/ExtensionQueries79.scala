package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Rounding
import graft.io.Tables

/** Round-9 thirty-seventh wave: Gumbel block maxima (q454), log-log
  * price elasticity (q455), ABC-XYZ inventory classification (q456),
  * and newsvendor service-level stocking quantiles (q457).
  */
object ExtensionQueries79 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q454: Gumbel block-maxima fit — the OTHER classical extreme-value
    // route next to q439's peaks-over-threshold: the 80 monthly maxima
    // of order value are themselves the sample, fit by method of
    // moments (σ = s·√6/π, μ = m − γ·σ with Euler's γ as a literal),
    // and extrapolated to the 100-month return level
    // μ − σ·ln(−ln(1−1/100)). Block maxima are exact LONG cents, so
    // m/s come from exact sums; the block frame is 80 rows at any
    // corpus size.
    Q(
      "q454_gumbel_block_maxima",
      (s, dir) => {
        val bm = Tables.load(s, dir, "orders")
          .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
          .agg(max(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("mx"))
        val g = bm.agg(count(lit(1)).as("n"), sum("mx").as("sm"),
          sum((col("mx") * col("mx")).cast("decimal(38,0)")).as("qm"))
          .withColumn("nd", col("n").cast("double"))
          .withColumn("mean", col("sm").cast("double") / col("nd"))
          .withColumn("sd", sqrt(col("qm").cast("double") / col("nd")
            - col("mean") * col("mean")))
          .withColumn("sigma",
            col("sd") * sqrt(lit(6.0)) / lit(3.141592653589793))
          .withColumn("mu",
            col("mean") - lit(0.5772156649015329) * col("sigma"))
          .withColumn("rl100", col("mu") - col("sigma")
            * log(-log(lit(1.0) - lit(1.0) / 100.0)))
        g.select(col("n").as("n_blocks"),
          Rounding.stableRound6(col("mean") / 100.0).as("mean_max_dollars"),
          Rounding.stableRound6(col("sd") / 100.0).as("sd_max_dollars"),
          Rounding.stableRound6(col("mu") / 100.0).as("gumbel_mu_dollars"),
          Rounding.stableRound6(col("sigma") / 100.0)
            .as("gumbel_sigma_dollars"),
          Rounding.stableRound6(col("rl100") / 100.0)
            .as("return_level_100mo_dollars"))
      },
      Some(s"""WITH bm AS (
             |  SELECT date_trunc('month', o_orderdate) AS m,
             |    CAST(max(CAST(floor(o_totalprice * 100 + 0.5)
             |      AS BIGINT)) AS BIGINT) AS mx
             |  FROM orders GROUP BY 1),
             |g AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(mx) AS BIGINT) AS sm, sum(mx * mx) AS qm
             |  FROM bm),
             |st AS (
             |  SELECT n, sm::DOUBLE / n::DOUBLE AS mean,
             |    sqrt(qm::DOUBLE / n::DOUBLE
             |      - (sm::DOUBLE / n::DOUBLE) * (sm::DOUBLE / n::DOUBLE))
             |      AS sd
             |  FROM g),
             |fit AS (
             |  SELECT *, sd * sqrt(6.0) / 3.141592653589793 AS sigma,
             |    mean - 0.5772156649015329
             |      * (sd * sqrt(6.0) / 3.141592653589793) AS mu
             |  FROM st)
             |SELECT n AS n_blocks,
             |  ${Rounding.duckSql("mean / 100.0")} AS mean_max_dollars,
             |  ${Rounding.duckSql("sd / 100.0")} AS sd_max_dollars,
             |  ${Rounding.duckSql("mu / 100.0")} AS gumbel_mu_dollars,
             |  ${Rounding.duckSql("sigma / 100.0")}
             |    AS gumbel_sigma_dollars,
             |  ${Rounding.duckSql(
                  "(mu - sigma * ln(-ln(1.0 - 1.0 / 100.0))) / 100.0")}
             |    AS return_level_100mo_dollars
             |FROM fit""".stripMargin)),

    // ------------------------------------------------------------------
    // q455: price elasticity of demand — the log-log regression
    // ln(quantity) ~ ln(unit price) across parts. Every per-part log
    // snaps to the 1e-9 LONG grid and every cross-term snaps BEFORE
    // summation (the q270 discipline: libm ln may differ in the last
    // ulp between engines, the grid absorbs it and makes the sums
    // order-independent LONG arithmetic). The honest fixture answer is
    // elasticity ≈ 0 — prices are drawn independently of demand — and
    // the spec pins exactly that.
    Q(
      "q455_price_elasticity",
      (s, dir) => {
        val per = Tables.load(s, dir, "lineitem")
          .groupBy("l_partkey")
          .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
            .as("e"),
            sum(col("l_quantity").cast("long")).as("q"))
          .withColumn("lp", floor(log(col("e").cast("double")
            / col("q").cast("double")) * lit(1e9) + 0.5).cast("long"))
          .withColumn("lq", floor(log(col("q").cast("double"))
            * lit(1e9) + 0.5).cast("long"))
          .withColumn("lpd", col("lp").cast("double") / lit(1e9))
          .withColumn("lqd", col("lq").cast("double") / lit(1e9))
          .withColumn("pp9", floor(col("lpd") * col("lpd") * lit(1e9)
            + 0.5).cast("long"))
          .withColumn("pq9", floor(col("lpd") * col("lqd") * lit(1e9)
            + 0.5).cast("long"))
        val g = per.agg(count(lit(1)).as("n"),
          sum("lp").as("sp"), sum("lq").as("sq"),
          sum("pp9").as("spp"), sum("pq9").as("spq"))
          .withColumn("nd", col("n").cast("double"))
          .withColumn("spd", col("sp").cast("double") / lit(1e9))
          .withColumn("sqd", col("sq").cast("double") / lit(1e9))
          .withColumn("cpp", col("spp").cast("double") / lit(1e9)
            - col("spd") * col("spd") / col("nd"))
          .withColumn("cpq", col("spq").cast("double") / lit(1e9)
            - col("spd") * col("sqd") / col("nd"))
          .withColumn("beta", col("cpq") / col("cpp"))
        g.select(col("n").as("n_parts"),
          Rounding.stableRound6(col("spd") / col("nd"))
            .as("mean_ln_price"),
          Rounding.stableRound6(col("sqd") / col("nd"))
            .as("mean_ln_qty"),
          Rounding.stableRound6(col("beta")).as("elasticity"),
          (abs(col("beta")) < 1.0).as("inelastic"))
      },
      Some(s"""WITH per AS (
             |  SELECT l_partkey,
             |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
             |      AS BIGINT)) AS BIGINT) AS e,
             |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
             |  FROM lineitem GROUP BY 1),
             |lg AS (
             |  SELECT
             |    CAST(floor(ln(e::DOUBLE / q::DOUBLE) * 1000000000
             |      + 0.5) AS BIGINT) AS lp,
             |    CAST(floor(ln(q::DOUBLE) * 1000000000 + 0.5) AS BIGINT)
             |      AS lq
             |  FROM per),
             |t AS (
             |  SELECT lp, lq,
             |    lp::DOUBLE / 1000000000 AS lpd,
             |    lq::DOUBLE / 1000000000 AS lqd
             |  FROM lg),
             |t9 AS (
             |  SELECT lp, lq,
             |    CAST(floor(lpd * lpd * 1000000000 + 0.5) AS BIGINT)
             |      AS pp9,
             |    CAST(floor(lpd * lqd * 1000000000 + 0.5) AS BIGINT)
             |      AS pq9
             |  FROM t),
             |g AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(lp) AS BIGINT) AS sp,
             |    CAST(sum(lq) AS BIGINT) AS sq,
             |    CAST(sum(pp9) AS BIGINT) AS spp,
             |    CAST(sum(pq9) AS BIGINT) AS spq
             |  FROM t9),
             |st AS (
             |  SELECT n, n::DOUBLE AS nd,
             |    sp::DOUBLE / 1000000000 AS spd,
             |    sq::DOUBLE / 1000000000 AS sqd,
             |    spp::DOUBLE / 1000000000 AS sppd,
             |    spq::DOUBLE / 1000000000 AS spqd
             |  FROM g),
             |b AS (
             |  SELECT *,
             |    (spqd - spd * sqd / nd) / (sppd - spd * spd / nd)
             |      AS beta
             |  FROM st)
             |SELECT n AS n_parts,
             |  ${Rounding.duckSql("spd / nd")} AS mean_ln_price,
             |  ${Rounding.duckSql("sqd / nd")} AS mean_ln_qty,
             |  ${Rounding.duckSql("beta")} AS elasticity,
             |  abs(beta) < 1.0 AS inelastic
             |FROM b""".stripMargin)),

    // ------------------------------------------------------------------
    // q456: ABC-XYZ inventory classification — the planner's 3×3
    // matrix: ABC by cumulative revenue share (A ≤ 70%, B ≤ 90%, C
    // rest, walked over parts ordered by revenue with a key tiebreak —
    // a dimension-sized window, the vocab-frame convention) crossed
    // with XYZ by demand variability (monthly CV including zero
    // months: mean = S/M and var = Q/M − mean² with M the fixed month
    // count, so absent months contribute exactly their zeros without
    // materializing them). Exact integer sums throughout; the output
    // is the ≤9-cell matrix.
    Q(
      "q456_abc_xyz",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
          .select(col("l_partkey"),
            date_trunc("month", col("l_shipdate")).as("m"),
            floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("e"),
            col("l_quantity").cast("long").as("q"))
        val months = li.agg(countDistinct("m").as("mm"))
        val pm = li.groupBy("l_partkey", "m")
          .agg(sum("q").as("qm"), sum("e").as("em"))
        val per = pm.groupBy("l_partkey")
          .agg(sum("em").as("rev"), sum("qm").as("sq"),
            sum((col("qm") * col("qm")).cast("decimal(38,0)")).as("qq"))
          .crossJoin(broadcast(months))
          .withColumn("mean_d", col("sq").cast("double")
            / col("mm").cast("double"))
          .withColumn("var_d", col("qq").cast("double")
            / col("mm").cast("double") - col("mean_d") * col("mean_d"))
          .withColumn("cv", sqrt(col("var_d")) / col("mean_d"))
          .withColumn("cum", sum("rev").over(Window
            .orderBy(col("rev").desc, col("l_partkey"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val tot = per.agg(max("cum").as("tot"))
        val cls = per.crossJoin(broadcast(tot))
          .withColumn("abc",
            when(col("cum").cast("double") <= col("tot").cast("double")
              * 0.7, "A")
              .when(col("cum").cast("double")
                <= col("tot").cast("double") * 0.9, "B")
              .otherwise("C"))
          .withColumn("xyz", when(col("cv") < 0.5, "X")
            .when(col("cv") < 1.0, "Y").otherwise("Z"))
        cls.groupBy("abc", "xyz")
          .agg(count(lit(1)).as("n_parts"), sum("rev").as("rev"))
          .crossJoin(broadcast(tot))
          .select(col("abc"), col("xyz"), col("n_parts"),
            Rounding.stableRound6(col("rev").cast("double")
              / col("tot").cast("double")).as("revenue_share"))
          .orderBy("abc", "xyz")
      },
      Some(s"""WITH li AS (
             |  SELECT l_partkey, date_trunc('month', l_shipdate) AS m,
             |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS e,
             |    CAST(l_quantity AS BIGINT) AS q
             |  FROM lineitem),
             |months AS (SELECT CAST(count(DISTINCT m) AS BIGINT) AS mm
             |  FROM li),
             |pm AS (
             |  SELECT l_partkey, m, CAST(sum(q) AS BIGINT) AS qm,
             |    CAST(sum(e) AS BIGINT) AS em
             |  FROM li GROUP BY 1, 2),
             |per AS (
             |  SELECT l_partkey, CAST(sum(em) AS BIGINT) AS rev,
             |    CAST(sum(qm) AS BIGINT) AS sq, sum(qm * qm) AS qq
             |  FROM pm GROUP BY 1),
             |pc AS (
             |  SELECT per.*, months.mm,
             |    sq::DOUBLE / mm::DOUBLE AS mean_d,
             |    qq::DOUBLE / mm::DOUBLE
             |      - (sq::DOUBLE / mm::DOUBLE) * (sq::DOUBLE / mm::DOUBLE)
             |      AS var_d,
             |    sum(rev) OVER (ORDER BY rev DESC, l_partkey
             |      ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM per CROSS JOIN months),
             |tot AS (SELECT max(cum) AS tot FROM pc),
             |cls AS (
             |  SELECT *,
             |    CASE WHEN cum::DOUBLE <= tot::DOUBLE * 0.7 THEN 'A'
             |      WHEN cum::DOUBLE <= tot::DOUBLE * 0.9 THEN 'B'
             |      ELSE 'C' END AS abc,
             |    CASE WHEN sqrt(var_d) / mean_d < 0.5 THEN 'X'
             |      WHEN sqrt(var_d) / mean_d < 1.0 THEN 'Y'
             |      ELSE 'Z' END AS xyz
             |  FROM pc CROSS JOIN tot)
             |SELECT abc, xyz, CAST(count(*) AS BIGINT) AS n_parts,
             |  ${Rounding.duckSql(
                  "sum(rev)::DOUBLE / any_value(tot)::DOUBLE")}
             |    AS revenue_share
             |FROM cls
             |GROUP BY abc, xyz
             |ORDER BY abc, xyz""".stripMargin)),

    // ------------------------------------------------------------------
    // q457: newsvendor stocking quantiles — for service-level targets
    // 50/80/95%, the smallest stock level covering that share of daily
    // purchase demand: the critical-fractile answer read as an exact
    // order statistic off the (daily demand → count) value-domain walk.
    // Alongside each quantile: the exact share of days it actually
    // covers (≥ the target by construction — the discreteness gap made
    // visible) and the units short on uncovered days.
    Q(
      "q457_newsvendor_quantile",
      (s, dir) => {
        val daily = Tables.load(s, dir, "events")
          .where(col("event_type") === "purchase")
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("d"))
        val dom = daily.groupBy("d").agg(count(lit(1)).as("c"))
          .withColumn("cum", sum("c").over(Window.orderBy("d")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val n = daily.agg(count(lit(1)).as("n"),
          sum("d").as("total_demand"))
        import s.implicits._
        val ratios = Seq(0.5, 0.8, 0.95).toDF("service_target")
        val q = dom.crossJoin(broadcast(n)).crossJoin(broadcast(ratios))
          .where(col("cum").cast("double")
            >= col("service_target") * col("n").cast("double"))
          .groupBy("service_target", "n")
          .agg(min("d").as("stock_level"))
        val cov = q.join(dom.select(col("d"), col("cum")),
            q("stock_level") === dom("d"))
          .select(col("service_target"), col("n"), col("stock_level"),
            col("cum"))
        val short = cov.join(daily.select(col("d").as("dd")),
            col("dd") > col("stock_level"), "left")
          .groupBy("service_target", "n", "stock_level", "cum")
          .agg(coalesce(sum(col("dd") - col("stock_level")), lit(0L))
            .as("units_short"))
        short.select(col("service_target"),
            col("stock_level"),
            Rounding.stableRound6(col("cum").cast("double")
              / col("n").cast("double")).as("days_covered_share"),
            col("units_short"))
          .orderBy("service_target")
      },
      Some(s"""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS day,
             |    CAST(count(*) AS BIGINT) AS d
             |  FROM events WHERE event_type = 'purchase'
             |  GROUP BY 1),
             |dom AS (
             |  SELECT d, count(*) AS c,
             |    sum(count(*)) OVER (ORDER BY d
             |      ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM daily GROUP BY d),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(d) AS BIGINT) AS total_demand FROM daily),
             |ratios AS (SELECT unnest([0.5, 0.8, 0.95])
             |  AS service_target),
             |q AS (
             |  SELECT service_target, any_value(n.n) AS n,
             |    CAST(min(d) AS BIGINT) AS stock_level
             |  FROM dom CROSS JOIN n CROSS JOIN ratios
             |  WHERE cum::DOUBLE >= service_target * n.n::DOUBLE
             |  GROUP BY service_target),
             |cov AS (
             |  SELECT q.service_target, q.n, q.stock_level,
             |    CAST(dom.cum AS BIGINT) AS cum
             |  FROM q JOIN dom ON dom.d = q.stock_level),
             |short AS (
             |  SELECT cov.service_target, cov.n, cov.stock_level,
             |    cov.cum,
             |    CAST(coalesce(sum(daily.d - cov.stock_level), 0)
             |      AS BIGINT) AS units_short
             |  FROM cov LEFT JOIN daily ON daily.d > cov.stock_level
             |  GROUP BY 1, 2, 3, 4)
             |SELECT service_target, stock_level,
             |  ${Rounding.duckSql("cum::DOUBLE / n::DOUBLE")}
             |    AS days_covered_share,
             |  units_short
             |FROM short
             |ORDER BY service_target""".stripMargin))
  )
}
