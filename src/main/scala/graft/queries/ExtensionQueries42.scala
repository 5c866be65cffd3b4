package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Rounding
import graft.io.Tables

/** Round-8 seventeenth continuation wave: count-data overdispersion
  * diagnostics (q320) and cross-correlation lead-lag discovery (q321).
  * Same contract as every other module: each Spark pipeline pairs with
  * DuckDB oracle SQL replaying it.
  */
object ExtensionQueries42 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q320: index-of-dispersion test per event type — the count-data
    // diagnostic that decides whether a Poisson rate model (and its
    // SE = sqrt(mean)) is even admissible for daily volumes, before
    // anyone fits one: D = var/mean and the chi-square dispersion
    // statistic Σ(x−x̄)²/x̄ = (n·Σx² − S²)/(n·S)·n/n — BOTH exact
    // integer rationals via the (n·Σx² − S²) identity, so the verdict
    // column (overdispersed at ~3σ of the χ²(n−1) normal
    // approximation) flips identically in both engines. One daily agg,
    // one per-type agg, a type-count frame of rows.
    Q(
      "q320_dispersion_test",
      (s, dir) => {
        val daily = Tables.load(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("x"))
        val agg = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"),
            sum(col("x") * col("x")).as("sx2"))
        agg
          .withColumn("a2", col("n") * col("sx2") - col("sx") * col("sx"))
          .select(col("event_type"), col("n").as("n_days"),
            Rounding.stableRound6(col("sx").cast("double") /
              col("n").cast("double")).as("mean_daily"),
            Rounding.stableRound6(col("a2").cast("double") /
              (col("n") * col("sx")).cast("double")).as("dispersion"),
            Rounding.stableRound6(col("a2").cast("double") /
              col("sx").cast("double")).as("chi2"),
            when(col("a2").cast("double") / col("sx").cast("double") >
              (col("n") - lit(1)).cast("double") +
                lit(3.0) * sqrt(lit(2.0) *
                  (col("n") - lit(1)).cast("double")), 1L)
              .otherwise(0L).as("overdispersed"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, ts::DATE AS d, count(*) AS x
             |  FROM events GROUP BY 1, 2),
             |agg AS (
             |  SELECT event_type, count(*) AS n,
             |    CAST(sum(x) AS BIGINT) AS sx,
             |    CAST(sum(x*x) AS BIGINT) AS sx2
             |  FROM daily GROUP BY 1),
             |a AS (
             |  SELECT event_type, n, sx, n*sx2 - sx*sx AS a2 FROM agg)
             |SELECT event_type, CAST(n AS BIGINT) AS n_days,
             |  floor(sx::DOUBLE / n::DOUBLE * 1000000.0 + 0.5)
             |    / 1000000.0 AS mean_daily,
             |  floor(a2::DOUBLE / (n*sx)::DOUBLE * 1000000.0 + 0.5)
             |    / 1000000.0 AS dispersion,
             |  floor(a2::DOUBLE / sx::DOUBLE * 1000000.0 + 0.5)
             |    / 1000000.0 AS chi2,
             |  CASE WHEN a2::DOUBLE / sx::DOUBLE >
             |    (n - 1)::DOUBLE + 3.0 * sqrt(2.0 * (n - 1)::DOUBLE)
             |  THEN 1 ELSE 0 END AS overdispersed
             |FROM a ORDER BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // q321: cross-correlation lead-lag discovery between the daily view
    // and purchase series — "do purchases FOLLOW views, and by how many
    // days?": CCF at lags −7…+7 with the argmax lag attached. The q300
    // exact-integer machinery, two-series form: every centered product
    // (n·x_t − Sx)(n·y_{t+k} − Sy) is a LONG, the denominator is the
    // one fp op sqrt(dx)·sqrt(dy) (identical per engine since dx, dy
    // are exact LONGs; their product would overflow, so the square
    // roots multiply as doubles). Day alignment is the shared calendar
    // index, the lag join a 15-row broadcast against the day-sized
    // frame.
    Q(
      "q321_ccf_leadlag",
      (s, dir) => {
        val daily = Tables.load(s, dir, "events")
          .where(col("event_type").isin("view", "purchase"))
          .groupBy(to_date(col("ts")).as("d"))
          .agg(
            sum(when(col("event_type") === "view", 1L).otherwise(0L))
              .as("x"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("y"))
        val idx = daily
          .withColumn("t", row_number().over(Window.orderBy("d")))
          .select("t", "x", "y")
        val st = idx.agg(count(lit(1)).as("n"), sum("x").as("sx"),
          sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        val cent = idx.crossJoin(broadcast(st))
          .select(col("t"),
            (col("n") * col("x") - col("sx")).as("cx"),
            (col("n") * col("y") - col("sy")).as("cy"),
            (col("n") * col("sxx") - col("sx") * col("sx")).as("dx"),
            (col("n") * col("syy") - col("sy") * col("sy")).as("dy"))
        val ks = s.range(-7, 8).select(col("id").as("lag"))
        val num = ks
          .crossJoin(cent.select(col("t"), col("cx"), col("dx"), col("dy"))
            .as("a"))
          .join(cent.select(col("t").as("tb"), col("cy").as("cyb")),
            col("tb") === col("t") + col("lag"))
          .groupBy("lag")
          .agg(sum(col("cx") * col("cyb")).as("num"),
            first("dx").as("dx"), first("dy").as("dy"))
        // num carries n² (both series centered as n·x − S); dx/dy carry
        // n¹ each (n·Σx² − S²  =  n·Σ(x−x̄)²) — one residual /n
        val scored = num.crossJoin(broadcast(st.select(col("n"))))
          .select(col("lag"),
            Rounding.stableRound6(col("num").cast("double") /
              (sqrt(col("dx").cast("double")) *
                sqrt(col("dy").cast("double"))) /
              col("n").cast("double")).as("ccf"))
        val best = scored
          .withColumn("rk", row_number().over(
            Window.orderBy(desc("ccf"), col("lag"))))
          .where(col("rk") === 1)
          .select(col("lag").as("best_lag"))
        scored.crossJoin(broadcast(best)).orderBy("lag")
      },
      Some("""WITH daily AS (
             |  SELECT ts::DATE AS d,
             |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0
             |      END) AS BIGINT) AS x,
             |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
             |      ELSE 0 END) AS BIGINT) AS y
             |  FROM events WHERE event_type IN ('view', 'purchase')
             |  GROUP BY 1),
             |idx AS (
             |  SELECT row_number() OVER (ORDER BY d) AS t, x, y
             |  FROM daily),
             |st AS (
             |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
             |    CAST(sum(y) AS BIGINT) AS sy,
             |    CAST(sum(x*x) AS BIGINT) AS sxx,
             |    CAST(sum(y*y) AS BIGINT) AS syy
             |  FROM idx),
             |cent AS (
             |  SELECT t, n*x - sx AS cx, n*y - sy AS cy,
             |    n*sxx - sx*sx AS dx, n*syy - sy*sy AS dy
             |  FROM idx, st),
             |num AS (
             |  SELECT lag, CAST(sum(a.cx * b.cy) AS BIGINT) AS num,
             |    max(a.dx) AS dx, max(a.dy) AS dy
             |  FROM range(-7, 8) r(lag)
             |  JOIN cent a ON true
             |  JOIN cent b ON b.t = a.t + lag
             |  GROUP BY lag),
             |scored AS (
             |  SELECT lag,
             |    floor(num::DOUBLE / (sqrt(dx::DOUBLE) * sqrt(dy::DOUBLE))
             |      / n::DOUBLE
             |      * 1000000.0 + 0.5) / 1000000.0 AS ccf
             |  FROM num, st),
             |best AS (
             |  SELECT lag AS best_lag FROM scored
             |  ORDER BY ccf DESC, lag LIMIT 1)
             |SELECT CAST(lag AS BIGINT) AS lag, ccf,
             |  CAST(best_lag AS BIGINT) AS best_lag
             |FROM scored, best ORDER BY lag""".stripMargin)))
}
