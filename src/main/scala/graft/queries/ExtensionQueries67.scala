package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Rounding
import graft.io.Tables

/** Round-9 twenty-fifth wave: the classical k-group hypothesis-testing
  * family — one-way ANOVA (q406), Kruskal-Wallis rank ANOVA (q407),
  * Jarque-Bera normality (q408), and the Brown-Forsythe robust
  * variance-homogeneity test (q409). All four run off exact integer
  * power/rank sums (cents domain, LONG/decimal(38,0)); the only doubles
  * are the final statistics, built from a fixed IEEE op sequence both
  * engines execute and snapped by Rounding.
  */
object ExtensionQueries67 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q406: one-way ANOVA — does mean order value differ across the five
    // order priorities? Per group the exact LONG/decimal sufficient
    // statistics (n, Σx, Σx² in cents; Σx² summed in decimal(38,0)
    // because 150k × (6e7)² cents² overflows BIGINT while each element
    // fits), then SST/SSW from the raw-moment identities in a fixed
    // double op sequence; SSB = SST − SSW, F = (SSB/(k−1))/(SSW/(N−k)),
    // and the effect size η² = SSB/SST. One tiny groupBy(priority)
    // shuffle + a broadcast totals frame — scale-free: the statistics
    // frame is k rows no matter the corpus size.
    Q(
      "q406_anova_oneway",
      (s, dir) => {
        val x = Tables.load(s, dir, "orders")
          .select(col("o_orderpriority").as("priority"),
            floor(col("o_totalprice") * 100 + 0.5).cast("long").as("x"))
        val g = x.groupBy("priority")
          .agg(count(lit(1)).as("n_g"), sum("x").as("s_g"),
            sum((col("x") * col("x")).cast("decimal(38,0)")).as("q_g"))
          .localCheckpoint()
        val tot = g.agg(count(lit(1)).as("k"), sum("n_g").as("n"),
          sum("s_g").as("s"), sum("q_g").as("qq"),
          sum(col("q_g").cast("double")
            - col("s_g").cast("double") * col("s_g").cast("double")
              / col("n_g").cast("double")).as("ssw"))
        g.crossJoin(broadcast(tot))
          .withColumn("sst", col("qq").cast("double")
            - col("s").cast("double") * col("s").cast("double")
              / col("n").cast("double"))
          .withColumn("ssb", col("sst") - col("ssw"))
          .select(col("priority"), col("n_g").as("n"),
            Rounding.stableRound6(col("s_g").cast("double")
              / col("n_g").cast("double") / 100.0).as("mean_price"),
            Rounding.stableRound6(
              (col("ssb") / (col("k").cast("double") - 1.0)) /
                (col("ssw") / (col("n").cast("double")
                  - col("k").cast("double")))).as("f_stat"),
            Rounding.stableRound6(col("ssb") / col("sst")).as("eta_sq"),
            (col("k") - 1L).cast("long").as("df_between"),
            (col("n") - col("k")).cast("long").as("df_within"))
          .orderBy("priority")
      },
      Some(s"""WITH x AS (
             |  SELECT o_orderpriority AS priority,
             |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS x
             |  FROM orders),
             |g AS (
             |  SELECT priority, CAST(count(*) AS BIGINT) AS n_g,
             |    CAST(sum(x) AS BIGINT) AS s_g, sum(x * x) AS q_g
             |  FROM x GROUP BY 1),
             |t AS (
             |  SELECT CAST(count(*) AS BIGINT) AS k,
             |    CAST(sum(n_g) AS BIGINT) AS n,
             |    CAST(sum(s_g) AS BIGINT) AS s, sum(q_g) AS qq,
             |    sum(q_g::DOUBLE - s_g::DOUBLE * s_g::DOUBLE / n_g::DOUBLE)
             |      AS ssw
             |  FROM g),
             |f AS (
             |  SELECT g.*, t.*,
             |    qq::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE AS sst
             |  FROM g CROSS JOIN t)
             |SELECT priority, n_g AS n,
             |  ${Rounding.duckSql("s_g::DOUBLE / n_g::DOUBLE / 100.0")}
             |    AS mean_price,
             |  ${Rounding.duckSql(
                  "((sst - ssw) / (k::DOUBLE - 1.0)) / " +
                    "(ssw / (n::DOUBLE - k::DOUBLE))")} AS f_stat,
             |  ${Rounding.duckSql("(sst - ssw) / sst")} AS eta_sq,
             |  CAST(k - 1 AS BIGINT) AS df_between,
             |  CAST(n - k AS BIGINT) AS df_within
             |FROM f
             |ORDER BY priority""".stripMargin)),

    // ------------------------------------------------------------------
    // q407: Kruskal-Wallis — the rank-based (distribution-free) ANOVA on
    // event value by event type, with the tie correction. Ranks never
    // touch a corpus-sized sort: the cents VALUE DOMAIN (≤ ~56k distinct
    // values) carries a cumulative-count walk, and the average mid-rank
    // of a tied value is kept exact by working in DOUBLED ranks
    // (2·avgrank = 2·(cum−t) + t + 1, an integer), so each group's rank
    // sum R_g is an exact LONG from a (group, value)-counts join.
    // H = 12/(N(N+1))·ΣR_g²/n_g − 3(N+1), then H/C with the tie factor
    // C = 1 − Σ(t³−t)/(N³−N) — all integer numerators.
    Q(
      "q407_kruskal_wallis",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select(col("event_type").as("grp"),
            floor(col("value") * 100 + 0.5).cast("long").as("v"))
        val dom = e.groupBy("v").agg(count(lit(1)).as("t"))
          .withColumn("cum", sum("t").over(Window.orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("avg2",
            lit(2L) * (col("cum") - col("t")) + col("t") + 1L)
        val ties = dom.agg(
          sum(col("t") * col("t") * col("t") - col("t")).as("tsum"),
          sum("t").as("n"))
        val rg = e.groupBy("grp", "v").agg(count(lit(1)).as("c"))
          .join(dom.select("v", "avg2"), "v")
          .groupBy("grp")
          .agg(sum("c").as("n_g"), sum(col("avg2") * col("c")).as("r2_g"))
          .localCheckpoint()
        val k = rg.agg(count(lit(1)).as("k"),
          sum((col("r2_g").cast("double") / 2.0)
            * (col("r2_g").cast("double") / 2.0)
            / col("n_g").cast("double")).as("sumterm"))
        rg.crossJoin(broadcast(ties)).crossJoin(broadcast(k))
          .withColumn("nd", col("n").cast("double"))
          .withColumn("h_raw",
            lit(12.0) / (col("nd") * (col("nd") + 1.0)) * col("sumterm")
              - lit(3.0) * (col("nd") + 1.0))
          .withColumn("tie_c",
            lit(1.0) - col("tsum").cast("double")
              / (col("nd") * col("nd") * col("nd") - col("nd")))
          .select(col("grp"), col("n_g").as("n"),
            Rounding.stableRound6(col("r2_g").cast("double") / 2.0
              / col("n_g").cast("double")).as("mean_rank"),
            Rounding.stableRound6(col("h_raw")).as("h_stat"),
            Rounding.stableRound6(col("h_raw") / col("tie_c"))
              .as("h_adjusted"),
            (col("k") - 1L).cast("long").as("df"))
          .orderBy("grp")
      },
      Some(s"""WITH e AS (
             |  SELECT event_type AS grp,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
             |  FROM events),
             |dom AS (
             |  SELECT v, CAST(count(*) AS BIGINT) AS t,
             |    sum(count(*)) OVER (ORDER BY v
             |      ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM e GROUP BY v),
             |dom2 AS (
             |  SELECT v, t, 2 * (cum - t) + t + 1 AS avg2 FROM dom),
             |ties AS (
             |  SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tsum,
             |    CAST(sum(t) AS BIGINT) AS n
             |  FROM dom2),
             |rg AS (
             |  SELECT grp, CAST(sum(c) AS BIGINT) AS n_g,
             |    CAST(sum(avg2 * c) AS BIGINT) AS r2_g
             |  FROM (SELECT grp, v, CAST(count(*) AS BIGINT) AS c
             |        FROM e GROUP BY 1, 2) gv
             |  JOIN dom2 USING (v)
             |  GROUP BY grp),
             |kk AS (
             |  SELECT CAST(count(*) AS BIGINT) AS k,
             |    sum((r2_g::DOUBLE / 2.0) * (r2_g::DOUBLE / 2.0)
             |      / n_g::DOUBLE) AS sumterm
             |  FROM rg),
             |f AS (
             |  SELECT rg.*, ties.*, kk.*, n::DOUBLE AS nd,
             |    12.0 / (n::DOUBLE * (n::DOUBLE + 1.0)) * sumterm
             |      - 3.0 * (n::DOUBLE + 1.0) AS h_raw,
             |    1.0 - tsum::DOUBLE
             |      / (n::DOUBLE * n::DOUBLE * n::DOUBLE - n::DOUBLE)
             |      AS tie_c
             |  FROM rg CROSS JOIN ties CROSS JOIN kk)
             |SELECT grp, n_g AS n,
             |  ${Rounding.duckSql("r2_g::DOUBLE / 2.0 / n_g::DOUBLE")}
             |    AS mean_rank,
             |  ${Rounding.duckSql("h_raw")} AS h_stat,
             |  ${Rounding.duckSql("h_raw / tie_c")} AS h_adjusted,
             |  CAST(k - 1 AS BIGINT) AS df
             |FROM f
             |ORDER BY grp""".stripMargin)),

    // ------------------------------------------------------------------
    // q408: Jarque-Bera normality test per event type — skewness and
    // excess kurtosis from exact raw power sums (Σx, Σx² and Σx³ summed
    // in decimal(38,0); Σx⁴ built as Σ(x²·x²) with the x² factors cast
    // to decimal(19,0) so the product is an EXACT decimal(38,0) —
    // 56021⁴ ≈ 9.9e18 overflows BIGINT per element, the one power that
    // does; DuckDB runs the same split in HUGEINT). Central moments by
    // the raw-moment identities in fixed double ops, m2^1.5 as
    // m2·sqrt(m2) (sqrt is correctly-rounded IEEE in both engines,
    // unlike pow), JB = n/6·(S² + K²/4), and the closed-form χ²(2)
    // p-value exp(−JB/2). A heavy-tailed uniform-ish value column should
    // reject normality at every SF — the gate exercises real rejections.
    Q(
      "q408_jarque_bera",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select(col("event_type").as("grp"),
            floor(col("value") * 100 + 0.5).cast("long").as("x"))
          .withColumn("x2", col("x") * col("x"))
        val g = e.groupBy("grp").agg(
          count(lit(1)).as("n"), sum("x").as("s1"),
          sum(col("x2").cast("decimal(38,0)")).as("s2"),
          sum((col("x2") * col("x")).cast("decimal(38,0)")).as("s3"),
          sum(col("x2").cast("decimal(19,0)")
            * col("x2").cast("decimal(19,0)")).as("s4"))
        val m = g
          .withColumn("nd", col("n").cast("double"))
          .withColumn("mu", col("s1").cast("double") / col("nd"))
          .withColumn("m2", col("s2").cast("double") / col("nd")
            - col("mu") * col("mu"))
          .withColumn("m3", col("s3").cast("double") / col("nd")
            - lit(3.0) * col("mu") * (col("s2").cast("double") / col("nd"))
            + lit(2.0) * col("mu") * col("mu") * col("mu"))
          .withColumn("m4", col("s4").cast("double") / col("nd")
            - lit(4.0) * col("mu") * (col("s3").cast("double") / col("nd"))
            + lit(6.0) * col("mu") * col("mu")
              * (col("s2").cast("double") / col("nd"))
            - lit(3.0) * col("mu") * col("mu") * col("mu") * col("mu"))
          .withColumn("skew", col("m3") / (col("m2") * sqrt(col("m2"))))
          .withColumn("exkurt",
            col("m4") / (col("m2") * col("m2")) - 3.0)
          .withColumn("jb", col("nd") / 6.0 * (col("skew") * col("skew")
            + col("exkurt") * col("exkurt") / 4.0))
        m.select(col("grp"), col("n"),
            Rounding.stableRound6(col("skew")).as("skewness"),
            Rounding.stableRound6(col("exkurt")).as("excess_kurtosis"),
            Rounding.stableRound6(col("jb")).as("jb_stat"),
            Rounding.stableRound6(exp(-col("jb") / 2.0)).as("p_value"),
            (col("jb") > 5.991464547107979).as("reject_95"))
          .orderBy("grp")
      },
      Some(s"""WITH e AS (
             |  SELECT event_type AS grp,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS x,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT)
             |      * CAST(floor(value * 100 + 0.5) AS BIGINT) AS x2
             |  FROM events),
             |g AS (
             |  SELECT grp, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS s1, sum(x2) AS s2,
             |    sum(x2 * x) AS s3,
             |    sum(x2::HUGEINT * x2::HUGEINT) AS s4
             |  FROM e GROUP BY grp),
             |m AS (
             |  SELECT grp, n, n::DOUBLE AS nd,
             |    s1::DOUBLE / n::DOUBLE AS mu,
             |    s2::DOUBLE / n::DOUBLE AS r2,
             |    s3::DOUBLE / n::DOUBLE AS r3,
             |    s4::DOUBLE / n::DOUBLE AS r4
             |  FROM g),
             |c AS (
             |  SELECT grp, n, nd, mu,
             |    r2 - mu * mu AS m2,
             |    r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
             |    r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
             |      - 3.0 * mu * mu * mu * mu AS m4
             |  FROM m),
             |st AS (
             |  SELECT grp, n, nd,
             |    m3 / (m2 * sqrt(m2)) AS skew,
             |    m4 / (m2 * m2) - 3.0 AS exkurt
             |  FROM c),
             |jb AS (
             |  SELECT grp, n, skew, exkurt,
             |    nd / 6.0 * (skew * skew + exkurt * exkurt / 4.0) AS jb
             |  FROM st)
             |SELECT grp, n,
             |  ${Rounding.duckSql("skew")} AS skewness,
             |  ${Rounding.duckSql("exkurt")} AS excess_kurtosis,
             |  ${Rounding.duckSql("jb")} AS jb_stat,
             |  ${Rounding.duckSql("exp(-jb / 2.0)")} AS p_value,
             |  jb > 5.991464547107979 AS reject_95
             |FROM jb
             |ORDER BY grp""".stripMargin)),

    // ------------------------------------------------------------------
    // q409: Brown-Forsythe — Levene's variance-homogeneity test on
    // MEDIAN-centered absolute deviations (the robust variant): are the
    // event-value spreads equal across event types? Each group's median
    // comes from the per-group value-domain cumulative walk (the q405
    // order-statistic discipline, never a corpus sort); the deviations
    // z = |x − med_g| are then exact LONG cents, so the one-way ANOVA on
    // z (the q406 machinery) runs off exact Σz/Σz² sufficient
    // statistics. Emits each group's median and mean absolute deviation
    // plus the shared W statistic and degrees of freedom.
    Q(
      "q409_brown_forsythe",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select(col("event_type").as("grp"),
            floor(col("value") * 100 + 0.5).cast("long").as("v"))
        val dom = e.groupBy("grp", "v").agg(count(lit(1)).as("c"))
          .withColumn("cum", sum("c").over(Window.partitionBy("grp")
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val n = e.groupBy("grp").agg(count(lit(1)).as("n_rows"))
          .withColumn("r_med", expr("(n_rows + 1) div 2"))
        val med = dom.join(n, "grp")
          .where(col("cum") >= col("r_med"))
          .groupBy("grp").agg(min("v").as("med"))
        val z = e.join(broadcast(med), "grp")
          .select(col("grp"), abs(col("v") - col("med")).as("z"))
        val g = z.groupBy("grp").agg(count(lit(1)).as("n_g"),
            sum("z").as("s_g"), sum(col("z") * col("z")).as("q_g"))
          .localCheckpoint()
        val tot = g.agg(count(lit(1)).as("k"), sum("n_g").as("n"),
          sum("s_g").as("s"), sum("q_g").as("qq"),
          sum(col("q_g").cast("double")
            - col("s_g").cast("double") * col("s_g").cast("double")
              / col("n_g").cast("double")).as("ssw"))
        g.join(broadcast(med), "grp").crossJoin(broadcast(tot))
          .withColumn("sst", col("qq").cast("double")
            - col("s").cast("double") * col("s").cast("double")
              / col("n").cast("double"))
          .withColumn("ssb", col("sst") - col("ssw"))
          .select(col("grp"), col("n_g").as("n"),
            col("med").as("median_cents"),
            Rounding.stableRound6(col("s_g").cast("double")
              / col("n_g").cast("double")).as("mean_abs_dev_cents"),
            Rounding.stableRound6(
              (col("ssb") / (col("k").cast("double") - 1.0)) /
                (col("ssw") / (col("n").cast("double")
                  - col("k").cast("double")))).as("w_stat"),
            (col("k") - 1L).cast("long").as("df_between"),
            (col("n") - col("k")).cast("long").as("df_within"))
          .orderBy("grp")
      },
      Some(s"""WITH e AS (
             |  SELECT event_type AS grp,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
             |  FROM events),
             |dom AS (
             |  SELECT grp, v, count(*) AS c,
             |    sum(count(*)) OVER (PARTITION BY grp ORDER BY v
             |      ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM e GROUP BY grp, v),
             |n AS (
             |  SELECT grp, count(*) AS n_rows,
             |    (count(*) + 1) // 2 AS r_med
             |  FROM e GROUP BY grp),
             |med AS (
             |  SELECT grp, CAST(min(v) AS BIGINT) AS med
             |  FROM dom JOIN n USING (grp)
             |  WHERE cum >= r_med GROUP BY grp),
             |z AS (
             |  SELECT e.grp, abs(e.v - med.med) AS z
             |  FROM e JOIN med ON med.grp = e.grp),
             |g AS (
             |  SELECT grp, CAST(count(*) AS BIGINT) AS n_g,
             |    CAST(sum(z) AS BIGINT) AS s_g,
             |    CAST(sum(z * z) AS BIGINT) AS q_g
             |  FROM z GROUP BY grp),
             |t AS (
             |  SELECT CAST(count(*) AS BIGINT) AS k,
             |    CAST(sum(n_g) AS BIGINT) AS n,
             |    CAST(sum(s_g) AS BIGINT) AS s, sum(q_g) AS qq,
             |    sum(q_g::DOUBLE - s_g::DOUBLE * s_g::DOUBLE / n_g::DOUBLE)
             |      AS ssw
             |  FROM g),
             |f AS (
             |  SELECT g.*, med.med, t.*,
             |    qq::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE AS sst
             |  FROM g JOIN med USING (grp) CROSS JOIN t)
             |SELECT grp, n_g AS n, med AS median_cents,
             |  ${Rounding.duckSql("s_g::DOUBLE / n_g::DOUBLE")}
             |    AS mean_abs_dev_cents,
             |  ${Rounding.duckSql(
                  "((sst - ssw) / (k::DOUBLE - 1.0)) / " +
                    "(ssw / (n::DOUBLE - k::DOUBLE))")} AS w_stat,
             |  CAST(k - 1 AS BIGINT) AS df_between,
             |  CAST(n - k AS BIGINT) AS df_within
             |FROM f
             |ORDER BY grp""".stripMargin))
  )
}
