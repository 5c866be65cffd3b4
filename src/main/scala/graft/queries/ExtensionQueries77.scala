package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Rounding
import graft.io.Tables

/** Round-9 thirty-fifth wave: two-way ANOVA with interaction (q446),
  * partial correlation (q447), restricted mean survival time (q448),
  * and stump-based feature importance ranking (q449).
  */
object ExtensionQueries77 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q446: two-way ANOVA — does order value respond to region,
    // priority, or their INTERACTION? Sequential (Type-I-style) sums of
    // squares from exact cell statistics: SS_cells decomposes into
    // main effects + interaction, the remainder is within-cell noise.
    // Every (Σy)²/n term is snapped to the integer grid before the
    // cell/marginal folds (the 0.5-ulp snap noise is ~19 orders below
    // the statistics), so the cross-cell sums are order-independent
    // integer arithmetic — summed in decimal(38,0)/HUGEINT because
    // five ~1.9e18 cents² marginal terms overflow BIGINT at sf0.01.
    // One 25-cell aggregation; the ANOVA table is 3 rows.
    Q(
      "q446_anova_twoway",
      (s, dir) => {
        val y = Tables.load(s, dir, "orders")
          .join(Tables.load(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.load(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.load(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("r_name").as("a"), col("o_orderpriority").as("b"),
            floor(col("o_totalprice") * 100 + 0.5).cast("long").as("y"))
        val cells = y.groupBy("a", "b").agg(count(lit(1)).as("n"),
            sum("y").as("sy"),
            sum((col("y") * col("y")).cast("decimal(38,0)")).as("qy"))
          .localCheckpoint()
        def fold(df: org.apache.spark.sql.DataFrame,
            keys: Seq[String]): org.apache.spark.sql.DataFrame = {
          val g = if (keys.isEmpty) df.groupBy()
            else df.groupBy(keys.map(col): _*)
          g.agg(sum("n").as("n"), sum("sy").as("sy"))
            .agg(count(lit(1)).as("k"),
              // per-term integers reach ~1.9e18 at sf0.01; the SUM
              // overflows BIGINT, so it runs in decimal(38,0) (DuckDB's
              // sum already widens to HUGEINT)
              sum(floor(col("sy").cast("double") * col("sy").cast("double")
                / col("n").cast("double") + 0.5).cast("decimal(38,0)"))
                .as("t"))
        }
        val byA = fold(cells, Seq("a"))
          .select(col("k").as("ka"), col("t").as("ta"))
        val byB = fold(cells, Seq("b"))
          .select(col("k").as("kb"), col("t").as("tb"))
        val byAB = fold(cells, Seq("a", "b"))
          .select(col("k").as("kab"), col("t").as("tab"))
        val tot = cells.agg(sum("n").as("nn"), sum("sy").as("ss"),
            sum("qy").as("qq"))
          .withColumn("corr", col("ss").cast("double")
            * col("ss").cast("double") / col("nn").cast("double"))
        val j = byA.crossJoin(byB).crossJoin(byAB).crossJoin(tot)
          .withColumn("ss_a", col("ta").cast("double") - col("corr"))
          .withColumn("ss_b", col("tb").cast("double") - col("corr"))
          .withColumn("ss_cells", col("tab").cast("double") - col("corr"))
          .withColumn("ss_ab",
            col("ss_cells") - col("ss_a") - col("ss_b"))
          .withColumn("sst", col("qq").cast("double") - col("corr"))
          .withColumn("ss_w", col("sst") - col("ss_cells"))
          .withColumn("df_a", col("ka") - 1L)
          .withColumn("df_b", col("kb") - 1L)
          .withColumn("df_ab",
            (col("ka") - 1L) * (col("kb") - 1L))
          .withColumn("df_w", col("nn") - col("kab"))
          .withColumn("msw", col("ss_w") / col("df_w").cast("double"))
        j.selectExpr(
            "stack(3, " +
              "'region', ss_a, df_a, " +
              "'priority', ss_b, df_b, " +
              "'interaction', ss_ab, df_ab) AS (effect, ss, df)",
            "msw", "sst")
          .select(col("effect"),
            Rounding.stableRound6(col("ss") / 10000.0).as("ss_dollars_sq"),
            col("df"),
            Rounding.stableRound6(
              (col("ss") / col("df").cast("double")) / col("msw"))
              .as("f_stat"),
            Rounding.stableRound6(col("ss") / col("sst")).as("eta_sq"))
          .orderBy("effect")
      },
      Some(s"""WITH y AS (
             |  SELECT r_name AS a, o_orderpriority AS b,
             |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y
             |  FROM orders
             |  JOIN customer ON c_custkey = o_custkey
             |  JOIN nation ON n_nationkey = c_nationkey
             |  JOIN region ON r_regionkey = n_regionkey),
             |cells AS (
             |  SELECT a, b, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(y) AS BIGINT) AS sy, sum(y * y) AS qy
             |  FROM y GROUP BY 1, 2),
             |fa AS (
             |  SELECT CAST(count(*) AS BIGINT) AS ka,
             |    sum(CAST(floor(sy::DOUBLE * sy::DOUBLE / n::DOUBLE
             |      + 0.5) AS BIGINT)) AS ta
             |  FROM (SELECT a, CAST(sum(n) AS BIGINT) AS n,
             |        CAST(sum(sy) AS BIGINT) AS sy
             |        FROM cells GROUP BY a)),
             |fb AS (
             |  SELECT CAST(count(*) AS BIGINT) AS kb,
             |    sum(CAST(floor(sy::DOUBLE * sy::DOUBLE / n::DOUBLE
             |      + 0.5) AS BIGINT)) AS tb
             |  FROM (SELECT b, CAST(sum(n) AS BIGINT) AS n,
             |        CAST(sum(sy) AS BIGINT) AS sy
             |        FROM cells GROUP BY b)),
             |fab AS (
             |  SELECT CAST(count(*) AS BIGINT) AS kab,
             |    sum(CAST(floor(sy::DOUBLE * sy::DOUBLE / n::DOUBLE
             |      + 0.5) AS BIGINT)) AS tab
             |  FROM cells),
             |tot AS (
             |  SELECT CAST(sum(n) AS BIGINT) AS nn,
             |    CAST(sum(sy) AS BIGINT) AS ss, sum(qy) AS qq
             |  FROM cells),
             |j AS (
             |  SELECT *,
             |    ss::DOUBLE * ss::DOUBLE / nn::DOUBLE AS corr
             |  FROM fa CROSS JOIN fb CROSS JOIN fab CROSS JOIN tot),
             |k AS (
             |  SELECT *,
             |    ta::DOUBLE - corr AS ss_a,
             |    tb::DOUBLE - corr AS ss_b,
             |    tab::DOUBLE - corr AS ss_cells,
             |    qq::DOUBLE - corr AS sst
             |  FROM j),
             |m AS (
             |  SELECT *,
             |    ss_cells - ss_a - ss_b AS ss_ab,
             |    sst - ss_cells AS ss_w,
             |    ka - 1 AS df_a, kb - 1 AS df_b,
             |    (ka - 1) * (kb - 1) AS df_ab,
             |    nn - kab AS df_w
             |  FROM k),
             |u AS (
             |  SELECT 'region' AS effect, ss_a AS ss,
             |    CAST(df_a AS BIGINT) AS df, m.* FROM m
             |  UNION ALL
             |  SELECT 'priority', ss_b, CAST(df_b AS BIGINT), m.* FROM m
             |  UNION ALL
             |  SELECT 'interaction', ss_ab, CAST(df_ab AS BIGINT), m.*
             |  FROM m)
             |SELECT effect,
             |  ${Rounding.duckSql("ss / 10000.0")} AS ss_dollars_sq,
             |  df,
             |  ${Rounding.duckSql(
                  "(ss / df::DOUBLE) / (ss_w / df_w::DOUBLE)")} AS f_stat,
             |  ${Rounding.duckSql("ss / sst")} AS eta_sq
             |FROM u
             |ORDER BY effect""".stripMargin)),

    // ------------------------------------------------------------------
    // q447: partial correlation — does quantity still predict line
    // price once the discount is held fixed?
    // r_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)), all three
    // pairwise correlations from ONE pass of exact LONG/decimal product
    // sums (quantity, price cents, discount basis points), the
    // controlled coefficient a fixed double sequence on top. Emits the
    // raw trio alongside so the confounding story is visible.
    Q(
      "q447_partial_correlation",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
          .select(col("l_quantity").cast("long").as("x"),
            floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("y"),
            floor(col("l_discount") * 10000 + 0.5).cast("long").as("z"))
        val g = li.agg(count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"), sum("z").as("sz"),
          sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
          sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"),
          sum((col("z") * col("z")).cast("decimal(38,0)")).as("szz"),
          sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
          sum((col("x") * col("z")).cast("decimal(38,0)")).as("sxz"),
          sum((col("y") * col("z")).cast("decimal(38,0)")).as("syz"))
          .withColumn("nd", col("n").cast("double"))
        def cdev(ab: String, a: String, b: String) =
          col(ab).cast("double") - (col(a).cast("double")
            * col(b).cast("double") / col("nd"))
        val r = g
          .withColumn("cxx", cdev("sxx", "sx", "sx"))
          .withColumn("cyy", cdev("syy", "sy", "sy"))
          .withColumn("czz", cdev("szz", "sz", "sz"))
          .withColumn("rxy", cdev("sxy", "sx", "sy")
            / sqrt(col("cxx") * col("cyy")))
          .withColumn("rxz", cdev("sxz", "sx", "sz")
            / sqrt(col("cxx") * col("czz")))
          .withColumn("ryz", cdev("syz", "sy", "sz")
            / sqrt(col("cyy") * col("czz")))
          .withColumn("partial", (col("rxy") - col("rxz") * col("ryz"))
            / sqrt((lit(1.0) - col("rxz") * col("rxz"))
              * (lit(1.0) - col("ryz") * col("ryz"))))
        r.select(col("n"),
          Rounding.stableRound6(col("rxy")).as("r_qty_price"),
          Rounding.stableRound6(col("rxz")).as("r_qty_discount"),
          Rounding.stableRound6(col("ryz")).as("r_price_discount"),
          Rounding.stableRound6(col("partial"))
            .as("partial_r_qty_price_given_discount"))
      },
      Some(s"""WITH li AS (
             |  SELECT CAST(l_quantity AS BIGINT) AS x,
             |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y,
             |    CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS z
             |  FROM lineitem),
             |g AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS sx,
             |    CAST(sum(y) AS BIGINT) AS sy,
             |    CAST(sum(z) AS BIGINT) AS sz,
             |    sum(x * x) AS sxx, sum(y * y) AS syy, sum(z * z) AS szz,
             |    sum(x * y) AS sxy, sum(x * z) AS sxz, sum(y * z) AS syz
             |  FROM li),
             |c AS (
             |  SELECT n,
             |    sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n::DOUBLE AS cxx,
             |    syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n::DOUBLE AS cyy,
             |    szz::DOUBLE - sz::DOUBLE * sz::DOUBLE / n::DOUBLE AS czz,
             |    sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE / n::DOUBLE AS cxy,
             |    sxz::DOUBLE - sx::DOUBLE * sz::DOUBLE / n::DOUBLE AS cxz,
             |    syz::DOUBLE - sy::DOUBLE * sz::DOUBLE / n::DOUBLE AS cyz
             |  FROM g),
             |r AS (
             |  SELECT n,
             |    cxy / sqrt(cxx * cyy) AS rxy,
             |    cxz / sqrt(cxx * czz) AS rxz,
             |    cyz / sqrt(cyy * czz) AS ryz
             |  FROM c)
             |SELECT n,
             |  ${Rounding.duckSql("rxy")} AS r_qty_price,
             |  ${Rounding.duckSql("rxz")} AS r_qty_discount,
             |  ${Rounding.duckSql("ryz")} AS r_price_discount,
             |  ${Rounding.duckSql(
                  "(rxy - rxz * ryz) / sqrt((1.0 - rxz * rxz) " +
                    "* (1.0 - ryz * ryz))")}
             |    AS partial_r_qty_price_given_discount
             |FROM r""".stripMargin)),

    // ------------------------------------------------------------------
    // q448: restricted mean survival time — "average days until first
    // purchase within the first 14 days", the clinically-preferred
    // summary when hazards aren't proportional (completes the q261
    // Kaplan-Meier / q303 Nelson-Aalen / q331 log-rank family). Each
    // user contributes a first-purchase time or a censoring time (last
    // event); the KM curve lives on the ≤30-value day domain, its
    // product survives as an exp(Σ snapped-ln) cumulative LONG walk,
    // and RMST(τ) = Σ S(tᵢ)·(interval width clipped at τ) — an exact
    // domain-frame integral, never a corpus sort.
    Q(
      "q448_rmst",
      (s, dir) => {
        val tau = 14L
        val wU = Window.partitionBy("user_id").orderBy("us", "event_id")
        val ev = Tables.load(s, dir, "events")
          .select(col("user_id"),
            unix_micros(col("ts").cast("timestamp")).as("us"),
            col("event_id"), col("event_type"))
        val per = ev
          .withColumn("t0", min("us").over(
            Window.partitionBy("user_id")))
          .withColumn("tp", min(when(col("event_type") === "purchase",
            col("us"))).over(Window.partitionBy("user_id")))
          .withColumn("tl", max("us").over(
            Window.partitionBy("user_id")))
          .groupBy("user_id")
          .agg(first("t0").as("t0"), first("tp").as("tp"),
            first("tl").as("tl"))
          .withColumn("event", col("tp").isNotNull)
          .withColumn("t", when(col("event"),
            expr("(tp - t0) div 86400000000"))
            .otherwise(expr("(tl - t0) div 86400000000")))
        val dom = per.groupBy("t").agg(
            sum(when(col("event"), 1L).otherwise(0L)).as("d"),
            count(lit(1)).as("c"))
          .withColumn("after", sum("c").over(Window.orderBy("t")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)))
          .withColumn("ln9", when(col("d") >= col("after"),
            // the last at-risk user converts: S hits exactly 0 — a
            // deterministic ln(1e-12) sentinel keeps both engines off
            // the ln(0) domain error while snapping S(t) to ~0
            lit(-27631021116L))
            .when(col("d") > 0,
              floor(log(lit(1.0) - col("d").cast("double")
                / col("after").cast("double")) * lit(1e9) + 0.5)
                .cast("long")).otherwise(0L))
          .withColumn("cum9", sum("ln9").over(Window.orderBy("t")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("surv", exp(col("cum9").cast("double") / lit(1e9)))
          .withColumn("t_next", lead("t", 1).over(Window.orderBy("t")))
        // RMST = 1·min(t_first, tau) + Σ S(t_i)·clip-width(t_i..t_next)
        val head = dom.agg(min("t").as("t_first"))
          .select(least(col("t_first"), lit(tau)).cast("double")
            .as("seg"))
        val segs = dom
          .withColumn("lo", least(col("t"), lit(tau)))
          .withColumn("hi", least(coalesce(col("t_next"), lit(tau)),
            lit(tau)))
          .withColumn("seg", col("surv")
            * (col("hi") - col("lo")).cast("double"))
          .agg(sum(floor(col("seg") * lit(1e9) + 0.5).cast("long"))
            .as("segs9"))
        val kmTau = dom.where(col("t") <= tau)
          .agg(coalesce(min("cum9"), lit(0L)).as("cum9_tau"))
        per.agg(count(lit(1)).as("n_users"),
            sum(when(col("event"), 1L).otherwise(0L)).as("n_purchased"))
          .crossJoin(broadcast(head)).crossJoin(broadcast(segs))
          .crossJoin(broadcast(kmTau))
          .select(lit(tau).as("tau_days"), col("n_users"),
            col("n_purchased"),
            Rounding.stableRound6(col("seg")
              + col("segs9").cast("double") / lit(1e9)).as("rmst_days"),
            Rounding.stableRound6(
              exp(col("cum9_tau").cast("double") / lit(1e9)))
              .as("km_survival_at_tau"))
      },
      Some(s"""WITH ev AS (
             |  SELECT user_id, epoch_us(ts::TIMESTAMP) AS us,
             |    event_type
             |  FROM events),
             |per AS (
             |  SELECT user_id, min(us) AS t0,
             |    min(CASE WHEN event_type = 'purchase' THEN us END)
             |      AS tp,
             |    max(us) AS tl
             |  FROM ev GROUP BY user_id),
             |pt AS (
             |  SELECT user_id, tp IS NOT NULL AS event,
             |    CASE WHEN tp IS NOT NULL
             |      THEN (tp - t0) // 86400000000
             |      ELSE (tl - t0) // 86400000000 END AS t
             |  FROM per),
             |dom AS (
             |  SELECT t,
             |    CAST(sum(CASE WHEN event THEN 1 ELSE 0 END) AS BIGINT)
             |      AS d,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM pt GROUP BY t),
             |walk AS (
             |  SELECT t, d, c,
             |    sum(c) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
             |      AND UNBOUNDED FOLLOWING) AS after
             |  FROM dom),
             |lns AS (
             |  SELECT t, d, c, after,
             |    CASE WHEN d >= after THEN -27631021116
             |    WHEN d > 0 THEN CAST(floor(ln(1.0 - d::DOUBLE
             |      / after::DOUBLE) * 1000000000 + 0.5) AS BIGINT)
             |      ELSE 0 END AS ln9
             |  FROM walk),
             |surv AS (
             |  SELECT t, d, c,
             |    sum(ln9) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
             |      AS cum9,
             |    lead(t, 1) OVER (ORDER BY t) AS t_next
             |  FROM lns),
             |head AS (
             |  SELECT least(min(t), 14)::DOUBLE AS seg FROM surv),
             |segs AS (
             |  SELECT CAST(sum(CAST(floor(
             |    exp(cum9::DOUBLE / 1000000000)
             |    * (least(coalesce(t_next, 14), 14)
             |      - least(t, 14))::DOUBLE * 1000000000 + 0.5)
             |    AS BIGINT)) AS BIGINT) AS segs9
             |  FROM surv),
             |km AS (
             |  SELECT coalesce(min(cum9), 0) AS cum9_tau
             |  FROM surv WHERE t <= 14),
             |nu AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n_users,
             |    CAST(sum(CASE WHEN event THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_purchased
             |  FROM pt)
             |SELECT CAST(14 AS BIGINT) AS tau_days, n_users, n_purchased,
             |  ${Rounding.duckSql(
                  "seg + segs9::DOUBLE / 1000000000")} AS rmst_days,
             |  ${Rounding.duckSql(
                  "exp(cum9_tau::DOUBLE / 1000000000)")}
             |    AS km_survival_at_tau
             |FROM nu CROSS JOIN head CROSS JOIN segs CROSS JOIN km""".stripMargin)),

    // ------------------------------------------------------------------
    // q449: feature-importance ranking by decision-stump information
    // gain — q415 generalized into the model-debugging tool: for each
    // candidate feature (quantity, discount bps, tax bps, ship month)
    // the best Gini split for predicting returnflag = 'R' via its own
    // VALUE-DOMAIN cumulative walk, ranked by gain. Four bounded
    // domains, one scan each, a 4-row ranking.
    Q(
      "q449_feature_importance",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
          .select(col("l_quantity").cast("long").as("quantity"),
            floor(col("l_discount") * 10000 + 0.5).cast("long")
              .as("discount_bps"),
            floor(col("l_tax") * 10000 + 0.5).cast("long").as("tax_bps"),
            month(col("l_shipdate")).cast("long").as("ship_month"),
            when(col("l_returnflag") === "R", 1L).otherwise(0L).as("pos"))
          .localCheckpoint()
        val feats = Seq("quantity", "discount_bps", "tax_bps",
          "ship_month")
        val per = feats.map { f =>
          val dom = li.groupBy(col(f).as("v"))
            .agg(count(lit(1)).as("n_v"), sum("pos").as("pos_v"))
            .withColumn("nl", sum("n_v").over(Window.orderBy("v")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .withColumn("posl", sum("pos_v").over(Window.orderBy("v")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          val tot = dom.agg(max("nl").as("n"), max("posl").as("p"))
          dom.crossJoin(broadcast(tot))
            .where(col("nl") < col("n"))
            .withColumn("nr", col("n") - col("nl"))
            .withColumn("posr", col("p") - col("posl"))
            .withColumn("gl", lit(1.0)
              - (col("posl").cast("double") * col("posl").cast("double")
                + (col("nl") - col("posl")).cast("double")
                  * (col("nl") - col("posl")).cast("double"))
                / (col("nl").cast("double") * col("nl").cast("double")))
            .withColumn("gr", lit(1.0)
              - (col("posr").cast("double") * col("posr").cast("double")
                + (col("nr") - col("posr")).cast("double")
                  * (col("nr") - col("posr")).cast("double"))
                / (col("nr").cast("double") * col("nr").cast("double")))
            .withColumn("gw", (col("nl").cast("double") * col("gl")
              + col("nr").cast("double") * col("gr"))
              / col("n").cast("double"))
            .withColumn("gp", lit(1.0)
              - (col("p").cast("double") * col("p").cast("double")
                + (col("n") - col("p")).cast("double")
                  * (col("n") - col("p")).cast("double"))
                / (col("n").cast("double") * col("n").cast("double")))
            .withColumn("gain", col("gp") - col("gw"))
            .orderBy(col("gain").desc, col("v"))
            .limit(1)
            .select(lit(f).as("feature"), col("v").as("best_threshold"),
              Rounding.stableRound6(col("gain")).as("info_gain"))
        }
        per.reduce(_ unionAll _)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("info_gain").desc, col("feature"))))
          .orderBy("rank")
      },
      Some {
        def stump(f: String, expr0: String): String =
          s"""SELECT '$f' AS feature, v AS best_threshold, gain FROM (
             |  SELECT v,
             |    (1.0 - (p::DOUBLE * p::DOUBLE + (n - p)::DOUBLE
             |      * (n - p)::DOUBLE) / (n::DOUBLE * n::DOUBLE))
             |    - ((nl::DOUBLE * (1.0 - (posl::DOUBLE * posl::DOUBLE
             |        + (nl - posl)::DOUBLE * (nl - posl)::DOUBLE)
             |        / (nl::DOUBLE * nl::DOUBLE))
             |      + (n - nl)::DOUBLE * (1.0 - ((p - posl)::DOUBLE
             |        * (p - posl)::DOUBLE + ((n - nl) - (p - posl))::DOUBLE
             |        * ((n - nl) - (p - posl))::DOUBLE)
             |        / ((n - nl)::DOUBLE * (n - nl)::DOUBLE)))
             |      / n::DOUBLE) AS gain
             |  FROM (
             |    SELECT v,
             |      CAST(sum(n_v) OVER w AS BIGINT) AS nl,
             |      CAST(sum(pos_v) OVER w AS BIGINT) AS posl
             |    FROM (SELECT $expr0 AS v, count(*) AS n_v,
             |          sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0
             |          END) AS pos_v
             |          FROM lineitem GROUP BY 1)
             |    WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING))
             |  CROSS JOIN (
             |    SELECT CAST(count(*) AS BIGINT) AS n,
             |      CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0
             |      END) AS BIGINT) AS p
             |    FROM lineitem)
             |  WHERE nl < n
             |  ORDER BY gain DESC, v LIMIT 1)""".stripMargin
        val stumps = Seq(
          stump("quantity", "CAST(l_quantity AS BIGINT)"),
          stump("discount_bps",
            "CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)"),
          stump("tax_bps", "CAST(floor(l_tax * 10000 + 0.5) AS BIGINT)"),
          stump("ship_month", "CAST(month(l_shipdate) AS BIGINT)"))
          .mkString("\nUNION ALL\n")
        s"""WITH allf AS (
           |$stumps)
           |SELECT feature, best_threshold,
           |  floor(gain * 1000000 + 0.5) / 1000000 AS info_gain,
           |  CAST(row_number() OVER (
           |    ORDER BY floor(gain * 1000000 + 0.5) / 1000000 DESC,
           |      feature) AS BIGINT) AS rank
           |FROM allf
           |ORDER BY rank""".stripMargin
      })
  )
}
