package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.TextAnalysis
import graft.functions.Rounding
import graft.io.Tables

/** Round-9 fourth wave: Benjamini-Hochberg FDR control across the
  * per-metric A/B tests (q330 — run enough metrics and something is
  * "significant" by luck; BH is the standard correction), the log-rank
  * two-group survival test (q331 — completes the q261/q303 survival
  * family with its canonical hypothesis test), and leave-one-source-out
  * jackknife SE (q332 — the closed-form uncertainty for "how much does
  * any single source move the corpus quality metric"). Same contract as
  * every other module: each Spark pipeline pairs with DuckDB oracle SQL
  * replaying it.
  */
object ExtensionQueries46 {

  private def inList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("(", ", ", ")")

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q330: Benjamini-Hochberg FDR across the five per-event-type A/B
    // z-tests (arms = user_id % 2, metric = event value in exact LONG
    // cents; Welch-style z from the n·Σx²−S² integer identities). BH
    // needs p-value ORDER plus the thresholds p ≤ α·k/m; on the z
    // scale that is |z|_(k) ≥ Φ⁻¹(1 − α·k/(2m)) — with m = 5 fixture
    // metrics (FixtureSpec pins the event-type set) and α = 0.05 those
    // five thresholds are BURNED IN as literals (2.575829, 2.326348,
    // 2.170090, 2.053749, 1.959964 — standard normal quantiles), so
    // both engines compare the identical doubles and no erf/Φ
    // implementation difference can flip a verdict. |z| snaps before
    // ranking (round-before-rank); the rank window runs over the
    // 5-row metric frame (value-domain discipline).
    Q(
      "q330_bh_fdr",
      (s, dir) => {
        import s.implicits._
        val zstar = Seq((1L, 2.575829), (2L, 2.326348), (3L, 2.170090),
          (4L, 2.053749), (5L, 1.959964)).toDF("rank", "zstar")
        val ev = Tables.load(s, dir, "events")
          .select(col("event_type"), (col("user_id") % 2).as("arm"),
            round(col("value") * 100).cast("long").as("cents"))
        val m = ev.groupBy("event_type", "arm")
          .agg(count(lit(1)).as("n"), sum("cents").as("sx"),
            sum(col("cents") * col("cents")).as("sxx"))
          .withColumn("mean", col("sx").cast("double") / col("n").cast("double"))
          .withColumn("vr",
            (col("n") * col("sxx") - col("sx") * col("sx")).cast("double") /
              (col("n") * (col("n") - 1)).cast("double"))
        val z = m.where(col("arm") === 0)
          .select(col("event_type"), col("n").as("n0"),
            col("mean").as("m0"), col("vr").as("v0"))
          .join(m.where(col("arm") === 1)
            .select(col("event_type"), col("n").as("n1"),
              col("mean").as("m1"), col("vr").as("v1")), "event_type")
          .select(col("event_type"),
            Rounding.stableRound6((col("m0") - col("m1")) /
              sqrt(col("v0") / col("n0").cast("double") +
                col("v1") / col("n1").cast("double"))).as("z"))
        val ranked = z
          .withColumn("az", abs(col("z")))
          // 5-row metric frame: the global window is value-domain-sized
          .withColumn("rank", row_number().over(
            Window.orderBy(desc("az"), col("event_type"))).cast("long"))
          .join(broadcast(zstar), "rank")
          .withColumn("ok", col("az") >= col("zstar"))
        val kmax = Window.partitionBy()
        ranked
          .withColumn("kmax", max(when(col("ok"), col("rank"))).over(kmax))
          .select(col("event_type"), col("rank"), col("z"),
            (col("rank") <= coalesce(col("kmax"), lit(0L))).as("rejected"))
          .orderBy("rank")
      },
      Some(s"""WITH ev AS (
             |  SELECT event_type, user_id % 2 AS arm,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events),
             |m AS (
             |  SELECT event_type, arm, count(*) AS n,
             |    CAST(sum(cents) AS BIGINT) AS sx,
             |    CAST(sum(cents*cents) AS BIGINT) AS sxx
             |  FROM ev GROUP BY event_type, arm),
             |mm AS (
             |  SELECT event_type, arm, n,
             |    sx::DOUBLE / n::DOUBLE AS mean,
             |    (n*sxx - sx*sx)::DOUBLE / (n*(n-1))::DOUBLE AS vr
             |  FROM m),
             |z AS (
             |  SELECT a.event_type,
             |    ${Rounding.duckSql(
                  "(a.mean - b.mean) / sqrt(a.vr / a.n::DOUBLE + " +
                    "b.vr / b.n::DOUBLE)")} AS z
             |  FROM mm a JOIN mm b ON a.event_type = b.event_type
             |    AND a.arm = 0 AND b.arm = 1),
             |zs AS (SELECT * FROM (VALUES (1, 2.575829), (2, 2.326348),
             |  (3, 2.170090), (4, 2.053749), (5, 1.959964))
             |  AS t(rank, zstar)),
             |ranked AS (
             |  SELECT event_type, z, abs(z) AS az,
             |    row_number() OVER (ORDER BY abs(z) DESC, event_type)
             |      AS rank
             |  FROM z),
             |ok AS (
             |  SELECT r.event_type, r.rank, r.z,
             |    r.az >= s.zstar AS ok
             |  FROM ranked r JOIN zs s ON s.rank = r.rank),
             |km AS (SELECT max(CASE WHEN ok THEN rank END) AS kmax FROM ok)
             |SELECT o.event_type, CAST(o.rank AS BIGINT) AS rank, o.z,
             |  o.rank <= coalesce(km.kmax, 0) AS rejected
             |FROM ok o CROSS JOIN km
             |ORDER BY o.rank""".stripMargin)),

    // ------------------------------------------------------------------
    // q331: log-rank test — do the two arms (user_id % 2) differ in
    // view→purchase conversion time? q261's duration/censoring
    // construction verbatim, then the canonical test: at each distinct
    // event day t, O₁ = d₁t observed arm-1 conversions,
    // E₁ = d_t·n₁t/n_t expected under H₀,
    // V = d_t·(n₁t/n_t)·(1−n₁t/n_t)·(n_t−d_t)/(n_t−1), and
    // χ² = (ΣO₁−ΣE₁)²/ΣV against χ²₁. At-risk counts come from
    // reverse-cumulative windows over the DAY-domain frame (≤31 rows —
    // the q248/q261 value-domain discipline), every count an exact
    // LONG; E and V are single double expressions over those longs.
    Q(
      "q331_logrank_test",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts").cast("timestamp")).as("t"))
        val perUser = e.groupBy("user_id")
          .agg(min(when(col("event_type") === "view", col("t"))).as("tv"),
            max("t").as("tlast"))
          .where(col("tv").isNotNull)
        val durs = perUser
          .join(e.where(col("event_type") === "purchase")
            .select(col("user_id"), col("t").as("pt")),
            Seq("user_id"), "left")
          .groupBy("user_id")
          .agg(first("tv").as("tv"), first("tlast").as("tlast"),
            min(when(col("pt") >= col("tv"), col("pt"))).as("tp"))
          .select((col("user_id") % 2).as("arm"),
            when(col("tp").isNotNull, lit(1L)).otherwise(lit(0L))
              .as("event"),
            expr("(coalesce(tp, tlast) - tv) div 86400000000")
              .as("t_days"))
        val byDay = durs.groupBy("t_days")
          .agg(sum("event").as("d"), count(lit(1)).as("cnt"),
            sum(when(col("arm") === 1, col("event")).otherwise(0L))
              .as("d1"),
            sum(when(col("arm") === 1, 1L).otherwise(0L)).as("cnt1"))
        val tot = Window.partitionBy()
        val wPrev = Window.orderBy("t_days")
          .rowsBetween(Window.unboundedPreceding, -1)
        val risk = byDay
          .withColumn("n_risk",
            sum("cnt").over(tot) - coalesce(sum("cnt").over(wPrev), lit(0L)))
          .withColumn("n1_risk",
            sum("cnt1").over(tot) -
              coalesce(sum("cnt1").over(wPrev), lit(0L)))
          .where(col("d") > 0 && col("n_risk") > 1)
        val p1 = col("n1_risk").cast("double") / col("n_risk").cast("double")
        risk.agg(
            sum("d1").cast("long").as("o1"),
            sum(col("d").cast("double") * p1).as("e1"),
            sum(col("d").cast("double") * p1 * (lit(1.0) - p1) *
              (col("n_risk") - col("d")).cast("double") /
              (col("n_risk") - 1).cast("double")).as("v"))
          .select(col("o1"), Rounding.stableRound6(col("e1")).as("e1"),
            Rounding.stableRound6(
              (col("o1").cast("double") - col("e1")) *
                (col("o1").cast("double") - col("e1")) / col("v"))
              .as("chi2"))
          .withColumn("significant", col("chi2") > 3.841)
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
             |pu AS (
             |  SELECT user_id,
             |    min(CASE WHEN event_type = 'view' THEN t END) AS tv,
             |    max(t) AS tlast
             |  FROM e GROUP BY user_id),
             |pu2 AS (SELECT * FROM pu WHERE tv IS NOT NULL),
             |durs AS (
             |  SELECT p.user_id % 2 AS arm,
             |    CASE WHEN min(CASE WHEN pur.pt >= p.tv THEN pur.pt END)
             |      IS NOT NULL THEN 1 ELSE 0 END AS event,
             |    (coalesce(min(CASE WHEN pur.pt >= p.tv THEN pur.pt END),
             |      any_value(p.tlast)) - any_value(p.tv)) // 86400000000
             |      AS t_days
             |  FROM pu2 p LEFT JOIN (
             |    SELECT user_id, t AS pt FROM e
             |    WHERE event_type = 'purchase') pur
             |    ON pur.user_id = p.user_id
             |  GROUP BY p.user_id),
             |byday AS (
             |  SELECT t_days, sum(event) AS d, count(*) AS cnt,
             |    sum(CASE WHEN arm = 1 THEN event ELSE 0 END) AS d1,
             |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS cnt1
             |  FROM durs GROUP BY t_days),
             |risk AS (
             |  SELECT t_days, d, d1,
             |    sum(cnt) OVER () - coalesce(sum(cnt) OVER w, 0) AS n_risk,
             |    sum(cnt1) OVER () - coalesce(sum(cnt1) OVER w, 0)
             |      AS n1_risk
             |  FROM byday
             |  WINDOW w AS (ORDER BY t_days
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
             |kept AS (SELECT * FROM risk WHERE d > 0 AND n_risk > 1),
             |agg AS (
             |  SELECT CAST(sum(d1) AS BIGINT) AS o1,
             |    sum(d::DOUBLE * (n1_risk::DOUBLE / n_risk::DOUBLE)) AS e1r,
             |    sum(d::DOUBLE * (n1_risk::DOUBLE / n_risk::DOUBLE) *
             |      (1.0 - n1_risk::DOUBLE / n_risk::DOUBLE) *
             |      (n_risk - d)::DOUBLE / (n_risk - 1)::DOUBLE) AS v
             |  FROM kept)
             |SELECT o1,
             |  floor(e1r * 1000000 + 0.5) / 1000000 AS e1,
             |  floor((o1::DOUBLE - e1r) * (o1::DOUBLE - e1r) / v
             |    * 1000000 + 0.5) / 1000000 AS chi2,
             |  floor((o1::DOUBLE - e1r) * (o1::DOUBLE - e1r) / v
             |    * 1000000 + 0.5) / 1000000 > 3.841 AS significant
             |FROM agg""".stripMargin)),

    // ------------------------------------------------------------------
    // q332: leave-one-source-out jackknife — the closed-form SE of the
    // corpus mean quality score under source removal: for each source
    // i, θ₍ᵢ₎ = (S−sᵢ)/(N−nᵢ) (the mean without that source), and
    // SE = sqrt((g−1)/g · Σ(θ₍ᵢ₎−θ̄)²). Complements the resampling
    // family (q257 Poisson / q293 / q312 bootstrap) with the exact
    // delete-one answer for "is the quality metric hostage to one
    // source". q40's quality score is an exact 1e-6-grid value, so per
    // -source sums are EXACT LONG micro-units (the q100 discipline) and
    // every θ is one double division over exact integers. Frames: one
    // doc scan → 20-source frame → two 1-row aggregations.
    Q(
      "q332_jackknife_quality",
      (s, dir) => {
        val micro = (TextAnalysis.qualityScore(col("text")) *
          lit(1000000.0)).cast("long")
        val src = Tables.load(s, dir, "documents")
          .select(col("source"), micro.as("q6"))
          .groupBy("source")
          .agg(count(lit(1)).as("n"), sum("q6").as("sq"))
        val tot = src.agg(count(lit(1)).as("g"), sum("n").as("nn"),
          sum("sq").as("ss"))
        val loo = src.crossJoin(broadcast(tot))
          .select(col("g"), col("nn"), col("ss"),
            ((col("ss") - col("sq")).cast("double") /
              (col("nn") - col("n")).cast("double")).as("theta_i"))
        loo.groupBy("g", "nn", "ss")
          .agg(sum("theta_i").as("st"),
            sum(col("theta_i") * col("theta_i")).as("stt"))
          .select(col("g").cast("long").as("n_sources"),
            col("nn").cast("long").as("n_docs"),
            Rounding.stableRound6(col("ss").cast("double") /
              col("nn").cast("double") / 1000000.0).as("mean_quality"),
            Rounding.stableRound6(sqrt(
              (col("g") - 1).cast("double") / col("g").cast("double") *
                (col("stt") - col("st") * col("st") /
                  col("g").cast("double"))) / 1000000.0)
              .as("jackknife_se"))
      },
      Some {
        val stop = inList(TextAnalysis.Markers.head._2)
        s"""WITH q AS (
           |  SELECT source,
           |    CAST(floor((0.4 * least(ws_tokens::DOUBLE / 50.0, 1.0)
           |      + 0.3 * (1.0 - punct_ratio)
           |      + 0.3 * least(stopword_ratio * 5.0, 1.0)) * 1000000 + 0.5)
           |      AS BIGINT) AS q6raw
           |  FROM (
           |    SELECT source,
           |      len(regexp_extract_all(text, '\\S+'))::BIGINT AS ws_tokens,
           |      floor(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]'))::DOUBLE
           |        / greatest(length(text), 1) * 1000000 + 0.5) / 1000000
           |        AS punct_ratio,
           |      floor(len(list_filter(regexp_extract_all(lower(text), '\\S+'),
           |          t -> t IN $stop))::DOUBLE
           |        / greatest(len(regexp_extract_all(lower(text), '\\S+')), 1)
           |        * 1000000 + 0.5) / 1000000 AS stopword_ratio
           |    FROM documents)),
           |q2 AS (SELECT source, CAST(floor(q6raw) AS BIGINT) AS q6 FROM q),
           |src AS (
           |  SELECT source, count(*) AS n, CAST(sum(q6) AS BIGINT) AS sq
           |  FROM q2 GROUP BY source),
           |tot AS (
           |  SELECT CAST(count(*) AS BIGINT) AS g,
           |    CAST(sum(n) AS BIGINT) AS nn, CAST(sum(sq) AS BIGINT) AS ss
           |  FROM src),
           |loo AS (
           |  SELECT t.g, t.nn, t.ss,
           |    (t.ss - s.sq)::DOUBLE / (t.nn - s.n)::DOUBLE AS theta_i
           |  FROM src s CROSS JOIN tot t),
           |agg AS (
           |  SELECT g, nn, ss, sum(theta_i) AS st,
           |    sum(theta_i * theta_i) AS stt
           |  FROM loo GROUP BY g, nn, ss)
           |SELECT g AS n_sources, nn AS n_docs,
           |  ${Rounding.duckSql("ss::DOUBLE / nn::DOUBLE / 1000000.0")}
           |    AS mean_quality,
           |  ${Rounding.duckSql(
                "sqrt((g - 1)::DOUBLE / g::DOUBLE * " +
                  "(stt - st * st / g::DOUBLE)) / 1000000.0")}
             |    AS jackknife_se
           |FROM agg""".stripMargin
      }))
}
