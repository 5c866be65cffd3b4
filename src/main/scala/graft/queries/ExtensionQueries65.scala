package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.Rounding
import graft.io.Tables
import graft.ops.Text

/** Round-9 twenty-third wave: growth accounting (q398), SLO burn-rate
  * monitoring (q399), a per-source curation scorecard capstone (q400),
  * and weighted effective sample size (q401).
  */
object ExtensionQueries65 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q398: growth accounting — the canonical DAU decomposition, by
    // event-day: each active user is NEW (never seen before),
    // RETAINED (active the previous day) or RESURRECTED (seen before,
    // not yesterday); CHURNED counts yesterday's actives who did not
    // return. Built from the distinct (user, day) frame with one
    // first-seen groupBy and one self-join on the previous day —
    // set algebra on keyed joins, no window over users. The identity
    // active_today = new + retained + resurrected holds by
    // construction and is spec-asserted.
    Q(
      "q398_growth_accounting",
      (s, dir) => {
        val ud = Tables.load(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .distinct().localCheckpoint()
        val first = ud.groupBy("user_id").agg(min("day").as("first_day"))
        val prev = ud.select(col("user_id"),
          date_add(col("day"), 1).as("day"), lit(1L).as("was_prev"))
        val today = ud.join(first, "user_id")
          .join(prev, Seq("user_id", "day"), "left")
          .select(col("day"),
            when(col("first_day") === col("day"), 1L).otherwise(0L)
              .as("is_new"),
            when(col("was_prev").isNotNull &&
              col("first_day") =!= col("day"), 1L).otherwise(0L)
              .as("is_retained"),
            when(col("was_prev").isNull &&
              col("first_day") =!= col("day"), 1L).otherwise(0L)
              .as("is_resurrected"))
          .groupBy("day")
          .agg(count(lit(1)).as("active"), sum("is_new").as("n_new"),
            sum("is_retained").as("n_retained"),
            sum("is_resurrected").as("n_resurrected"))
        val churned = ud.select(col("user_id"),
            date_add(col("day"), 1).as("day"))
          .join(ud, Seq("user_id", "day"), "left_anti")
          .groupBy("day").agg(count(lit(1)).as("n_churned"))
        today.join(churned, Seq("day"), "left")
          .na.fill(0L, Seq("n_churned"))
          .orderBy("day")
      },
      Some("""WITH ud AS (
             |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
             |  FROM events),
             |first AS (
             |  SELECT user_id, min(day) AS first_day FROM ud GROUP BY 1),
             |today AS (
             |  SELECT ud.day,
             |    CAST(count(*) AS BIGINT) AS active,
             |    CAST(sum(CASE WHEN f.first_day = ud.day THEN 1 ELSE 0
             |      END) AS BIGINT) AS n_new,
             |    CAST(sum(CASE WHEN p.user_id IS NOT NULL
             |      AND f.first_day <> ud.day THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_retained,
             |    CAST(sum(CASE WHEN p.user_id IS NULL
             |      AND f.first_day <> ud.day THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_resurrected
             |  FROM ud
             |  JOIN first f ON f.user_id = ud.user_id
             |  LEFT JOIN ud p ON p.user_id = ud.user_id
             |    AND p.day = ud.day - INTERVAL 1 DAY
             |  GROUP BY ud.day),
             |churn AS (
             |  SELECT a.day + INTERVAL 1 DAY AS day,
             |    CAST(count(*) AS BIGINT) AS n_churned
             |  FROM ud a ANTI JOIN ud b
             |    ON b.user_id = a.user_id
             |    AND b.day = a.day + INTERVAL 1 DAY
             |  GROUP BY 1)
             |SELECT today.day, active, n_new, n_retained, n_resurrected,
             |  CAST(coalesce(churn.n_churned, 0) AS BIGINT) AS n_churned
             |FROM today LEFT JOIN churn ON churn.day = today.day
             |ORDER BY today.day""".stripMargin)),

    // ------------------------------------------------------------------
    // q399: SLO burn rate — error-budget accounting on the event
    // stream: the SLO says at most 5% of daily events may carry
    // value > 300 (the latency-proxy threshold); the burn rate is
    // (daily violation share)/(budget share), and a day burning > 2×
    // fires the fast-burn alert (the standard multiwindow-alert
    // arithmetic, computed exactly from integer counts). One day
    // groupBy; the clock frame is date-domain-sized.
    Q(
      "q399_slo_burn",
      (s, dir) => {
        Tables.load(s, dir, "events")
          .select(to_date(col("ts")).as("day"),
            when(floor(col("value") * 100 + 0.5).cast("long") > 30000L,
              1L).otherwise(0L).as("viol"))
          .groupBy("day")
          .agg(count(lit(1)).as("n_events"), sum("viol").as("n_violations"))
          .withColumn("viol_share",
            Rounding.stableRound6(col("n_violations").cast("double") /
              col("n_events").cast("double")))
          .withColumn("burn_rate",
            Rounding.stableRound6(col("n_violations").cast("double") /
              col("n_events").cast("double") / 0.05))
          .withColumn("fast_burn", col("burn_rate") > 2.0)
          .orderBy("day")
      },
      Some(s"""WITH d AS (
             |  SELECT CAST(ts AS DATE) AS day,
             |    CAST(count(*) AS BIGINT) AS n_events,
             |    CAST(sum(CASE WHEN CAST(floor(value * 100 + 0.5)
             |      AS BIGINT) > 30000 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_violations
             |  FROM events GROUP BY 1)
             |SELECT day, n_events, n_violations,
             |  ${Rounding.duckSql(
                  "n_violations::DOUBLE / n_events::DOUBLE")}
             |    AS viol_share,
             |  ${Rounding.duckSql(
                  "n_violations::DOUBLE / n_events::DOUBLE / 0.05")}
             |    AS burn_rate,
             |  ${Rounding.duckSql(
                  "n_violations::DOUBLE / n_events::DOUBLE / 0.05")}
             |    > 2.0 AS fast_burn
             |FROM d
             |ORDER BY day""".stripMargin)),

    // ------------------------------------------------------------------
    // q400: per-source curation scorecard — the round's capstone
    // advisory table: for every source, volume, mean quality (q52's
    // formula), mean Flesch readability (q360's), the dominant
    // language with its share, and token mass — five signals meeting
    // on `source` with NO new shuffle class (two doc-frame groupBys +
    // one key-partitioned window for the dominant language), exactly
    // the q200/q389 materialization discipline. This is the table a
    // data-sourcing review actually reads.
    Q(
      "q400_source_scorecard",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .withColumn("nw",
            size(Text.words(Text.clean(col("text")))).cast("long"))
          .where(col("nw") >= 1L)
          .withColumn("q6",
            floor(graft.ext.TextAnalysis.qualityScore(col("text")) * 1e6
              + 0.5).cast("long"))
          .withColumn("f6",
            floor((lit(206.835)
              - lit(1.015) * col("nw").cast("double")
                / greatest(lit(1L),
                  size(expr("regexp_extract_all(text, '[.!?]+', 0)"))
                    .cast("long")).cast("double")
              - lit(84.6)
                * size(expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
                  .cast("double") / col("nw").cast("double"))
              * 1e6 + 0.5).cast("long"))
          .localCheckpoint()
        val base = d.groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("nw").as("token_mass"),
            sum("q6").as("sq6"), sum("f6").as("sf6"))
        val lang = d.groupBy("source", "lang")
          .agg(count(lit(1)).as("c"))
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("source").orderBy(col("c").desc, col("lang"))))
          .where(col("rn") === 1)
          .select(col("source"), col("lang").as("dominant_lang"),
            col("c").as("lang_docs"))
        base.join(lang, "source")
          .select(col("source"), col("n_docs"), col("token_mass"),
            Rounding.stableRound6(col("sq6").cast("double") /
              col("n_docs").cast("double") / 1e6).as("mean_quality"),
            Rounding.stableRound6(col("sf6").cast("double") /
              col("n_docs").cast("double") / 1e6).as("mean_flesch"),
            col("dominant_lang"),
            Rounding.stableRound6(col("lang_docs").cast("double") /
              col("n_docs").cast("double")).as("dominant_lang_share"))
          .orderBy("source")
      },
      Some(s"""WITH d AS (
             |  SELECT source, lang,
             |    len(list_filter(string_split(regexp_replace(text,
             |      '[^a-zA-Z0-9 ]', '', 'g'), ' '), w -> w <> ''))
             |      AS nw,
             |    CAST(floor((${ExtensionQueries.QualityScoreSql})
             |      * 1000000 + 0.5) AS BIGINT) AS q6,
             |    greatest(1, len(regexp_extract_all(text, '[.!?]+')))
             |      AS ns,
             |    len(regexp_extract_all(lower(text), '[aeiouy]+'))
             |      AS syl
             |  FROM documents),
             |f AS (
             |  SELECT source, lang, nw, q6,
             |    CAST(floor((206.835 - 1.015 * nw::DOUBLE / ns::DOUBLE
             |      - 84.6 * syl::DOUBLE / nw::DOUBLE) * 1000000 + 0.5)
             |      AS BIGINT) AS f6
             |  FROM d WHERE nw >= 1),
             |base AS (
             |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(nw) AS BIGINT) AS token_mass,
             |    CAST(sum(q6) AS BIGINT) AS sq6,
             |    CAST(sum(f6) AS BIGINT) AS sf6
             |  FROM f GROUP BY 1),
             |lang AS (
             |  SELECT source, lang AS dominant_lang, c AS lang_docs
             |  FROM (
             |    SELECT source, lang, count(*) AS c, row_number() OVER (
             |      PARTITION BY source ORDER BY count(*) DESC, lang)
             |      AS rn
             |    FROM f GROUP BY source, lang)
             |  WHERE rn = 1)
             |SELECT base.source, n_docs, token_mass,
             |  ${Rounding.duckSql(
                  "sq6::DOUBLE / n_docs::DOUBLE / 1000000.0")}
             |    AS mean_quality,
             |  ${Rounding.duckSql(
                  "sf6::DOUBLE / n_docs::DOUBLE / 1000000.0")}
             |    AS mean_flesch,
             |  dominant_lang,
             |  ${Rounding.duckSql(
                  "lang_docs::DOUBLE / n_docs::DOUBLE")}
             |    AS dominant_lang_share
             |FROM base
             |JOIN lang ON lang.source = base.source
             |ORDER BY base.source""".stripMargin)),

    // ------------------------------------------------------------------
    // q401: effective sample size of quality-weighted sampling — if
    // docs are drawn proportionally to quality score (the q97/q158
    // weighted regimes), how many EFFECTIVE docs does each source
    // contribute? ESS = (Σw)²/Σw² — equal weights give ESS = n,
    // concentration shrinks it; ess_ratio near 1 means weighting is
    // nearly uniform (weights carry little information), near 0 means
    // a few docs dominate. Weights are the exact 1e-6 LONG quality
    // grid, so both moment sums are exact integers.
    Q(
      "q401_effective_sample_size",
      (s, dir) => {
        Tables.load(s, dir, "documents")
          .select(col("source"),
            floor(graft.ext.TextAnalysis.qualityScore(col("text")) * 1e6
              + 0.5).cast("long").as("w6"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("w6").as("sw"),
            sum(col("w6") * col("w6")).as("sw2"))
          .select(col("source"), col("n_docs"),
            Rounding.stableRound6(
              col("sw").cast("double") * col("sw").cast("double") /
                col("sw2").cast("double")).as("ess"),
            Rounding.stableRound6(
              col("sw").cast("double") * col("sw").cast("double") /
                col("sw2").cast("double") / col("n_docs").cast("double"))
              .as("ess_ratio"))
          .orderBy("source")
      },
      Some(s"""WITH w AS (
             |  SELECT source,
             |    CAST(floor((${ExtensionQueries.QualityScoreSql})
             |      * 1000000 + 0.5) AS BIGINT) AS w6
             |  FROM documents),
             |g AS (
             |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(w6) AS BIGINT) AS sw,
             |    CAST(sum(w6 * w6) AS BIGINT) AS sw2
             |  FROM w GROUP BY 1)
             |SELECT source, n_docs,
             |  ${Rounding.duckSql(
                  "sw::DOUBLE * sw::DOUBLE / sw2::DOUBLE")} AS ess,
             |  ${Rounding.duckSql(
                  "sw::DOUBLE * sw::DOUBLE / sw2::DOUBLE" +
                    " / n_docs::DOUBLE")} AS ess_ratio
             |FROM g
             |ORDER BY source""".stripMargin))
  )
}
