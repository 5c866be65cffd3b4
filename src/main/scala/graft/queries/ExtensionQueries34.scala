package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.{PolyHash, Rounding}
import graft.io.Tables

/** Round-8 ninth continuation wave: the per-source dataset card
  * (q296) and a Simpson's-paradox stratification audit (q297). Same
  * contract as every other module: each Spark pipeline pairs with
  * DuckDB oracle SQL replaying it.
  */
object ExtensionQueries34 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q296: per-source dataset card — the one-row-per-source release
    // summary a corpus ships with (the per-SOURCE sibling of the
    // per-doc q200 training manifest): volume (docs, chars), language
    // spread (distinct langs + lang entropy on the 1e-9 integer term
    // grid), exact-duplicate rate from the content-hash distinct count
    // (the q43 fingerprint), English share, and mean length. One scan
    // feeds every signal: a (source, lang) agg for the entropy terms, a
    // (source) agg with count(distinct hash) for the rest, joined on
    // the tiny source frame — nothing here is data-sized after the
    // first shuffle.
    Q(
      "q296_dataset_card",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .select(col("source"), col("lang"), col("n_chars"),
            PolyHash(col("text")).as("fp"))
        val base = docs.groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"),
            countDistinct("fp").as("n_distinct"),
            countDistinct("lang").as("n_langs"),
            sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"))
        val ent = docs.groupBy("source", "lang")
          .agg(count(lit(1)).as("c"))
          .join(base.select(col("source"), col("n_docs")), "source")
          .withColumn("t9",
            floor((col("c").cast("double") / col("n_docs").cast("double")) *
              log(col("c").cast("double") / col("n_docs").cast("double")) *
              lit(1000000000.0) + lit(0.5)).cast("long"))
          .groupBy("source").agg(sum("t9").as("e9"))
        base.join(ent, "source")
          .select(col("source"), col("n_docs"), col("total_chars"),
            col("n_langs"),
            Rounding.stableRound6(-col("e9").cast("double") /
              lit(1000000000.0)).as("lang_entropy"),
            Rounding.stableRound6(
              (col("n_docs") - col("n_distinct")).cast("double") /
                col("n_docs").cast("double")).as("dup_rate"),
            Rounding.stableRound6(col("n_en").cast("double") /
              col("n_docs").cast("double")).as("en_share"),
            Rounding.stableRound6(col("total_chars").cast("double") /
              col("n_docs").cast("double")).as("mean_chars"))
          .orderBy("source")
      },
      Some(s"""WITH d AS (
             |  SELECT source, lang, n_chars,
             |    ${PolyHash.duckSql("text")} AS fp
             |  FROM documents),
             |base AS (
             |  SELECT source, count(*) AS n_docs, sum(n_chars)
             |      AS total_chars,
             |    count(DISTINCT fp) AS n_distinct,
             |    count(DISTINCT lang) AS n_langs,
             |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_en
             |  FROM d GROUP BY source),
             |ent AS (
             |  SELECT sl.source, sum(CAST(floor(
             |    (sl.c::DOUBLE / b.n_docs::DOUBLE) *
             |    ln(sl.c::DOUBLE / b.n_docs::DOUBLE) *
             |    1000000000.0 + 0.5) AS BIGINT)) AS e9
             |  FROM (SELECT source, lang, count(*) AS c FROM d
             |        GROUP BY source, lang) sl
             |  JOIN base b ON b.source = sl.source
             |  GROUP BY sl.source)
             |SELECT b.source, CAST(n_docs AS BIGINT) AS n_docs,
             |  CAST(total_chars AS BIGINT) AS total_chars,
             |  CAST(n_langs AS BIGINT) AS n_langs,
             |  ${Rounding.duckSql("-e9::DOUBLE / 1000000000.0")}
             |    AS lang_entropy,
             |  ${Rounding.duckSql(
                  "(n_docs - n_distinct)::DOUBLE / n_docs::DOUBLE")}
             |    AS dup_rate,
             |  ${Rounding.duckSql("n_en::DOUBLE / n_docs::DOUBLE")}
             |    AS en_share,
             |  ${Rounding.duckSql(
                  "total_chars::DOUBLE / n_docs::DOUBLE")} AS mean_chars
             |FROM base b JOIN ent ON ent.source = b.source
             |ORDER BY b.source""".stripMargin)),

    // ------------------------------------------------------------------
    // q297: Simpson's-paradox stratification audit — does the overall
    // cohort effect (conversion-rate difference between user cohorts)
    // REVERSE inside any event-type stratum? The aggregation trap every
    // observational readout of logged data must check before shipping a
    // conclusion (the q284/q295 estimators assume the logged propensity
    // is the only confounder; this audit is the cheap alarm for the
    // stratified kind). Per stratum and overall: exact LONG counts, one
    // double rate-difference each, and a reversed flag comparing each
    // stratum's sign against the overall sign — the overall row rides
    // the same output with stratum '__all'. One scan, one 4-ish-key
    // agg, one broadcast 1-row overall frame.
    Q(
      "q297_simpson_audit",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select(col("event_type").as("stratum"),
            (col("user_id") % 2).as("cohort"),
            when(col("value") > 50.0, 1L).otherwise(0L).as("y"))
        def rates(df: org.apache.spark.sql.DataFrame, keys: Seq[String]) =
          df.groupBy(keys.map(col): _*)
            .agg(
              sum(when(col("cohort") === 1L, 1L).otherwise(0L)).as("n1"),
              sum(when(col("cohort") === 1L, col("y")).otherwise(0L))
                .as("s1"),
              sum(when(col("cohort") === 0L, 1L).otherwise(0L)).as("n0"),
              sum(when(col("cohort") === 0L, col("y")).otherwise(0L))
                .as("s0"))
        val diffCol = col("s1").cast("double") / col("n1").cast("double") -
          col("s0").cast("double") / col("n0").cast("double")
        val overall = rates(ev, Seq.empty)
          .select(diffCol.as("overall_diff"))
        val strata = rates(ev, Seq("stratum"))
          .filter(col("n1") > 0 && col("n0") > 0)
          .crossJoin(broadcast(overall))
          .select(col("stratum"), col("n1"), col("n0"),
            Rounding.stableRound6(diffCol).as("rate_diff"),
            (signum(diffCol) =!= signum(col("overall_diff")))
              .as("reversed"))
        val overallRow = rates(ev, Seq.empty)
          .select(lit("__all").as("stratum"), col("n1"), col("n0"),
            Rounding.stableRound6(diffCol).as("rate_diff"),
            lit(false).as("reversed"))
        strata.unionByName(overallRow).orderBy("stratum")
      },
      Some("""WITH ev AS (
             |  SELECT event_type AS stratum, user_id % 2 AS cohort,
             |    CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS y
             |  FROM events),
             |st AS (
             |  SELECT stratum,
             |    sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS n1,
             |    sum(CASE WHEN cohort = 1 THEN y ELSE 0 END) AS s1,
             |    sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS n0,
             |    sum(CASE WHEN cohort = 0 THEN y ELSE 0 END) AS s0
             |  FROM ev GROUP BY stratum),
             |ov AS (
             |  SELECT sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS n1,
             |    sum(CASE WHEN cohort = 1 THEN y ELSE 0 END) AS s1,
             |    sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS n0,
             |    sum(CASE WHEN cohort = 0 THEN y ELSE 0 END) AS s0
             |  FROM ev)
             |SELECT * FROM (
             |  SELECT st.stratum, CAST(st.n1 AS BIGINT) AS n1,
             |    CAST(st.n0 AS BIGINT) AS n0,
             |    floor((st.s1::DOUBLE / st.n1::DOUBLE
             |      - st.s0::DOUBLE / st.n0::DOUBLE) * 1000000 + 0.5)
             |      / 1000000 AS rate_diff,
             |    sign(st.s1::DOUBLE / st.n1::DOUBLE
             |        - st.s0::DOUBLE / st.n0::DOUBLE)
             |      <> sign(ov.s1::DOUBLE / ov.n1::DOUBLE
             |        - ov.s0::DOUBLE / ov.n0::DOUBLE) AS reversed
             |  FROM st CROSS JOIN ov
             |  WHERE st.n1 > 0 AND st.n0 > 0
             |  UNION ALL
             |  SELECT '__all', CAST(n1 AS BIGINT), CAST(n0 AS BIGINT),
             |    floor((s1::DOUBLE / n1::DOUBLE - s0::DOUBLE / n0::DOUBLE)
             |      * 1000000 + 0.5) / 1000000,
             |    false
             |  FROM ov)
             |ORDER BY stratum""".stripMargin))
  )
}
