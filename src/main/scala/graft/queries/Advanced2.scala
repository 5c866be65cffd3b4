package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, TextAnalysis}
import graft.io.Tables

/** Third relational wave (pivot, lag/lead, exact percentiles) plus the
  * end-to-end curation pipeline — the composed "LLM data cleaning" job
  * that chains quality scoring, language ID and exact dedup the way a
  * real 100 TB corpus pass would.
  */
object Advanced2 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q26: pivot — one output column per order status. Spark's pivot with
    // explicit values (no extra distinct-values job) == manual CASE
    // aggregation in the oracle; identical column names by construction.
    Q(
      "q26_pivot_status",
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(round(sum("o_totalprice"), 2))
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS F,
             |  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS O,
             |  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS P
             |FROM orders
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // ------------------------------------------------------------------
    // q27: lag/lead analytics — per-customer order-to-order deltas.
    Q(
      "q27_order_deltas",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        Tables.load(s, dir, "orders")
          .withColumn("prev_price", lag("o_totalprice", 1).over(w))
          .withColumn("next_date", lead("o_orderdate", 1).over(w))
          .where(col("prev_price").isNotNull)
          .select(col("o_orderkey"), col("o_custkey"),
            round(col("o_totalprice") - col("prev_price"), 2).as("delta"),
            datediff(col("next_date"), col("o_orderdate")).as("days_to_next"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  round(o_totalprice - prev_price, 2) AS delta,
             |  date_diff('day', o_orderdate, next_date)::INT AS days_to_next
             |FROM (
             |  SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
             |    lag(o_totalprice) OVER w AS prev_price,
             |    lead(o_orderdate) OVER w AS next_date
             |  FROM orders
             |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
             |WHERE prev_price IS NOT NULL
             |ORDER BY o_orderkey""".stripMargin)),

    // ------------------------------------------------------------------
    // q28: exact percentiles (sort-based `percentile`, linear
    // interpolation — same definition as DuckDB quantile_cont).
    // MEMORY CONTRACT: `percentile` buffers every group value in one
    // aggregation state — O(values-per-group) heap, NOT mergeable-
    // bounded. With 3 enum groups that is ~N/3 doubles per buffer, so
    // this exact form is only safe where the per-group row count fits
    // an executor (ad-hoc/interactive scale). At corpus scale use the
    // engine's mergeable quantiles instead: Sketches.histogramQuantiles
    // (q61) or the grouped inline histogram form (q125) — state bounded
    // by bin count, deterministic, oracle-replayable. q28 stays exact
    // on purpose: it is the surface that PINS the percentile ≡
    // quantile_cont equivalence the sketch gates are judged against.
    Q(
      "q28_price_percentiles",
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .groupBy("o_orderstatus")
          .agg(
            graft.functions.Rounding.stableRound6(
              expr("percentile(o_totalprice, 0.5)")).as("med"),
            graft.functions.Rounding.stableRound6(
              expr("percentile(o_totalprice, 0.9)")).as("p90"))
          .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus,
             |  floor(quantile_cont(o_totalprice, 0.5) * 1000000 + 0.5) / 1000000 AS med,
             |  floor(quantile_cont(o_totalprice, 0.9) * 1000000 + 0.5) / 1000000 AS p90
             |FROM orders
             |GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin)),

    // ------------------------------------------------------------------
    // q29: batch sessionization — gap-based session assignment via
    // lag + cumulative boundary counting (the batch twin of
    // streaming.EventStreams.gapSessions; a session starts when the gap
    // since the user's previous event exceeds 1 hour). Pure integer
    // window math — fully oracle-replayable.
    Q(
      "q29_sessionization",
      (s, dir) => {
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val evts = Tables.load(s, dir, "events")
          .withColumn("prev_ts", lag("ts", 1).over(byUser))
          // fractional-second gap: ntz→timestamp→double (UTC session) ==
          // DuckDB's epoch(); unix_timestamp would truncate to whole
          // seconds and diverge from the oracle on gaps in (3600, 3601)
          .withColumn("new_session",
            when(col("prev_ts").isNull
              || col("ts").cast("timestamp").cast("double")
                - col("prev_ts").cast("timestamp").cast("double") > 3600, 1)
              .otherwise(0))
          .withColumn("session_idx",
            sum("new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        evts
          .groupBy("user_id", "session_idx")
          .agg(count(lit(1)).as("n_events"),
            round(sum("value"), 2).as("session_value"))
          .orderBy("user_id", "session_idx")
      },
      Some("""SELECT user_id, session_idx, count(*) AS n_events,
             |  round(sum(value), 2) AS session_value
             |FROM (
             |  SELECT user_id, value,
             |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
             |  FROM (
             |    SELECT user_id, ts, event_id, value,
             |      CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             |             OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 3600
             |           THEN 1 ELSE 0 END AS new_session
             |    FROM events))
             |GROUP BY user_id, session_idx
             |ORDER BY user_id, session_idx""".stripMargin)),

    // ------------------------------------------------------------------
    // q52: the composed curation pipeline — quality + language filter +
    // exact-dedup canonical selection in one pass over documents. This is
    // the shape of a real training-data cleaning job: narrow per-row
    // scoring, one fingerprint shuffle, survivors out.
    Q(
      "q52_curation_pipeline",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val scored = docs.select(
          col("doc_id"),
          TextAnalysis.qualityScore(col("text")).as("quality"),
          TextAnalysis.langId(col("text")).as("lang_pred"),
          TextAnalysis.fingerprintMd5(col("text")).as("fp"))
        val w = Window.partitionBy("fp")
        scored
          .withColumn("canonical_id", min(col("doc_id")).over(w))
          .where(col("doc_id") === col("canonical_id")
            && col("quality") >= 0.5 && col("lang_pred") === "en")
          .select("doc_id", "lang_pred", "quality")
          .orderBy("doc_id")
      },
      Some(s"""WITH scored AS (
             |  SELECT doc_id,
             |    floor((0.4 * least(len(regexp_extract_all(text, '\\S+'))::DOUBLE / 50.0, 1.0)
             |      + 0.3 * (1.0 - floor(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]'))::DOUBLE
             |          / greatest(length(text), 1) * 1000000 + 0.5) / 1000000)
             |      + 0.3 * least(floor(len(list_filter(regexp_extract_all(lower(text), '\\S+'),
             |            t -> t IN ('the', 'a', 'and', 'of', 'is', 'to', 'in')))::DOUBLE
             |          / greatest(len(regexp_extract_all(lower(text), '\\S+')), 1) * 1000000 + 0.5)
             |          / 1000000 * 5.0, 1.0)) * 1000000 + 0.5) / 1000000 AS quality,
             |    ${langPredSql("text")} AS lang_pred,
             |    md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
             |  FROM documents),
             |dedup AS (
             |  SELECT *, min(doc_id) OVER (PARTITION BY fp) AS canonical_id
             |  FROM scored)
             |SELECT doc_id, lang_pred, quality
             |FROM dedup
             |WHERE doc_id = canonical_id AND quality >= 0.5 AND lang_pred = 'en'
             |ORDER BY doc_id""".stripMargin))
  )

  /** DuckDB replay of TextAnalysis.langId over a text expression. */
  private def langPredSql(textExpr: String): String = {
    val toks = s"regexp_extract_all(lower($textExpr), '\\S+')"
    def score(ms: Seq[String]) =
      s"len(list_filter($toks, t -> t IN ${ms.map(m => s"'$m'").mkString("(", ", ", ")")}))"
    val scores = TextAnalysis.Markers.map { case (l, ms) => l -> score(ms) }
    val best = s"greatest(${scores.map(_._2).mkString(", ")})"
    val cases = scores.map { case (l, sc) => s"WHEN $sc = $best THEN '$l'" }.mkString(" ")
    s"(CASE WHEN $best = 0 THEN 'unknown' $cases ELSE 'unknown' END)"
  }
}
