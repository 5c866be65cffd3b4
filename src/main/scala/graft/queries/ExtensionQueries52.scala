package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.TextAnalysis
import graft.functions.Rounding
import graft.io.Tables

/** Round-9 tenth wave: code-switching detection (q350 — documents
  * mixing languages are poison for single-language quality filters and
  * tokenizer fitting) and exact two-sided trimmed means (q351 — the
  * robust location estimate, computed by the q248 value-domain
  * discipline instead of any corpus-sized sort). Same contract as every
  * other module: each Spark pipeline pairs with DuckDB oracle SQL
  * replaying it.
  */
object ExtensionQueries52 {

  private def inList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("(", ", ", ")")

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q350: code-switching detection — a doc is MIXED when at least two
    // language marker families (q41's stopword sets) each hit ≥ 3
    // times: single-language quality heuristics (stopword ratio,
    // perplexity buckets) misfire on such docs, and tokenizer fitting
    // over-merges across them, so the curation pipeline routes them
    // separately. Per source: doc count, mixed count, mixed rate, and
    // the mean number of language families present (≥ 3 hits) per doc
    // — all from one scan of per-doc marker-hit counts (a 5-wide
    // codegen projection, shuffle-free until the source agg).
    Q(
      "q350_code_switching",
      (s, dir) => {
        val toks = TextAnalysis.wsTokens(lower(col("text")))
        val hitCols = TextAnalysis.Markers.map { case (l, ms) =>
          (TextAnalysis.markerHits(toks, ms) >= 3).cast("long").as(s"p_$l")
        }
        val d = Tables.load(s, dir, "documents")
          .select((col("source") +: hitCols): _*)
        val nLangs = TextAnalysis.Markers
          .map { case (l, _) => col(s"p_$l") }.reduce(_ + _)
        d.withColumn("n_langs", nLangs)
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(when(col("n_langs") >= 2, 1L).otherwise(0L))
              .as("n_mixed"),
            sum("n_langs").as("sum_langs"))
          .select(col("source"), col("n_docs"), col("n_mixed"),
            Rounding.stableRound6(col("n_mixed").cast("double") /
              col("n_docs").cast("double")).as("mixed_rate"),
            Rounding.stableRound6(col("sum_langs").cast("double") /
              col("n_docs").cast("double")).as("mean_lang_families"))
          .orderBy("source")
      },
      Some {
        val hitSelects = TextAnalysis.Markers.map { case (l, ms) =>
          s"CASE WHEN len(list_filter(toks, t -> t IN ${inList(ms)}))" +
            s" >= 3 THEN 1 ELSE 0 END AS p_$l"
        }.mkString(",\n             |    ")
        val nLangs = TextAnalysis.Markers.map("p_" + _._1).mkString(" + ")
        s"""WITH d AS (
           |  SELECT source,
           |    $hitSelects
           |  FROM (SELECT source,
           |          regexp_extract_all(lower(text), '\\S+') AS toks
           |        FROM documents)),
           |n AS (SELECT source, $nLangs AS n_langs FROM d)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(CASE WHEN n_langs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_mixed,
           |  ${Rounding.duckSql(
                "sum(CASE WHEN n_langs >= 2 THEN 1 ELSE 0 END)::DOUBLE " +
                  "/ count(*)::DOUBLE")} AS mixed_rate,
           |  ${Rounding.duckSql(
                "sum(n_langs)::DOUBLE / count(*)::DOUBLE")}
           |    AS mean_lang_families
           |FROM n
           |GROUP BY source
           |ORDER BY source""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q351: exact 10%-trimmed mean per event type — the robust location
    // estimate (q125 winsorizes, q126 flags; this REMOVES the k = ⌊n/10⌋
    // smallest and largest observations and averages the rest), and the
    // q248 value-domain discipline makes it EXACT with no corpus sort:
    // aggregate to (type, cents) counts, then the k-smallest mass is
    // Σ_v min(cnt_v, max(0, k − cum_before_v))·v — one cumulative walk
    // over the tiny value frame, partial boundary values handled by the
    // min/max clamp; the top tail mirrors with a reverse walk. Every
    // term is an exact LONG; the only double is the final division.
    Q(
      "q351_trimmed_mean",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("cents"))
        val counts = ev.groupBy("event_type", "cents")
          .agg(count(lit(1)).as("cnt"))
        val wAsc = Window.partitionBy("event_type").orderBy("cents")
          .rowsBetween(Window.unboundedPreceding, -1)
        val wDesc = Window.partitionBy("event_type").orderBy(desc("cents"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val wAll = Window.partitionBy("event_type")
        val walked = counts
          .withColumn("n", sum("cnt").over(wAll))
          .withColumn("k", expr("n DIV 10"))
          .withColumn("cb_lo", coalesce(sum("cnt").over(wAsc), lit(0L)))
          .withColumn("cb_hi", coalesce(sum("cnt").over(wDesc), lit(0L)))
          .withColumn("take_lo",
            least(col("cnt"), greatest(lit(0L), col("k") - col("cb_lo"))))
          .withColumn("take_hi",
            least(col("cnt"), greatest(lit(0L), col("k") - col("cb_hi"))))
        walked.groupBy("event_type")
          .agg(max("n").cast("long").as("n"),
            max("k").cast("long").as("k_trimmed_each_side"),
            sum(col("cnt") * col("cents")).as("s_all"),
            sum(col("take_lo") * col("cents")).as("s_lo"),
            sum(col("take_hi") * col("cents")).as("s_hi"))
          .select(col("event_type"), col("n"),
            col("k_trimmed_each_side"),
            Rounding.stableRound6(col("s_all").cast("double") /
              col("n").cast("double") / 100.0).as("mean"),
            Rounding.stableRound6(
              (col("s_all") - col("s_lo") - col("s_hi")).cast("double") /
                (col("n") - lit(2L) * col("k_trimmed_each_side")).cast("double") /
                100.0).as("trimmed_mean"))
          .orderBy("event_type")
      },
      Some("""WITH ev AS (
             |  SELECT event_type,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events),
             |counts AS (
             |  SELECT event_type, cents, count(*) AS cnt
             |  FROM ev GROUP BY event_type, cents),
             |walked AS (
             |  SELECT event_type, cents, cnt,
             |    sum(cnt) OVER (PARTITION BY event_type) AS n,
             |    sum(cnt) OVER (PARTITION BY event_type) // 10 AS k,
             |    coalesce(sum(cnt) OVER (PARTITION BY event_type
             |      ORDER BY cents
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS cb_lo,
             |    coalesce(sum(cnt) OVER (PARTITION BY event_type
             |      ORDER BY cents DESC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS cb_hi
             |  FROM counts),
             |takes AS (
             |  SELECT event_type, cents, cnt, n, k,
             |    least(cnt, greatest(0, k - cb_lo)) AS take_lo,
             |    least(cnt, greatest(0, k - cb_hi)) AS take_hi
             |  FROM walked)
             |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
             |  CAST(max(k) AS BIGINT) AS k_trimmed_each_side,
             |  floor(sum(cnt * cents)::DOUBLE / max(n)::DOUBLE
             |    / 100.0 * 1000000 + 0.5) / 1000000 AS mean,
             |  floor((sum(cnt * cents) - sum(take_lo * cents)
             |      - sum(take_hi * cents))::DOUBLE
             |    / (max(n) - 2 * max(k))::DOUBLE / 100.0
             |    * 1000000 + 0.5) / 1000000 AS trimmed_mean
             |FROM takes
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin))
  )
}
