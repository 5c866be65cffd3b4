package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{Sampling, Sketches}
import graft.functions.Rounding
import graft.io.Tables

/** Round-7 fourteenth wave: event cadence quantiles and split-balance
  * verification. Same contract as every other module: each Spark
  * pipeline pairs with DuckDB oracle SQL replaying it.
  */
object ExtensionQueries20 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q194: event cadence — per event type, p50/p90/p99 of the
    // inter-arrival time WITHIN each user's stream (seconds between an
    // event and the user's previous event of the same type): the
    // latency-profile diagnostic behind every debounce/rate-limit/
    // session knob in this engine (q154's 5 min, q160's 10 min, q29's
    // 1 h gaps are exactly cuts of this distribution). Scale shape:
    // the lag runs in a (user, type)-keyed window (keys distribute;
    // per-key streams are the unit), then the quantiles come from the
    // MERGEABLE grouped histogram sketch (q134's machinery — state =
    // #(type, bin), never a per-group value buffer). 60-second bins:
    // |est − exact| ≤ 1 min, the right resolution for knob-setting.
    Q(
      "q194_event_cadence",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts").cast("timestamp")).as("t"), col("event_id"))
        val w = Window.partitionBy("user_id", "event_type")
          .orderBy("t", "event_id")
        val gaps = e
          .withColumn("prev", lag("t", 1).over(w))
          .where(col("prev").isNotNull)
          .select(col("event_type"),
            ((col("t") - col("prev")) / 1000000L).cast("double")
              .as("gap_s"))
        Sketches.groupedHistogramQuantiles(
            gaps, "event_type", "gap_s", 60.0, Seq(0.5, 0.9, 0.99))
          .select(col("event_type"), col("q"), col("est"))
          .orderBy("event_type", "q")
      },
      Some("""WITH gaps AS (
             |  SELECT event_type,
             |    ((epoch_us(ts) - lag(epoch_us(ts)) OVER (
             |      PARTITION BY user_id, event_type
             |      ORDER BY epoch_us(ts), event_id)) // 1000000)::DOUBLE
             |      AS gap_s
             |  FROM events
             |  QUALIFY lag(epoch_us(ts)) OVER (
             |    PARTITION BY user_id, event_type
             |    ORDER BY epoch_us(ts), event_id) IS NOT NULL),
             |bins AS (
             |  SELECT event_type, floor(gap_s / 60.0) AS bin, count(*) AS c
             |  FROM gaps GROUP BY 1, 2),
             |cum AS (
             |  SELECT event_type, bin, c,
             |    sum(c) OVER (PARTITION BY event_type ORDER BY bin
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |    sum(c) OVER (PARTITION BY event_type) AS total
             |  FROM bins),
             |qs AS (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE])
             |         AS q)
             |SELECT event_type, q,
             |  (min(CASE WHEN cum >= q * total THEN bin END) + 0.5) * 60.0
             |    AS est
             |FROM cum CROSS JOIN qs
             |GROUP BY 1, 2
             |ORDER BY event_type, q""".stripMargin)),

    // ------------------------------------------------------------------
    // q195: split balance verification — the chi-square statistic of
    // the (split × language) contingency for q166's leakage-safe
    // train/val/test assignment: a salted-hash split SHOULD be
    // independent of language, and this is the audit that proves it
    // (a biased split silently shifts eval difficulty — the QA gate
    // between q166 and any reported metric). Expected cells from
    // integer marginal products; the statistic sums (o·N − rm·cm)² /
    // (rm·cm·N) over the densified grid — identical double ops both
    // engines, q141's discipline. One row per split with its doc
    // count plus the per-split chi-square contribution.
    Q(
      "q195_split_balance",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))))
              .as("fp"))
        val canon = d.groupBy("fp").agg(min("doc_id").as("canonical_id"))
        val withSplit = Sampling.hashSplit(d.join(canon, "fp"),
          "canonical_id", "leak42",
          Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
        val cells = withSplit.groupBy("split", "lang")
          .agg(count(lit(1)).as("o"))
        // densify over the full split x lang grid (absent cells are
        // real zeros and contribute (0 - e)^2 / e)
        val splits = cells.select("split").distinct()
        val langs = cells.select("lang").distinct()
        val grid = splits.crossJoin(langs)
          .join(cells, Seq("split", "lang"), "left")
          .select(col("split"), col("lang"),
            coalesce(col("o"), lit(0L)).as("o"))
        val wS = Window.partitionBy("split")
        val wL = Window.partitionBy("lang")
        val g = Window.partitionBy()
        grid
          .withColumn("rm", sum("o").over(wS))
          .withColumn("cm", sum("o").over(wL))
          .withColumn("n", sum("o").over(g))
          .withColumn("contrib",
            ((col("o") * col("n") - col("rm") * col("cm"))
              .cast("double") *
              (col("o") * col("n") - col("rm") * col("cm"))
                .cast("double")) /
              (col("rm") * col("cm")).cast("double") / col("n").cast("double"))
          .groupBy("split")
          .agg(first("rm").as("n_docs"),
            Rounding.stableRound6(sum("contrib")).as("chi2_contrib"))
          .select(col("split"), col("n_docs"), col("chi2_contrib"))
          .orderBy("split")
      },
      Some(s"""WITH d AS (
             |  SELECT doc_id, lang,
             |    md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
             |  FROM documents),
             |canon AS (SELECT fp, min(doc_id) AS canonical_id FROM d
             |          GROUP BY fp),
             |ws AS (
             |  SELECT d.doc_id, d.lang,
             |    CASE WHEN b < 8000 THEN 'train'
             |         WHEN b < 9000 THEN 'val' ELSE 'test' END AS split
             |  FROM (SELECT d.doc_id, d.lang,
             |          ${Sampling.bucketDuckSql("leak42", "c.canonical_id")}
             |            AS b
             |        FROM d JOIN canon c USING (fp)) AS d),
             |cells AS (SELECT split, lang, count(*) AS o FROM ws
             |          GROUP BY 1, 2),
             |grid AS (
             |  SELECT s.split, l.lang, coalesce(c.o, 0) AS o
             |  FROM (SELECT DISTINCT split FROM cells) s
             |  CROSS JOIN (SELECT DISTINCT lang FROM cells) l
             |  LEFT JOIN cells c ON c.split = s.split AND c.lang = l.lang),
             |x AS (
             |  SELECT split, lang, o,
             |    sum(o) OVER (PARTITION BY split) AS rm,
             |    sum(o) OVER (PARTITION BY lang) AS cm,
             |    sum(o) OVER () AS n
             |  FROM grid)
             |SELECT split, CAST(min(rm) AS BIGINT) AS n_docs,
             |  ${Rounding.duckSql(
                  "sum((o * n - rm * cm)::DOUBLE * (o * n - rm * cm)::DOUBLE " +
                    "/ (rm * cm)::DOUBLE / n::DOUBLE)")} AS chi2_contrib
             |FROM x
             |GROUP BY split
             |ORDER BY split""".stripMargin))
  )
}
