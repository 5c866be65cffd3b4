package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Rounding
import graft.io.Tables
import graft.ops.Text

/** Round-7 fifth wave: sorted-neighborhood prefix containment (truncated
  * near-dup detection), per-source boilerplate n-grams, and a quality
  * threshold sweep. Same contract as every other module: each Spark
  * pipeline pairs with DuckDB oracle SQL replaying it.
  */
object ExtensionQueries11 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q168: prefix-containment dedup via sorted neighborhood — find
    // every document whose normalized text is a PREFIX of some other
    // document's (truncated crawls, re-scraped pages with appended
    // boilerplate — the near-dup class exact-hash dedup misses and
    // Jaccard under-scores when the extension is long). The classic
    // sorted-neighborhood theorem makes this one window, not a join:
    // in lexicographic order, x is a prefix of SOMETHING iff x is a
    // prefix of its IMMEDIATE successor (anything between x and a
    // superstring of x also starts with x) — so one lead() per row
    // decides global containment. Scale shape: rows partition by their
    // 2-char normalized prefix (a prefix pair always shares its first
    // 2 chars, so blocks lose nothing for len ≥ 2), the window sorts
    // WITHIN blocks — no global single-partition window (the oracle
    // replays with a global sort, same output by the block-closure
    // argument). Equal texts flag too (contained-or-equal; q43 owns
    // the exact class).
    Q(
      "q168_prefix_containment",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            lower(trim(regexp_replace(col("text"), "\\s+", " "))).as("nt"))
          .where(length(col("nt")) >= 2)
        val w = Window.partitionBy(substring(col("nt"), 1, 2))
          .orderBy("nt", "doc_id")
        d.withColumn("nxt", lead(col("nt"), 1).over(w))
          .withColumn("nxt_id", lead(col("doc_id"), 1).over(w))
          .where(col("nxt").isNotNull &&
            col("nxt").startsWith(col("nt")))
          .select(col("doc_id"), col("nxt_id").as("contained_in"),
            length(col("nt")).as("len"),
            (length(col("nxt")) - length(col("nt"))).as("extension_len"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
             |  FROM documents
             |  WHERE len(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) >= 2),
             |n AS (
             |  SELECT doc_id, nt,
             |    lead(nt) OVER (ORDER BY nt, doc_id) AS nxt,
             |    lead(doc_id) OVER (ORDER BY nt, doc_id) AS nxt_id
             |  FROM d)
             |SELECT doc_id, nxt_id AS contained_in,
             |  CAST(len(nt) AS INT) AS len,
             |  CAST(len(nxt) - len(nt) AS INT) AS extension_len
             |FROM n
             |WHERE nxt IS NOT NULL AND starts_with(nxt, nt)
             |ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q169: per-source boilerplate n-grams — the 3 word-5-grams with the
    // highest DOCUMENT frequency within each source (df ≥ 2): nav bars,
    // cookie banners, license headers — the repeated-furniture class a
    // curation pass strips BEFORE dedup so boilerplate doesn't glue
    // unrelated pages into near-dup clusters (q44/q45's shingle overlap
    // counts it otherwise). Scale shape: grams are per-doc DISTINCT
    // before any aggregation (q156's guard — a doc repeating its own
    // banner counts once), one (source, gram)-keyed df agg, then top-3
    // per source by row_number over the AGGREGATED gram-vocab frame
    // (never the corpus), full (df DESC, gram) tiebreak.
    Q(
      "q169_boilerplate_grams",
      (s, dir) => {
        val grams = Tables.load(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            expr("filter(split(text, ' '), w -> w <> '')").as("ws"))
          .where(size(col("ws")) >= 5)
          .select(col("source"), col("doc_id"), explode(expr(
            "transform(sequence(1, size(ws) - 4), " +
              "i -> concat_ws(' ', slice(ws, i, 5)))")).as("g"))
          .distinct()
        val df = grams.groupBy("source", "g").agg(count(lit(1)).as("df"))
          .where(col("df") >= 2)
        df.withColumn("rank", row_number().over(
            Window.partitionBy("source").orderBy(desc("df"), col("g"))))
          .where(col("rank") <= 3)
          .select(col("source"), col("rank"), col("g"), col("df"))
          .orderBy("source", "rank")
      },
      Some("""WITH toks AS (
             |  SELECT source, doc_id, list_filter(string_split(text, ' '),
             |    w -> w <> '') AS ws FROM documents),
             |grams AS (
             |  SELECT DISTINCT source, doc_id,
             |    array_to_string(ws[i:i+4], ' ') AS g
             |  FROM toks, UNNEST(generate_series(1, greatest(len(ws) - 4, 0)))
             |    AS t(i)),
             |df AS (SELECT source, g, count(*) AS df FROM grams
             |       GROUP BY 1, 2 HAVING count(*) >= 2),
             |ranked AS (
             |  SELECT *, row_number() OVER (PARTITION BY source
             |    ORDER BY df DESC, g) AS rank
             |  FROM df)
             |SELECT source, rank, g, CAST(df AS BIGINT) AS df
             |FROM ranked WHERE rank <= 3
             |ORDER BY source, rank""".stripMargin)),

    // ------------------------------------------------------------------
    // q170: quality threshold sweep — for each candidate cutoff on a
    // per-doc quality score (here: distinct-token ratio, the q163
    // diversity signal at document grain), how many documents and how
    // many TOKENS survive. This is the retention-curve table a pipeline
    // owner reads to set the filter knob (keep 90% of tokens vs 70%?)
    // WITHOUT re-running the filter per guess. Scale shape: one corpus
    // scan computes (score, n_tokens) per doc shuffle-free (two array
    // functions, no explode), a 9-row threshold grid broadcast-crosses
    // it, one tiny per-threshold agg. Score and thresholds compare on
    // stableRound6'd values so the cut is engine-exact.
    Q(
      "q170_quality_sweep",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val scored = Tables.load(s, dir, "documents")
          .select(size(Text.words(Text.clean(col("text"))))
              .cast("long").as("n"),
            size(array_distinct(Text.words(Text.clean(col("text")))))
              .cast("long").as("u"))
          .select(col("n"), Rounding.stableRound6(
            col("u").cast("double") / col("n")).as("score"))
        val grid = broadcast((1 to 9).map(_ / 10.0).toDF("t"))
        grid.crossJoin(scored)
          .groupBy("t")
          .agg(count(when(col("score") >= col("t"), 1)).as("n_docs"),
            coalesce(sum(when(col("score") >= col("t"), col("n"))), lit(0L))
              .as("n_tokens"))
          .orderBy("t")
      },
      Some(s"""WITH scored AS (
             |  SELECT len(ws)::BIGINT AS n,
             |    ${Rounding.duckSql("len(list_distinct(ws))::DOUBLE / len(ws)")}
             |      AS score
             |  FROM (SELECT list_filter(string_split(
             |    regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' '),
             |    w -> w <> '') AS ws FROM documents)),
             |-- i::DOUBLE / 10::DOUBLE, not i / 10.0: the DECIMAL quotient
             |-- would compare exactly where Spark's double does not
             |grid AS (SELECT i::DOUBLE / 10::DOUBLE AS t
             |         FROM UNNEST(generate_series(1, 9)) AS s(i))
             |SELECT t,
             |  CAST(count(CASE WHEN score >= t THEN 1 END) AS BIGINT) AS n_docs,
             |  CAST(coalesce(sum(CASE WHEN score >= t THEN n END), 0) AS BIGINT)
             |    AS n_tokens
             |FROM grid CROSS JOIN scored
             |GROUP BY t
             |ORDER BY t""".stripMargin))
  )
}
