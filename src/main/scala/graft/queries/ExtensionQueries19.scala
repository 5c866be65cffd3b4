package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Rounding
import graft.io.Tables
import graft.ops.Text

/** Round-7 thirteenth wave: item-level drift (trending terms) and
  * budgeted per-source selection. Same contract as every other module:
  * each Spark pipeline pairs with DuckDB oracle SQL replaying it.
  */
object ExtensionQueries19 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q192: trending terms — the top-15 words by smoothed frequency
    // lift between two deterministic corpus halves (doc_id parity
    // stands in for time slices): ITEM-level drift, the complement of
    // q143's PSI (which says "the distribution moved" without naming
    // the words that moved it — this names them, the report a crawl
    // operator reads when a spam campaign enters the feed). Add-1
    // smoothing over the shared vocab (q158's discipline) keeps
    // half-exclusive words finite; a c1 ≥ 5 floor kills
    // one-occurrence noise. Scale shape: ONE vocab aggregation with
    // conditional half-counts, scalars via the window-over-small-vocab
    // trick, top-15 via row_number on the vocab frame — the corpus is
    // scanned once.
    Q(
      "q192_trending_terms",
      (s, dir) => {
        val toks = Tables.load(s, dir, "documents")
          .select((col("doc_id") % 2 === 1).as("h1"),
            explode(Text.words(Text.clean(col("text")))).as("w"))
        // r15 window census: the vocab totals ran as THREE global
        // windows and the top-15 as row_number over the whole filtered
        // vocab — four single-partition passes of a vocabulary-sized
        // frame (1e8-1e9 rows web-scale). The vocab aggregate is pinned
        // once (small aggregated frame over the heavy corpus explode —
        // the q302 profile, so the totals agg and the top-k don't
        // re-scan the corpus); totals are one 1-row agg broadcast back;
        // the top-15 is orderBy+limit (per-partition
        // TakeOrderedAndProject), with row_number only over the 15
        // survivors. Same total order (lift desc, w), same rows.
        val vocab = toks.groupBy("w")
          .agg(sum(when(col("h1"), 0L).otherwise(1L)).as("c0"),
            sum(when(col("h1"), 1L).otherwise(0L)).as("c1"))
          .localCheckpoint()
        val tot = vocab.agg(sum("c0").as("t0"), sum("c1").as("t1"),
          count(lit(1)).as("v"))
        val enriched = vocab
          .crossJoin(broadcast(tot))
          .where(col("c1") >= 5)
          .withColumn("lift",
            ((col("c1") + 1).cast("double") / (col("t1") + col("v"))) /
              ((col("c0") + 1).cast("double") / (col("t0") + col("v"))))
        enriched
          .orderBy(desc("lift"), col("w")).limit(15)
          .withColumn("rank", row_number().over(
            Window.orderBy(desc("lift"), col("w"))))
          .select(col("rank"), col("w").as("word"), col("c0"), col("c1"),
            Rounding.stableRound6(col("lift")).as("lift"))
          .orderBy("rank")
      },
      Some(s"""WITH toks AS (
             |  SELECT doc_id % 2 = 1 AS h1, unnest(list_filter(string_split(
             |    regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' '),
             |    w -> w <> '')) AS w
             |  FROM documents),
             |vocab AS (
             |  SELECT w, sum(CASE WHEN h1 THEN 0 ELSE 1 END) AS c0,
             |    sum(CASE WHEN h1 THEN 1 ELSE 0 END) AS c1
             |  FROM toks GROUP BY w),
             |scal AS (SELECT sum(c0) AS t0, sum(c1) AS t1,
             |           count(*)::BIGINT AS v
             |         FROM vocab),
             |lifted AS (
             |  SELECT w, c0, c1,
             |    ((c1 + 1)::DOUBLE / (t1 + v)) / ((c0 + 1)::DOUBLE / (t0 + v))
             |      AS lift
             |  FROM vocab CROSS JOIN scal WHERE c1 >= 5),
             |ranked AS (
             |  SELECT *, row_number() OVER (ORDER BY lift DESC, w) AS rank
             |  FROM lifted)
             |SELECT rank, w AS word, CAST(c0 AS BIGINT) AS c0,
             |  CAST(c1 AS BIGINT) AS c1,
             |  ${Rounding.duckSql("lift")} AS lift
             |FROM ranked WHERE rank <= 15
             |ORDER BY rank""".stripMargin)),

    // ------------------------------------------------------------------
    // q193: budgeted per-source selection — greedily keep each source's
    // best documents (by the distinct-token-ratio quality score, q170's
    // signal) until a 400-token budget per source is spent: the
    // per-domain token-budget allocator (q97 caps document COUNTS;
    // training mixtures are specified in TOKENS, and greedy-by-quality
    // under the token budget is how the cap actually gets filled).
    // Scale shape: one scoring scan, then a window PARTITIONED BY
    // SOURCE (keys distribute; the within-source sort is the standard
    // keyed-window price) computing rank and an inclusive integer
    // token prefix sum — exact LONGs, so the keep/stop cut is
    // engine-exact. Quality ranks on the stableRound6 grid with
    // doc_id tiebreak (the q173 rule: never order on an unrounded
    // cross-engine double).
    Q(
      "q193_budgeted_selection",
      (s, dir) => {
        val scored = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            size(Text.words(Text.clean(col("text")))).cast("long").as("tok"),
            Rounding.stableRound6(
              size(array_distinct(Text.words(Text.clean(col("text")))))
                .cast("double") /
                size(Text.words(Text.clean(col("text"))))).as("quality"))
        val w = Window.partitionBy("source")
          .orderBy(desc("quality"), col("doc_id"))
        scored
          .withColumn("rank", row_number().over(w))
          .withColumn("cum_tokens", sum("tok").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
          .where(col("cum_tokens") <= 400L)
          .select(col("source"), col("rank"), col("doc_id"), col("tok"),
            col("cum_tokens"), col("quality"))
          .orderBy("source", "rank")
      },
      Some(s"""WITH scored AS (
             |  SELECT doc_id, source, len(ws)::BIGINT AS tok,
             |    ${Rounding.duckSql(
                  "len(list_distinct(ws))::DOUBLE / len(ws)")} AS quality
             |  FROM (SELECT doc_id, source, list_filter(string_split(
             |    regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' '),
             |    w -> w <> '') AS ws FROM documents)),
             |ranked AS (
             |  SELECT *,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY quality DESC, doc_id) AS rank,
             |    sum(tok) OVER (PARTITION BY source
             |      ORDER BY quality DESC, doc_id
             |      ROWS UNBOUNDED PRECEDING) AS cum_tokens
             |  FROM scored)
             |SELECT source, rank, doc_id, tok,
             |  CAST(cum_tokens AS BIGINT) AS cum_tokens, quality
             |FROM ranked WHERE cum_tokens <= 400
             |ORDER BY source, rank""".stripMargin))
  )
}
