package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Rounding
import graft.io.Tables
import graft.ops.Text

/** Round-9 thirteenth wave — four LM-data operators: the word2vec
  * negative-sampling distribution with an IEEE-exact pow-3/4 (q358), a
  * speculative-decoding acceptance-rate proxy from a bigram draft model
  * (q359), Flesch readability scoring (q360), and the marginal-novelty
  * decay curve over ingestion order (q361). Each Spark pipeline pairs
  * with DuckDB oracle SQL replaying it bit-exactly.
  */
object ExtensionQueries55 {

  /** DuckDB replay of Text.clean + Text.words (the q110 convention). */
  private val DuckWords =
    "list_filter(string_split(regexp_replace(text, '[^a-zA-Z0-9 ]', " +
      "'', 'g'), ' '), w -> w <> '')"

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q358: negative-sampling distribution — word2vec/SGNS draws
    // negatives from unigram^(3/4); this materializes that table: the
    // top-30 tokens by count with their sampling probability and
    // expected draws per 10k negatives. Two determinism tricks make
    // the gate bit-exact: c^0.75 is computed as sqrt(c·sqrt(c)) —
    // sqrt is IEEE-correctly-rounded in BOTH engines, unlike pow —
    // and each term is snapped to the 1e-6 LONG grid BEFORE the
    // normalizing sum (the q288 1/ln(deg) discipline), so the
    // denominator is an exact LONG, immune to summation order. The
    // top-30 cut orders by raw count (c^0.75 is monotone in c, same
    // cut) → TakeOrderedAndProject, no global sort. Scale: one token
    // shuffle + a vocab-sized agg; beyond ~1e18 total grid mass the
    // denominator moves to DECIMAL(38,0), no shape change.
    Q(
      "q358_negative_sampling",
      (s, dir) => {
        val toks = Tables.load(s, dir, "documents")
          .select(explode(Text.words(Text.clean(col("text")))).as("w"))
        val cnt = toks.groupBy("w").agg(count(lit(1)).as("c"))
          .withColumn("t6",
            floor(sqrt(col("c").cast("double") *
              sqrt(col("c").cast("double"))) * 1e6 + 0.5).cast("long"))
        val denom = cnt.agg(sum("t6").as("d6"))
        cnt.crossJoin(denom)
          .orderBy(col("c").desc, col("w"))
          .limit(30)
          .withColumn("p", col("t6").cast("double") / col("d6").cast("double"))
          .select(col("w").as("word"), col("c").as("cnt"),
            Rounding.stableRound6(col("p")).as("p_neg"),
            Rounding.stableRound(col("p") * 10000.0, 4).as("draws_per_10k"))
          .orderBy(col("cnt").desc, col("word"))
      },
      Some(s"""WITH toks AS (
             |  SELECT unnest($DuckWords) AS w FROM documents),
             |cnt AS (SELECT w, CAST(count(*) AS BIGINT) AS c
             |        FROM toks GROUP BY w),
             |t AS (
             |  SELECT w, c,
             |    CAST(floor(sqrt(c::DOUBLE * sqrt(c::DOUBLE)) * 1e6 + 0.5)
             |      AS BIGINT) AS t6
             |  FROM cnt),
             |d AS (SELECT CAST(sum(t6) AS BIGINT) AS d6 FROM t),
             |top AS (
             |  SELECT w, c, t6 FROM t ORDER BY c DESC, w LIMIT 30)
             |SELECT w AS word, c AS cnt,
             |  ${Rounding.duckSql("t6::DOUBLE / d6::DOUBLE")} AS p_neg,
             |  ${Rounding.duckSql("t6::DOUBLE / d6::DOUBLE * 10000.0", 4)}
             |    AS draws_per_10k
             |FROM top CROSS JOIN d
             |ORDER BY cnt DESC, word""".stripMargin)),

    // ------------------------------------------------------------------
    // q359: speculative-decoding acceptance proxy — a bigram "draft
    // model" predicts each next token as argmax_c count(lang, w1, c)
    // (ties broken lexicographically); the acceptance rate is the
    // share of corpus bigram positions where the draft matches the
    // actual next token — the deterministic skeleton of the
    // draft-model acceptance measurement used to size speculative
    // decoding, and a repetitiveness signal in its own right
    // (templated corpora accept high). Counts are exact LONGs, the
    // argmax is a row_number over the (lang, w1)-partitioned count
    // table (key-partitioned window, never global), and the scoring
    // join is keyed on (lang, w1) — the q110 bigram shapes.
    Q(
      "q359_draft_acceptance",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .withColumn("ws", Text.words(Text.clean(col("text"))))
          .where(size(col("ws")) >= 2)
        // localCheckpoint: `bi` feeds BOTH the count aggregation and
        // the scoring join — without it the corpus is tokenized and
        // pair-exploded twice (the q345 discipline; at 100x the second
        // full scan+explode is the query's largest avoidable term)
        val bi = docs.select(col("lang"), expr(
            "explode(transform(sequence(1, size(ws) - 1), " +
              "i -> struct(element_at(ws, i) AS w1, " +
              "element_at(ws, i + 1) AS w2)))").as("b"))
          .select(col("lang"), col("b.w1").as("w1"), col("b.w2").as("w2"))
          .localCheckpoint()
        val cnt = bi.groupBy("lang", "w1", "w2").agg(count(lit(1)).as("c"))
        val best = cnt
          .withColumn("rn", row_number().over(
            Window.partitionBy("lang", "w1")
              .orderBy(col("c").desc, col("w2"))))
          .where(col("rn") === 1)
          .select(col("lang"), col("w1"), col("w2").as("pred"))
        bi.join(best, Seq("lang", "w1"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_positions"),
            sum(when(col("w2") === col("pred"), 1L).otherwise(0L))
              .as("n_accepted"))
          .select(col("lang"), col("n_positions"), col("n_accepted"),
            Rounding.stableRound6(col("n_accepted").cast("double") /
              col("n_positions").cast("double")).as("acceptance_rate"))
          .orderBy("lang")
      },
      Some(s"""WITH toks AS (
             |  SELECT lang, $DuckWords AS ws FROM documents),
             |bi AS (
             |  SELECT lang, unnest(list_transform(range(1, len(ws)),
             |    i -> {'w1': ws[i], 'w2': ws[i+1]}), recursive := true)
             |  FROM toks WHERE len(ws) >= 2),
             |cnt AS (
             |  SELECT lang, w1, w2, count(*) AS c
             |  FROM bi GROUP BY 1, 2, 3),
             |best AS (
             |  SELECT lang, w1, w2 AS pred FROM (
             |    SELECT lang, w1, w2, row_number() OVER (
             |      PARTITION BY lang, w1 ORDER BY c DESC, w2) AS rn
             |    FROM cnt)
             |  WHERE rn = 1)
             |SELECT bi.lang, CAST(count(*) AS BIGINT) AS n_positions,
             |  CAST(sum(CASE WHEN bi.w2 = best.pred THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_accepted,
             |  ${Rounding.duckSql(
                  "sum(CASE WHEN bi.w2 = best.pred THEN 1 ELSE 0 END)" +
                    "::DOUBLE / count(*)::DOUBLE")} AS acceptance_rate
             |FROM bi
             |JOIN best ON best.lang = bi.lang AND best.w1 = bi.w1
             |GROUP BY bi.lang
             |ORDER BY bi.lang""".stripMargin)),

    // ------------------------------------------------------------------
    // q360: Flesch reading-ease per source — 206.835 − 1.015·(W/S) −
    // 84.6·(Syl/W) with the standard corpus-scale approximations:
    // sentences = runs of [.!?] (min 1), syllables = vowel-group runs
    // ([aeiouy]+) — both countable by one regexp_extract_all per doc
    // in both engines, no per-word loop. The per-doc score is snapped
    // to the 1e-6 LONG grid before the per-source average (exact LONG
    // sum / count — summation-order-proof), and share_easy counts
    // docs above the standard 60 "plain English" threshold on the
    // same grid. Shuffle-free scoring projection + one source-sized
    // agg — the TextAnalysis quality-score shape.
    Q(
      "q360_flesch_readability",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .withColumn("nw",
            size(Text.words(Text.clean(col("text")))).cast("long"))
          .where(col("nw") >= 1L)
          .withColumn("ns", greatest(lit(1L),
            size(expr("regexp_extract_all(text, '[.!?]+', 0)"))
              .cast("long")))
          .withColumn("syl",
            size(expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
              .cast("long"))
          .withColumn("f6",
            floor((lit(206.835)
              - lit(1.015) * col("nw").cast("double")
                / col("ns").cast("double")
              - lit(84.6) * col("syl").cast("double")
                / col("nw").cast("double")) * 1e6 + 0.5).cast("long"))
        d.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            Rounding.stableRound6(
              sum("f6").cast("double") / count(lit(1)).cast("double")
                / 1e6).as("avg_flesch"),
            Rounding.stableRound6(
              sum(when(col("f6") > 60000000L, 1L).otherwise(0L))
                .cast("double") / count(lit(1)).cast("double"))
              .as("share_easy"))
          .orderBy("source")
      },
      Some(s"""WITH d AS (
             |  SELECT source,
             |    len($DuckWords) AS nw,
             |    greatest(1, len(regexp_extract_all(text, '[.!?]+')))
             |      AS ns,
             |    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syl
             |  FROM documents),
             |f AS (
             |  SELECT source,
             |    CAST(floor((206.835 - 1.015 * nw::DOUBLE / ns::DOUBLE
             |      - 84.6 * syl::DOUBLE / nw::DOUBLE) * 1e6 + 0.5)
             |      AS BIGINT) AS f6
             |  FROM d WHERE nw >= 1)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  ${Rounding.duckSql(
                  "sum(f6)::DOUBLE / count(*)::DOUBLE / 1e6")}
             |    AS avg_flesch,
             |  ${Rounding.duckSql(
                  "sum(CASE WHEN f6 > 60000000 THEN 1 ELSE 0 END)::DOUBLE" +
                    " / count(*)::DOUBLE")} AS share_easy
             |FROM f
             |GROUP BY source
             |ORDER BY source""".stripMargin)),

    // ------------------------------------------------------------------
    // q361: marginal-novelty decay — process the corpus in ingestion
    // (doc_id) order and measure, per decile, what share of each
    // doc's distinct 3-gram shingles are FIRST occurrences: the
    // diminishing-returns curve that tells a crawl when additional
    // ingestion stops buying new content (q243 scores novelty vs a
    // fixed reference; this is novelty vs everything ingested BEFORE,
    // as a curve). First-occurrence is min(doc_id) per shingle — one
    // groupBy, no ordered scan — then one keyed join back and a
    // 10-row decile agg. Per-doc shares snap to the 1e-6 LONG grid
    // before averaging; the pooled share is a pure count ratio.
    // Docs with <3 words have no shingles and are out of frame.
    Q(
      "q361_novelty_decay",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val mx = docs.agg((max("doc_id") + 1L).as("mx"))
        val sh = docs.select(col("doc_id"),
          explode(graft.ext.Dedup.shingles(col("text"))).as("sg"))
        val first = sh.groupBy("sg").agg(min("doc_id").as("fd"))
        val per = sh.join(first, "sg")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_sh"),
            sum(when(col("fd") === col("doc_id"), 1L).otherwise(0L))
              .as("n_new"))
          .withColumn("s6",
            floor(col("n_new").cast("double") / col("n_sh").cast("double")
              * 1e6 + 0.5).cast("long"))
        per.crossJoin(mx)
          .withColumn("decile", expr("doc_id * 10 div mx"))
          .groupBy("decile")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_sh").as("n_shingles"),
            Rounding.stableRound6(sum("n_new").cast("double") /
              sum("n_sh").cast("double")).as("pooled_new_share"),
            Rounding.stableRound6(sum("s6").cast("double") /
              count(lit(1)).cast("double") / 1e6)
              .as("mean_doc_new_share"))
          .orderBy("decile")
      },
      Some(s"""WITH mx AS (
             |  SELECT max(doc_id) + 1 AS mx FROM documents),
             |${ExtensionQueries.ShingleCtes},
             |first AS (SELECT s, min(doc_id) AS fd FROM sh GROUP BY s),
             |per AS (
             |  SELECT sh.doc_id, count(*) AS n_sh,
             |    sum(CASE WHEN first.fd = sh.doc_id THEN 1 ELSE 0 END)
             |      AS n_new
             |  FROM sh JOIN first ON first.s = sh.s
             |  GROUP BY sh.doc_id),
             |p6 AS (
             |  SELECT doc_id, n_sh, n_new,
             |    CAST(floor(n_new::DOUBLE / n_sh::DOUBLE * 1e6 + 0.5)
             |      AS BIGINT) AS s6
             |  FROM per)
             |SELECT CAST(doc_id * 10 // mx AS BIGINT) AS decile,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_sh) AS BIGINT) AS n_shingles,
             |  ${Rounding.duckSql(
                  "sum(n_new)::DOUBLE / sum(n_sh)::DOUBLE")}
             |    AS pooled_new_share,
             |  ${Rounding.duckSql(
                  "sum(s6)::DOUBLE / count(*)::DOUBLE / 1e6")}
             |    AS mean_doc_new_share
             |FROM p6 CROSS JOIN mx
             |GROUP BY 1
             |ORDER BY decile""".stripMargin))
  )
}
