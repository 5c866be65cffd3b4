package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Rounding
import graft.io.Tables
import graft.ops.Text

/** Round-7 third wave: padding-waste audit for length-bucketed batching,
  * the first BPE merge iteration (corpus-weighted adjacent-pair counts),
  * and per-source token-distribution entropy. Same contract as every
  * other module: each Spark pipeline pairs with DuckDB oracle SQL.
  */
object ExtensionQueries9 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q161: padding-waste audit — when training batches are assembled by
    // length bucket (the standard dynamic-batching scheme), every
    // sequence pads to its bucket's max length; this reports, per
    // 16-token bucket, how many tokens of compute that padding burns
    // (the number a pipeline owner reads before choosing bucket
    // boundaries — q75's bin packing is the fix when the rate is bad).
    // waste = n_docs·max_len − Σ len falls straight out of ONE
    // aggregation: a single corpus scan computing each doc's token
    // count shuffle-free (size of the split array — no explode), then
    // one tiny per-bucket agg. No join, no window, all-integer until
    // the final rate.
    Q(
      "q161_padding_waste",
      (s, dir) => {
        Tables.load(s, dir, "documents")
          .select((size(Text.words(Text.clean(col("text")))))
            .cast("long").as("n"))
          .withColumn("bucket", floor(col("n") / 16L))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"), max("n").as("max_len"),
            sum("n").as("total_tokens"))
          .select(col("bucket"), col("n_docs"), col("max_len"),
            col("total_tokens"),
            (col("n_docs") * col("max_len") - col("total_tokens"))
              .as("waste_tokens"),
            Rounding.stableRound6(
              (col("n_docs") * col("max_len") - col("total_tokens"))
                .cast("double") / (col("n_docs") * col("max_len")))
              .as("waste_rate"))
          .orderBy("bucket")
      },
      Some(s"""WITH lens AS (
             |  SELECT len(list_filter(string_split(
             |    regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' '),
             |    w -> w <> ''))::BIGINT AS n
             |  FROM documents),
             |b AS (
             |  SELECT n // 16 AS bucket, count(*) AS n_docs, max(n) AS max_len,
             |    sum(n) AS total_tokens
             |  FROM lens GROUP BY 1)
             |SELECT bucket, CAST(n_docs AS BIGINT) AS n_docs,
             |  CAST(max_len AS BIGINT) AS max_len,
             |  CAST(total_tokens AS BIGINT) AS total_tokens,
             |  CAST(n_docs * max_len - total_tokens AS BIGINT) AS waste_tokens,
             |  ${Rounding.duckSql(
                  "(n_docs * max_len - total_tokens)::DOUBLE " +
                    "/ (n_docs * max_len)")} AS waste_rate
             |FROM b
             |ORDER BY bucket""".stripMargin)),

    // ------------------------------------------------------------------
    // q162: first BPE merge iteration — the corpus-weighted frequency of
    // every adjacent character pair WITHIN words, top 20 (Sennrich et
    // al. 2016: the pair a byte-pair-encoding tokenizer would merge
    // first; iterating this rule IS BPE training, and the expensive
    // step at 100 TB is exactly this count). Scale shape: the corpus
    // collapses to the DISTINCT word vocabulary with counts FIRST (one
    // aggregation — the token stream is never pair-exploded), then
    // pairs explode off the small vocab (×avg word length) into one
    // pair-keyed agg weighted by the word count. Top-20 via one
    // row_number over the pair-count frame (pair-vocab-sized, tiny);
    // full (n DESC, pair) tiebreak keeps both engines deterministic.
    Q(
      "q162_bpe_pairs",
      (s, dir) => {
        val vocab = Tables.load(s, dir, "documents")
          .select(explode(Text.words(Text.clean(lower(col("text"))))).as("w"))
          .groupBy("w").agg(count(lit(1)).as("cnt"))
          .where(length(col("w")) >= 2)
        val pairs = vocab
          .select(col("cnt"), explode(expr(
            "transform(sequence(1, length(w) - 1), " +
              "i -> substring(w, i, 2))")).as("pair"))
          .groupBy("pair").agg(sum("cnt").as("n"))
        pairs
          .withColumn("rank",
            row_number().over(Window.orderBy(desc("n"), col("pair"))))
          .where(col("rank") <= 20)
          .select(col("rank"), col("pair"), col("n"))
          .orderBy("rank")
      },
      Some("""WITH toks AS (
             |  SELECT unnest(list_filter(string_split(
             |    regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' '),
             |    w -> w <> '')) AS w
             |  FROM documents),
             |vocab AS (SELECT w, count(*) AS cnt FROM toks
             |          GROUP BY w HAVING len(w) >= 2),
             |pairs AS (
             |  SELECT substr(w, i, 2) AS pair, sum(cnt) AS n
             |  FROM vocab, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
             |  GROUP BY 1),
             |ranked AS (
             |  SELECT *, row_number() OVER (ORDER BY n DESC, pair) AS rank
             |  FROM pairs)
             |SELECT rank, pair, CAST(n AS BIGINT) AS n
             |FROM ranked WHERE rank <= 20
             |ORDER BY rank""".stripMargin)),

    // ------------------------------------------------------------------
    // q163: per-source token-distribution entropy — Shannon entropy of
    // each source's unigram distribution plus type-token ratio: the two
    // cheap diversity signals that flag templated/machine-generated
    // sources (low entropy, low TTR) before any LM-based scoring runs.
    // Scale shape: one corpus scan → one (source, word)-keyed agg →
    // one source-keyed agg (tiny). The per-source total lands on each
    // (source, word) row via a window over the source partition of the
    // COUNTS frame (vocab-sized, not the token stream); entropy sums
    // −p·ln p exactly once per distinct (source, word).
    Q(
      "q163_source_entropy",
      (s, dir) => {
        val sw = Tables.load(s, dir, "documents")
          .select(col("source"),
            explode(Text.words(Text.clean(col("text")))).as("w"))
          .groupBy("source", "w").agg(count(lit(1)).cast("double").as("c"))
        sw.withColumn("n", sum("c").over(Window.partitionBy("source")))
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_types"),
            first("n").cast("long").as("n_tokens"),
            Rounding.stableRound6(
              -sum((col("c") / col("n")) * log(col("c") / col("n"))))
              .as("entropy"))
          .select(col("source"), col("n_tokens"), col("n_types"),
            Rounding.stableRound6(
              col("n_types").cast("double") / col("n_tokens")).as("ttr"),
            col("entropy"))
          .orderBy("source")
      },
      Some(s"""WITH toks AS (
             |  SELECT source, unnest(list_filter(string_split(
             |    regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' '),
             |    w -> w <> '')) AS w
             |  FROM documents),
             |sw AS (SELECT source, w, count(*)::DOUBLE AS c FROM toks
             |       GROUP BY 1, 2),
             |st AS (SELECT source, sum(c) AS n, count(*) AS n_types
             |       FROM sw GROUP BY 1)
             |SELECT source, CAST(n AS BIGINT) AS n_tokens,
             |  CAST(n_types AS BIGINT) AS n_types,
             |  ${Rounding.duckSql("n_types::DOUBLE / n")} AS ttr,
             |  ${Rounding.duckSql(
                  "(SELECT -sum((c / st.n) * ln(c / st.n)) FROM sw " +
                    "WHERE sw.source = st.source)")} AS entropy
             |FROM st
             |ORDER BY source""".stripMargin))
  )
}
