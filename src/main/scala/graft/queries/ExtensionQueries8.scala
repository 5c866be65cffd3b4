package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.Rounding
import graft.io.Tables
import graft.ops.Text

/** Round-7 second wave: DSIR-style importance weighting (targeted data
  * selection), a per-source duplication report (where is my duplication
  * coming from), and token-bucket rate limiting on the streaming-fold
  * engine. Same contract as every other module: each Spark pipeline
  * pairs with DuckDB oracle SQL replaying it.
  */
object ExtensionQueries8 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q158: DSIR-style importance weights — score every document by the
    // mean per-token log-ratio ln(p_target(w) / p_corpus(w)) between a
    // target-domain unigram LM (here: the lang='en' slice) and the
    // whole-corpus LM, add-1 smoothed over the shared vocabulary
    // (Xie et al. 2023's hashed-ngram importance resampling, reduced to
    // its unigram core). High weight = looks like the target domain;
    // this is the standard cheap targeted-selection signal when you
    // want "more data like X" out of a 100-TB crawl. Scale shape is
    // q94's: ONE vocab aggregation (target counts fall out of the same
    // groupBy as conditional sums — no second corpus scan for the
    // target side), scalars via the single-partition window over the
    // SMALL vocab (q58's doc_freq trick), then the vocab meets the
    // token stream through a broadcast join and one per-doc
    // aggregation. Two corpus scans total; no shuffle keyed on
    // anything wider than the vocab.
    Q(
      "q158_dsir_weights",
      (s, dir) => {
        val toks = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            explode(Text.words(Text.clean(col("text")))).as("w"))
        val vocab = toks
          .groupBy("w")
          .agg(count(lit(1)).cast("double").as("c_all"),
            sum(when(col("lang") === "en", 1L).otherwise(0L))
              .cast("double").as("c_tgt"))
        val enriched = vocab
          .withColumn("n_all", sum("c_all").over(
            org.apache.spark.sql.expressions.Window.partitionBy()))
          .withColumn("n_tgt", sum("c_tgt").over(
            org.apache.spark.sql.expressions.Window.partitionBy()))
          .withColumn("v", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy()))
          .withColumn("logratio",
            log((col("c_tgt") + 1) / (col("n_tgt") + col("v"))) -
              log((col("c_all") + 1) / (col("n_all") + col("v"))))
        toks.join(broadcast(enriched.select("w", "logratio")), "w")
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("long").as("n_tokens"),
            Rounding.stableRound6(avg(col("logratio"))).as("dsir_weight"))
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (
             |  SELECT doc_id, lang, unnest(list_filter(string_split(
             |    regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' '),
             |    w -> w <> '')) AS w
             |  FROM documents),
             |vocab AS (
             |  SELECT w, count(*)::DOUBLE AS c_all,
             |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::DOUBLE AS c_tgt
             |  FROM toks GROUP BY w),
             |scal AS (
             |  SELECT sum(c_all) AS n_all, sum(c_tgt) AS n_tgt,
             |    count(*)::DOUBLE AS v
             |  FROM vocab),
             |lr AS (
             |  SELECT w,
             |    ln((c_tgt + 1) / (n_tgt + v)) - ln((c_all + 1) / (n_all + v))
             |      AS logratio
             |  FROM vocab CROSS JOIN scal)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             |  ${Rounding.duckSql("avg(logratio)")} AS dsir_weight
             |FROM toks JOIN lr USING (w)
             |GROUP BY doc_id
             |ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q159: per-source duplication report — for each source, how many of
    // its documents are exact duplicates of SOME document (q43's
    // whitespace-normalized md5 fingerprint), and how many belong to a
    // fingerprint that spans MORE THAN ONE source (cross-source
    // contamination — syndicated/boilerplate text that per-source dedup
    // would miss). This is the provenance-level report a curation team
    // reads before deciding where dedup budget goes. Scale shape: one
    // fingerprint aggregation (group stats on the fp key), one join
    // BACK to the docs keyed on the fp (posting-list shape, never
    // pairwise), one tiny per-source aggregation. The fp→stats frame is
    // corpus-distinct-sized, NOT force-broadcast (AQE decides).
    Q(
      "q159_dup_rate_by_source",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))))
              .as("fp"))
        val stats = d.groupBy("fp")
          .agg(count(lit(1)).as("group_size"),
            countDistinct("source").as("n_sources"))
        d.join(stats, "fp")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("group_size") > 1, 1L).otherwise(0L)).as("n_dup"),
            sum(when(col("n_sources") > 1, 1L).otherwise(0L)).as("n_cross"))
          .select(col("source"), col("n_docs"), col("n_dup"), col("n_cross"),
            Rounding.stableRound6(
              col("n_dup").cast("double") / col("n_docs")).as("dup_rate"))
          .orderBy("source")
      },
      Some(s"""WITH d AS (
             |  SELECT doc_id, source,
             |    md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
             |  FROM documents),
             |stats AS (
             |  SELECT fp, count(*) AS group_size,
             |    count(DISTINCT source) AS n_sources
             |  FROM d GROUP BY fp)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(CASE WHEN group_size > 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_dup,
             |  CAST(sum(CASE WHEN n_sources > 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_cross,
             |  ${Rounding.duckSql(
                  "sum(CASE WHEN group_size > 1 THEN 1 ELSE 0 END)::DOUBLE " +
                    "/ count(*)")} AS dup_rate
             |FROM d JOIN stats USING (fp)
             |GROUP BY source
             |ORDER BY source""".stripMargin)),

    // ------------------------------------------------------------------
    // q160: token-bucket rate limiting — per user, admit an event only
    // if the bucket (capacity 3, refill 1 token / 10 min) has a token;
    // the ingestion-guard primitive that protects a pipeline from the
    // same crash-looping client q154's debounce collapses. The decision
    // at event i depends on every ADMIT decision before it, so this is
    // a per-key sequential fold — and it runs on ext.Folds
    // .streamingKeyFold: hash-partition + spill-backed secondary sort +
    // one streamed pass, O(1) state per key (tokens, last_refill), so
    // the adversarial million-event key streams from disk instead of
    // buffering (the r6→r7 debounce lesson, reused). All state is
    // integer micros/counts — no float drift for the oracle to trip on.
    // Refill arithmetic: k = (ts−last)/P whole periods credited,
    // last += k·P (the partial period stays banked), tokens capped at C
    // — identical integer ops in the DuckDB walk.
    Q(
      "q160_rate_limit",
      (s, dir) => {
        import org.apache.spark.sql.Row
        import org.apache.spark.sql.types._
        val cap = 3L
        val period = 600000000L // 10 min in micros
        val e = Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts").cast("timestamp")).as("ts_us"))
        val out = StructType(Seq(
          StructField("user_id", LongType),
          StructField("event_id", LongType),
          StructField("allowed", BooleanType)))
        graft.ext.Folds.streamingKeyFold[(Long, Long)](
          e, Seq("user_id"), Seq(col("ts_us"), col("event_id")),
          out,
          init = () => (-1L, 0L), // (tokens; -1 = no event yet, lastRefill)
          step = (st, r) => {
            val ts = r.getLong(2)
            val (tok0, last0) =
              if (st._1 == -1L) (cap, ts)
              else {
                val k = (ts - st._2) / period
                (math.min(cap, st._1 + k), st._2 + k * period)
              }
            val allowed = tok0 > 0L
            val tok1 = if (allowed) tok0 - 1L else tok0
            ((tok1, last0),
              Seq(Row(r.getLong(0), r.getLong(1), allowed)))
          },
          flush = (_, _) => Nil
        ).orderBy("event_id")
      },
      // the same integer walk as q154's oracle: a recursive CTE carrying
      // (tokens, last_refill) scalar state per user, idx-ordered
      Some("""WITH RECURSIVE ev AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS t,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY epoch_us(ts), event_id) AS idx
             |  FROM events),
             |walk AS (
             |  SELECT user_id, idx, event_id, true AS allowed,
             |    CAST(2 AS BIGINT) AS tokens, t AS last_refill
             |  FROM ev WHERE idx = 1
             |  UNION ALL
             |  SELECT e.user_id, e.idx, e.event_id,
             |    least(3, w.tokens + (e.t - w.last_refill) // 600000000) > 0,
             |    CASE WHEN least(3, w.tokens +
             |        (e.t - w.last_refill) // 600000000) > 0
             |      THEN least(3, w.tokens +
             |        (e.t - w.last_refill) // 600000000) - 1
             |      ELSE least(3, w.tokens +
             |        (e.t - w.last_refill) // 600000000) END,
             |    w.last_refill +
             |      ((e.t - w.last_refill) // 600000000) * 600000000
             |  FROM walk w JOIN ev e ON e.user_id = w.user_id
             |    AND e.idx = w.idx + 1)
             |SELECT user_id, event_id, allowed FROM walk
             |ORDER BY event_id""".stripMargin))
  )
}
