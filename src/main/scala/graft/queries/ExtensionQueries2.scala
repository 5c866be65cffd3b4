package graft.queries

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Graph, Sampling, Sketches, TextAnalysis}
import graft.functions.{PolyHash, Rounding}
import graft.io.Tables
import graft.ops.Text

/** Round-5 extension surface: the declarative session-window operator
  * (q88), iterative graph ranking (q89), dimension-merge/SCD2 (q90),
  * weighted sampling (q91), sketch-accelerated decontamination (q92),
  * Misra-Gries heavy hitters (q93), and unigram-LM surprisal scoring
  * (q94). Same contract as every other module: each Spark pipeline is
  * paired with DuckDB oracle SQL that replays it exactly.
  */
object ExtensionQueries2 {

  private val P = PolyHash.Mod

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q88: built-in session_window — the DECLARATIVE twin of q29's
    // gaps-and-islands and q76's stateful stream: Catalyst's native
    // session aggregation (merging windows, map-side partial merge)
    // instead of hand-rolled window math. Boundary semantics MATCH q29:
    // session_window merges an event landing exactly at the previous
    // window's close (verified by Extension2Spec's exact-gap probe — a
    // new session needs gap STRICTLY > the duration), so the oracle
    // replays q29's `> 3600` rule. session_end is last event + gap (the
    // window's close), not the last event itself.
    Q(
      "q88_session_window",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
        e.groupBy(col("user_id"), session_window(col("ts"), "1 hour").as("sw"))
          .agg(count(lit(1)).cast("long").as("n_events"),
            round(sum("value"), 2).as("session_value"))
          .select(col("user_id"), col("sw.start").as("session_start"),
            col("sw.end").as("session_end"), col("n_events"), col("session_value"))
          .orderBy("user_id", "session_start")
      },
      Some("""WITH marked AS (
             |  SELECT user_id, ts, event_id, value,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |           OR epoch(ts) - epoch(lag(ts) OVER w) > 3600
             |         THEN 1 ELSE 0 END AS new_s
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (
             |  SELECT user_id, ts, value,
             |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM marked)
             |SELECT user_id, min(ts) AS session_start,
             |  max(ts) + INTERVAL 1 HOUR AS session_end,
             |  CAST(count(*) AS BIGINT) AS n_events,
             |  round(sum(value), 2) AS session_value
             |FROM sess
             |GROUP BY user_id, sid
             |ORDER BY user_id, session_start""".stripMargin)),

    // ------------------------------------------------------------------
    // q89: PageRank over the near-dup evidence graph — "which document is
    // the authority of its duplication neighborhood". Fixed 5 iterations,
    // each two keyed shuffles (ext.Graph.pageRank); the oracle unrolls
    // the same recurrence as 5 chained CTEs (recursive CTEs can't
    // aggregate per step). All constants are written with explicit
    // ::DOUBLE arithmetic so both engines derive bit-identical
    // coefficients ((1.0 - 0.85) is NOT the double nearest 0.15);
    // summation order is the only divergence and round6 absorbs it.
    Q(
      "q89_pagerank",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val pairs = Dedup.nearDupPairs(docs, "text", "doc_id", 0.5)
          .select(col("da").as("src"), col("db").as("dst"))
        Graph.pageRank(pairs, iters = 5, damping = 0.85)
          .select(col("node").as("doc_id"),
            Rounding.stableRound6(col("rank")).as("pagerank"))
          .orderBy("doc_id")
      },
      Some {
        val iters = (1 to 5).map { i =>
          s"""pr$i AS (
             |  SELECT e.dst AS node,
             |    (1.0::DOUBLE - 0.85::DOUBLE) / (SELECT n FROM nn)
             |      + 0.85::DOUBLE * sum(p.rank / d.deg) AS rank
             |  FROM edges e
             |  JOIN deg d ON d.src = e.src
             |  JOIN pr${i - 1} p ON p.node = e.src
             |  GROUP BY e.dst)"""
        }.mkString(",\n")
        s"""WITH pairs AS (
           |${ExtensionQueries.NearDupPairsOracle}
           |),
           |edges AS (SELECT da AS src, db AS dst FROM pairs
           |          UNION ALL SELECT db, da FROM pairs),
           |nodes AS (SELECT DISTINCT src AS node FROM edges),
           |nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
           |deg AS (SELECT src, count(*)::DOUBLE AS deg FROM edges GROUP BY src),
           |pr0 AS (SELECT node, 1.0::DOUBLE / (SELECT n FROM nn) AS rank FROM nodes),
           |$iters
           |SELECT node AS doc_id,
           |  ${Rounding.duckSql("rank")} AS pagerank
           |FROM pr5
           |ORDER BY doc_id""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q90: SCD-2 merge (ops.Upsert.scd2) — fold a deterministic change
    // batch into the customer dimension keeping history: updated keys get
    // an expired v1 row + a current v2 row, new keys insert as v1,
    // untouched keys carry forward. The change batch is derived from the
    // dimension itself (custkey%7 → balance update; custkey%97 → a new
    // +1M key) so the oracle rebuilds it exactly; +100.0 on a double is
    // the same IEEE op in both engines, no rounding needed.
    Q(
      "q90_scd2",
      (s, dir) => {
        val cust = Tables.load(s, dir, "customer")
        val base = cust.select(col("c_custkey"), col("c_acctbal"))
        val changes = cust.where(col("c_custkey") % 7 === 0)
          .select(col("c_custkey"), (col("c_acctbal") + 100.0).as("c_acctbal"))
          .unionAll(cust.where(col("c_custkey") % 97 === 0)
            .select((col("c_custkey") + 1000000L).as("c_custkey"), col("c_acctbal")))
        graft.ops.Upsert.scd2(base, changes, "c_custkey", Seq("c_acctbal"))
          .orderBy("c_custkey", "version")
      },
      Some("""WITH base AS (SELECT c_custkey, c_acctbal FROM customer),
             |changes AS (
             |  SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal
             |  FROM customer WHERE c_custkey % 7 = 0
             |  UNION ALL
             |  SELECT c_custkey + 1000000, c_acctbal
             |  FROM customer WHERE c_custkey % 97 = 0),
             |expired AS (
             |  SELECT c_custkey, c_acctbal, 1::BIGINT AS version, false AS is_current
             |  FROM base WHERE c_custkey IN (SELECT c_custkey FROM changes)),
             |carried AS (
             |  SELECT c_custkey, c_acctbal, 1::BIGINT, true
             |  FROM base WHERE c_custkey NOT IN (SELECT c_custkey FROM changes)),
             |applied AS (
             |  SELECT c.c_custkey, c.c_acctbal,
             |    CASE WHEN b.c_custkey IS NOT NULL THEN 2 ELSE 1 END::BIGINT, true
             |  FROM changes c LEFT JOIN base b ON b.c_custkey = c.c_custkey)
             |SELECT * FROM (
             |  SELECT * FROM expired
             |  UNION ALL SELECT * FROM carried
             |  UNION ALL SELECT * FROM applied)
             |ORDER BY c_custkey, version""".stripMargin)),

    // ------------------------------------------------------------------
    // q91: deterministic weighted sampling without replacement
    // (Efraimidis-Spirakis A-ES over the hash-derived uniform) — select
    // 100 documents with probability ∝ token count, reproducibly. The
    // oracle replays key = u^(1/w) and the same (key DESC, id) order.
    Q(
      "q91_weighted_sample",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Sampling.weightedTopK(docs, "doc_id",
            size(TextAnalysis.wsTokens(col("text"))), "wsamp1", 100)
          .select("doc_id", "weight", "bucket")
          .orderBy("doc_id")
      },
      Some(s"""WITH wd AS (
             |  SELECT doc_id,
             |    greatest(len(regexp_extract_all(text, '\\S+'))::DOUBLE, 1.0::DOUBLE) AS weight,
             |    (h * h % $P) % 10000 AS bucket
             |  FROM (SELECT doc_id, text,
             |          ${PolyHash.duckSql("'wsamp1#' || doc_id::VARCHAR")} AS h
             |        FROM documents)),
             |top AS (
             |  SELECT doc_id, weight, bucket
             |  FROM wd
             |  ORDER BY pow((bucket::DOUBLE + 0.5) / 10000.0, 1.0::DOUBLE / weight) DESC,
             |           doc_id
             |  LIMIT 100)
             |SELECT doc_id, weight, bucket FROM top ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q92: bloom-accelerated decontamination — same semantics as q78's
    // exact operator (here at n=6 grams), but the training-shingle stream
    // is pre-filtered through a driver-built bloom sketch of the eval set
    // before the join. The gate asserts the 100 TB shortcut is LOSSLESS:
    // blooms over-approximate (false positives die in the exact join) and
    // never drop a true collision.
    Q(
      "q92_bloom_decontaminate",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val b = Sampling.bucket(col("doc_id"), "decon1")
        val train = docs.where(b >= 2000)
        val eval = docs.where(b < 2000)
        Dedup.contaminationReportBloom(train, eval, "text", "doc_id", n = 6)
          .orderBy("doc_id")
      },
      Some {
        val gram6 = (1 to 6).map(j => s"arr[i+$j]").mkString(" || ' ' || ")
        s"""WITH bucketed AS (
           |  SELECT doc_id, text,
           |    (h * h % $P) % 10000 AS bucket
           |  FROM (SELECT doc_id, text,
           |          ${PolyHash.duckSql("'decon1#' || doc_id::VARCHAR")} AS h
           |        FROM documents)),
           |sh AS (
           |  SELECT DISTINCT doc_id, bucket, s FROM (
           |    SELECT doc_id, bucket,
           |      unnest(list_transform(range(len(arr) - 5), i -> $gram6)) AS s
           |    FROM (SELECT doc_id, bucket,
           |            list_filter(string_split(text, ' '), t -> t <> '') AS arr
           |          FROM bucketed)
           |    WHERE len(arr) >= 6))
           |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_shared
           |FROM (SELECT doc_id, s FROM sh WHERE bucket >= 2000) t
           |JOIN (SELECT DISTINCT s FROM sh WHERE bucket < 2000) e ON t.s = e.s
           |GROUP BY t.doc_id
           |ORDER BY t.doc_id""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q93: heavy hitters — every token above 0.8% of the corpus, found by
    // a per-partition Misra-Gries sketch (bounded memory, shuffle carries
    // only candidate keys) + exact recheck. The oracle is the plain
    // GROUP BY/HAVING — gating the sketch's no-false-negative guarantee
    // end-to-end (see ext.Sketches.heavyHitters).
    Q(
      "q93_heavy_hitters",
      (s, dir) => {
        val toks = Tables.load(s, dir, "documents")
          .select(explode(Text.words(Text.clean(col("text")))).as("w"))
        Sketches.heavyHitters(toks, "w", k = 160, minCountOfTotal = 0.008)
          .withColumnRenamed("v", "word")
          .orderBy("word")
      },
      Some("""WITH toks AS (
             |  SELECT unnest(string_split(
             |    regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' ')) AS word
             |  FROM documents),
             |tok2 AS (SELECT word FROM toks WHERE word <> '')
             |SELECT word, CAST(count(*) AS BIGINT) AS n
             |FROM tok2
             |GROUP BY word
             |HAVING count(*) >= (SELECT count(*)::DOUBLE FROM tok2) * 0.008
             |ORDER BY word""".stripMargin)),

    // ------------------------------------------------------------------
    // q94: unigram-LM surprisal scoring — the corpus-statistics quality
    // signal: build the unigram frequency table (one aggregation), then
    // score every document by its mean token surprisal −ln p(w). Two
    // corpus scans total; the vocab meets the token stream through a
    // broadcast. Repetitive/templated docs score low, rare-token docs
    // high — the classic cheap LM filter.
    Q(
      "q94_unigram_logprob",
      (s, dir) => {
        val toks = Tables.load(s, dir, "documents")
          .select(col("doc_id"), explode(Text.words(Text.clean(col("text")))).as("w"))
        // total token count as a single-partition window over the SMALL
        // vocab (q58's doc_freq trick) — a separate `toks.count()` branch
        // would re-scan the whole corpus (Catalyst does not CSE the vocab
        // subplan across DataFrame reuse); this keeps it at exactly two
        // corpus scans (vocab build + scoring join). Counts are integral
        // doubles, so the windowed sum is exact.
        val vocab = toks.groupBy("w").agg(count(lit(1)).cast("double").as("cnt"))
          .withColumn("total", sum("cnt").over(
            org.apache.spark.sql.expressions.Window.partitionBy()))
        toks.join(broadcast(vocab), "w")
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("long").as("n_tokens"),
            Rounding.stableRound6(avg(-log(col("cnt") / col("total"))))
              .as("avg_surprisal"))
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (
             |  SELECT doc_id, unnest(string_split(
             |    regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' ')) AS w
             |  FROM documents),
             |tok2 AS (SELECT doc_id, w FROM toks WHERE w <> ''),
             |vocab AS (SELECT w, count(*)::DOUBLE AS cnt FROM tok2 GROUP BY w),
             |tot AS (SELECT count(*)::DOUBLE AS total FROM tok2)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             |  ${Rounding.duckSql("avg(-ln(cnt / total))")} AS avg_surprisal
             |FROM tok2 JOIN vocab USING (w) CROSS JOIN tot
             |GROUP BY doc_id
             |ORDER BY doc_id""".stripMargin))
  )
}
