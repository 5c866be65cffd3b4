package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.{PolyHash, Rounding}
import graft.io.Tables

/** Round-9 seventh wave: prefix-cache savings estimation (q343 — how
  * much prefill compute exact-prefix KV-cache reuse would save on this
  * corpus) and local-DP randomized response with debiasing (q344 — the
  * client-side privacy mechanism q260's central-DP noise does not
  * cover). Same contract as every other module: each Spark pipeline
  * pairs with DuckDB oracle SQL replaying it.
  */
object ExtensionQueries49 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q343: prefix-cache savings — if serving keyed a KV cache on
    // exact k-token prefixes, how much prefill would this corpus
    // re-use? For k ∈ {8, 16, 32}: docs with ≥ k tokens, their
    // k-prefix fingerprints (PolyHash of the joined prefix — one
    // shuffle on the hash per k), and every doc beyond the first in a
    // fingerprint group saves k tokens of prefill. saved_token_share
    // divides by TOTAL corpus tokens, so the three rows compare on one
    // scale. The fingerprint group sizes are the whole state — never a
    // pairwise join; boilerplate-heavy corpora (q169's shape) show
    // large shares, clean prose shows ~0.
    Q(
      "q343_prefix_cache_savings",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            expr("filter(split(text, ' '), w -> w <> '')").as("arr"))
          .withColumn("ntok", size(col("arr")).cast("long"))
        val total = docs.agg(sum("ntok").as("total_tokens"))
        val perK = Seq(8, 16, 32).map { k =>
          docs.where(col("ntok") >= k)
            .select(PolyHash(concat_ws(" ",
              slice(col("arr"), 1, k))).as("fp"))
            .groupBy("fp").agg(count(lit(1)).as("cnt"))
            .agg(lit(k.toLong).as("k"),
              sum("cnt").cast("long").as("n_docs_ge_k"),
              count(lit(1)).cast("long").as("n_prefix_groups"),
              sum(col("cnt") - 1).cast("long").as("saved_docs"),
              (sum(col("cnt") - 1) * k).cast("long").as("saved_tokens"))
        }.reduce(_ unionAll _)
        perK.crossJoin(broadcast(total))
          .select(col("k"), col("n_docs_ge_k"), col("n_prefix_groups"),
            col("saved_docs"),
            Rounding.stableRound6(col("saved_tokens").cast("double") /
              col("total_tokens").cast("double")).as("saved_token_share"))
          .orderBy("k")
      },
      Some {
        val grp = (k: Int) =>
          s"""g$k AS (
             |  SELECT ${PolyHash.duckSql(
                  s"array_to_string(arr[1:$k], ' ')")} AS fp,
             |    count(*) AS cnt
             |  FROM d WHERE ntok >= $k GROUP BY 1),
             |a$k AS (
             |  SELECT CAST($k AS BIGINT) AS k,
             |    CAST(sum(cnt) AS BIGINT) AS n_docs_ge_k,
             |    CAST(count(*) AS BIGINT) AS n_prefix_groups,
             |    CAST(sum(cnt - 1) AS BIGINT) AS saved_docs,
             |    CAST(sum(cnt - 1) * $k AS BIGINT) AS saved_tokens
             |  FROM g$k)"""
        s"""WITH d AS (
           |  SELECT doc_id,
           |    list_filter(string_split(text, ' '), w -> w <> '') AS arr,
           |    len(list_filter(string_split(text, ' '), w -> w <> ''))
           |      AS ntok
           |  FROM documents),
           |tot AS (SELECT CAST(sum(ntok) AS BIGINT) AS total_tokens FROM d),
           |${grp(8)},
           |${grp(16)},
           |${grp(32)},
           |u AS (SELECT * FROM a8 UNION ALL SELECT * FROM a16
           |      UNION ALL SELECT * FROM a32)
           |SELECT u.k, u.n_docs_ge_k, u.n_prefix_groups, u.saved_docs,
           |  ${Rounding.duckSql(
                "u.saved_tokens::DOUBLE / tot.total_tokens::DOUBLE")}
           |    AS saved_token_share
           |FROM u CROSS JOIN tot
           |ORDER BY u.k""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q344: local-DP randomized response — the CLIENT-side mechanism
    // (each event reports a possibly-lied event type; the server never
    // sees truth) with the unbiased frequency estimator, versus q260's
    // central-DP noise on true counts. Mechanism: with probability
    // p = 0.25 report a uniform draw over the 5 types, else the truth;
    // the "coins" are PolyHash streams keyed by event_id, so BOTH
    // engines flip identically and the gate is exact. Debias:
    // est_c = (obs_c − n·p/5) / (1 − p). The output carries the true
    // counts alongside (this is the fixture audit of estimator error —
    // a production pipeline would not have them). One scan; the type
    // frame is the 5-value domain.
    Q(
      "q344_randomized_response",
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val typeArr = typedlit(types)
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("event_type"))
          .withColumn("coin",
            pmod(PolyHash(concat(lit("rr#"), col("event_id"))),
              lit(1000000L)))
          .withColumn("pick",
            pmod(PolyHash(concat(lit("rp#"), col("event_id"))), lit(5L)))
          .withColumn("reported",
            when(col("coin") < 250000L,
              element_at(typeArr, col("pick").cast("int") + 1))
              .otherwise(col("event_type")))
        val n = ev.agg(count(lit(1)).as("n"))
        val obs = ev.groupBy(col("reported").as("event_type"))
          .agg(count(lit(1)).as("obs_n"))
        val truth = ev.groupBy("event_type")
          .agg(count(lit(1)).as("true_n"))
        obs.join(truth, "event_type").crossJoin(broadcast(n))
          .select(col("event_type"), col("true_n").cast("long").as("true_n"),
            col("obs_n").cast("long").as("obs_n"),
            Rounding.stableRound6(
              (col("obs_n").cast("double") -
                col("n").cast("double") * 0.25 / 5.0) / (1.0 - 0.25))
              .as("est_n"),
            Rounding.stableRound6(abs(
              (col("obs_n").cast("double") -
                col("n").cast("double") * 0.25 / 5.0) / (1.0 - 0.25) -
                col("true_n").cast("double")) /
              col("true_n").cast("double")).as("rel_err"))
          .orderBy("event_type")
      },
      Some(s"""WITH ev AS (
             |  SELECT event_id, event_type,
             |    ${PolyHash.duckSql("'rr#' || event_id::VARCHAR")} % 1000000
             |      AS coin,
             |    ${PolyHash.duckSql("'rp#' || event_id::VARCHAR")} % 5
             |      AS pick
             |  FROM events),
             |rep AS (
             |  SELECT event_type,
             |    CASE WHEN coin < 250000 THEN
             |      (['click', 'error', 'purchase', 'signup', 'view'])
             |        [pick + 1]
             |    ELSE event_type END AS reported
             |  FROM ev),
             |n AS (SELECT count(*) AS n FROM rep),
             |obs AS (SELECT reported AS event_type, count(*) AS obs_n
             |        FROM rep GROUP BY reported),
             |truth AS (SELECT event_type, count(*) AS true_n
             |          FROM rep GROUP BY event_type)
             |SELECT o.event_type, CAST(t.true_n AS BIGINT) AS true_n,
             |  CAST(o.obs_n AS BIGINT) AS obs_n,
             |  ${Rounding.duckSql(
                  "(o.obs_n::DOUBLE - n.n::DOUBLE * 0.25 / 5.0) " +
                    "/ (1.0 - 0.25)")} AS est_n,
             |  ${Rounding.duckSql(
                  "abs((o.obs_n::DOUBLE - n.n::DOUBLE * 0.25 / 5.0) " +
                    "/ (1.0 - 0.25) - t.true_n::DOUBLE) " +
                    "/ t.true_n::DOUBLE")} AS rel_err
             |FROM obs o JOIN truth t ON t.event_type = o.event_type
             |CROSS JOIN n
             |ORDER BY o.event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // q345: dedup threshold survival sweep — the policy-decision curve:
    // at Jaccard thresholds {0.5 … 0.9}, how many pairs survive, how
    // many clusters form, how many docs (and what TOKEN share) would
    // dedup remove under min-id survivorship? Candidates and exact
    // Jaccards compute ONCE at the loosest threshold (banded MinHash —
    // never all-pairs — then the 1e-6-snapped exact verify); each
    // sweep point is a filter + min-label components over an
    // ever-smaller pair set. This is the chart a curation owner reads
    // before picking q53's production threshold. The oracle replays
    // the shared pair frame MATERIALIZED and runs one recursive
    // component walk per threshold.
    Q(
      "q345_dedup_threshold_sweep",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        // r14 opt (guide §2.4/§2.6): the five sweep points used to run
        // FIVE independent iterative component loops (each paying the
        // per-iteration join/agg/checkpoint jobs) plus five re-scans of
        // the token-count frame. Now: the checkpointed pair set is
        // replicated per qualifying threshold (≤5×, pair-set-sized) and
        // ONE grouped min-label loop (canonicalizeGrouped, keyed on the
        // threshold) labels all five subsets in max-over-thresholds
        // iterations; toks is checkpointed so the corpus tokenize runs
        // once. Per-threshold labels are identical — propagation never
        // crosses a threshold group — so every output number matches
        // the oracle's per-threshold replay unchanged.
        val toks = docs.select(col("doc_id"),
          size(expr("filter(split(text, ' '), w -> w <> '')"))
            .cast("long").as("ntok"))
          .localCheckpoint()
        val totalToks = toks.agg(sum("ntok").as("total_tokens"))
        val allJac = graft.ext.Dedup
          .nearDupPairs(docs, "text", "doc_id", 0.5)
          .localCheckpoint()
        val thresholds = Seq(0.5, 0.6, 0.7, 0.8, 0.9)
        val tArr = array(thresholds.map(lit): _*)
        val rep = allJac.select(col("da"), col("db"),
          explode(filter(tArr, t => col("jaccard") >= t)).as("threshold"))
        val labels = graft.ext.Dedup
          .canonicalizeGrouped(rep, Seq("threshold"))
        val nPairs = rep.groupBy("threshold")
          .agg(count(lit(1)).as("n_pairs"))
        val nClusters = labels.groupBy("threshold")
          .agg(countDistinct("label").as("n_clusters"))
        val removedStats = labels.where(col("id") =!= col("label"))
          .join(toks, col("id") === col("doc_id"), "left")
          .groupBy("threshold")
          .agg(count(lit(1)).as("docs_removed"),
            coalesce(sum("ntok"), lit(0L)).as("tokens_removed"))
        // a threshold with no surviving pairs must still emit its row
        // (zero counts), exactly as the old per-threshold aggregates did
        val tf = thresholds.foldLeft(
            Option.empty[org.apache.spark.sql.DataFrame]) { (acc, t) =>
            val one = s.range(1).select(lit(t).as("threshold"))
            Some(acc.map(_.unionAll(one)).getOrElse(one))
          }.get
        tf.join(nPairs, Seq("threshold"), "left")
          .join(nClusters, Seq("threshold"), "left")
          .join(removedStats, Seq("threshold"), "left")
          .crossJoin(broadcast(totalToks))
          .select(col("threshold"),
            coalesce(col("n_pairs"), lit(0L)).cast("long").as("n_pairs"),
            coalesce(col("n_clusters"), lit(0L)).cast("long")
              .as("n_clusters"),
            coalesce(col("docs_removed"), lit(0L)).cast("long")
              .as("docs_removed"),
            Rounding.stableRound6(
              coalesce(col("tokens_removed"), lit(0L)).cast("double") /
                col("total_tokens").cast("double"))
              .as("token_share_removed"))
          .orderBy("threshold")
      },
      Some {
        val block = (i: Int, t: Double) =>
          s"""p$i AS (SELECT da, db FROM alljac WHERE jaccard >= $t),
             |e$i AS (SELECT da AS s, db AS d FROM p$i
             |        UNION ALL SELECT db, da FROM p$i),
             |w$i(id, lab) AS (
             |  SELECT s, s FROM e$i
             |  UNION
             |  SELECT e.s, w.lab FROM e$i e JOIN w$i w ON w.id = e.d),
             |l$i AS (SELECT id, min(lab) AS label FROM w$i GROUP BY id),
             |r$i AS (
             |  SELECT CAST($t AS DOUBLE) AS threshold,
             |    (SELECT count(*) FROM p$i) AS n_pairs,
             |    (SELECT count(DISTINCT label) FROM l$i) AS n_clusters,
             |    count(*) AS docs_removed,
             |    coalesce(sum(tk.ntok), 0) AS tokens_removed
             |  FROM (SELECT id FROM l$i WHERE id <> label) rm
             |  LEFT JOIN tk ON tk.doc_id = rm.id)"""
        val blocks = Seq(0.5, 0.6, 0.7, 0.8, 0.9).zipWithIndex
          .map { case (t, i) => block(i, t) }.mkString(",\n")
        val union = (0 until 5).map(i => s"SELECT * FROM r$i")
          .mkString("\n  UNION ALL ")
        s"""WITH RECURSIVE alljac AS MATERIALIZED (
           |${ExtensionQueries.nearDupPairsOracleAt(0.5)}
           |),
           |tk AS MATERIALIZED (
           |  SELECT doc_id,
           |    len(list_filter(string_split(text, ' '), w -> w <> ''))
           |      AS ntok
           |  FROM documents),
           |tt AS (SELECT CAST(sum(ntok) AS BIGINT) AS total_tokens FROM tk),
           |$blocks,
           |u AS ($union)
           |SELECT u.threshold, CAST(u.n_pairs AS BIGINT) AS n_pairs,
           |  CAST(u.n_clusters AS BIGINT) AS n_clusters,
           |  CAST(u.docs_removed AS BIGINT) AS docs_removed,
           |  ${Rounding.duckSql(
                "u.tokens_removed::DOUBLE / tt.total_tokens::DOUBLE")}
           |    AS token_share_removed
           |FROM u CROSS JOIN tt
           |ORDER BY u.threshold""".stripMargin
      }))
}
