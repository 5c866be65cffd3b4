package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.Sampling
import graft.functions.Rounding
import graft.io.Tables

/** Round-8 third continuation wave: sequential A/B testing (SPRT,
  * q264), kNN-graph hubness (q265), and day-of-week seasonality
  * strength (q266). Same contract as every other module: each Spark
  * pipeline pairs with DuckDB oracle SQL replaying it.
  */
object ExtensionQueries28 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q264: SPRT sequential A/B test — Wald's sequential probability
    // ratio test over each variant's event stream: the
    // early-stopping decision procedure (accept H1: conversion ≥ p1,
    // accept H0: ≤ p0, or keep collecting) that a streaming experiment
    // framework runs instead of fixed-horizon tests. Per event the LLR
    // steps by ln(p1/p0) on conversion, ln((1−p1)/(1−p0)) otherwise —
    // both snapped once to the 1e-9 LONG grid, so the whole walk is
    // cum9 = k·a9 + (i−k)·b9: EXACT integer arithmetic on two prefix
    // counts. The prefix counts come from the q249 two-pass block
    // discipline (per-block window + bounded block-frame prefix),
    // never a per-variant single-partition window; the decision
    // thresholds ±ln((1−β)/α) (α = β = 0.05) live on the same grid.
    Q(
      "q264_sprt_ab_test",
      (s, dir) => {
        val a9 = floor(log(lit(0.20) / lit(0.10)) * lit(1000000000.0) +
          lit(0.5)).cast("long")
        val b9 = floor(log(lit(0.80) / lit(0.90)) * lit(1000000000.0) +
          lit(0.5)).cast("long")
        val t9 = floor(log(lit(0.95) / lit(0.05)) * lit(1000000000.0) +
          lit(0.5)).cast("long")
        val e = Tables.load(s, dir, "events")
          .select((col("user_id") % 2).as("variant"), col("event_id"),
            when(col("event_type") === "purchase", 1L).otherwise(0L)
              .as("p"))
          .withColumn("blk", expr("event_id div 8192"))
        val wIn = Window.partitionBy("variant", "blk").orderBy("event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wRn = Window.partitionBy("variant", "blk").orderBy("event_id")
        val wPrev = Window.partitionBy("variant").orderBy("blk")
          .rowsBetween(Window.unboundedPreceding, -1)
        val pref = e.groupBy("variant", "blk")
          .agg(sum("p").as("bk"), count(lit(1)).as("bn"))
          .withColumn("pk", coalesce(sum("bk").over(wPrev), lit(0L)))
          .withColumn("pn", coalesce(sum("bn").over(wPrev), lit(0L)))
          .select(col("variant"), col("blk"), col("pk"), col("pn"))
        val walk = e
          .withColumn("kin", sum("p").over(wIn))
          .withColumn("iin", row_number().over(wRn).cast("long"))
          .join(broadcast(pref), Seq("variant", "blk"))
          .withColumn("k", col("pk") + col("kin"))
          .withColumn("i", col("pn") + col("iin"))
          .withColumn("cum9", col("k") * a9 + (col("i") - col("k")) * b9)
          .withColumn("crossed",
            col("cum9") >= t9 || col("cum9") <= -t9)
        val firstCross = walk.where(col("crossed"))
          .groupBy("variant").agg(min("i").as("n_at_decision"))
          .withColumnRenamed("variant", "v2")
        val atCross = walk.join(broadcast(firstCross),
            col("variant") === col("v2") &&
              col("i") === col("n_at_decision"))
          .select(col("variant"), col("n_at_decision"),
            col("cum9").as("cum9_dec"))
        walk.groupBy("variant")
          .agg(count(lit(1)).as("n_total"), sum("p").as("n_purchases"),
            max("cum9").as("maxc"), min("cum9").as("minc"))
          .join(atCross, Seq("variant"), "left")
          .select(col("variant").cast("long").as("variant"),
            col("n_total").cast("long").as("n_total"),
            col("n_purchases").cast("long").as("n_purchases"),
            coalesce(col("n_at_decision"), lit(-1L)).cast("long")
              .as("n_at_decision"),
            when(col("cum9_dec").isNull, "continue")
              .when(col("cum9_dec") >= t9, "accept_h1")
              .otherwise("accept_h0").as("decision"),
            Rounding.stableRound6(coalesce(col("cum9_dec"), lit(0L))
              .cast("double") / lit(1000000000.0)).as("llr_at_decision"))
          .orderBy("variant")
      },
      Some(s"""WITH g AS (
             |  SELECT CAST(floor(ln(0.20 / 0.10) * 1000000000 + 0.5)
             |      AS BIGINT) AS a9,
             |    CAST(floor(ln(0.80 / 0.90) * 1000000000 + 0.5)
             |      AS BIGINT) AS b9,
             |    CAST(floor(ln(0.95 / 0.05) * 1000000000 + 0.5)
             |      AS BIGINT) AS t9),
             |e AS (
             |  SELECT user_id % 2 AS variant, event_id,
             |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
             |  FROM events),
             |walk AS (
             |  SELECT variant, p,
             |    sum(p) OVER (PARTITION BY variant ORDER BY event_id) AS k,
             |    row_number() OVER (PARTITION BY variant ORDER BY event_id)
             |      AS i
             |  FROM e),
             |c AS (
             |  SELECT variant, p, k, i, k * a9 + (i - k) * b9 AS cum9,
             |    (k * a9 + (i - k) * b9 >= t9 OR
             |     k * a9 + (i - k) * b9 <= -t9) AS crossed
             |  FROM walk CROSS JOIN g),
             |fc AS (
             |  SELECT variant, min(i) AS n_at_decision FROM c
             |  WHERE crossed GROUP BY 1),
             |ac AS (
             |  SELECT c.variant, fc.n_at_decision, c.cum9 AS cum9_dec
             |  FROM c JOIN fc ON fc.variant = c.variant
             |    AND c.i = fc.n_at_decision),
             |tot AS (
             |  SELECT variant, count(*) AS n_total, sum(p) AS n_purchases
             |  FROM c GROUP BY 1)
             |SELECT CAST(tot.variant AS BIGINT) AS variant,
             |  CAST(n_total AS BIGINT) AS n_total,
             |  CAST(n_purchases AS BIGINT) AS n_purchases,
             |  CAST(coalesce(n_at_decision, -1) AS BIGINT)
             |    AS n_at_decision,
             |  CASE WHEN cum9_dec IS NULL THEN 'continue'
             |    WHEN cum9_dec >= (SELECT t9 FROM g) THEN 'accept_h1'
             |    ELSE 'accept_h0' END AS decision,
             |  ${Rounding.duckSql(
                  "coalesce(cum9_dec, 0)::DOUBLE / 1000000000")}
             |    AS llr_at_decision
             |FROM tot LEFT JOIN ac ON ac.variant = tot.variant
             |ORDER BY tot.variant""".stripMargin)),

    // ------------------------------------------------------------------
    // q265: kNN-graph hubness — the ANN index health check the recall
    // audits (q189, q212) don't see: in high dimensions a few "hub"
    // vectors appear in a disproportionate share of other points'
    // k-NN lists, degrading graph-based indexes (HNSW) and
    // nearest-neighbor classification alike. Over a deterministic 10%
    // hash sample, build the exact k=5 cosine NN graph (scores snapped
    // to the stableRound6 grid BEFORE ranking, neighbor-id tiebreak —
    // the q234 discipline) and report the in-degree histogram,
    // densified from 0 (anti-hubs — never anyone's neighbor — are the
    // other half of the diagnosis). The sample bound makes the cross
    // score quadratic in the SAMPLE, constant in the corpus; at 100 TB
    // the same audit runs per IVF cell (q242's frame) instead.
    Q(
      "q265_knn_hubness",
      (s, dir) => {
        import graft.functions.VectorFunctions
        val smp = Tables.load(s, dir, "embeddings")
          .where(Sampling.bucket(col("vec_id"), "hub27") < 1000)
          .select(col("vec_id"), col("embedding"))
          .localCheckpoint()
        val scored = broadcast(smp.select(col("vec_id").as("qid"),
            col("embedding").as("qv")))
          .crossJoin(smp.select(col("vec_id").as("nid"),
            col("embedding").as("nv")))
          .where(col("qid") =!= col("nid"))
          .withColumn("cos", Rounding.stableRound6(
            VectorFunctions.cosineSim(col("qv"), col("nv"))))
        val w = Window.partitionBy("qid").orderBy(desc("cos"), col("nid"))
        val inDeg = scored.withColumn("rk", row_number().over(w))
          .where(col("rk") <= 5)
          .groupBy("nid").agg(count(lit(1)).as("deg"))
        val nodes = smp.select(col("vec_id").as("nid"))
          .join(inDeg, Seq("nid"), "left")
          .withColumn("deg", coalesce(col("deg"), lit(0L)))
        val maxDeg = nodes.agg(max("deg").as("md"))
        maxDeg.select(explode(sequence(lit(0L), col("md"))).as("deg"))
          .join(nodes.groupBy("deg").agg(count(lit(1)).as("n_nodes")),
            Seq("deg"), "left")
          .select(col("deg").cast("long").as("in_deg"),
            coalesce(col("n_nodes"), lit(0L)).cast("long").as("n_nodes"))
          .orderBy("in_deg")
      },
      Some(s"""WITH smp AS (
             |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
             |  WHERE ${Sampling.bucketDuckSql("hub27", "vec_id")} < 1000),
             |scored AS (
             |  SELECT a.vec_id AS qid, b.vec_id AS nid,
             |    ${Rounding.duckSql("list_cosine_similarity(a.v, b.v)")}
             |      AS cos
             |  FROM smp a CROSS JOIN smp b WHERE a.vec_id <> b.vec_id),
             |top AS (
             |  SELECT nid FROM (
             |    SELECT nid, row_number() OVER (PARTITION BY qid
             |      ORDER BY cos DESC, nid) AS rk
             |    FROM scored)
             |  WHERE rk <= 5),
             |deg AS (
             |  SELECT smp.vec_id AS nid, coalesce(d.deg, 0) AS deg
             |  FROM smp LEFT JOIN (
             |    SELECT nid, count(*) AS deg FROM top GROUP BY 1) d
             |    ON d.nid = smp.vec_id),
             |hist AS (
             |  SELECT g.deg, coalesce(h.n_nodes, 0) AS n_nodes
             |  FROM (SELECT unnest(range((SELECT max(deg) + 1 FROM deg)))
             |      AS deg) g
             |  LEFT JOIN (SELECT deg, count(*) AS n_nodes FROM deg
             |    GROUP BY 1) h ON h.deg = g.deg)
             |SELECT CAST(deg AS BIGINT) AS in_deg,
             |  CAST(n_nodes AS BIGINT) AS n_nodes
             |FROM hist
             |ORDER BY in_deg""".stripMargin)),

    // ------------------------------------------------------------------
    // q266: day-of-week seasonality strength — the time-series
    // decomposition audit behind the q229 MASE choice of a lag-7
    // forecast: how much of daily revenue variance the weekly profile
    // explains, as the between-group share R² = SS_dow / SS_total over
    // daily integer-cents totals. Both sums of squares reduce to EXACT
    // integer aggregates (Σc², group sums, counts — in decimal(38,0)
    // for headroom; DuckDB's integer sums are HUGEINT already); the
    // strength and peak-day mean are single divisions on the rounding
    // grid, with the peak day chosen by an exact integer mean6
    // comparison over the 7-row dow frame.
    Q(
      "q266_dow_seasonality",
      (s, dir) => {
        val daily = Tables.load(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long"))
            .as("c"))
          .withColumn("dow", weekday(col("day")) + lit(1))
          .localCheckpoint()
        val cd = col("c").cast("decimal(38,0)")
        val byDow = daily.groupBy("event_type", "dow")
          .agg(sum("c").as("sg"), count(lit(1)).as("ng"))
          .withColumn("mean6", expr("(sg * 1000000) div ng"))
        val wPk = Window.partitionBy("event_type")
          .orderBy(desc("mean6"), col("dow"))
        val peak = byDow.withColumn("rk", row_number().over(wPk))
          .where(col("rk") === 1)
          .select(col("event_type"), col("dow").as("peak_dow"),
            col("mean6"))
        // Σ floor(S_g²/n_g) — exact LONG in both engines (identical
        // floors, so gate-stable; the <1-per-group floor loss is 1e-15
        // relative at these magnitudes). A float division inside a
        // distributed sum is the q204 bug class; Spark's `div` returns
        // LONG, so the 1e-6-grid variant overflowed at sf0.1 — the
        // unscaled quotient keeps every intermediate below 2^63 (a
        // larger corpus promotes sg² to decimal with the same shape).
        val ssb = byDow.groupBy("event_type")
          .agg(sum(expr("(sg * sg) div ng")).as("sb"))
        val tot = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n_days"), sum("c").as("s"),
            sum(cd * cd).as("q"))
        tot.join(ssb, "event_type").join(peak, "event_type")
          .withColumn("sst", col("q").cast("double") -
            col("s").cast("double") * col("s").cast("double") /
              col("n_days").cast("double"))
          .withColumn("ssbv", col("sb").cast("double") -
            col("s").cast("double") * col("s").cast("double") /
              col("n_days").cast("double"))
          .select(col("event_type"), col("n_days").cast("long").as("n_days"),
            col("peak_dow").cast("long").as("peak_dow"),
            Rounding.stableRound6(col("mean6").cast("double") /
              lit(1000000.0) / lit(100.0)).as("peak_daily_mean"),
            Rounding.stableRound6(col("ssbv") / col("sst"))
              .as("dow_strength"))
          .orderBy("event_type")
      },
      Some(s"""WITH daily AS (
             |  SELECT event_type, ts::DATE AS day,
             |    sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS c,
             |    isodow(ts::DATE) AS dow
             |  FROM events GROUP BY 1, 2, 4),
             |bydow AS (
             |  SELECT event_type, dow, sum(c) AS sg, count(*) AS ng,
             |    (sum(c) * 1000000) // count(*) AS mean6
             |  FROM daily GROUP BY 1, 2),
             |peak AS (
             |  SELECT event_type, dow AS peak_dow, mean6 FROM (
             |    SELECT *, row_number() OVER (PARTITION BY event_type
             |      ORDER BY mean6 DESC, dow) AS rk
             |    FROM bydow)
             |  WHERE rk = 1),
             |ssb AS (
             |  SELECT event_type, sum((sg * sg) // ng) AS sb
             |  FROM bydow GROUP BY 1),
             |tot AS (
             |  SELECT event_type, count(*) AS n_days, sum(c) AS s,
             |    sum(c * c) AS q
             |  FROM daily GROUP BY 1)
             |SELECT tot.event_type, CAST(n_days AS BIGINT) AS n_days,
             |  CAST(peak_dow AS BIGINT) AS peak_dow,
             |  ${Rounding.duckSql("mean6::DOUBLE / 1000000 / 100.0")}
             |    AS peak_daily_mean,
             |  ${Rounding.duckSql(
                  "(sb::DOUBLE - s::DOUBLE * s::DOUBLE / n_days::DOUBLE) / " +
                  "(q::DOUBLE - s::DOUBLE * s::DOUBLE / n_days::DOUBLE)")}
             |    AS dow_strength
             |FROM tot
             |JOIN ssb ON ssb.event_type = tot.event_type
             |JOIN peak ON peak.event_type = tot.event_type
             |ORDER BY tot.event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // q267: IVF recall/probe sweep — q189 audits recall at ONE setting;
    // index tuning needs the CURVE: for nProbe ∈ {1, 2, 4, 8} against
    // the 16-cell IVF layout, mean recall@10 vs the brute-force
    // ground truth next to the scan cost (candidate postings touched,
    // as an exact share of n_queries × corpus — the latency proxy a
    // probe setting is chosen by). One cell-assignment pass feeds all
    // four settings (the probe list is the rank ≤ 8 prefix filtered
    // per setting); everything downstream is joins on the bounded
    // probe frame. Deterministic end to end (hash-picked centroids,
    // grid-rounded scores, id tiebreaks), so the oracle replays the
    // full sweep.
    Q(
      "q267_ivf_probe_sweep",
      (s, dir) => {
        import s.implicits._
        import graft.ext.SimilaritySearch
        import graft.functions.VectorFunctions
        val e = Tables.load(s, dir, "embeddings")
        val probes = e.filter(col("vec_id") < 20)
        val brute = SimilaritySearch.bruteTopK(probes, e, 10)
          .select("query_id", "neighbor_id")
        val settings = Seq(1, 2, 4, 8)
        val sweep = settings.map { np =>
          SimilaritySearch.ivfTopK(probes, e, 10, nCentroids = 16,
              nProbe = np)
            .select(col("query_id"), col("neighbor_id"))
            .withColumn("np", lit(np))
        }.reduce(_ unionByName _)
        val hits = sweep
          .join(brute, Seq("query_id", "neighbor_id"), "left_semi")
          .groupBy("np").agg(count(lit(1)).as("n_hits"))
        val cents = SimilaritySearch.hashPickedCentroids(e, "vec_id",
          "embedding", 16)
        val sizes = e.select(element_at(
            VectorFunctions.centroidRanks(col("embedding"), cents, 1), 1)
            .as("cell"))
          .groupBy("cell").agg(count(lit(1)).as("csz"))
        val npDf = settings.toDF("np")
        val scanned = probes.select(col("vec_id").as("query_id"),
            posexplode(VectorFunctions.centroidRanks(col("embedding"),
              cents, 8)).as(Seq("pos", "cell")))
          .crossJoin(broadcast(npDf))
          .where(col("pos") < col("np"))
          .join(broadcast(sizes), "cell")
          .groupBy("np").agg(sum("csz").as("scanned"))
        val counts = probes.agg(count(lit(1)).as("nq"))
          .crossJoin(e.agg(count(lit(1)).as("n_corpus")))
        npDf.join(hits, Seq("np"), "left")
          .join(scanned, Seq("np"), "left")
          .crossJoin(broadcast(counts))
          .select(col("np").cast("long").as("np"),
            col("nq").cast("long").as("n_queries"),
            coalesce(col("n_hits"), lit(0L)).cast("long").as("n_hits"),
            Rounding.stableRound6(coalesce(col("n_hits"), lit(0L))
              .cast("double") / (col("nq") * 10).cast("double"))
              .as("recall_at_10"),
            coalesce(col("scanned"), lit(0L)).cast("long").as("scanned"),
            Rounding.stableRound6(coalesce(col("scanned"), lit(0L))
              .cast("double") /
              (col("nq") * col("n_corpus")).cast("double"))
              .as("scan_share"))
          .orderBy("np")
      },
      Some({
        val hashSql = graft.functions.PolyHash.duckSql(
          "'ivf#' || vec_id::VARCHAR")
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |picked AS (
           |  SELECT vec_id, v FROM (
           |    SELECT vec_id, v, $hashSql AS h FROM e)
           |  ORDER BY h, vec_id LIMIT 16),
           |cents AS (
           |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
           |  FROM picked),
           |cell_ranks AS (
           |  SELECT e.vec_id, c.cid,
           |    row_number() OVER (PARTITION BY e.vec_id
           |      ORDER BY list_dot_product(e.v, c.cv) DESC, c.cid) AS rnk
           |  FROM e CROSS JOIN cents c),
           |assign AS (SELECT vec_id, cid FROM cell_ranks WHERE rnk = 1),
           |sizes AS (SELECT cid, count(*) AS csz FROM assign GROUP BY 1),
           |nps AS (SELECT unnest([1, 2, 4, 8]) AS np),
           |probes AS (
           |  SELECT np, vec_id, cid FROM cell_ranks CROSS JOIN nps
           |  WHERE rnk <= np AND vec_id < 20),
           |scanned AS (
           |  SELECT np, sum(csz) AS scanned
           |  FROM probes JOIN sizes USING (cid) GROUP BY 1),
           |brute AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
           |        floor(list_cosine_similarity(q.v, c.v) * 1000000 + 0.5)
           |          / 1000000 DESC, c.vec_id) AS rk
           |    FROM e q CROSS JOIN e c
           |    WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id)
           |  WHERE rk <= 10),
           |ivf AS (
           |  SELECT np, query_id, neighbor_id FROM (
           |    SELECT p.np, p.vec_id AS query_id, a.vec_id AS neighbor_id,
           |      row_number() OVER (PARTITION BY p.np, p.vec_id ORDER BY
           |        floor(list_cosine_similarity(eq.v, en.v) * 1000000 + 0.5)
           |          / 1000000 DESC, a.vec_id) AS rank
           |    FROM probes p
           |    JOIN assign a ON a.cid = p.cid AND a.vec_id <> p.vec_id
           |    JOIN e eq ON eq.vec_id = p.vec_id
           |    JOIN e en ON en.vec_id = a.vec_id)
           |  WHERE rank <= 10),
           |hits AS (
           |  SELECT np, count(*) AS n_hits
           |  FROM ivf JOIN brute USING (query_id, neighbor_id)
           |  GROUP BY 1),
           |nq AS (SELECT count(*) AS nq FROM e WHERE vec_id < 20),
           |cn AS (SELECT count(*) AS n_corpus FROM e)
           |SELECT CAST(nps.np AS BIGINT) AS np,
           |  CAST(nq AS BIGINT) AS n_queries,
           |  CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
           |  ${Rounding.duckSql(
                "coalesce(n_hits, 0)::DOUBLE / (nq * 10)::DOUBLE")}
           |    AS recall_at_10,
           |  CAST(coalesce(scanned, 0) AS BIGINT) AS scanned,
           |  ${Rounding.duckSql(
                "coalesce(scanned, 0)::DOUBLE / (nq * n_corpus)::DOUBLE")}
           |    AS scan_share
           |FROM nps
           |LEFT JOIN hits ON hits.np = nps.np
           |LEFT JOIN scanned ON scanned.np = nps.np
           |CROSS JOIN nq CROSS JOIN cn
           |ORDER BY nps.np""".stripMargin
      })),

    // ------------------------------------------------------------------
    // q269: lexical diversity — type-token ratio and hapax-legomenon
    // share per source: the vocabulary-concentration signals next to
    // q163's entropy (a source whose TTR collapses is templated text;
    // a hapax share near 1 is OCR noise or ID-like garbage — both
    // curation red flags the length/punct stats of q40 can't see).
    // One token scan to a (source, word) count frame (vocab-bounded),
    // then a source-sized rollup; ratios are single divisions of exact
    // counts on the rounding grid.
    Q(
      "q269_ttr_hapax",
      (s, dir) => {
        val wc = Tables.load(s, dir, "documents")
          .select(col("source"),
            explode(graft.ops.Text.words(
              graft.ops.Text.clean(col("text")))).as("w"))
          .groupBy("source", "w").agg(count(lit(1)).as("c"))
        wc.groupBy("source")
          .agg(sum("c").as("tokens"), count(lit(1)).as("vocab"),
            sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n_hapax"))
          .select(col("source"), col("tokens").cast("long").as("tokens"),
            col("vocab").cast("long").as("vocab"),
            col("n_hapax").cast("long").as("n_hapax"),
            Rounding.stableRound6(col("vocab").cast("double") /
              col("tokens").cast("double")).as("ttr"),
            Rounding.stableRound6(col("n_hapax").cast("double") /
              col("vocab").cast("double")).as("hapax_share"))
          .orderBy("source")
      },
      Some(s"""WITH wc AS (
             |  SELECT source, word, count(*) AS c FROM (
             |    SELECT source, unnest(list_filter(string_split(
             |      regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' '),
             |      w -> w <> '')) AS word
             |    FROM documents)
             |  GROUP BY 1, 2)
             |SELECT source, CAST(sum(c) AS BIGINT) AS tokens,
             |  CAST(count(*) AS BIGINT) AS vocab,
             |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_hapax,
             |  ${Rounding.duckSql("count(*)::DOUBLE / sum(c)::DOUBLE")}
             |    AS ttr,
             |  ${Rounding.duckSql(
                  "sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::DOUBLE / " +
                  "count(*)::DOUBLE")} AS hapax_share
             |FROM wc GROUP BY source
             |ORDER BY source""".stripMargin)),

    // ------------------------------------------------------------------
    // q270: character-bigram entropy rate — H(c₂|c₁) = H(pairs) −
    // H(first chars) per language: the character-statistics fingerprint
    // under the word-level members of the information family (q163
    // word entropy, q151 MI, q94 surprisal). Natural language sits in a
    // narrow band (~2.3–3.3 bits); encrypted/compressed/base64 payloads
    // masquerading as text push toward ln(alphabet), repeated
    // boilerplate collapses toward 0 — a cheap scanner-level content
    // filter. Each Σ n·ln(n) term snaps to the 1e-9 LONG grid BEFORE
    // the (alphabet²-bounded) sum, one final assembly per language on
    // the rounding grid. The fixture corpus is ASCII (max codepoint
    // 121, checked), so UTF-16 `split` and codepoint extraction agree
    // across engines.
    Q(
      "q270_char_entropy_rate",
      (s, dir) => {
        val chars = Tables.loadParallel(s, dir, "documents")
          .select(col("lang"), col("doc_id"), expr(
            "filter(transform(sequence(1, length(text) - 1), " +
              "i -> substring(text, i, 2)), p -> length(p) = 2)")
            .as("ps"))
          .select(col("lang"), explode(col("ps")).as("pair"))
        // r14 opt (guide §2.4): ONE explode pass. The first-char counts
        // are EXACTLY the pair counts re-grouped by the pair's first
        // char (Σ over pairs starting with c1 of n = occurrences of c1
        // as a bigram head), so deriving them from the alphabet²-bounded
        // pairCnt frame removes the second full scan+explode+shuffle of
        // the corpus the old firstCnt paid — both consumers now sit on
        // the SAME (lang, pair) exchange, which ReuseExchange dedupes
        // (one scan+explode map side; measured: a localCheckpoint here
        // was SLOWER than the reused exchange — RDD-block rescans lose
        // codegen). Integer counts are identical, so every downstream
        // double (t9, entropies) is bit-identical.
        val pairCnt = chars.groupBy("lang", "pair")
          .agg(count(lit(1)).as("n"))
          .withColumn("t9", floor(col("n").cast("double") *
            log(col("n").cast("double")) * lit(1000000000.0) + lit(0.5))
            .cast("long"))
        val firstCnt = pairCnt
          .groupBy(col("lang"), substring(col("pair"), 1, 1).as("c1"))
          .agg(sum("n").as("n"))
          .withColumn("t9", floor(col("n").cast("double") *
            log(col("n").cast("double")) * lit(1000000000.0) + lit(0.5))
            .cast("long"))
        val hp = pairCnt.groupBy("lang")
          .agg(sum("n").as("total"), count(lit(1)).as("n_pairs"),
            sum("t9").as("sp9"))
        val h1 = firstCnt.groupBy("lang")
          .agg(count(lit(1)).as("alphabet"), sum("t9").as("s19"))
        hp.join(h1, "lang")
          .withColumn("h_pair", log(col("total").cast("double")) -
            col("sp9").cast("double") /
              (col("total").cast("double") * lit(1000000000.0)))
          .withColumn("h_first", log(col("total").cast("double")) -
            col("s19").cast("double") /
              (col("total").cast("double") * lit(1000000000.0)))
          .select(col("lang"), col("total").cast("long").as("n_bigrams"),
            col("alphabet").cast("long").as("alphabet"),
            col("n_pairs").cast("long").as("n_distinct_bigrams"),
            Rounding.stableRound6(col("h_pair") - col("h_first"))
              .as("entropy_rate_nats"))
          .orderBy("lang")
      },
      Some(s"""WITH pairs AS (
             |  SELECT lang, unnest(list_filter(list_transform(
             |    range(1, length(text)), i -> substr(text, i, 2)),
             |    p -> length(p) = 2)) AS pair
             |  FROM documents),
             |pc AS (
             |  SELECT lang, pair, count(*) AS n,
             |    CAST(floor(count(*)::DOUBLE * ln(count(*)::DOUBLE)
             |      * 1000000000 + 0.5) AS BIGINT) AS t9
             |  FROM pairs GROUP BY 1, 2),
             |fc AS (
             |  SELECT lang, substr(pair, 1, 1) AS c1, count(*) AS n,
             |    CAST(floor(count(*)::DOUBLE * ln(count(*)::DOUBLE)
             |      * 1000000000 + 0.5) AS BIGINT) AS t9
             |  FROM pairs GROUP BY 1, 2),
             |hp AS (
             |  SELECT lang, sum(n) AS total, count(*) AS n_pairs,
             |    sum(t9) AS sp9
             |  FROM pc GROUP BY 1),
             |h1 AS (
             |  SELECT lang, count(*) AS alphabet, sum(t9) AS s19
             |  FROM fc GROUP BY 1)
             |SELECT hp.lang, CAST(total AS BIGINT) AS n_bigrams,
             |  CAST(alphabet AS BIGINT) AS alphabet,
             |  CAST(n_pairs AS BIGINT) AS n_distinct_bigrams,
             |  ${Rounding.duckSql(
                  "(ln(total::DOUBLE) - sp9::DOUBLE / (total::DOUBLE * 1000000000)) - " +
                  "(ln(total::DOUBLE) - s19::DOUBLE / (total::DOUBLE * 1000000000))")}
             |    AS entropy_rate_nats
             |FROM hp JOIN h1 ON h1.lang = hp.lang
             |ORDER BY hp.lang""".stripMargin)),

    // ------------------------------------------------------------------
    // q271: session path mining — the top user journeys: per gap
    // session (q29's strict 1-hour rule), the ordered sequence of the
    // first three event types as a path string, counted corpus-wide
    // with the top 10 reported. This is the ordered-SEQUENCE view the
    // pairwise members can't give (q98's Markov transitions lose
    // position; q135's association rules lose order entirely). Session
    // assignment is the per-user lag/cumsum walk (user-keyed windows
    // distribute); the step pivot is conditional aggregation (never a
    // collect_list whose order the engine doesn't define), and the
    // top-10 arrives via TakeOrderedAndProject with (count desc, path)
    // tiebreak.
    Q(
      "q271_session_paths",
      (s, dir) => {
        val wU = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        val e = Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts").cast("timestamp")).as("ts_us"))
          .withColumn("new_s",
            when(col("ts_us") - lag("ts_us", 1).over(wU) > 3600000000L ||
              lag("ts_us", 1).over(wU).isNull, 1L).otherwise(0L))
          .withColumn("sess", sum("new_s").over(
            Window.partitionBy("user_id").orderBy("ts_us", "event_id")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val wS = Window.partitionBy("user_id", "sess")
          .orderBy("ts_us", "event_id")
        e.withColumn("rn", row_number().over(wS))
          .where(col("rn") <= 3)
          .groupBy("user_id", "sess")
          .agg(concat_ws(">",
            max(when(col("rn") === 1, col("event_type"))),
            max(when(col("rn") === 2, col("event_type"))),
            max(when(col("rn") === 3, col("event_type")))).as("path"))
          .groupBy("path").agg(count(lit(1)).as("n_sessions"))
          .orderBy(desc("n_sessions"), col("path"))
          .limit(10)
          .select(col("path"),
            col("n_sessions").cast("long").as("n_sessions"))
      },
      Some(s"""WITH e AS (
             |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
             |  FROM events),
             |m AS (
             |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
             |      OR ts_us - lag(ts_us) OVER w > 3600000000
             |      THEN 1 ELSE 0 END AS new_s
             |  FROM e
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
             |sess AS (
             |  SELECT *, sum(new_s) OVER (PARTITION BY user_id
             |    ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS sess
             |  FROM m),
             |steps AS (
             |  SELECT *, row_number() OVER (PARTITION BY user_id, sess
             |    ORDER BY ts_us, event_id) AS rn
             |  FROM sess),
             |paths AS (
             |  SELECT user_id, sess, concat_ws('>',
             |    max(CASE WHEN rn = 1 THEN event_type END),
             |    max(CASE WHEN rn = 2 THEN event_type END),
             |    max(CASE WHEN rn = 3 THEN event_type END)) AS path
             |  FROM steps WHERE rn <= 3 GROUP BY 1, 2)
             |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
             |FROM paths GROUP BY path
             |ORDER BY n_sessions DESC, path
             |LIMIT 10""".stripMargin)),

    // ------------------------------------------------------------------
    // q272: rank-function surface — percent_rank, cume_dist, ntile, and
    // nth_value in one gate, completing the window family's coverage
    // (q7 rank/topk, q27 lag deltas, q43/q69/q70 rows/range frames,
    // q108/q119 sliding, q88/q102 session windows). Per nation, the
    // top-3 customers by integer-cents spend with their distribution
    // position (percent_rank, cume_dist on the nation frame), spend
    // quartile (ntile 4), and the nation's second-highest spend
    // (nth_value over the full frame, frame EXPLICIT — engines differ
    // on the default). Nation-keyed windows distribute; ties broken by
    // custkey everywhere.
    Q(
      "q272_rank_functions",
      (s, dir) => {
        val spend = Tables.load(s, dir, "orders")
          .groupBy("o_custkey")
          .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5))
            .cast("long")).as("cents"))
        val cust = Tables.load(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))
        val j = spend.join(cust, col("o_custkey") === col("c_custkey"))
        val w = Window.partitionBy("c_nationkey")
          .orderBy(desc("cents"), col("c_custkey"))
        val wf = w.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
        j.withColumn("rk", row_number().over(w))
          .withColumn("pct_rank", percent_rank().over(w))
          .withColumn("cume", cume_dist().over(w))
          .withColumn("quartile", ntile(4).over(w))
          .withColumn("second_highest", nth_value(col("cents"), 2).over(wf))
          .where(col("rk") <= 3)
          .select(col("c_nationkey").cast("long").as("nation"),
            col("rk").cast("long").as("rk"),
            col("c_custkey").cast("long").as("custkey"),
            col("cents"),
            Rounding.stableRound6(col("pct_rank")).as("pct_rank"),
            Rounding.stableRound6(col("cume")).as("cume_dist"),
            col("quartile").cast("long").as("quartile"),
            col("second_highest").cast("long").as("second_highest"))
          .orderBy("nation", "rk")
      },
      Some(s"""WITH spend AS (
             |  SELECT o_custkey,
             |    sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |      AS cents
             |  FROM orders GROUP BY 1),
             |j AS (
             |  SELECT c_nationkey, c_custkey, cents
             |  FROM spend JOIN customer ON c_custkey = o_custkey),
             |r AS (
             |  SELECT c_nationkey, c_custkey, cents,
             |    row_number() OVER w AS rk,
             |    percent_rank() OVER w AS pct_rank,
             |    cume_dist() OVER w AS cume,
             |    ntile(4) OVER w AS quartile,
             |    nth_value(cents, 2) OVER (PARTITION BY c_nationkey
             |      ORDER BY cents DESC, c_custkey
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |      AS second_highest
             |  FROM j
             |  WINDOW w AS (PARTITION BY c_nationkey
             |    ORDER BY cents DESC, c_custkey))
             |SELECT CAST(c_nationkey AS BIGINT) AS nation,
             |  CAST(rk AS BIGINT) AS rk,
             |  CAST(c_custkey AS BIGINT) AS custkey,
             |  CAST(cents AS BIGINT) AS cents,
             |  ${Rounding.duckSql("pct_rank")} AS pct_rank,
             |  ${Rounding.duckSql("cume")} AS cume_dist,
             |  CAST(quartile AS BIGINT) AS quartile,
             |  CAST(second_highest AS BIGINT) AS second_highest
             |FROM r WHERE rk <= 3
             |ORDER BY nation, rk""".stripMargin)),

    // ------------------------------------------------------------------
    // q273: k-core peeling — the graph family's degeneracy member
    // (q89 ranks, q136 reaches, q145 labels, q73/q152 count local
    // structure; the 2-core strips pendant chains so those all run on
    // the load-bearing subgraph). Three peel rounds over the near-dup
    // edge set: each round recomputes degrees on the surviving graph
    // and drops nodes below degree 2 — per-round node/edge census
    // reported, fixed-point visible as unchanged counts. Rounds are
    // bounded driver iterations over keyed joins (the q89/q95
    // iterative discipline — semi-joins on the keep set, no
    // driver-side graph); the oracle unrolls the same three rounds as
    // chained CTEs over the shared NearDupPairs replay.
    Q(
      "q273_kcore_peel",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
        val pairs = graft.ext.Dedup.nearDupPairs(docs, "text", "doc_id", 0.5)
          .select(col("da"), col("db"))
        var cur = pairs.unionAll(
            pairs.select(col("db").as("da"), col("da").as("db")))
          .toDF("src", "dst")
          .localCheckpoint()
        val census = (1 to 3).map { r =>
          val keep = cur.groupBy("src").agg(count(lit(1)).as("deg"))
            .where(col("deg") >= 2).select(col("src").as("v"))
          cur = cur
            .join(keep.select(col("v").as("src")).hint("shuffle_hash"),
              Seq("src"), "left_semi")
            .join(keep.select(col("v").as("dst")).hint("shuffle_hash"),
              Seq("dst"), "left_semi")
            .localCheckpoint()
          val nodes = cur.select("src").distinct().count()
          (r.toLong, nodes, cur.count() / 2)
        }
        census.toDF("round", "nodes_remaining", "edges_remaining")
          .orderBy("round")
      },
      // every CTE is MATERIALIZED: DuckDB inlines plain CTEs per
      // reference, and the peel chain references each level several
      // times — inlining re-runs the MinHash pair replay exponentially
      // (observed: the un-materialized form ran minutes at sf0.001)
      Some(s"""WITH pairs AS MATERIALIZED (
             |${ExtensionQueries.NearDupPairsOracle}
             |),
             |e0 AS MATERIALIZED (
             |       SELECT da AS src, db AS dst FROM pairs
             |       UNION ALL SELECT db, da FROM pairs),
             |k1 AS MATERIALIZED (
             |       SELECT src AS v FROM e0 GROUP BY 1
             |       HAVING count(*) >= 2),
             |e1 AS MATERIALIZED (
             |       SELECT src, dst FROM e0
             |       WHERE src IN (SELECT v FROM k1)
             |         AND dst IN (SELECT v FROM k1)),
             |k2 AS MATERIALIZED (
             |       SELECT src AS v FROM e1 GROUP BY 1
             |       HAVING count(*) >= 2),
             |e2 AS MATERIALIZED (
             |       SELECT src, dst FROM e1
             |       WHERE src IN (SELECT v FROM k2)
             |         AND dst IN (SELECT v FROM k2)),
             |k3 AS MATERIALIZED (
             |       SELECT src AS v FROM e2 GROUP BY 1
             |       HAVING count(*) >= 2),
             |e3 AS MATERIALIZED (
             |       SELECT src, dst FROM e2
             |       WHERE src IN (SELECT v FROM k3)
             |         AND dst IN (SELECT v FROM k3))
             |SELECT * FROM (
             |  SELECT 1::BIGINT AS round,
             |    (SELECT count(DISTINCT src) FROM e1) AS nodes_remaining,
             |    (SELECT count(*) // 2 FROM e1) AS edges_remaining
             |  UNION ALL
             |  SELECT 2::BIGINT,
             |    (SELECT count(DISTINCT src) FROM e2),
             |    (SELECT count(*) // 2 FROM e2)
             |  UNION ALL
             |  SELECT 3::BIGINT,
             |    (SELECT count(DISTINCT src) FROM e3),
             |    (SELECT count(*) // 2 FROM e3))
             |ORDER BY round""".stripMargin)),

    // ------------------------------------------------------------------
    // q274: SAX motifs — symbolic aggregate approximation of the daily
    // revenue series: z-normalize per type (mean/std assembled from
    // EXACT integer cents sums, so both engines normalize against
    // identical doubles), discretize against the standard 4-symbol
    // N(0,1) breakpoints (−0.6745, 0, 0.6745), and count 3-day symbol
    // motifs — the most frequent recurring shape per type is the
    // series' behavioral signature (surveillance for "same dip every
    // N days" patterns that spectral methods need far longer series
    // to see). Day windows are type-keyed; motif assembly is two
    // leads; a symbol lands exactly ON a breakpoint only if two exact
    // integer expressions tie, which both engines resolve identically.
    Q(
      "q274_sax_motifs",
      (s, dir) => {
        val daily = Tables.load(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long"))
            .as("c"))
        val stats = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("c").as("sc"),
            sum(col("c").cast("decimal(38,0)") *
              col("c").cast("decimal(38,0)")).as("q"))
        val z = daily.join(broadcast(stats), "event_type")
          .withColumn("mean", col("sc").cast("double") /
            col("n").cast("double"))
          .withColumn("sd", sqrt((col("n").cast("double") *
            col("q").cast("double") -
            col("sc").cast("double") * col("sc").cast("double")) /
            (col("n").cast("double") * col("n").cast("double"))))
          .withColumn("zv", (col("c").cast("double") - col("mean")) /
            col("sd"))
          .withColumn("sym",
            when(col("zv") < -0.6745, "a").when(col("zv") < 0.0, "b")
              .when(col("zv") < 0.6745, "c").otherwise("d"))
        val wD = Window.partitionBy("event_type").orderBy("day")
        val motifs = z
          .withColumn("m", concat(col("sym"), lead("sym", 1).over(wD),
            lead("sym", 2).over(wD)))
          .where(length(col("m")) === 3)
          .groupBy("event_type", "m").agg(count(lit(1)).as("cnt"))
        val wTop = Window.partitionBy("event_type")
          .orderBy(desc("cnt"), col("m"))
        motifs.withColumn("rk", row_number().over(wTop))
          .where(col("rk") === 1)
          .join(broadcast(stats.select(col("event_type"),
            col("n").as("n_days"))), "event_type")
          .select(col("event_type"), col("n_days").cast("long").as("n_days"),
            col("m").as("top_motif"),
            col("cnt").cast("long").as("n_occurrences"))
          .orderBy("event_type")
      },
      Some(s"""WITH daily AS (
             |  SELECT event_type, ts::DATE AS day,
             |    sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS c
             |  FROM events GROUP BY 1, 2),
             |stats AS (
             |  SELECT event_type, count(*) AS n, sum(c) AS sc,
             |    sum(c * c) AS q
             |  FROM daily GROUP BY 1),
             |z AS (
             |  SELECT d.event_type, d.day,
             |    (d.c::DOUBLE - sc::DOUBLE / n::DOUBLE) /
             |      sqrt((n::DOUBLE * q::DOUBLE - sc::DOUBLE * sc::DOUBLE) /
             |        (n::DOUBLE * n::DOUBLE)) AS zv
             |  FROM daily d JOIN stats USING (event_type)),
             |sym AS (
             |  SELECT event_type, day,
             |    CASE WHEN zv < -0.6745 THEN 'a' WHEN zv < 0.0 THEN 'b'
             |      WHEN zv < 0.6745 THEN 'c' ELSE 'd' END AS sym
             |  FROM z),
             |m AS (
             |  SELECT event_type,
             |    sym || lead(sym, 1) OVER w || lead(sym, 2) OVER w AS m
             |  FROM sym
             |  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
             |cnts AS (
             |  SELECT event_type, m, count(*) AS cnt FROM m
             |  WHERE length(m) = 3 GROUP BY 1, 2),
             |top AS (
             |  SELECT event_type, m, cnt FROM (
             |    SELECT *, row_number() OVER (PARTITION BY event_type
             |      ORDER BY cnt DESC, m) AS rk
             |    FROM cnts)
             |  WHERE rk = 1)
             |SELECT top.event_type, CAST(n AS BIGINT) AS n_days,
             |  m AS top_motif, CAST(cnt AS BIGINT) AS n_occurrences
             |FROM top JOIN stats ON stats.event_type = top.event_type
             |ORDER BY top.event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // q275: Theil-Sen robust trend — the median of all pairwise slopes
    // of the daily revenue series per type: one outlier day drags an
    // OLS fit (q127) arbitrarily far but moves the slope median by one
    // rank (29.3% breakdown). The pair frame is DAYS², never
    // data-sized (the q229/q266 day-frame discipline); each slope is
    // the double division of two exact integers snapped once to the
    // 1e-6 grid, and the median is an exact order statistic via
    // cumulative counts over the per-type distinct slope grid (the
    // q254 rule) — no interpolation, no engine median() semantics.
    Q(
      "q275_theil_sen",
      (s, dir) => {
        val daily = Tables.load(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long"))
            .as("c"))
          .localCheckpoint()
        val b = daily.select(col("event_type"), col("day").as("day2"),
          col("c").as("c2"))
        val slopes = daily.join(b, "event_type")
          .where(col("day") < col("day2"))
          .withColumn("s6", floor((col("c2") - col("c")).cast("double") /
            datediff(col("day2"), col("day")).cast("double") *
            lit(1000000.0) + lit(0.5)).cast("long"))
        val grid = slopes.groupBy("event_type", "s6")
          .agg(count(lit(1)).as("cnt"))
        val wg = Window.partitionBy("event_type").orderBy("s6")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wt = Window.partitionBy("event_type")
        grid.withColumn("cum", sum("cnt").over(wg))
          .withColumn("np", sum("cnt").over(wt))
          .where(col("cum") * 2 >= col("np"))
          .groupBy("event_type")
          .agg(first("np").as("n_pairs"), min("s6").as("med6"))
          .select(col("event_type"), col("n_pairs").cast("long")
            .as("n_pairs"),
            (col("med6").cast("double") / lit(1000000.0))
              .as("slope_cents_per_day"))
          .orderBy("event_type")
      },
      Some(s"""WITH daily AS (
             |  SELECT event_type, ts::DATE AS day,
             |    sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS c
             |  FROM events GROUP BY 1, 2),
             |slopes AS (
             |  SELECT a.event_type,
             |    CAST(floor((b.c - a.c)::DOUBLE /
             |      date_diff('day', a.day, b.day)::DOUBLE * 1000000 + 0.5)
             |      AS BIGINT) AS s6
             |  FROM daily a JOIN daily b
             |    ON a.event_type = b.event_type AND a.day < b.day),
             |grid AS (
             |  SELECT event_type, s6, count(*) AS cnt
             |  FROM slopes GROUP BY 1, 2),
             |cum AS (
             |  SELECT event_type, s6,
             |    sum(cnt) OVER (PARTITION BY event_type ORDER BY s6) AS cum,
             |    sum(cnt) OVER (PARTITION BY event_type) AS np
             |  FROM grid)
             |SELECT event_type, CAST(any_value(np) AS BIGINT) AS n_pairs,
             |  min(s6)::DOUBLE / 1000000 AS slope_cents_per_day
             |FROM cum WHERE cum * 2 >= np
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // q276: incremental view maintenance (join view) — the missing
    // member of the incremental family (q153 merges agg partials, q66
    // extends the near-dup index, q232 upserts a snapshot): a
    // materialized join view V = orders ⋈ customer maintained under an
    // append delta as V' = V ∪ (Δ ⋈ customer) — the delta joins ONLY
    // its own rows against the dimension, never re-scanning the base
    // fact (at 100 TB the difference between a minutes-long refresh and
    // a full rebuild). The base view materializes (localCheckpoint
    // standing in for the stored table), the delta path unions on top,
    // and the gate compares the incrementally-maintained rollup
    // against the full-rebuild rollup column by column — `matches`
    // pinned true per nation.
    Q(
      "q276_ivm_join",
      (s, dir) => {
        val orders = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
              .as("cents"))
          .withColumn("is_base",
            Sampling.bucket(col("o_orderkey"), "ivm28") < 8000)
        val cust = Tables.load(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))
        def rollup(v: org.apache.spark.sql.DataFrame) =
          v.groupBy("c_nationkey")
            .agg(count(lit(1)).as("n"), sum("cents").as("sc"))
        val baseView = orders.where(col("is_base"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .localCheckpoint()
        val deltaView = orders.where(!col("is_base"))
          .join(cust, col("o_custkey") === col("c_custkey"))
        val incr = rollup(baseView.unionByName(deltaView))
          .withColumnRenamed("n", "n_incr")
          .withColumnRenamed("sc", "cents_incr")
        val full = rollup(orders
          .join(cust, col("o_custkey") === col("c_custkey")))
        full.join(incr, "c_nationkey")
          .select(col("c_nationkey").cast("long").as("nation"),
            col("n").cast("long").as("n_full"),
            col("sc").cast("long").as("cents_full"),
            (col("n") === col("n_incr") &&
              col("sc") === col("cents_incr")).as("matches"))
          .orderBy("nation")
      },
      Some(s"""WITH o AS (
             |  SELECT o_orderkey, o_custkey,
             |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
             |  FROM orders),
             |v AS (
             |  SELECT c_nationkey, count(*) AS n, sum(cents) AS sc
             |  FROM o JOIN customer ON c_custkey = o_custkey
             |  GROUP BY 1)
             |SELECT CAST(c_nationkey AS BIGINT) AS nation,
             |  CAST(n AS BIGINT) AS n_full,
             |  CAST(sc AS BIGINT) AS cents_full,
             |  true AS matches
             |FROM v
             |ORDER BY nation""".stripMargin)))
}
