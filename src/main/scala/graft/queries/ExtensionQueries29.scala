package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{PolyHash, Rounding}
import graft.io.Tables

/** Round-8 fourth continuation wave: Jensen-Shannon source drift
  * (q278), Fellegi-Sunter record linkage (q279), ranking average
  * precision (q280), Mann-Whitney U (q281), and content-defined
  * chunking dedup (q282). Same contract as every other module: each
  * Spark pipeline pairs with DuckDB oracle SQL replaying it.
  */
object ExtensionQueries29 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q278: Jensen-Shannon divergence per source vs the corpus — the
    // symmetric, bounded ([0, ln 2] nats) member the drift family was
    // missing (q143 PSI needs a clamp for empty bins, q228 KS is
    // CDF-shaped, q151 MI is a dependence measure): JSD(P‖Q) =
    // ½ΣP·ln(P/M) + ½ΣQ·ln(Q/M), M=(P+Q)/2, P = the source's lang
    // distribution, Q = the corpus-wide one. Numerics: every p/q/m is a
    // single exact double division of exact LONG counts (identical bits
    // in both engines); each log TERM is snapped once to the 1e-9 LONG
    // grid, so the per-source accumulation is an exact integer sum —
    // associative, partition-count-invariant — and only the final
    // /2e9 presentation division is floating point. The zero-count
    // cells a source lacks contribute q·ln(q/m) (p = 0 kills the
    // P-side term exactly), so the grid is sources × corpus langs —
    // built by crossing two TINY aggregate frames, never the data.
    // Scale shape: two grouped scans of documents + one lang-sized
    // broadcast grid; no data-sized shuffle beyond the (source, lang)
    // agg.
    Q(
      "q278_jsd_drift",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val nAll = docs.agg(count(lit(1)).as("n_all"))
        val gl = docs.groupBy("lang").agg(count(lit(1)).as("gc"))
          .crossJoin(nAll)
        val ns = docs.groupBy("source").agg(count(lit(1)).as("ns"))
        val sc = docs.groupBy("source", "lang")
          .agg(count(lit(1)).as("pc"))
        val grid = ns.crossJoin(broadcast(gl))
          .join(sc, Seq("source", "lang"), "left")
          .withColumn("pc", coalesce(col("pc"), lit(0L)))
          .withColumn("p", col("pc").cast("double") / col("ns").cast("double"))
          .withColumn("q", col("gc").cast("double") / col("n_all").cast("double"))
          .withColumn("m", (col("p") + col("q")) / lit(2.0))
        val termed = grid
          .withColumn("tp9",
            when(col("pc") > 0,
              floor(col("p") * log(col("p") / col("m")) *
                lit(1000000000.0) + lit(0.5)).cast("long"))
              .otherwise(lit(0L)))
          .withColumn("tq9",
            floor(col("q") * log(col("q") / col("m")) *
              lit(1000000000.0) + lit(0.5)).cast("long"))
        termed.groupBy("source")
          .agg(max("ns").as("n_docs"), sum(col("tp9") + col("tq9")).as("j9"))
          .select(col("source"), col("n_docs"),
            Rounding.stableRound6(col("j9").cast("double") /
              lit(2000000000.0)).as("jsd_nats"))
          .orderBy("source")
      },
      Some(s"""WITH nall AS (SELECT count(*) AS n_all FROM documents),
             |gl AS (
             |  SELECT lang, count(*) AS gc, (SELECT n_all FROM nall) AS n_all
             |  FROM documents GROUP BY lang),
             |ns AS (SELECT source, count(*) AS ns FROM documents GROUP BY source),
             |grid AS (
             |  SELECT ns.source, gl.lang, ns.ns, gl.gc, gl.n_all,
             |    coalesce(sc.pc, 0) AS pc
             |  FROM ns CROSS JOIN gl
             |  LEFT JOIN (SELECT source, lang, count(*) AS pc
             |             FROM documents GROUP BY source, lang) sc
             |    ON sc.source = ns.source AND sc.lang = gl.lang),
             |vals AS (
             |  SELECT source, ns, pc::DOUBLE / ns::DOUBLE AS p,
             |    gc::DOUBLE / n_all::DOUBLE AS q, pc
             |  FROM grid),
             |ms AS (SELECT source, ns, pc, p, q, (p + q) / 2.0 AS m FROM vals),
             |terms AS (
             |  SELECT source, ns,
             |    CASE WHEN pc > 0 THEN
             |      CAST(floor(p * ln(p / m) * 1000000000.0 + 0.5) AS BIGINT)
             |    ELSE 0 END AS tp9,
             |    CAST(floor(q * ln(q / m) * 1000000000.0 + 0.5) AS BIGINT)
             |      AS tq9
             |  FROM ms)
             |SELECT source, CAST(max(ns) AS BIGINT) AS n_docs,
             |  ${Rounding.duckSql("sum(tp9 + tq9)::DOUBLE / 2000000000.0")}
             |    AS jsd_nats
             |FROM terms GROUP BY source
             |ORDER BY source""".stripMargin)),

    // ------------------------------------------------------------------
    // q279: Fellegi-Sunter record linkage — the entity-resolution shape
    // the dedup family (equality/Jaccard/MinHash) doesn't cover:
    // probabilistic matching with per-FIELD match weights. Block on
    // (lang, n_chars div 50) so candidate pairs are bounded by block
    // sizes (the 100 TB discipline: linkage cost is Σ|block|², tuned by
    // the blocking key — NEVER all-pairs), compare three fields (same
    // source, same 40-char-prefix fingerprint, same exact length), and
    // score each pair with the log-likelihood-ratio weights
    // ln(m_i/u_i) on agreement / ln((1−m_i)/(1−u_i)) on disagreement.
    // Weights and thresholds are snapped ONCE to the 1e-9 LONG grid
    // (the q264 SPRT discipline), so pair scores are exact integer sums
    // and the link/possible/non-link decision is integer comparison.
    Q(
      "q279_record_linkage",
      (s, dir) => {
        def w9(m: Double, u: Double) =
          floor(log(lit(m) / lit(u)) * lit(1000000000.0) + lit(0.5))
            .cast("long")
        def d9(m: Double, u: Double) =
          floor(log((lit(1.0) - lit(m)) / (lit(1.0) - lit(u))) *
            lit(1000000000.0) + lit(0.5)).cast("long")
        val upper9 = lit(6000000000L)
        val lower9 = lit(0L)
        val docs = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
            expr("n_chars div 50").as("blk"),
            PolyHash(substring(col("text"), 1, 40)).as("fp40"))
        val a = docs.toDF("da", "lang", "src_a", "nc_a", "blk", "fp_a")
        val b = docs.toDF("db", "lang", "src_b", "nc_b", "blk", "fp_b")
        val pairs = a.join(b, Seq("lang", "blk"))
          .where(col("da") < col("db"))
          .withColumn("s9",
            when(col("src_a") === col("src_b"), w9(0.95, 0.05))
              .otherwise(d9(0.95, 0.05)) +
            when(col("fp_a") === col("fp_b"), w9(0.90, 0.01))
              .otherwise(d9(0.90, 0.01)) +
            when(col("nc_a") === col("nc_b"), w9(0.80, 0.02))
              .otherwise(d9(0.80, 0.02)))
          .withColumn("decision",
            when(col("s9") >= upper9, "link")
              .when(col("s9") > lower9, "possible")
              .otherwise("non_link"))
        pairs.groupBy("lang", "decision")
          .agg(count(lit(1)).as("n_pairs"),
            Rounding.stableRound6(min("s9").cast("double") /
              lit(1000000000.0)).as("min_score"),
            Rounding.stableRound6(max("s9").cast("double") /
              lit(1000000000.0)).as("max_score"))
          .orderBy("lang", "decision")
      },
      Some {
        def w9(m: Double, u: Double) =
          s"CAST(floor(ln($m / $u) * 1000000000.0 + 0.5) AS BIGINT)"
        def d9(m: Double, u: Double) =
          s"CAST(floor(ln((1.0 - $m) / (1.0 - $u)) * 1000000000.0 + 0.5)" +
            " AS BIGINT)"
        s"""WITH d AS (
           |  SELECT doc_id, lang, source, n_chars, n_chars // 50 AS blk,
           |    ${PolyHash.duckSql("substr(text, 1, 40)")} AS fp40
           |  FROM documents),
           |pairs AS (
           |  SELECT a.lang,
           |    (CASE WHEN a.source = b.source THEN ${w9(0.95, 0.05)}
           |          ELSE ${d9(0.95, 0.05)} END) +
           |    (CASE WHEN a.fp40 = b.fp40 THEN ${w9(0.90, 0.01)}
           |          ELSE ${d9(0.90, 0.01)} END) +
           |    (CASE WHEN a.n_chars = b.n_chars THEN ${w9(0.80, 0.02)}
           |          ELSE ${d9(0.80, 0.02)} END) AS s9
           |  FROM d a JOIN d b
           |    ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id),
           |dec AS (
           |  SELECT lang, s9,
           |    CASE WHEN s9 >= 6000000000 THEN 'link'
           |         WHEN s9 > 0 THEN 'possible'
           |         ELSE 'non_link' END AS decision
           |  FROM pairs)
           |SELECT lang, decision, CAST(count(*) AS BIGINT) AS n_pairs,
           |  ${Rounding.duckSql("min(s9)::DOUBLE / 1000000000.0")}
           |    AS min_score,
           |  ${Rounding.duckSql("max(s9)::DOUBLE / 1000000000.0")}
           |    AS max_score
           |FROM dec GROUP BY lang, decision
           |ORDER BY lang, decision""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q280: ranking average precision (AP ≈ area under the PR curve) —
    // the retrieval-side eval the ROC-side q203 AUC doesn't give:
    // under class imbalance (the usual curation case: few "good" docs)
    // AP tracks precision at the top of the ranking where AUC is
    // dominated by the easy negatives. Ranking: n_chars DESC with
    // doc_id tiebreak per source; relevant = lang='en'. AP =
    // (1/n_pos)·Σ_{k rel} prec@k, and every prec@k = pk/k is snapped to
    // the 1e-9 grid as PURE integer arithmetic —
    // floor(1e9·pk/k + ½) = (2e9·pk + k) div (2k) — so the whole
    // query's only floating-point op is the final presentation
    // division. Scale shape: one window per source partition (the q203
    // shape); at 100 TB the per-source ranking becomes the q205
    // two-pass global rank, same integer terms.
    Q(
      "q280_average_precision",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .select(col("source"), col("doc_id"), col("n_chars"),
            when(col("lang") === "en", 1L).otherwise(0L).as("rel"))
        val wRk = Window.partitionBy("source")
          .orderBy(desc("n_chars"), col("doc_id"))
        val ranked = docs
          .withColumn("k", row_number().over(wRk).cast("long"))
          .withColumn("pk", sum("rel").over(
            Window.partitionBy("source").orderBy(desc("n_chars"), col("doc_id"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("term9",
            expr("(2000000000 * pk + k) div (2 * k)"))
        ranked.groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("rel").as("n_pos"),
            sum(when(col("rel") === 1L, col("term9")).otherwise(0L))
              .as("ap9"))
          .filter(col("n_pos") > 0)
          .select(col("source"), col("n_docs"), col("n_pos"),
            Rounding.stableRound6(col("ap9").cast("double") /
              col("n_pos").cast("double") / lit(1000000000.0))
              .as("avg_precision"))
          .orderBy("source")
      },
      Some(s"""WITH d AS (
             |  SELECT source, doc_id, n_chars,
             |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS rel
             |  FROM documents),
             |ranked AS (
             |  SELECT source, rel,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY n_chars DESC, doc_id) AS k,
             |    sum(rel) OVER (PARTITION BY source
             |      ORDER BY n_chars DESC, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pk
             |  FROM d),
             |terms AS (
             |  SELECT source, rel,
             |    (2000000000 * pk + k) // (2 * k) AS term9
             |  FROM ranked),
             |agg AS (
             |  SELECT source, count(*) AS n_docs, sum(rel) AS n_pos,
             |    sum(CASE WHEN rel = 1 THEN term9 ELSE 0 END) AS ap9
             |  FROM terms GROUP BY source)
             |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
             |  CAST(n_pos AS BIGINT) AS n_pos,
             |  ${Rounding.duckSql(
                  "ap9::DOUBLE / n_pos::DOUBLE / 1000000000.0")}
             |    AS avg_precision
             |FROM agg WHERE n_pos > 0
             |ORDER BY source""".stripMargin)),

    // ------------------------------------------------------------------
    // q281: Mann-Whitney U — the nonparametric two-sample location test
    // (does lang='en' doc length stochastically dominate the rest?),
    // per source. Built from GROUPED midranks, never per-row ranking:
    // per distinct length v the 2×midrank is 2·below + c + 1 (exact
    // integers from cumulative counts over the distinct-value frame —
    // the q203/q255 shape), so 2U₁ = Σc₁·(2·below+c+1) − n₁(n₁+1) is
    // exact LONG arithmetic; U and the tie-corrected normal z =
    // (U − n₁n₂/2)/σ with σ² = (n₁n₂/12)·((n+1) − Σ(t³−t)/(n(n−1)))
    // are single-expression double derivations of those longs (sqrt is
    // IEEE-exact, so both engines agree bit-for-bit before the final
    // stableRound6). Scale shape: one (source, v) agg + a window over
    // the distinct-value frame; nothing data-sized is sorted globally.
    Q(
      "q281_mann_whitney",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .select(col("source"), col("n_chars").as("v"),
            when(col("lang") === "en", 1L).otherwise(0L).as("g1"))
        val cnt = docs.groupBy("source", "v")
          .agg(count(lit(1)).as("c"), sum("g1").as("c1"))
        val wB = Window.partitionBy("source").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, -1)
        val agg = cnt
          .withColumn("below", coalesce(sum("c").over(wB), lit(0L)))
          .groupBy("source")
          .agg(sum("c1").as("n1"), sum(col("c") - col("c1")).as("n2"),
            sum(col("c1") * (lit(2L) * col("below") + col("c") + lit(1L)))
              .as("r12"),
            sum(col("c") * col("c") * col("c") - col("c")).as("ties"))
          .filter(col("n1") > 0 && col("n2") > 0)
          .withColumn("u2", col("r12") - col("n1") * (col("n1") + lit(1L)))
          .withColumn("n", col("n1") + col("n2"))
        agg
          .withColumn("sigma2",
            col("n1").cast("double") * col("n2").cast("double") / lit(12.0) *
              ((col("n") + lit(1L)).cast("double") -
                col("ties").cast("double") /
                  (col("n").cast("double") * (col("n") - lit(1L))
                    .cast("double"))))
          .filter(col("sigma2") > 0.0)
          .select(col("source"), col("n1"), col("n2"),
            (col("u2").cast("double") / lit(2.0)).as("u"),
            Rounding.stableRound6(
              ((col("u2") - col("n1") * col("n2")).cast("double") / lit(2.0)) /
                sqrt(col("sigma2"))).as("z"))
          .orderBy("source")
      },
      Some(s"""WITH d AS (
             |  SELECT source, n_chars AS v,
             |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g1
             |  FROM documents),
             |cnt AS (
             |  SELECT source, v, count(*) AS c, sum(g1) AS c1
             |  FROM d GROUP BY source, v),
             |win AS (
             |  SELECT source, v, c, c1,
             |    coalesce(sum(c) OVER (PARTITION BY source ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS below
             |  FROM cnt),
             |agg AS (
             |  SELECT source, sum(c1) AS n1, sum(c - c1) AS n2,
             |    sum(c1 * (2 * below + c + 1)) AS r12,
             |    sum(c * c * c - c) AS ties
             |  FROM win GROUP BY source),
             |u AS (
             |  SELECT source, n1, n2, r12 - n1 * (n1 + 1) AS u2,
             |    n1 + n2 AS n, ties
             |  FROM agg WHERE n1 > 0 AND n2 > 0),
             |sig AS (
             |  SELECT source, n1, n2, u2,
             |    n1::DOUBLE * n2::DOUBLE / 12.0 *
             |      ((n + 1)::DOUBLE - ties::DOUBLE /
             |        (n::DOUBLE * (n - 1)::DOUBLE)) AS sigma2
             |  FROM u)
             |SELECT source, CAST(n1 AS BIGINT) AS n1,
             |  CAST(n2 AS BIGINT) AS n2,
             |  u2::DOUBLE / 2.0 AS u,
             |  ${Rounding.duckSql(
                  "((u2 - n1 * n2)::DOUBLE / 2.0) / sqrt(sigma2)")} AS z
             |FROM sig WHERE sigma2 > 0.0
             |ORDER BY source""".stripMargin)),

    // ------------------------------------------------------------------
    // q282: content-defined chunking dedup — the storage-side dedup the
    // winnowing fingerprints (q208) and MinHash (q45) don't give:
    // split every document at CONTENT-derived boundaries (a token
    // whose hash ≡ 0 mod 32 ends its chunk — rsync/LBFS-style, so an
    // insertion only reshapes the chunks it touches, not every
    // fixed-size block after it), fingerprint each chunk with an
    // order-independent exact signature (sum of token hashes + length
    // — both well inside LONG range for the 1e9+7-bounded PolyHash),
    // and measure the cross-document shared-chunk mass per source.
    // Boundary selection is embarrassingly parallel (no min-spacing
    // constraint, so no sequential scan), the chunk-id prefix count is
    // a DOC-LOCAL window, and the dedup audit is one (sig, len) agg —
    // never pairwise text comparison. At 100 TB the (sig, len) group
    // is the chunk-store key; duplicate chunks store one copy.
    Q(
      "q282_cdc_chunks",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val toks = docs
          .select(col("doc_id"), col("source"),
            posexplode(expr("filter(split(text, ' '), t -> t != '')"))
              .as(Seq("pos", "w")))
          .withColumn("wh", PolyHash(col("w")))
          .withColumn("b", when(col("wh") % 32 === 0, 1L).otherwise(0L))
        val wChunk = Window.partitionBy("doc_id").orderBy("pos")
          .rowsBetween(Window.unboundedPreceding, -1)
        val chunks = toks
          .withColumn("chunk", coalesce(sum("b").over(wChunk), lit(0L)))
          .groupBy("doc_id", "source", "chunk")
          .agg(sum("wh").as("sig"), count(lit(1)).as("len"))
        val shared = chunks.groupBy("sig", "len")
          .agg(countDistinct("doc_id").as("n_docs"))
        chunks.join(shared, Seq("sig", "len"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_chunks"),
            sum(when(col("n_docs") > 1, 1L).otherwise(0L))
              .as("n_dup_chunks"))
          .select(col("source"), col("n_chunks"), col("n_dup_chunks"),
            Rounding.stableRound6(col("n_dup_chunks").cast("double") /
              col("n_chunks").cast("double")).as("dup_ratio"))
          .orderBy("source")
      },
      Some(s"""WITH toks AS (
             |  SELECT doc_id, source,
             |    list_filter(string_split(text, ' '), t -> t <> '') AS arr
             |  FROM documents),
             |tok AS (
             |  SELECT doc_id, source, i AS pos,
             |    ${PolyHash.duckSql("arr[i + 1]")} AS wh
             |  FROM (SELECT doc_id, source, arr,
             |          unnest(range(len(arr))) AS i
             |        FROM toks WHERE len(arr) >= 1)),
             |marked AS (
             |  SELECT doc_id, source, pos, wh,
             |    CASE WHEN wh % 32 = 0 THEN 1 ELSE 0 END AS b
             |  FROM tok),
             |chunked AS (
             |  SELECT doc_id, source, wh,
             |    coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS chunk
             |  FROM marked),
             |chunks AS (
             |  SELECT doc_id, source, chunk, sum(wh) AS sig,
             |    count(*) AS len
             |  FROM chunked GROUP BY doc_id, source, chunk),
             |shared AS (
             |  SELECT sig, len, count(DISTINCT doc_id) AS n_docs
             |  FROM chunks GROUP BY sig, len)
             |SELECT c.source, CAST(count(*) AS BIGINT) AS n_chunks,
             |  CAST(sum(CASE WHEN s.n_docs > 1 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_dup_chunks,
             |  ${Rounding.duckSql(
                  "sum(CASE WHEN s.n_docs > 1 THEN 1 ELSE 0 END)::DOUBLE" +
                    " / count(*)::DOUBLE")} AS dup_ratio
             |FROM chunks c JOIN shared s ON s.sig = c.sig AND s.len = c.len
             |GROUP BY c.source
             |ORDER BY c.source""".stripMargin))
  )
}
