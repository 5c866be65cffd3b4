package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{Graph, Ranking, Sampling}
import graft.functions.Rounding
import graft.io.Tables

/** Round-8 fifth continuation wave: TextRank keyword extraction
  * (q283), IPS/SNIPS offline policy evaluation (q284), Welch's t-test
  * (q285), and pooled quantile normalization (q286). Same contract as
  * every other module: each Spark pipeline pairs with DuckDB oracle
  * SQL replaying it.
  */
object ExtensionQueries30 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q283: TextRank keyword extraction — unsupervised corpus keywords
    // as PageRank over the word co-occurrence graph (adjacent content
    // words, length ≥ 4, lowercased; distinct undirected edges), the
    // graph-centrality complement to the frequency-side keyword
    // surfaces (q58 TF-IDF, q192 trending terms). Reuses ext.Graph
    // .pageRank (5 iterations, d=0.85 — the q89 recurrence); words map
    // to dense LONG node ids via a vocabulary row_number (PolyHash ids
    // would birthday-collide at vocab scale), and the oracle unrolls
    // the same five iterations as chained CTEs. Ranks are snapped
    // (stableRound6) BEFORE the top-20 selection with a word tiebreak
    // — the q234/q265 round-before-rank discipline — so the cutoff is
    // deterministic despite order-dependent double summation inside an
    // iteration. Scale: everything after tokenization is vocab/edge-
    // bounded; the id window runs over the vocabulary frame, not docs.
    Q(
      "q283_textrank_keywords",
      (s, dir) => {
        val toks = Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            posexplode(expr(
              "filter(split(lower(text), ' '), t -> length(t) >= 4)"))
              .as(Seq("pos", "w")))
        val wNext = Window.partitionBy("doc_id").orderBy("pos")
        // r14 opt (guide §2.4/§5): this distinct pair frame feeds the
        // vocab rank (whose two-pass rank executes its input EAGERLY,
        // twice), the id-resolution join, and the final word join —
        // un-materialized, the posexplode + per-doc window pipeline
        // over the whole corpus re-ran ~5x. localCheckpoint pins the
        // vocabulary-pair-sized result once (the q302/q345 profile:
        // small aggregated frame, heavy upstream); row set unchanged.
        val edges = toks
          .withColumn("w2", lead("w", 1).over(wNext))
          .where(col("w2").isNotNull && col("w") =!= col("w2"))
          .select(least(col("w"), col("w2")).as("wa"),
            greatest(col("w"), col("w2")).as("wb"))
          .distinct()
          .localCheckpoint()
        // dense LONG ids via the distributed two-pass global rank
        // (r9: Window.orderBy with no partition key serialized the
        // whole vocab through ONE task — fixture-fine, but a web-scale
        // corpus vocabulary is 1e8-1e9 rows; withGlobalRank range-
        // partitions on word, so id assignment is partition-parallel
        // and partition-count invariant)
        val vocab = Ranking.withGlobalRank(
            edges.select(col("wa").as("word"))
              .union(edges.select(col("wb").as("word"))).distinct(),
            Seq(col("word")))
          .withColumnRenamed("global_rank", "id")
        val e2 = edges
          .join(vocab.select(col("word").as("wa"), col("id").as("src")), "wa")
          .join(vocab.select(col("word").as("wb"), col("id").as("dst")), "wb")
          .select("src", "dst")
        // top-20 via TakeOrderedAndProject (never a global rank window
        // over the vocab-sized scored frame); rk is then assigned on
        // the 20-row result by the same two-pass rank — the executed
        // plan carries NO partition-less window (PlanSpec pins it)
        val top20 = Graph.pageRank(e2, iters = 5, damping = 0.85)
          .join(vocab.select(col("id").as("node"), col("word")), "node")
          .select(col("word"),
            Rounding.stableRound6(col("rank")).as("textrank"))
          .orderBy(desc("textrank"), col("word"))
          .limit(20)
        Ranking.withGlobalRank(top20,
            Seq(col("textrank").desc, col("word")), partitions = 1)
          .select(col("global_rank").as("rk"), col("word"), col("textrank"))
          .orderBy("rk")
      },
      Some {
        val iters = (1 to 5).map { i =>
          s"""pr$i AS (
             |  SELECT e.dst AS node,
             |    (1.0::DOUBLE - 0.85::DOUBLE) / (SELECT n FROM nn)
             |      + 0.85::DOUBLE * sum(p.rank / d.deg) AS rank
             |  FROM ed e
             |  JOIN deg d ON d.src = e.src
             |  JOIN pr${i - 1} p ON p.node = e.src
             |  GROUP BY e.dst)"""
        }.mkString(",\n")
        s"""WITH toks AS (
           |  SELECT doc_id,
           |    list_filter(string_split(lower(text), ' '),
           |      t -> len(t) >= 4) AS arr
           |  FROM documents),
           |adj AS (
           |  SELECT DISTINCT
           |    least(arr[i + 1], arr[i + 2]) AS wa,
           |    greatest(arr[i + 1], arr[i + 2]) AS wb
           |  FROM (SELECT doc_id, arr, unnest(range(len(arr) - 1)) AS i
           |        FROM toks WHERE len(arr) >= 2)
           |  WHERE arr[i + 1] <> arr[i + 2]),
           |vocab AS (
           |  SELECT word, row_number() OVER (ORDER BY word) AS id
           |  FROM (SELECT wa AS word FROM adj
           |        UNION SELECT wb FROM adj)),
           |e2 AS (
           |  SELECT va.id AS src, vb.id AS dst
           |  FROM adj JOIN vocab va ON va.word = adj.wa
           |  JOIN vocab vb ON vb.word = adj.wb),
           |ed AS (SELECT src, dst FROM e2 UNION ALL SELECT dst, src FROM e2),
           |nodes AS (SELECT DISTINCT src AS node FROM ed),
           |nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
           |deg AS (SELECT src, count(*)::DOUBLE AS deg FROM ed GROUP BY src),
           |pr0 AS (SELECT node, 1.0::DOUBLE / (SELECT n FROM nn) AS rank
           |        FROM nodes),
           |$iters,
           |scored AS (
           |  SELECT v.word, ${Rounding.duckSql("p.rank")} AS textrank
           |  FROM pr5 p JOIN vocab v ON v.id = p.node),
           |top AS (
           |  SELECT word, textrank,
           |    row_number() OVER (ORDER BY textrank DESC, word) AS rk
           |  FROM scored)
           |SELECT CAST(rk AS BIGINT) AS rk, word, textrank
           |FROM top WHERE rk <= 20
           |ORDER BY rk""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q284: IPS/SNIPS offline policy evaluation — estimate how a NEW
    // decision policy would have performed from a log collected under a
    // DIFFERENT (randomized) policy, without an online experiment: the
    // counterfactual-eval step between the A/B-test family (q264 SPRT)
    // and deployment. Logging policy: action a=1 with propensity 0.3
    // (hash-bucket randomization, q55 discipline); target policy:
    // a=1 iff value > 50; reward: a purchase with value > 20. The
    // inverse-propensity weights 1/0.3 and 1/0.7 are snapped ONCE to
    // 1e-9 LONG constants, so both the IPS numerator and the SNIPS
    // self-normalizing denominator are exact integer sums of weighted
    // match counts — associative, partition-invariant — and only the
    // two presentation divisions are floating point. One shuffle-free
    // scoring scan + a 4-key agg; nothing here grows with scale but
    // the scan.
    Q(
      "q284_ips_offline_eval",
      (s, dir) => {
        val w1_9 = floor(lit(1000000000.0) / lit(0.3) + lit(0.5))
          .cast("long")
        val w0_9 = floor(lit(1000000000.0) / lit(0.7) + lit(0.5))
          .cast("long")
        val ev = Tables.load(s, dir, "events")
          .select((col("user_id") % 4).as("segment"),
            when(Sampling.bucket(col("event_id"), "ips1") < 3000, 1L)
              .otherwise(0L).as("a"),
            when(col("event_type") === "purchase" && col("value") > 20.0,
              1L).otherwise(0L).as("r"),
            when(col("value") > 50.0, 1L).otherwise(0L).as("pi"))
          .withColumn("w9", when(col("a") === 1L, w1_9).otherwise(w0_9))
          .withColumn("m", when(col("pi") === col("a"), 1L).otherwise(0L))
        ev.groupBy("segment")
          .agg(count(lit(1)).as("n"), sum("m").as("n_match"),
            sum(col("m") * col("r") * col("w9")).as("num9"),
            sum(col("m") * col("w9")).as("den9"))
          .select(col("segment").cast("long").as("segment"), col("n"),
            col("n_match"),
            Rounding.stableRound6(col("num9").cast("double") /
              col("n").cast("double") / lit(1000000000.0)).as("ips"),
            Rounding.stableRound6(col("num9").cast("double") /
              col("den9").cast("double")).as("snips"))
          .orderBy("segment")
      },
      Some(s"""WITH c AS (
             |  SELECT CAST(floor(1000000000.0 / 0.3 + 0.5) AS BIGINT)
             |      AS w1_9,
             |    CAST(floor(1000000000.0 / 0.7 + 0.5) AS BIGINT) AS w0_9),
             |ev AS (
             |  SELECT user_id % 4 AS segment,
             |    CASE WHEN ${Sampling.bucketDuckSql("ips1", "event_id")}
             |      < 3000 THEN 1 ELSE 0 END AS a,
             |    CASE WHEN event_type = 'purchase' AND value > 20.0
             |      THEN 1 ELSE 0 END AS r,
             |    CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS pi
             |  FROM events),
             |sc AS (
             |  SELECT segment, r,
             |    CASE WHEN a = 1 THEN (SELECT w1_9 FROM c)
             |         ELSE (SELECT w0_9 FROM c) END AS w9,
             |    CASE WHEN pi = a THEN 1 ELSE 0 END AS m
             |  FROM ev),
             |agg AS (
             |  SELECT segment, count(*) AS n, sum(m) AS n_match,
             |    sum(m * r * w9) AS num9, sum(m * w9) AS den9
             |  FROM sc GROUP BY segment)
             |SELECT CAST(segment AS BIGINT) AS segment,
             |  CAST(n AS BIGINT) AS n, CAST(n_match AS BIGINT) AS n_match,
             |  ${Rounding.duckSql(
                  "num9::DOUBLE / n::DOUBLE / 1000000000.0")} AS ips,
             |  ${Rounding.duckSql("num9::DOUBLE / den9::DOUBLE")} AS snips
             |FROM agg
             |ORDER BY segment""".stripMargin)),

    // ------------------------------------------------------------------
    // q285: Welch's unequal-variance t-test — the parametric companion
    // to the rank-based q281 (Mann-Whitney) on the same contrast
    // (lang='en' doc length vs the rest, per source), with the
    // Welch-Satterthwaite degrees of freedom. One conditional-agg scan
    // collects exact LONG (n, Σv, Σv²) for both groups (Σv² stays
    // under 2^53 at gated scales; beyond that switch the sums to
    // DECIMAL(38,0)); every downstream mean/variance/t/df is a single
    // shared-text double expression over those longs (sqrt is
    // IEEE-exact), then stableRound6. No window, no second pass.
    Q(
      "q285_welch_ttest",
      (s, dir) => {
        val agg = Tables.load(s, dir, "documents")
          .select(col("source"), col("n_chars").as("v"),
            when(col("lang") === "en", 1L).otherwise(0L).as("g1"))
          .groupBy("source")
          .agg(
            sum("g1").as("n1"),
            sum(when(col("g1") === 1L, col("v")).otherwise(0L)).as("s1"),
            sum(when(col("g1") === 1L, col("v") * col("v")).otherwise(0L))
              .as("ss1"),
            sum(lit(1L) - col("g1")).as("n2"),
            sum(when(col("g1") === 0L, col("v")).otherwise(0L)).as("s2"),
            sum(when(col("g1") === 0L, col("v") * col("v")).otherwise(0L))
              .as("ss2"))
          .filter(col("n1") > 1 && col("n2") > 1)
        val va1 = (col("ss1").cast("double") -
          col("s1").cast("double") * col("s1").cast("double") /
            col("n1").cast("double")) / (col("n1") - lit(1L)).cast("double")
        val va2 = (col("ss2").cast("double") -
          col("s2").cast("double") * col("s2").cast("double") /
            col("n2").cast("double")) / (col("n2") - lit(1L)).cast("double")
        val agg2 = agg
          .withColumn("se1", va1 / col("n1").cast("double"))
          .withColumn("se2", va2 / col("n2").cast("double"))
          .withColumn("se", col("se1") + col("se2"))
          .filter(col("se") > 0.0)
        agg2
          .select(col("source"), col("n1"), col("n2"),
            Rounding.stableRound6(
              (col("s1").cast("double") / col("n1").cast("double") -
                col("s2").cast("double") / col("n2").cast("double")) /
                sqrt(col("se"))).as("t"),
            Rounding.stableRound6(col("se") * col("se") /
              (col("se1") * col("se1") / (col("n1") - lit(1L))
                .cast("double") +
               col("se2") * col("se2") / (col("n2") - lit(1L))
                .cast("double"))).as("df"))
          .orderBy("source")
      },
      Some(s"""WITH agg AS (
             |  SELECT source,
             |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n1,
             |    sum(CASE WHEN lang = 'en' THEN n_chars ELSE 0 END) AS s1,
             |    sum(CASE WHEN lang = 'en' THEN n_chars * n_chars
             |        ELSE 0 END) AS ss1,
             |    sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS n2,
             |    sum(CASE WHEN lang = 'en' THEN 0 ELSE n_chars END) AS s2,
             |    sum(CASE WHEN lang = 'en' THEN 0
             |        ELSE n_chars * n_chars END) AS ss2
             |  FROM documents GROUP BY source),
             |f AS (SELECT * FROM agg WHERE n1 > 1 AND n2 > 1),
             |v AS (
             |  SELECT source, n1, n2, s1, s2,
             |    (ss1::DOUBLE - s1::DOUBLE * s1::DOUBLE / n1::DOUBLE)
             |      / (n1 - 1)::DOUBLE / n1::DOUBLE AS se1,
             |    (ss2::DOUBLE - s2::DOUBLE * s2::DOUBLE / n2::DOUBLE)
             |      / (n2 - 1)::DOUBLE / n2::DOUBLE AS se2
             |  FROM f),
             |w AS (
             |  SELECT source, n1, n2, s1, s2, se1, se2, se1 + se2 AS se
             |  FROM v)
             |SELECT source, CAST(n1 AS BIGINT) AS n1,
             |  CAST(n2 AS BIGINT) AS n2,
             |  ${Rounding.duckSql(
                  "(s1::DOUBLE / n1::DOUBLE - s2::DOUBLE / n2::DOUBLE)" +
                    " / sqrt(se)")} AS t,
             |  ${Rounding.duckSql(
                  "se * se / (se1 * se1 / (n1 - 1)::DOUBLE" +
                    " + se2 * se2 / (n2 - 1)::DOUBLE)")} AS df
             |FROM w WHERE se > 0.0
             |ORDER BY source""".stripMargin)),

    // ------------------------------------------------------------------
    // q286: pooled quantile normalization — map every source's length
    // distribution onto the CORPUS distribution (each doc's per-source
    // mid-rank percentile is replaced by the pooled order statistic at
    // that percentile), the cross-source score-harmonization step a
    // mixed-corpus curation pipeline runs before any global threshold
    // (q115 normalizes WITHIN a source; this aligns BETWEEN sources).
    // Percentiles live on a fixed 100-point grid, so the pooled lookup
    // table is 100 rows built from the distinct-length cumulative
    // counts — idx = ceil((2g+1)·N/200) as pure integer arithmetic, a
    // 100×bins bounded range probe — and the per-doc mapping is an
    // equi-join against that broadcast grid. Normalized values are the
    // original LONG lengths, so per-source before/after sums are exact
    // and only the mean-shift presentation division is floating point.
    // At 100 TB the cum table swaps for a mergeable quantile sketch
    // (q210) without changing the join shape.
    Q(
      "q286_quantile_normalize",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        val nAll = d.agg(count(lit(1)).as("n_total"))
        val wRk = Window.partitionBy("source").orderBy("n_chars", "doc_id")
        val wN = Window.partitionBy("source")
        val ranked = d
          .withColumn("r", row_number().over(wRk).cast("long"))
          .withColumn("ns", count(lit(1)).over(wN))
          .withColumn("b", expr("((r - 1) * 100) div ns"))
        val wCum = Window.orderBy("n_chars")
          .rowsBetween(Window.unboundedPreceding, -1)
        val cum = d.groupBy("n_chars").agg(count(lit(1)).as("c"))
          .withColumn("below", coalesce(sum("c").over(wCum), lit(0L)))
        val grid = s.range(0, 100).select(col("id").as("g"))
          .crossJoin(nAll)
          .withColumn("idx",
            expr("((2 * g + 1) * n_total + 199) div 200"))
        val pooled = grid.join(cum,
            col("idx") > col("below") &&
              col("idx") <= col("below") + col("c"))
          .select(col("g"), col("n_chars").as("qv"))
        ranked.join(broadcast(pooled), col("b") === col("g"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").as("sum_chars"), sum("qv").as("sum_norm"))
          .select(col("source"), col("n_docs"), col("sum_chars"),
            col("sum_norm"),
            Rounding.stableRound6(
              (col("sum_norm") - col("sum_chars")).cast("double") /
                col("n_docs").cast("double")).as("mean_shift"))
          .orderBy("source")
      },
      Some(s"""WITH d AS (
             |  SELECT doc_id, source, n_chars FROM documents),
             |nall AS (SELECT count(*) AS n_total FROM d),
             |ranked AS (
             |  SELECT doc_id, source, n_chars,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY n_chars, doc_id) AS r,
             |    count(*) OVER (PARTITION BY source) AS ns
             |  FROM d),
             |bd AS (
             |  SELECT source, n_chars, ((r - 1) * 100) // ns AS b
             |  FROM ranked),
             |cum AS (
             |  SELECT n_chars, c,
             |    coalesce(sum(c) OVER (ORDER BY n_chars
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS below
             |  FROM (SELECT n_chars, count(*) AS c FROM d
             |        GROUP BY n_chars)),
             |grid AS (
             |  SELECT g, ((2 * g + 1) * (SELECT n_total FROM nall) + 199)
             |      // 200 AS idx
             |  FROM (SELECT unnest(range(100)) AS g)),
             |pooled AS (
             |  SELECT grid.g, cum.n_chars AS qv
             |  FROM grid JOIN cum
             |    ON grid.idx > cum.below AND grid.idx <= cum.below + cum.c)
             |SELECT bd.source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(bd.n_chars) AS BIGINT) AS sum_chars,
             |  CAST(sum(p.qv) AS BIGINT) AS sum_norm,
             |  ${Rounding.duckSql(
                  "(sum(p.qv) - sum(bd.n_chars))::DOUBLE" +
                    " / count(*)::DOUBLE")} AS mean_shift
             |FROM bd JOIN pooled p ON p.g = bd.b
             |GROUP BY bd.source
             |ORDER BY bd.source""".stripMargin))
  )
}
