package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{Graph, Ranking}
import graft.functions.Rounding
import graft.io.Tables
import graft.ops.Text

/** Round-9 second wave: vocabulary-growth economics (q323 Good-Turing /
  * Chao1 unseen-mass estimation, q324 Heaps'-law growth fit — the "how
  * much NEW vocabulary does more data buy" questions a corpus-scaling
  * decision needs) and personalized PageRank seed-set expansion (q325 —
  * similarity-graph proximity as a data-selection score). Same contract
  * as every other module: each Spark pipeline pairs with DuckDB oracle
  * SQL replaying it.
  */
object ExtensionQueries44 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q323: Good-Turing unseen mass + Chao1 richness — per source, the
    // two classical "what's still missing" estimators over the word
    // frequency-of-frequencies: P(next token is UNSEEN) ≈ f1/N
    // (Good-Turing) and total-vocabulary richness ≈ V + f1²/(2·f2)
    // (Chao1; the f2=0 fallback is f1(f1−1)/2). Everything derives
    // from exact integer counts (one token scan → per-source vocab
    // counts → two singleton/doubleton sums), so the only doubles are
    // the two final ratios, snapped. Scale: the shuffle carries
    // (source, word) partial counts — map-side combined, vocab-sized.
    Q(
      "q323_unseen_vocab",
      (s, dir) => {
        val toks = Tables.load(s, dir, "documents")
          .select(col("source"),
            explode(Text.words(Text.clean(col("text")))).as("w"))
        val vocab = toks.groupBy("source", "w")
          .agg(count(lit(1)).as("c"))
        vocab.groupBy("source")
          .agg(sum("c").cast("long").as("n_tokens"),
            count(lit(1)).cast("long").as("vocab_size"),
            sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
            sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
          .select(col("source"), col("n_tokens"), col("vocab_size"),
            col("f1"), col("f2"),
            Rounding.stableRound6(col("f1").cast("double") /
              col("n_tokens").cast("double")).as("p_unseen"),
            Rounding.stableRound6(col("vocab_size").cast("double") +
              when(col("f2") > 0,
                col("f1").cast("double") * col("f1").cast("double") /
                  (lit(2.0) * col("f2").cast("double")))
                .otherwise(col("f1").cast("double") *
                  (col("f1").cast("double") - 1.0) / 2.0)).as("chao1"))
          .orderBy("source")
      },
      Some(s"""WITH toks0 AS (
             |  SELECT source, unnest(string_split(
             |    regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' ')) AS w
             |  FROM documents),
             |toks AS (SELECT source, w FROM toks0 WHERE w <> ''),
             |vocab AS (
             |  SELECT source, w, count(*) AS c FROM toks GROUP BY source, w),
             |agg AS (
             |  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
             |    CAST(count(*) AS BIGINT) AS vocab_size,
             |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
             |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
             |  FROM vocab GROUP BY source)
             |SELECT source, n_tokens, vocab_size, f1, f2,
             |  ${Rounding.duckSql("f1::DOUBLE / n_tokens::DOUBLE")}
             |    AS p_unseen,
             |  ${Rounding.duckSql(
                  "vocab_size::DOUBLE + CASE WHEN f2 > 0 THEN " +
                    "f1::DOUBLE * f1::DOUBLE / (2.0::DOUBLE * f2::DOUBLE) " +
                    "ELSE f1::DOUBLE * (f1::DOUBLE - 1.0) / 2.0 END")}
             |    AS chao1
             |FROM agg
             |ORDER BY source""".stripMargin)),

    // ------------------------------------------------------------------
    // q324: Heaps'-law vocabulary growth fit — per source, fit
    // V(N) ≈ k·N^beta (distinct vocabulary vs tokens read) and report
    // the exponent: beta near 1 means the source keeps paying new
    // vocabulary, beta near 0 means it has saturated — the
    // complementary scaling view to q323's point estimate and q236's
    // Zipf slope. Checkpoints are 32 equal-width doc_id buckets per
    // source (never a per-doc window): token counts per bucket and
    // FIRST-occurrence bucket per word are plain aggregations, the
    // cumulative walk runs over the ≤32-row bucket frame, and the
    // log-log OLS is one moment aggregation. Scale: the only
    // corpus-sized shuffles are the two (source, word)-keyed aggs.
    Q(
      "q324_heaps_law",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val toks = docs.select(col("source"), col("doc_id"),
          explode(Text.words(Text.clean(col("text")))).as("w"))
        val rng = docs.groupBy("source")
          .agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
        val tb = toks.join(broadcast(rng), "source")
          .withColumn("b", expr("(doc_id - lo) * 32 DIV (hi - lo + 1)"))
        val nb = tb.groupBy("source", "b").agg(count(lit(1)).as("nt"))
        val fw = tb.groupBy("source", "w").agg(min("b").as("fb"))
        val vb = fw.groupBy(col("source"), col("fb").as("b"))
          .agg(count(lit(1)).as("nv"))
        val wCum = Window.partitionBy("source").orderBy("b")
        val cum = nb.join(vb, Seq("source", "b"), "left")
          .na.fill(0L, Seq("nv"))
          .withColumn("x", log(sum("nt").over(wCum).cast("double")))
          .withColumn("y", log(sum("nv").over(wCum).cast("double")))
        cum.groupBy("source")
          .agg(count(lit(1)).cast("double").as("n"),
            sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("x") * col("y")).as("sxy"))
          .select(col("source"), col("n").cast("long").as("n_points"),
            Rounding.stableRound6(
              (col("n") * col("sxy") - col("sx") * col("sy")) /
                (col("n") * col("sxx") - col("sx") * col("sx")))
              .as("heaps_beta"),
            Rounding.stableRound6(exp((col("sy") -
              (col("n") * col("sxy") - col("sx") * col("sy")) /
                (col("n") * col("sxx") - col("sx") * col("sx")) *
                col("sx")) / col("n"))).as("heaps_k"))
          .orderBy("source")
      },
      Some(s"""WITH toks0 AS (
             |  SELECT source, doc_id, unnest(string_split(
             |    regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' ')) AS w
             |  FROM documents),
             |toks AS (SELECT source, doc_id, w FROM toks0 WHERE w <> ''),
             |rng AS (
             |  SELECT source, min(doc_id) AS lo, max(doc_id) AS hi
             |  FROM documents GROUP BY source),
             |tb AS (
             |  SELECT t.source, ((t.doc_id - r.lo) * 32) // (r.hi - r.lo + 1)
             |      AS b, t.w
             |  FROM toks t JOIN rng r ON r.source = t.source),
             |nb AS (SELECT source, b, count(*) AS nt FROM tb
             |       GROUP BY source, b),
             |fw AS (SELECT source, w, min(b) AS fb FROM tb
             |       GROUP BY source, w),
             |vb AS (SELECT source, fb AS b, count(*) AS nv FROM fw
             |       GROUP BY source, fb),
             |frame AS (
             |  SELECT nb.source, nb.b, nb.nt, coalesce(vb.nv, 0) AS nv
             |  FROM nb LEFT JOIN vb ON vb.source = nb.source
             |    AND vb.b = nb.b),
             |cum AS (
             |  SELECT source,
             |    ln((sum(nt) OVER w)::DOUBLE) AS x,
             |    ln((sum(nv) OVER w)::DOUBLE) AS y
             |  FROM frame
             |  WINDOW w AS (PARTITION BY source ORDER BY b)),
             |fit AS (
             |  SELECT source, count(*)::DOUBLE AS n, sum(x) AS sx,
             |    sum(y) AS sy, sum(x*x) AS sxx, sum(x*y) AS sxy
             |  FROM cum GROUP BY source)
             |SELECT source, CAST(n AS BIGINT) AS n_points,
             |  ${Rounding.duckSql(
                  "(n*sxy - sx*sy) / (n*sxx - sx*sx)")} AS heaps_beta,
             |  ${Rounding.duckSql(
                  "exp((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n)")}
             |    AS heaps_k
             |FROM fit
             |ORDER BY source""".stripMargin)),

    // ------------------------------------------------------------------
    // q325: personalized PageRank seed expansion — score every part of
    // the co-purchase graph (q288's support>=2 edges) by random-walk-
    // with-restart proximity to a SEED set (partkey % 50 == 0): the
    // "grow a trusted seed set through the similarity graph" selection
    // primitive (curated docs → candidate docs ranked by graph
    // closeness). Graph.personalizedPageRank, 4 iterations, d=0.85;
    // ranks snap (stableRound6) BEFORE the top-20 cut with a node
    // tiebreak (round-before-rank, q234/q283 discipline), and the cut
    // is TakeOrderedAndProject + the 20-row two-pass rank — no global
    // window. The oracle unrolls the same 4 restart-iterations as
    // MATERIALIZED CTE layers.
    Q(
      "q325_ppr_seed_expansion",
      (s, dir) => {
        // r14 note (guide §1.2 "measure first"): a localCheckpoint here
        // was MEASURED SLOWER (4.07s → 4.8s at sf0.1) — the self-join's
        // two sides already share one exchange via ReuseExchange, and
        // RDD-block rescans of a checkpoint lose the codegen'd parquet
        // scan. Left recomputed on purpose.
        val li = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        val l2 = li.toDF("l_orderkey", "p2")
        val edges = li.join(l2, "l_orderkey")
          .where(col("l_partkey") < col("p2"))
          .groupBy(col("l_partkey").as("da"), col("p2").as("db"))
          .agg(count(lit(1)).as("sup"))
          .where(col("sup") >= 2).select("da", "db")
        val seeds = li.select(col("l_partkey").as("node"))
          .where(col("node") % 50 === 0).distinct()
        val top20 = Graph.personalizedPageRank(edges, seeds,
            iters = 4, damping = 0.85)
          .select(col("node"), Rounding.stableRound6(col("rank")).as("ppr"))
          .orderBy(desc("ppr"), col("node"))
          .limit(20)
        Ranking.withGlobalRank(top20,
            Seq(col("ppr").desc, col("node")), partitions = 1)
          .select(col("global_rank").as("rk"), col("node").as("part_id"),
            col("ppr"))
          .orderBy("rk")
      },
      Some {
        val iters = (1 to 4).map { i =>
          s"""pr$i AS MATERIALIZED (
             |  SELECT n.node,
             |    (CASE WHEN sd.node IS NOT NULL
             |       THEN (1.0::DOUBLE - 0.85::DOUBLE) / (SELECT s FROM ns)
             |       ELSE 0.0::DOUBLE END)
             |    + 0.85::DOUBLE * coalesce(c.m, 0.0::DOUBLE) AS rank
             |  FROM nodes n
             |  LEFT JOIN seeds sd ON sd.node = n.node
             |  LEFT JOIN (
             |    SELECT e.dst AS node, sum(p.rank / d.deg) AS m
             |    FROM und e
             |    JOIN deg d ON d.src = e.src
             |    JOIN pr${i - 1} p ON p.node = e.src
             |    GROUP BY e.dst) c ON c.node = n.node)"""
        }.mkString(",\n")
        s"""WITH li AS (
           |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
           |sup AS (
           |  SELECT a.l_partkey AS da, b.l_partkey AS db, count(*) AS sup
           |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
           |    AND a.l_partkey < b.l_partkey
           |  GROUP BY 1, 2),
           |edges AS (SELECT da, db FROM sup WHERE sup >= 2),
           |und AS MATERIALIZED (
           |  SELECT da AS src, db AS dst FROM edges
           |  UNION ALL SELECT db, da FROM edges),
           |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM und),
           |seeds AS MATERIALIZED (
           |  SELECT node FROM nodes WHERE node % 50 = 0),
           |ns AS (SELECT count(*)::DOUBLE AS s FROM seeds),
           |deg AS MATERIALIZED (
           |  SELECT src, count(*)::DOUBLE AS deg FROM und GROUP BY src),
           |pr0 AS MATERIALIZED (
           |  SELECT n.node,
           |    CASE WHEN sd.node IS NOT NULL
           |      THEN 1.0::DOUBLE / (SELECT s FROM ns)
           |      ELSE 0.0::DOUBLE END AS rank
           |  FROM nodes n LEFT JOIN seeds sd ON sd.node = n.node),
           |$iters,
           |scored AS (
           |  SELECT node, ${Rounding.duckSql("rank")} AS ppr FROM pr4),
           |top AS (
           |  SELECT node, ppr,
           |    row_number() OVER (ORDER BY ppr DESC, node) AS rk
           |  FROM scored)
           |SELECT CAST(rk AS BIGINT) AS rk, node AS part_id, ppr
           |FROM top WHERE rk <= 20
           |ORDER BY rk""".stripMargin
      }))
}
