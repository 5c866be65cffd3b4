package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.functions.{PolyHash, Rounding, VectorFunctions}
import graft.io.Tables
import graft.ops.Text

/** Round-7 ninth wave: hybrid lexical+semantic retrieval fusion (RRF),
  * a sketch-quality report (LSH precision/recall vs exact), and GDPR
  * deletion cascade sizing. Same contract as every other module: each
  * Spark pipeline pairs with DuckDB oracle SQL replaying it.
  */
object ExtensionQueries15 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q180: hybrid retrieval with reciprocal-rank fusion — for each
    // probe document (doc_id % 100 = 0), fuse a LEXICAL ranking
    // (distinct-token overlap) with a SEMANTIC ranking (embedding
    // cosine, vec_id = doc_id) via RRF: score = Σ 1/(60 + rank), the
    // standard hybrid-search combiner (Cormack et al. 2009; what every
    // RAG stack runs when BM25 and ANN disagree). Top-10 per ranking,
    // top-5 fused. Scale shape: the probe set is corpus-fraction-sized
    // and both candidate enumerations are probe-keyed — the lexical
    // side meets candidates through the token posting join (shuffle
    // carries matched tokens, never doc pairs), the semantic side
    // through a probe-broadcast cosine scan; ranks are windows over
    // each probe's OWN candidate frame. 1/(60+r) sums are identical
    // IEEE ops both engines; the fused order ties break on doc id.
    Q(
      "q180_hybrid_rrf",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val toks = docs.select(col("doc_id"),
          explode(array_distinct(Text.words(Text.clean(col("text"))))).as("w"))
        val pt = toks.where(col("doc_id") % 100 === 0)
          .select(col("doc_id").as("probe_id"), col("w"))
        val lexCand = pt.join(toks.where(col("doc_id") % 100 =!= 0), "w")
          .groupBy("probe_id", "doc_id").agg(count(lit(1)).as("overlap"))
        val lexW = Window.partitionBy("probe_id")
          .orderBy(desc("overlap"), col("doc_id"))
        val lex = lexCand.withColumn("lex_rank", row_number().over(lexW))
          .where(col("lex_rank") <= 10)
          .select(col("probe_id"), col("doc_id"), col("lex_rank"))
        val e = Tables.load(s, dir, "embeddings")
        val pv = e.where(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
        val semCand = broadcast(pv)
          .join(e.where(col("vec_id") % 100 =!= 0), col("vec_id") =!= col("probe_id"))
          .withColumn("cos", Rounding.stableRound6(
            VectorFunctions.cosineSim(col("pv"), col("embedding"))))
        val semW = Window.partitionBy("probe_id")
          .orderBy(desc("cos"), col("vec_id"))
        val sem = semCand.withColumn("sem_rank", row_number().over(semW))
          .where(col("sem_rank") <= 10)
          .select(col("probe_id"), col("vec_id").as("doc_id"),
            col("sem_rank"))
        val fused = lex.join(sem, Seq("probe_id", "doc_id"), "full_outer")
          .withColumn("rrf",
            coalesce(lit(1.0) / (lit(60.0) + col("lex_rank")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(60.0) + col("sem_rank")), lit(0.0)))
        val fw = Window.partitionBy("probe_id")
          .orderBy(desc("rrf"), col("doc_id"))
        fused.withColumn("rank", row_number().over(fw))
          .where(col("rank") <= 5)
          .select(col("probe_id"), col("rank"), col("doc_id"),
            Rounding.stableRound6(col("rrf")).as("rrf"))
          .orderBy("probe_id", "rank")
      },
      Some(s"""WITH toks AS (
             |  SELECT DISTINCT doc_id, unnest(list_filter(string_split(
             |    regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' '),
             |    w -> w <> '')) AS w
             |  FROM documents),
             |lexcand AS (
             |  SELECT p.doc_id AS probe_id, c.doc_id, count(*) AS overlap
             |  FROM toks p JOIN toks c ON p.w = c.w
             |  WHERE p.doc_id % 100 = 0 AND c.doc_id % 100 <> 0
             |  GROUP BY 1, 2),
             |lex AS (
             |  SELECT probe_id, doc_id, lex_rank FROM (
             |    SELECT *, row_number() OVER (PARTITION BY probe_id
             |      ORDER BY overlap DESC, doc_id) AS lex_rank
             |    FROM lexcand) WHERE lex_rank <= 10),
             |ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |semcand AS (
             |  SELECT p.vec_id AS probe_id, c.vec_id AS doc_id,
             |    floor(list_cosine_similarity(p.v, c.v) * 1000000 + 0.5)
             |      / 1000000 AS cos
             |  FROM ev p JOIN ev c ON c.vec_id <> p.vec_id
             |  WHERE p.vec_id % 100 = 0 AND c.vec_id % 100 <> 0),
             |sem AS (
             |  SELECT probe_id, doc_id, sem_rank FROM (
             |    SELECT *, row_number() OVER (PARTITION BY probe_id
             |      ORDER BY cos DESC, doc_id) AS sem_rank
             |    FROM semcand) WHERE sem_rank <= 10),
             |fused AS (
             |  SELECT coalesce(l.probe_id, s.probe_id) AS probe_id,
             |    coalesce(l.doc_id, s.doc_id) AS doc_id,
             |    coalesce(1.0::DOUBLE / (60.0::DOUBLE + l.lex_rank), 0.0) +
             |      coalesce(1.0::DOUBLE / (60.0::DOUBLE + s.sem_rank), 0.0)
             |      AS rrf
             |  FROM lex l FULL OUTER JOIN sem s
             |    ON s.probe_id = l.probe_id AND s.doc_id = l.doc_id)
             |SELECT probe_id, rank, doc_id,
             |  ${Rounding.duckSql("rrf")} AS rrf
             |FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
             |        ORDER BY rrf DESC, doc_id) AS rank
             |      FROM fused)
             |WHERE rank <= 5
             |ORDER BY probe_id, rank""".stripMargin)),

    // ------------------------------------------------------------------
    // q181: LSH sketch-quality report — precision and recall of the
    // MinHash+LSH candidate set (q45's 16-permutation, 4×4 banding)
    // against the exact Jaccard ≥ 0.5 pair set (q44), as ONE measured
    // row: the engine reporting its own sketch's operating point
    // ("measure, don't guess" applied to the approximation itself —
    // the number that justifies the banding config before it filters
    // 100 TB). The LSH no-false-negative-by-construction claim is NOT
    // assumed: recall is computed, and the spec pins recall = 1 on the
    // fixture. Scale shape: both pair sets are candidate-scale frames;
    // the intersection is one equi-join on the pair key.
    Q(
      "q181_lsh_quality",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val exact = Dedup.jaccardPairs(docs, "text", "doc_id", 0.5)
          .select("da", "db")
        val cand = Dedup.minhashCandidates(docs, "text", "doc_id")
        val hit = cand.join(exact, Seq("da", "db"), "left_semi")
        exact.agg(count(lit(1)).as("n_exact"))
          .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
          .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
          .select(col("n_exact"), col("n_cand"), col("n_hit"),
            Rounding.stableRound6(
              col("n_hit").cast("double") / col("n_cand")).as("precision"),
            Rounding.stableRound6(
              col("n_hit").cast("double") / col("n_exact")).as("recall"))
      },
      Some {
        val mins = Dedup.Perms.zipWithIndex.map { case ((a, b), i) =>
          s"min(($a * h + $b) % ${PolyHash.Mod}) AS m$i"
        }.mkString(", ")
        val bandJoins = (0 until Dedup.Bands).map { bnd =>
          val keys = (0 until Dedup.RowsPerBand)
            .map(r => s"m${bnd * Dedup.RowsPerBand + r}")
          s"""SELECT a.doc_id AS da, b.doc_id AS db
             |    FROM sig a JOIN sig b
             |    ON a.doc_id < b.doc_id AND ${keys.map(k => s"a.$k = b.$k")
              .mkString(" AND ")}"""
        }.mkString("\n             |    UNION\n             |    ")
        s"""WITH ${ExtensionQueries.ShingleCtes},
           |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
           |inter AS (
           |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
           |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2),
           |exact AS (
           |  SELECT da, db FROM inter
           |  JOIN sizes sa ON sa.doc_id = da
           |  JOIN sizes sb ON sb.doc_id = db
           |  WHERE floor(i::DOUBLE / (sa.n + sb.n - i) * 1000000 + 0.5)
           |    / 1000000 >= 0.5),
           |hashes AS (SELECT doc_id, ${PolyHash.duckSql("s")} AS h FROM sh),
           |sig AS (SELECT doc_id, $mins FROM hashes GROUP BY doc_id),
           |cand AS (SELECT DISTINCT da, db FROM (
           |    $bandJoins)),
           |hit AS (SELECT * FROM cand c WHERE EXISTS
           |  (SELECT 1 FROM exact e WHERE e.da = c.da AND e.db = c.db)),
           |ns AS (
           |  SELECT (SELECT count(*) FROM exact) AS n_exact,
           |    (SELECT count(*) FROM cand) AS n_cand,
           |    (SELECT count(*) FROM hit) AS n_hit)
           |SELECT CAST(n_exact AS BIGINT) AS n_exact,
           |  CAST(n_cand AS BIGINT) AS n_cand,
           |  CAST(n_hit AS BIGINT) AS n_hit,
           |  ${Rounding.duckSql("n_hit::DOUBLE / n_cand")} AS precision,
           |  ${Rounding.duckSql("n_hit::DOUBLE / n_exact")} AS recall
           |FROM ns""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q182: deletion cascade sizing — given a deletion request set
    // (customers with c_custkey % 37 = 0), how many rows must go from
    // each table in the referential chain customer → orders →
    // lineitem: the impact report a GDPR/right-to-erasure job ships
    // with before it mutates 100 TB (and the row counts its
    // tombstone-compaction follow-up, q165's shape, will process).
    // Scale shape: the key set is a corpus fraction; each hop is one
    // LEFT SEMI join down the foreign-key chain (semi joins carry no
    // payload and never fan out), counts union at the end. The
    // lineitem hop keys on the ORDER, not the customer — the join
    // graph's own topology, one hop per edge.
    Q(
      "q182_deletion_cascade",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val delKeys = Tables.load(s, dir, "customer")
          .where(col("c_custkey") % 37 === 0).select("c_custkey")
        val delOrders = Tables.load(s, dir, "orders")
          .join(delKeys, col("o_custkey") === col("c_custkey"), "left_semi")
        val delLines = Tables.load(s, dir, "lineitem")
          .join(delOrders.select("o_orderkey"),
            col("l_orderkey") === col("o_orderkey"), "left_semi")
        delKeys.agg(count(lit(1)).as("n")).select(lit("customer").as("table_name"), col("n"))
          .unionAll(delOrders.agg(count(lit(1)).as("n"))
            .select(lit("orders").as("table_name"), col("n")))
          .unionAll(delLines.agg(count(lit(1)).as("n"))
            .select(lit("lineitem").as("table_name"), col("n")))
          .orderBy("table_name")
      },
      Some("""WITH delc AS (SELECT c_custkey FROM customer
             |             WHERE c_custkey % 37 = 0),
             |delo AS (SELECT o_orderkey FROM orders
             |         WHERE o_custkey IN (SELECT c_custkey FROM delc)),
             |dell AS (SELECT 1 FROM lineitem
             |         WHERE l_orderkey IN (SELECT o_orderkey FROM delo))
             |SELECT 'customer' AS table_name,
             |  CAST((SELECT count(*) FROM delc) AS BIGINT) AS n
             |UNION ALL
             |SELECT 'orders', CAST((SELECT count(*) FROM delo) AS BIGINT)
             |UNION ALL
             |SELECT 'lineitem', CAST((SELECT count(*) FROM dell) AS BIGINT)
             |ORDER BY table_name""".stripMargin)),

    // ------------------------------------------------------------------
    // q183: Pareto frontier selection — the documents not strictly
    // dominated in (token count, quality score): multi-objective data
    // selection ("longest AND cleanest") where a single weighted score
    // would hide the trade-off curve. A doc is dominated iff another
    // doc beats it on BOTH axes strictly; kept iff its quality ≥ M(t)
    // = max quality over docs with MORE tokens. The scale trick: M is
    // computed on the DISTINCT-token-count frame (value-domain-sized,
    // not corpus-sized) — per-count max quality, then a running max
    // over counts in descending order shifted by one (strictly
    // greater) — so the only window runs over a tiny frame (q94's
    // vocab-window discipline) and the corpus is touched by exactly
    // one scoring scan, one keyed agg, and one join back on the token
    // count. Quality compares on the stableRound6 grid — dominance
    // decisions are engine-exact.
    Q(
      "q183_pareto_frontier",
      (s, dir) => {
        val scored = Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            size(Text.words(Text.clean(col("text")))).cast("long").as("tok"),
            Rounding.stableRound6(
              size(array_distinct(Text.words(Text.clean(col("text")))))
                .cast("double") /
                size(Text.words(Text.clean(col("text")))))
              .as("quality"))
        val counts = scored.groupBy("tok").agg(max("quality").as("maxq"))
        val w = Window.orderBy(desc("tok"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val m = counts.withColumn("m", max("maxq").over(w))
        scored.join(m.select("tok", "m"), "tok")
          .where(col("m").isNull || col("quality") >= col("m"))
          .select(col("doc_id"), col("tok"), col("quality"))
          .orderBy("doc_id")
      },
      Some(s"""WITH scored AS (
             |  SELECT doc_id, len(ws)::BIGINT AS tok,
             |    ${Rounding.duckSql(
                  "len(list_distinct(ws))::DOUBLE / len(ws)")} AS quality
             |  FROM (SELECT doc_id, list_filter(string_split(
             |    regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' '),
             |    w -> w <> '') AS ws FROM documents)),
             |counts AS (SELECT tok, max(quality) AS maxq FROM scored
             |           GROUP BY tok),
             |m AS (
             |  SELECT tok, max(maxq) OVER (ORDER BY tok DESC
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m
             |  FROM counts)
             |SELECT doc_id, tok, quality
             |FROM scored JOIN m USING (tok)
             |WHERE m IS NULL OR quality >= m
             |ORDER BY doc_id""".stripMargin))
  )
}
