package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.SimilaritySearch
import graft.functions.Rounding
import graft.io.Tables

/** Round-8 thirteenth continuation wave: retrieval mean reciprocal
  * rank (q308), rank-biased overlap between ranking signals (q309),
  * and an inter-event cadence bot audit (q310). Same contract as every
  * other module: each Spark pipeline pairs with DuckDB oracle SQL
  * replaying it.
  */
object ExtensionQueries38 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q308: mean reciprocal rank of first same-label neighbor in the
    // brute cosine top-10 — the eval-side sibling of q212's NDCG and
    // q189's recall: "how far down the ranking is the first RELEVANT
    // hit", aggregated per query label. rr = 1/rank is snapped to exact
    // 1e-9 integer units per query (floor(1e9/rank + 0.5) — a pure
    // integer function of rank), so the per-label mean is one LONG sum
    // and one double division. Query set is the fixed vec_id < 50
    // probe prefix; candidate ranking reuses the q48 brute scaffolding
    // (snapped cosine, neighbor-id tiebreak).
    Q(
      "q308_retrieval_mrr",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val probes = e.filter(col("vec_id") < 50)
        val hits = SimilaritySearch.bruteTopK(probes, e, 10)
          .join(e.select(col("vec_id").as("neighbor_id"),
            col("label").as("n_label")), "neighbor_id")
          .join(broadcast(probes.select(col("vec_id").as("query_id"),
            col("label").as("q_label"))), "query_id")
          .where(col("n_label") === col("q_label"))
          .groupBy("query_id", "q_label")
          .agg(min("rank").as("first_rank"))
        probes.select(col("vec_id").as("query_id"),
            col("label").as("q_label"))
          .join(hits, Seq("query_id", "q_label"), "left")
          .withColumn("rr9", coalesce(
            floor(lit(1000000000.0) / col("first_rank").cast("double") +
              lit(0.5)).cast("long"), lit(0L)))
          .groupBy(col("q_label").as("label"))
          .agg(count(lit(1)).as("n_queries"),
            sum(when(col("first_rank").isNotNull, 1L).otherwise(0L))
              .as("n_hit"),
            Rounding.stableRound6(sum("rr9").cast("double") /
              lit(1000000000.0) / count(lit(1)).cast("double"))
              .as("mrr"))
          .orderBy("label")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, label, embedding::DOUBLE[] AS v
             |  FROM embeddings),
             |q AS (SELECT * FROM e WHERE vec_id < 50),
             |topk AS (
             |  SELECT query_id, q_label, neighbor_id, rank FROM (
             |    SELECT q.vec_id AS query_id, q.label AS q_label,
             |      e2.vec_id AS neighbor_id, e2.label AS n_label,
             |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
             |        floor(list_cosine_similarity(q.v, e2.v)
             |          * 1000000 + 0.5) / 1000000 DESC, e2.vec_id)
             |        AS rank
             |    FROM q JOIN e e2 ON e2.vec_id <> q.vec_id)
             |  WHERE rank <= 10 AND n_label = q_label),
             |fr AS (
             |  SELECT query_id, q_label, min(rank) AS first_rank
             |  FROM topk GROUP BY 1, 2),
             |rr AS (
             |  SELECT q.vec_id AS query_id, q.label AS label,
             |    coalesce(CAST(floor(1000000000.0 / fr.first_rank::DOUBLE
             |      + 0.5) AS BIGINT), 0) AS rr9,
             |    CASE WHEN fr.first_rank IS NOT NULL THEN 1 ELSE 0 END
             |      AS hit
             |  FROM q LEFT JOIN fr ON fr.query_id = q.vec_id)
             |SELECT label, CAST(count(*) AS BIGINT) AS n_queries,
             |  CAST(sum(hit) AS BIGINT) AS n_hit,
             |  floor(sum(rr9)::DOUBLE / 1000000000.0
             |    / count(*)::DOUBLE * 1000000.0 + 0.5) / 1000000.0
             |    AS mrr
             |FROM rr GROUP BY label ORDER BY label""".stripMargin)),

    // ------------------------------------------------------------------
    // q309: rank-biased overlap (p = 0.9, truncated at depth 10)
    // between two per-source document rankings — by raw length
    // (n_chars) and by distinct-word richness. RBO is THE comparator
    // for indefinite rankings (Webber et al. 2010): top-weighted, no
    // need for identical support. The prefix-overlap counts X_d are
    // exact integers off one full-outer rank join; the p^(d-1)/d
    // weights are 1e-12 integer constants (the q212 discount trick),
    // so each source's Σ is one LONG sum and the final (1-p) scale one
    // double multiply. Rankings window per source (bounded by the
    // per-source doc count), depth frame is 10 rows.
    Q(
      "q309_rank_biased_overlap",
      (s, dir) => {
        val p = 0.9
        val w12 = (1 to 10).map(d =>
          Math.round(math.pow(p, d - 1) / d * 1e12))
        val docs = Tables.load(s, dir, "documents")
          .withColumn("nw", size(array_distinct(
            graft.ops.Text.words(graft.ops.Text.clean(col("text"))))))
        val ra = docs.withColumn("rank_a", row_number().over(
            Window.partitionBy("source")
              .orderBy(desc("n_chars"), col("doc_id"))))
          .where(col("rank_a") <= 10)
          .select(col("source"), col("doc_id"), col("rank_a"))
        val rb = docs.withColumn("rank_b", row_number().over(
            Window.partitionBy("source")
              .orderBy(desc("nw"), col("doc_id"))))
          .where(col("rank_b") <= 10)
          .select(col("source"), col("doc_id"), col("rank_b"))
        val joined = ra.join(rb, Seq("source", "doc_id"), "full_outer")
        val depths = ra.sparkSession.range(1, 11).select(col("id").as("d"))
        val wArr = array(w12.map(lit): _*)
        val xd = joined.crossJoin(broadcast(depths))
          .where(col("rank_a") <= col("d") && col("rank_b") <= col("d"))
          .groupBy("source", "d")
          .agg(count(lit(1)).as("x_d"))
          .withColumn("contrib", col("x_d") * element_at(wArr,
            col("d").cast("int")))
        xd.groupBy("source")
          .agg(sum("contrib").as("s12"))
          .select(col("source"),
            Rounding.stableRound6(lit(0.1) * col("s12").cast("double") /
              lit(1.0e12)).as("rbo"))
          .orderBy("source")
      },
      Some {
        val p = 0.9
        val w12 = (1 to 10).map(d =>
          Math.round(math.pow(p, d - 1) / d * 1e12))
        val wList = w12.mkString("[", ", ", "]")
        s"""WITH docs AS (
           |  SELECT source, doc_id, n_chars,
           |    len(list_distinct(list_filter(string_split(
           |      regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' '),
           |      w -> w <> ''))) AS nw
           |  FROM documents),
           |ra AS (
           |  SELECT source, doc_id, rank_a FROM (
           |    SELECT source, doc_id, row_number() OVER (
           |      PARTITION BY source ORDER BY n_chars DESC, doc_id)
           |      AS rank_a
           |    FROM docs) WHERE rank_a <= 10),
           |rb AS (
           |  SELECT source, doc_id, rank_b FROM (
           |    SELECT source, doc_id, row_number() OVER (
           |      PARTITION BY source ORDER BY nw DESC, doc_id)
           |      AS rank_b
           |    FROM docs) WHERE rank_b <= 10),
           |joined AS (
           |  SELECT coalesce(ra.source, rb.source) AS source,
           |    rank_a, rank_b
           |  FROM ra FULL OUTER JOIN rb USING (source, doc_id)),
           |xd AS (
           |  SELECT source, d, count(*) AS x_d
           |  FROM joined, range(1, 11) r(d)
           |  WHERE rank_a <= d AND rank_b <= d
           |  GROUP BY 1, 2)
           |SELECT source,
           |  ${Rounding.duckSql(
              s"0.1 * sum(x_d * ($wList::BIGINT[])[d::INT])::DOUBLE " +
              "/ 1000000000000.0")} AS rbo
           |FROM xd GROUP BY source ORDER BY source""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q310: inter-event cadence audit — the bot/automation signal every
    // crawl-quality pipeline computes: a user whose event gaps are
    // near-CONSTANT (coefficient of variation ≈ 0) is a scheduler, not
    // a human. Gaps come from one user-keyed lag; the population CV is
    // computed EXACTLY as sqrt(n·Σg² − S²)/S — every term inside the
    // sqrt is LONG arithmetic on second-granularity gaps (bounded:
    // Σg ≤ the fixture's time span, so n·Σg² < 2^62), making the one
    // sqrt + division the only fp ops. Top-30 most-regular users with
    // ≥ 5 gaps, full (cv, user) tiebreak.
    Q(
      "q310_bot_cadence",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select(col("user_id"),
            unix_micros(col("ts").cast("timestamp")).as("us"),
            col("event_id"))
        val wu = Window.partitionBy("user_id").orderBy("us", "event_id")
        val gaps = e
          .withColumn("prev", lag("us", 1).over(wu))
          .where(col("prev").isNotNull)
          .select(col("user_id"),
            expr("(us - prev) div 1000000").as("g"))
        gaps.groupBy("user_id")
          .agg(count(lit(1)).as("n"), sum("g").as("sg"),
            sum(col("g") * col("g")).as("sg2"))
          .where(col("n") >= 5 && col("sg") > 0)
          .withColumn("cv",
            sqrt((col("n") * col("sg2") - col("sg") * col("sg"))
              .cast("double")) / col("sg").cast("double"))
          .select(col("user_id"), col("n").as("n_gaps"),
            Rounding.stableRound6(col("sg").cast("double") /
              col("n").cast("double")).as("mean_gap_s"),
            Rounding.stableRound6(col("cv")).as("cv"))
          .orderBy(col("cv"), col("user_id"))
          .limit(30)
      },
      Some("""WITH e AS (
             |  SELECT user_id, epoch_us(ts::TIMESTAMP) AS us, event_id
             |  FROM events),
             |gaps AS (
             |  SELECT user_id, (us - prev) // 1000000 AS g FROM (
             |    SELECT user_id, us, lag(us) OVER (
             |      PARTITION BY user_id ORDER BY us, event_id) AS prev
             |    FROM e)
             |  WHERE prev IS NOT NULL),
             |agg AS (
             |  SELECT user_id, count(*) AS n,
             |    CAST(sum(g) AS BIGINT) AS sg,
             |    CAST(sum(g*g) AS BIGINT) AS sg2
             |  FROM gaps GROUP BY user_id
             |  HAVING count(*) >= 5 AND sum(g) > 0)
             |SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
             |  floor(sg::DOUBLE / n::DOUBLE * 1000000.0 + 0.5)
             |    / 1000000.0 AS mean_gap_s,
             |  floor(sqrt((n*sg2 - sg*sg)::DOUBLE) / sg::DOUBLE
             |    * 1000000.0 + 0.5) / 1000000.0 AS cv
             |FROM agg
             |ORDER BY cv, user_id
             |LIMIT 30""".stripMargin)))
}
