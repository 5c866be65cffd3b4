package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.SimilaritySearch
import graft.functions.Rounding
import graft.io.Tables

/** Round-8 fifteenth continuation wave: exponential-decay engagement
  * scoring (q315), multi-probe LSH with a measured recall gain (q316),
  * and exact F1-optimal threshold selection (q317). Same contract as
  * every other module: each Spark pipeline pairs with DuckDB oracle
  * SQL replaying it.
  */
object ExtensionQueries40 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q315: exponential-decay engagement score — the standard recency
    // weighting (half-life ≈ 21 days at λ = 1/30) every feature store
    // ships: score(u) = Σ value·e^(−age_days/30) against the corpus'
    // max event time as "now" (a pure function of the data, so both
    // engines agree on it). age_days is exact integer division of
    // micros; each term snaps to 1e-9 integer units before the per-user
    // LONG sum, so partial-agg order can't drift the total. Top-20 by
    // (score, user) — deterministic because the ranking key is the
    // exact integer sum itself.
    Q(
      "q315_decayed_engagement",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select(col("user_id"), col("value"),
            unix_micros(col("ts").cast("timestamp")).as("us"))
        val ref = e.agg(max("us").as("ref"))
        e.crossJoin(broadcast(ref))
          .withColumn("age_d",
            expr("(ref - us) div 86400000000").cast("double"))
          .withColumn("t9",
            floor(col("value") * exp(-col("age_d") / lit(30.0)) *
              lit(1000000000.0) + lit(0.5)).cast("long"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"), sum("t9").as("s9"))
          .select(col("user_id"), col("n_events"),
            Rounding.stableRound6(col("s9").cast("double") /
              lit(1000000000.0)).as("score"))
          .orderBy(desc("s9"), col("user_id"))
          .limit(20)
      },
      Some("""WITH e AS (
             |  SELECT user_id, value, epoch_us(ts::TIMESTAMP) AS us
             |  FROM events),
             |ref AS (SELECT max(us) AS ref FROM e),
             |t AS (
             |  SELECT user_id,
             |    CAST(floor(value * exp(-(((ref - us) // 86400000000)
             |      ::DOUBLE) / 30.0) * 1000000000.0 + 0.5) AS BIGINT)
             |      AS t9
             |  FROM e, ref),
             |agg AS (
             |  SELECT user_id, count(*) AS n_events,
             |    CAST(sum(t9) AS BIGINT) AS s9
             |  FROM t GROUP BY user_id)
             |SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
             |  floor(s9::DOUBLE / 1000000000.0 * 1000000.0 + 0.5)
             |    / 1000000.0 AS score
             |FROM agg ORDER BY s9 DESC, user_id LIMIT 20""".stripMargin)),

    // ------------------------------------------------------------------
    // q316: multi-probe LSH recall audit — single-table LSH (q49)
    // probes one bucket and under-recalls; multi-probe (Lv et al.
    // 2007) also probes the buckets reached by flipping the 2 planes
    // the query sits CLOSEST to (smallest |margin| — precisely the
    // bits most likely to differ for a true neighbor). Per query this
    // emits recall@10 vs the brute oracle for both strategies, so the
    // gain is measured, not asserted (the q189 self-audit discipline).
    // Probe selection is a deterministic (|dot|, plane-index) sort
    // replayed from the same plane literals in the oracle.
    Q(
      "q316_multiprobe_lsh",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val probes = e.filter(col("vec_id") < 30)
        val brute = SimilaritySearch.bruteTopK(probes, e, 10)
          .select(col("query_id"), col("neighbor_id"))
        val single = SimilaritySearch.lshTopK(probes, e, 10)
          .select(col("query_id"), col("neighbor_id"))
        val multi = SimilaritySearch.multiProbeTopK(probes, e, 10)
          .select(col("query_id"), col("neighbor_id"))
        val nS = single.join(brute, Seq("query_id", "neighbor_id"))
          .groupBy("query_id").agg(count(lit(1)).as("n_single"))
        val nM = multi.join(brute, Seq("query_id", "neighbor_id"))
          .groupBy("query_id").agg(count(lit(1)).as("n_multi"))
        probes.select(col("vec_id").as("query_id"))
          .join(nS, Seq("query_id"), "left")
          .join(nM, Seq("query_id"), "left")
          .select(col("query_id"),
            coalesce(col("n_single"), lit(0L)).as("n_single"),
            coalesce(col("n_multi"), lit(0L)).as("n_multi"),
            Rounding.stableRound6(
              coalesce(col("n_single"), lit(0L)).cast("double") / lit(10.0))
              .as("recall_single"),
            Rounding.stableRound6(
              coalesce(col("n_multi"), lit(0L)).cast("double") / lit(10.0))
              .as("recall_multi"))
          .orderBy("query_id")
      },
      Some {
        val ps = SimilaritySearch.planes()
        def lits(p: Seq[Double]): String =
          p.map(v => String.format(java.util.Locale.ROOT, "%.6f",
            Double.box(v))).mkString("[", ", ", "]")
        val bucketExpr = ps.zipWithIndex.map { case (p, i) =>
          s"(CASE WHEN list_dot_product(v, ${lits(p)}::DOUBLE[]) > 0 " +
            s"THEN ${1L << i} ELSE 0 END)"
        }.mkString(" + ")
        val marginList = ps.zipWithIndex.map { case (p, i) =>
          s"{'m': abs(list_dot_product(v, ${lits(p)}::DOUBLE[])), " +
            s"'i': $i}"
        }.mkString("[", ", ", "]")
        s"""WITH e AS (
           |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |b AS (
           |  SELECT vec_id, v, $bucketExpr AS bkt,
           |    list_sort($marginList) AS ms
           |  FROM e),
           |q AS (SELECT * FROM b WHERE vec_id < 30),
           |brute AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT q.vec_id AS query_id, e2.vec_id AS neighbor_id,
           |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
           |        floor(list_cosine_similarity(q.v, e2.v)
           |          * 1000000 + 0.5) / 1000000 DESC, e2.vec_id) AS rank
           |    FROM q JOIN e e2 ON e2.vec_id <> q.vec_id)
           |  WHERE rank <= 10),
           |single AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
           |        floor(list_cosine_similarity(q.v, c.v)
           |          * 1000000 + 0.5) / 1000000 DESC, c.vec_id) AS rank
           |    FROM q JOIN b c ON c.bkt = q.bkt
           |      AND c.vec_id <> q.vec_id)
           |  WHERE rank <= 10),
           |qprobe AS (
           |  SELECT vec_id, v, unnest([bkt,
           |    xor(bkt, (1::BIGINT << (ms[1].i))),
           |    xor(bkt, (1::BIGINT << (ms[2].i)))]) AS bkt
           |  FROM q),
           |mcand AS (
           |  SELECT DISTINCT qp.vec_id AS query_id, qp.v AS qv,
           |    c.vec_id AS neighbor_id, c.v AS cv
           |  FROM qprobe qp JOIN b c ON c.bkt = qp.bkt
           |    AND c.vec_id <> qp.vec_id),
           |multi AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT query_id, neighbor_id,
           |      row_number() OVER (PARTITION BY query_id ORDER BY
           |        floor(list_cosine_similarity(qv, cv)
           |          * 1000000 + 0.5) / 1000000 DESC, neighbor_id)
           |        AS rank
           |    FROM mcand)
           |  WHERE rank <= 10),
           |ns AS (
           |  SELECT query_id, count(*) AS n_single FROM single
           |  JOIN brute USING (query_id, neighbor_id) GROUP BY 1),
           |nm AS (
           |  SELECT query_id, count(*) AS n_multi FROM multi
           |  JOIN brute USING (query_id, neighbor_id) GROUP BY 1)
           |SELECT q.vec_id AS query_id,
           |  CAST(coalesce(n_single, 0) AS BIGINT) AS n_single,
           |  CAST(coalesce(n_multi, 0) AS BIGINT) AS n_multi,
           |  floor(coalesce(n_single, 0)::DOUBLE / 10.0
           |    * 1000000.0 + 0.5) / 1000000.0 AS recall_single,
           |  floor(coalesce(n_multi, 0)::DOUBLE / 10.0
           |    * 1000000.0 + 0.5) / 1000000.0 AS recall_multi
           |FROM q
           |LEFT JOIN ns ON ns.query_id = q.vec_id
           |LEFT JOIN nm ON nm.query_id = q.vec_id
           |ORDER BY query_id""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q317: exact F1-optimal operating point for the length-based
    // en-classifier — the decision the q203 AUC and q204 calibration
    // gates defer: WHERE do you cut? Candidate thresholds are the
    // distinct score values; TP/FP/FN at every threshold come from one
    // descending cumulative window over the per-value (pos, neg)
    // aggregation, so the sweep costs one sort of ~300 rows however
    // large the corpus. Everything stays integer; the F1 ordering uses
    // the one exact double division both engines compute identically,
    // with the threshold as tiebreak. Top-5 operating points emitted.
    Q(
      "q317_f1_threshold",
      (s, dir) => {
        val scored = Tables.load(s, dir, "documents")
          .select(col("n_chars").as("t"),
            when(col("lang") === "en", 1L).otherwise(0L).as("y"))
        val byVal = scored.groupBy("t")
          .agg(sum("y").as("pos"), sum(lit(1L) - col("y")).as("neg"))
        val wDesc = Window.orderBy(desc("t"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = Window.partitionBy()
        val sweep = byVal
          .withColumn("tp", sum("pos").over(wDesc))
          .withColumn("fp", sum("neg").over(wDesc))
          .withColumn("fn", sum("pos").over(tot) - col("tp"))
          .withColumn("f1",
            (lit(2L) * col("tp")).cast("double") /
              (lit(2L) * col("tp") + col("fp") + col("fn")).cast("double"))
        sweep
          .select(col("t").as("threshold"), col("tp"), col("fp"),
            col("fn"),
            Rounding.stableRound6(col("tp").cast("double") /
              (col("tp") + col("fp")).cast("double")).as("precision"),
            Rounding.stableRound6(col("tp").cast("double") /
              (col("tp") + col("fn")).cast("double")).as("recall"),
            Rounding.stableRound6(col("f1")).as("f1"))
          .orderBy(desc("f1"), col("threshold"))
          .limit(5)
      },
      Some("""WITH scored AS (
             |  SELECT n_chars AS t,
             |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
             |  FROM documents),
             |byval AS (
             |  SELECT t, CAST(sum(y) AS BIGINT) AS pos,
             |    CAST(sum(1 - y) AS BIGINT) AS neg
             |  FROM scored GROUP BY t),
             |sweep AS (
             |  SELECT t,
             |    CAST(sum(pos) OVER (ORDER BY t DESC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS tp,
             |    CAST(sum(neg) OVER (ORDER BY t DESC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS fp,
             |    CAST(sum(pos) OVER () AS BIGINT) AS totpos
             |  FROM byval),
             |f AS (
             |  SELECT t, tp, fp, totpos - tp AS fn,
             |    (2*tp)::DOUBLE / (2*tp + fp + (totpos - tp))::DOUBLE
             |      AS f1
             |  FROM sweep)
             |SELECT t AS threshold, tp, fp, fn,
             |  floor(tp::DOUBLE / (tp + fp)::DOUBLE * 1000000.0 + 0.5)
             |    / 1000000.0 AS precision,
             |  floor(tp::DOUBLE / (tp + fn)::DOUBLE * 1000000.0 + 0.5)
             |    / 1000000.0 AS recall,
             |  floor(f1 * 1000000.0 + 0.5) / 1000000.0 AS f1
             |FROM f ORDER BY f1 DESC, threshold LIMIT 5""".stripMargin)))
}
