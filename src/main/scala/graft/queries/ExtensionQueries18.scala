package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.SimilaritySearch
import graft.functions.Rounding
import graft.io.Tables

/** Round-7 twelfth wave: ANN recall audit, embedding-cluster purity,
  * and lagged cross-correlation of event series. Same contract as every
  * other module: each Spark pipeline pairs with DuckDB oracle SQL
  * replaying it.
  */
object ExtensionQueries18 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q189: ANN recall audit — per probe, recall@10 of the LSH-bucketed
    // kNN (q49's 8-hyperplane banding) against the exact brute-force
    // top-10 (q48): q181's measure-your-own-sketch discipline applied
    // to similarity search. The number that decides whether the bucket
    // config ships: a pipeline that deduplicates or retrieves with ANN
    // at 100 TB needs the measured operating point, not the folklore
    // one. Scale shape: both sides are probe-keyed (probe set is
    // corpus-fraction-sized), the intersection is one equi-join on
    // (probe, neighbor), one probe-keyed count.
    Q(
      "q189_ann_recall",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val probes = e.filter(col("vec_id") < 20)
        val brute = SimilaritySearch.bruteTopK(probes, e, 10)
          .select(col("query_id"), col("neighbor_id"))
        val lsh = SimilaritySearch.lshTopK(probes, e, 10)
          .select(col("query_id"), col("neighbor_id"))
        val hit = lsh.join(brute, Seq("query_id", "neighbor_id"), "left_semi")
          .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
        val nl = lsh.groupBy("query_id").agg(count(lit(1)).as("n_lsh"))
        // base the report on the PROBE set: a probe alone in its bucket
        // has zero candidates and zero recall — the failure mode the
        // audit exists to surface, so it must appear as a row
        probes.select(col("vec_id").as("query_id"))
          .join(nl, Seq("query_id"), "left")
          .join(hit, Seq("query_id"), "left")
          .select(col("query_id"),
            coalesce(col("n_lsh"), lit(0L)).as("n_lsh"),
            coalesce(col("n_hit"), lit(0L)).as("n_hit"),
            Rounding.stableRound6(
              coalesce(col("n_hit"), lit(0L)).cast("double") / 10.0)
              .as("recall_at_10"))
          .orderBy("query_id")
      },
      Some {
        val ps = SimilaritySearch.planes()
        val bucketExpr = ps.zipWithIndex.map { case (p, i) =>
          val lits = p.map(v => String.format(java.util.Locale.ROOT, "%.6f",
            Double.box(v))).mkString("[", ", ", "]")
          s"(CASE WHEN list_dot_product(v, $lits::DOUBLE[]) > 0 THEN ${1L << i} ELSE 0 END)"
        }.mkString("\n             |    + ")
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |b AS (SELECT vec_id, v,
           |    $bucketExpr AS bkt
           |  FROM e),
           |q AS (SELECT * FROM b WHERE vec_id < 20),
           |bs AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT q.vec_id AS query_id, e2.vec_id AS neighbor_id,
           |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
           |        floor(list_cosine_similarity(q.v, e2.v) * 1000000 + 0.5)
           |          / 1000000 DESC, e2.vec_id) AS rank
           |    FROM q JOIN e e2 ON e2.vec_id <> q.vec_id)
           |  WHERE rank <= 10),
           |ls AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
           |        floor(list_cosine_similarity(q.v, c.v) * 1000000 + 0.5)
           |          / 1000000 DESC, c.vec_id) AS rank
           |    FROM q JOIN b c ON c.bkt = q.bkt AND c.vec_id <> q.vec_id)
           |  WHERE rank <= 10),
           |nl AS (SELECT query_id, count(*) AS n_lsh FROM ls GROUP BY 1),
           |hit AS (
           |  SELECT l.query_id, count(*) AS n_hit
           |  FROM ls l WHERE EXISTS (SELECT 1 FROM bs
           |    WHERE bs.query_id = l.query_id
           |      AND bs.neighbor_id = l.neighbor_id)
           |  GROUP BY 1)
           |SELECT q.vec_id AS query_id,
           |  CAST(coalesce(nl.n_lsh, 0) AS BIGINT) AS n_lsh,
           |  CAST(coalesce(hit.n_hit, 0) AS BIGINT) AS n_hit,
           |  ${Rounding.duckSql("coalesce(hit.n_hit, 0)::DOUBLE / 10.0")}
           |    AS recall_at_10
           |FROM q LEFT JOIN nl ON nl.query_id = q.vec_id
           |LEFT JOIN hit ON hit.query_id = q.vec_id
           |ORDER BY query_id""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q190: embedding-cluster purity — per cluster label, the majority
    // document language and its fraction (vec_id = doc_id pairing):
    // the standard external clustering-quality metric — a cluster
    // whose members span languages is a bad unit for q155's SemDeDup
    // prune or q123's centroid labels, and purity says so BEFORE those
    // ops trust it. Scale shape: one equi-join on the id, one
    // (cluster, lang) agg, argmax over the cell frame via
    // max(struct(cnt, rev(lang))) — deterministic smallest-lang tie
    // rule, no window over data rows.
    Q(
      "q190_cluster_purity",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
          .select(col("vec_id"), col("label").cast("long").as("cluster"))
        val d = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("lang"))
        val cells = e.join(d, col("vec_id") === col("doc_id"))
          .groupBy("cluster", "lang").agg(count(lit(1)).as("c"))
        val w = Window.partitionBy("cluster")
        cells
          .withColumn("n", sum("c").over(w))
          .withColumn("rnk", row_number().over(
            w.orderBy(desc("c"), col("lang"))))
          .where(col("rnk") === 1)
          .select(col("cluster"), col("n").as("n_vecs"),
            col("lang").as("majority_lang"), col("c").as("n_majority"),
            Rounding.stableRound6(col("c").cast("double") / col("n"))
              .as("purity"))
          .orderBy("cluster")
      },
      Some(s"""WITH cells AS (
             |  SELECT CAST(e.label AS BIGINT) AS cluster, d.lang,
             |    count(*) AS c
             |  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
             |  GROUP BY 1, 2),
             |x AS (
             |  SELECT cluster, lang, c,
             |    sum(c) OVER (PARTITION BY cluster) AS n,
             |    row_number() OVER (PARTITION BY cluster
             |      ORDER BY c DESC, lang) AS rnk
             |  FROM cells)
             |SELECT cluster, CAST(n AS BIGINT) AS n_vecs,
             |  lang AS majority_lang, CAST(c AS BIGINT) AS n_majority,
             |  ${Rounding.duckSql("c::DOUBLE / n")} AS purity
             |FROM x WHERE rnk = 1
             |ORDER BY cluster""".stripMargin)),

    // ------------------------------------------------------------------
    // q191: lagged cross-correlation — Pearson correlation between the
    // hourly view-count series and the purchase-count series shifted
    // by 0, 1, and 2 hours over a dense January-2024 grid (absent
    // hours count 0 — correlation over a sparse join would silently
    // drop the zeros and bias r): "do purchases track views, and at
    // what delay" — the lead-lag diagnostic behind conversion-window
    // choices like q139's 30 minutes. All sums (Σx, Σy, Σxy, Σx²,
    // Σy²) are exact LONGs over the 744-row grid; r is one identical
    // double expression both engines. Scale shape: one events agg to
    // (hour, type), a generated dense grid joined once, a 3-row lag
    // frame cross, one tiny agg per lag.
    Q(
      "q191_lag_correlation",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val counts = Tables.load(s, dir, "events")
          .where(col("event_type").isin("view", "purchase"))
          .select(col("event_type"),
            date_trunc("hour", col("ts").cast("timestamp")).as("h"))
          .groupBy("event_type", "h").agg(count(lit(1)).as("c"))
        val grid = spark.sql(
          """SELECT explode(sequence(timestamp'2024-01-01 00:00:00',
            |  timestamp'2024-01-31 23:00:00', interval 1 hour)) AS h
            |""".stripMargin)
        def series(t: String, name: String) = grid
          .join(counts.where(col("event_type") === t), Seq("h"), "left")
          .select(col("h"), coalesce(col("c"), lit(0L)).as(name))
        val x = series("view", "x")
        val y = series("purchase", "y")
        val lags = broadcast(Seq(0, 1, 2).toDF("lag"))
        val pairs = lags.crossJoin(x)
          .join(y.withColumnRenamed("h", "hy"),
            col("hy") === col("h") + expr("make_interval(0,0,0,0,lag,0,0)"))
          .select(col("lag"), col("x"), col("y"))
        pairs.groupBy("lag")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
          .select(col("lag"), col("n"),
            Rounding.stableRound6(
              (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
                sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                  .cast("double") *
                  (col("n") * col("syy") - col("sy") * col("sy"))
                    .cast("double"))).as("r"))
          .orderBy("lag")
      },
      Some(s"""WITH counts AS (
             |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS c
             |  FROM events WHERE event_type IN ('view', 'purchase')
             |  GROUP BY 1, 2),
             |grid AS (
             |  SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
             |    TIMESTAMP '2024-01-31 23:00:00', INTERVAL 1 HOUR)) AS h),
             |x AS (SELECT g.h, coalesce(c.c, 0) AS x FROM grid g
             |      LEFT JOIN counts c ON c.h = g.h
             |        AND c.event_type = 'view'),
             |y AS (SELECT g.h, coalesce(c.c, 0) AS y FROM grid g
             |      LEFT JOIN counts c ON c.h = g.h
             |        AND c.event_type = 'purchase'),
             |lags AS (SELECT unnest([0, 1, 2]) AS lag),
             |pairs AS (
             |  SELECT l.lag, x.x, y.y
             |  FROM lags l CROSS JOIN x
             |  JOIN y ON y.h = x.h + to_hours(l.lag)),
             |agg AS (
             |  SELECT lag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             |    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
             |  FROM pairs GROUP BY lag)
             |SELECT CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n,
             |  ${Rounding.duckSql(
                  "(n * sxy - sx * sy)::DOUBLE / sqrt((n * sxx - sx * sx)" +
                    "::DOUBLE * (n * syy - sy * sy)::DOUBLE)")} AS r
             |FROM agg
             |ORDER BY lag""".stripMargin))
  )
}
