package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.Graph
import graft.functions.Rounding
import graft.io.Tables

/** Round-8 sixteenth continuation wave: decile lift/gains table (q318)
  * and bipartite HITS over the co-purchase graph (q319). Same contract
  * as every other module: each Spark pipeline pairs with DuckDB oracle
  * SQL replaying it.
  */
object ExtensionQueries41 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q318: decile lift & cumulative gains for the length-based
    // en-classifier — the campaign-targeting readout next to q203's
    // AUC and q317's operating point: "if I only take the top decile by
    // score, how concentrated are the positives?". Deciles are assigned
    // at SCORE-VALUE granularity (a value group lands in the decile of
    // its last cumulative row, so ties never split nondeterministically
    // across buckets) — the whole table derives from one ~300-row
    // distinct-value aggregation, and every rate/lift/gain is an exact
    // integer ratio through one double division.
    Q(
      "q318_decile_lift",
      (s, dir) => {
        val scored = Tables.load(s, dir, "documents")
          .select(col("n_chars").as("t"),
            when(col("lang") === "en", 1L).otherwise(0L).as("y"))
        val byVal = scored.groupBy("t")
          .agg(sum("y").as("pos"), count(lit(1)).as("cnt"))
        val wDesc = Window.orderBy(desc("t"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = Window.partitionBy()
        val bucketed = byVal
          .withColumn("cum", sum("cnt").over(wDesc))
          .withColumn("n", sum("cnt").over(tot))
          .withColumn("totpos", sum("pos").over(tot))
          .withColumn("bucket", expr("((cum - 1) * 10) div n"))
        val wB = Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        bucketed
          .groupBy("bucket")
          .agg(sum("cnt").as("n_rows"), sum("pos").as("pos"),
            first("n").as("n"), first("totpos").as("totpos"))
          .withColumn("cumpos", sum("pos").over(wB))
          .select(col("bucket"), col("n_rows"), col("pos"),
            Rounding.stableRound6(col("pos").cast("double") /
              col("n_rows").cast("double")).as("rate"),
            Rounding.stableRound6(
              (col("pos") * col("n")).cast("double") /
                (col("n_rows") * col("totpos")).cast("double")).as("lift"),
            Rounding.stableRound6(col("cumpos").cast("double") /
              col("totpos").cast("double")).as("cum_gain"))
          .orderBy("bucket")
      },
      Some("""WITH scored AS (
             |  SELECT n_chars AS t,
             |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
             |  FROM documents),
             |byval AS (
             |  SELECT t, CAST(sum(y) AS BIGINT) AS pos,
             |    count(*) AS cnt
             |  FROM scored GROUP BY t),
             |bucketed AS (
             |  SELECT t, pos, cnt,
             |    CAST(sum(cnt) OVER (ORDER BY t DESC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS cum,
             |    CAST(sum(cnt) OVER () AS BIGINT) AS n,
             |    CAST(sum(pos) OVER () AS BIGINT) AS totpos
             |  FROM byval),
             |b AS (
             |  SELECT ((cum - 1) * 10) // n AS bucket,
             |    cnt, pos, n, totpos
             |  FROM bucketed),
             |g AS (
             |  SELECT bucket, CAST(sum(cnt) AS BIGINT) AS n_rows,
             |    CAST(sum(pos) AS BIGINT) AS pos,
             |    max(n) AS n, max(totpos) AS totpos
             |  FROM b GROUP BY bucket)
             |SELECT bucket, n_rows, pos,
             |  floor(pos::DOUBLE / n_rows::DOUBLE * 1000000.0 + 0.5)
             |    / 1000000.0 AS rate,
             |  floor((pos * n)::DOUBLE / (n_rows * totpos)::DOUBLE
             |    * 1000000.0 + 0.5) / 1000000.0 AS lift,
             |  floor(CAST(sum(pos) OVER (ORDER BY bucket
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT)::DOUBLE / totpos::DOUBLE
             |    * 1000000.0 + 0.5) / 1000000.0 AS cum_gain
             |FROM g ORDER BY bucket""".stripMargin)),

    // ------------------------------------------------------------------
    // q319: HITS hubs & authorities over the customer↔part co-purchase
    // bipartite graph (Graph.hits) — the mutual-reinforcement ranking
    // the near-dup PageRank (q89) can't express: a part is an AUTHORITY
    // when broad-basket customers buy it, a customer a HUB when they
    // buy authoritative parts. 4 snapped power iterations (the q299
    // 1e-9-grid discipline makes the unrolled-CTE oracle walk the
    // identical trajectory); top-20 per side by the exact snapped
    // score.
    Q(
      "q319_hits_copurchase",
      (s, dir) => {
        val edges = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
          .join(Tables.load(s, dir, "lineitem")
            .select(col("l_orderkey").as("o_orderkey"), col("l_partkey")),
            "o_orderkey")
          .select(col("o_custkey"), col("l_partkey"))
        val scores = Graph.hits(edges, iters = 4)
        val wSide = Window.partitionBy("side").orderBy(desc("s"), col("id"))
        scores
          .withColumn("rk", row_number().over(wSide))
          .where(col("rk") <= 20)
          .select(col("side"), col("id"),
            Rounding.stableRound6(col("s")).as("score"))
          .orderBy(col("side"), desc("score"), col("id"))
      },
      Some {
        // every CTE is MATERIALIZED: DuckDB inlines plain CTEs at each
        // reference, and this chain references each layer twice — the
        // un-materialized expansion is exponential (observed as an
        // fd-exhaustion crash re-opening the parquet 2^16 times)
        val iters = (1 to 4).map { i =>
          s"""ar$i AS MATERIALIZED (
             |  SELECT e.a, sum(h.s) AS r FROM e
             |  JOIN h${i - 1} h ON h.id = e.h GROUP BY e.a),
             |an$i AS MATERIALIZED (SELECT sqrt(sum(r*r)) AS nrm FROM ar$i),
             |a$i AS MATERIALIZED (
             |  SELECT a AS id,
             |    floor(r / nrm * 1000000000.0 + 0.5) / 1000000000.0 AS s
             |  FROM ar$i, an$i),
             |hr$i AS MATERIALIZED (
             |  SELECT e.h, sum(a2.s) AS r FROM e
             |  JOIN a$i a2 ON a2.id = e.a GROUP BY e.h),
             |hn$i AS MATERIALIZED (SELECT sqrt(sum(r*r)) AS nrm FROM hr$i),
             |h$i AS MATERIALIZED (
             |  SELECT h AS id,
             |    floor(r / nrm * 1000000000.0 + 0.5) / 1000000000.0 AS s
             |  FROM hr$i, hn$i)"""
        }.mkString(",\n")
        s"""WITH e AS MATERIALIZED (
           |  SELECT DISTINCT o.o_custkey AS h, l.l_partkey AS a
           |  FROM orders o JOIN lineitem l
           |    ON l.l_orderkey = o.o_orderkey),
           |h0 AS MATERIALIZED (
           |  SELECT DISTINCT h AS id, 1.0::DOUBLE AS s FROM e),
           |$iters,
           |ranked AS (
           |  SELECT 'authority' AS side, id, s,
           |    row_number() OVER (ORDER BY s DESC, id) AS rk
           |  FROM a4
           |  UNION ALL
           |  SELECT 'hub' AS side, id, s,
           |    row_number() OVER (ORDER BY s DESC, id) AS rk
           |  FROM h4)
           |SELECT side, id,
           |  floor(s * 1000000.0 + 0.5) / 1000000.0 AS score
           |FROM ranked WHERE rk <= 20
           |ORDER BY side, score DESC, id""".stripMargin
      }))
}
