package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Rounding
import graft.io.Tables
import graft.ops.Text

/** Round-7 seventeenth wave: Neyman-optimal sample allocation. Same
  * contract as every other module: the Spark pipeline pairs with DuckDB
  * oracle SQL replaying it.
  */
object ExtensionQueries23 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q201: Neyman-optimal sample allocation — how many of a 1000-doc
    // annotation budget each source stratum gets, proportional to
    // n_h·σ_h (population std of token count): the survey-sampling
    // answer to "where do labeling dollars buy the most variance
    // reduction" (uniform and proportional allocation are both wrong
    // when strata differ in spread). Integer-exact end to end: Σx and
    // Σx² are exact LONGs, σ_h² = (n·Σx² − (Σx)²)/n² is one exact
    // rational per stratum, and the 1000 seats assign by floor +
    // LARGEST-REMAINDER (rank over the tiny stratum frame, remainder
    // ties by source) — both engines run the identical IEEE
    // double sequence, so every seat lands identically. Scale shape:
    // one shuffle-free scoring scan, one source agg, seat assignment
    // on the stratum frame.
    Q(
      "q201_neyman_allocation",
      (s, dir) => {
        val budget = 1000L
        val stats = Tables.load(s, dir, "documents")
          .select(col("source"),
            size(Text.words(Text.clean(col("text")))).cast("long").as("x"))
          .groupBy("source")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"),
            sum(col("x") * col("x")).as("sxx"))
          .withColumn("sd", sqrt(
            (col("n") * col("sxx") - col("sx") * col("sx")).cast("double") /
              (col("n") * col("n")).cast("double")))
          .withColumn("w", col("n").cast("double") * col("sd"))
        val g = Window.partitionBy()
        // degenerate fallback (Round7EdgeSpec): if EVERY stratum has zero
        // spread the Neyman weights vanish and the seat share is 0/0 —
        // fall back to count-proportional allocation (the classical
        // degenerate of the formula itself: equal σ ⟹ proportional)
        val seats = stats
          .withColumn("tw", sum("w").over(g))
          .withColumn("w2", when(col("tw") === 0.0, col("n").cast("double"))
            .otherwise(col("w")))
          .withColumn("tw2", when(col("tw") === 0.0,
            sum("n").over(g).cast("double")).otherwise(col("tw")))
          .withColumn("ideal", col("w2") * budget / col("tw2"))
          .withColumn("base", floor(col("ideal")).cast("long"))
          .withColumn("rem", col("ideal") - col("base"))
          .withColumn("assigned", sum("base").over(g))
          .withColumn("rnk", row_number().over(
            Window.orderBy(desc("rem"), col("source"))))
        seats
          .withColumn("alloc",
            col("base") + when(col("rnk") <= lit(budget) - col("assigned"), 1L)
              .otherwise(0L))
          .select(col("source"), col("n"), Rounding.stableRound6(col("sd"))
            .as("sd"), col("alloc"))
          .orderBy("source")
      },
      Some(s"""WITH stats AS (
             |  SELECT source, count(*) AS n, sum(x) AS sx,
             |    sum(x * x) AS sxx
             |  FROM (SELECT source, len(list_filter(string_split(
             |    regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' '),
             |    w -> w <> ''))::BIGINT AS x FROM documents)
             |  GROUP BY source),
             |w AS (
             |  SELECT source, n,
             |    sqrt((n * sxx - sx * sx)::DOUBLE / (n * n)::DOUBLE) AS sd,
             |    n::DOUBLE * sqrt((n * sxx - sx * sx)::DOUBLE
             |      / (n * n)::DOUBLE) AS w
             |  FROM stats),
             |seats AS (
             |  SELECT source, n, sd,
             |    CASE WHEN sum(w) OVER () = 0
             |      THEN n::DOUBLE * 1000 / sum(n) OVER ()
             |      ELSE w * 1000 / sum(w) OVER () END AS ideal
             |  FROM w),
             |based AS (
             |  SELECT source, n, sd, floor(ideal) AS base,
             |    ideal - floor(ideal) AS rem,
             |    sum(floor(ideal)) OVER () AS assigned
             |  FROM seats),
             |ranked AS (
             |  SELECT *, row_number() OVER (ORDER BY rem DESC, source)
             |    AS rnk
             |  FROM based)
             |SELECT source, CAST(n AS BIGINT) AS n,
             |  ${Rounding.duckSql("sd")} AS sd,
             |  CAST(base + CASE WHEN rnk <= 1000 - assigned THEN 1
             |    ELSE 0 END AS BIGINT) AS alloc
             |FROM ranked
             |ORDER BY source""".stripMargin))
  )
}
