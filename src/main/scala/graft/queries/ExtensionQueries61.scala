package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Rounding
import graft.io.Tables

/** Round-9 nineteenth wave: bipartite-projection supplier similarity
  * (q382), a Chebyshev tail-bound contract check (q383), an RLE layout
  * advisor (q384), and transition conditional entropy (q385).
  */
object ExtensionQueries61 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q382: supplier sourcing overlap — the cosine-weighted bipartite
    // projection of the supplier–part graph: suppliers that stock the
    // same parts are substitutes (procurement redundancy / dedup of
    // supplier lists). Candidate pairs come from a POSTING join
    // through the shared part (pair space Σ_p (suppliers per part)²,
    // bounded by catalog fanout — never supplier × supplier), overlap
    // cosine = shared / √(n_a·n_b) from exact integer counts, and the
    // top-20 cut orders on the 1e-6-snapped LONG score
    // (TakeOrderedAndProject, integer-deterministic tiebreak).
    Q(
      "q382_bipartite_cosine",
      (s, dir) => {
        // r14 opt (guide §2.4/§5): the distinct (part, supplier) frame
        // feeds the degree aggregate AND both self-join sides —
        // un-materialized each consumer re-ran the lineitem scan +
        // distinct shuffle (plan audit: 8 parquet scans before, 1
        // after). localCheckpoint pins it once; row set unchanged.
        val ps = Tables.load(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_suppkey")).distinct()
          .localCheckpoint()
        val deg = ps.groupBy("l_suppkey").agg(count(lit(1)).as("np"))
        val pairs = ps.toDF("p", "sa")
          .join(ps.toDF("p", "sb"), "p")
          .where(col("sa") < col("sb"))
          .groupBy("sa", "sb").agg(count(lit(1)).as("shared"))
        pairs
          .join(deg.toDF("sa", "na"), "sa")
          .join(deg.toDF("sb", "nb"), "sb")
          .withColumn("c6",
            floor(col("shared").cast("double") /
              sqrt(col("na").cast("double") * col("nb").cast("double"))
              * 1e6 + 0.5).cast("long"))
          .orderBy(col("c6").desc, col("sa"), col("sb"))
          .limit(20)
          .select(col("sa").as("supp_a"), col("sb").as("supp_b"),
            col("shared"), col("na"), col("nb"),
            (col("c6").cast("double") / 1e6).as("cosine"))
      },
      Some("""WITH ps AS (
             |  SELECT DISTINCT l_partkey AS p, l_suppkey AS s
             |  FROM lineitem),
             |deg AS (SELECT s, CAST(count(*) AS BIGINT) AS np
             |        FROM ps GROUP BY s),
             |pairs AS (
             |  SELECT a.s AS sa, b.s AS sb,
             |    CAST(count(*) AS BIGINT) AS shared
             |  FROM ps a JOIN ps b ON b.p = a.p AND a.s < b.s
             |  GROUP BY 1, 2),
             |sc AS (
             |  SELECT sa, sb, shared, da.np AS na, db.np AS nb,
             |    CAST(floor(shared::DOUBLE
             |      / sqrt(da.np::DOUBLE * db.np::DOUBLE) * 1000000 + 0.5)
             |      AS BIGINT) AS c6
             |  FROM pairs
             |  JOIN deg da ON da.s = pairs.sa
             |  JOIN deg db ON db.s = pairs.sb)
             |SELECT sa AS supp_a, sb AS supp_b, shared, na, nb,
             |  c6::DOUBLE / 1000000.0 AS cosine
             |FROM sc
             |ORDER BY c6 DESC, supp_a, supp_b
             |LIMIT 20""".stripMargin)),

    // ------------------------------------------------------------------
    // q383: Chebyshev tail-bound contract — for every event type and
    // k ∈ {2,3,4}, the empirical share of values at least k·σ from
    // the mean, against the distribution-free bound 1/k². The `holds`
    // column is MATHEMATICALLY guaranteed true (Chebyshev is a
    // theorem), which makes it the ideal cross-engine contract: any
    // false is a computation bug, not a data property — the
    // q206-style pinned-true audit with a proof instead of a
    // tolerance. Moments are exact LONG cent sums; μ and σ are the
    // same fixed-order double expressions in both engines; one corpus
    // pass for moments, one for tails.
    Q(
      "q383_chebyshev_audit",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select(col("event_type"),
            floor(col("value") * 100 + 0.5).cast("long").as("x"))
        val m = e.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"),
            sum(col("x") * col("x")).as("qx"))
          .withColumn("mu", col("sx").cast("double") / col("n").cast("double"))
          .withColumn("sd", sqrt(
            col("qx").cast("double") / col("n").cast("double")
              - (col("sx").cast("double") / col("n").cast("double"))
              * (col("sx").cast("double") / col("n").cast("double"))))
        val tailAggs = Seq(2, 3, 4).map(k =>
          sum(when(abs(col("x").cast("double") - col("mu")) >=
            lit(k.toDouble) * col("sd"), 1L).otherwise(0L)).as(s"t$k"))
        val tails = e.join(m.select(col("event_type"), col("mu"), col("sd")),
            "event_type")
          .groupBy("event_type")
          .agg(tailAggs.head, tailAggs.tail: _*)
        m.join(tails, "event_type")
          .selectExpr("event_type", "n",
            "stack(3, 2L, t2, 3L, t3, 4L, t4) AS (k, tail_count)")
          .select(col("event_type"), col("k"), col("n"), col("tail_count"),
            Rounding.stableRound6(col("tail_count").cast("double") /
              col("n").cast("double")).as("tail_share"),
            Rounding.stableRound6(lit(1.0) /
              (col("k") * col("k")).cast("double")).as("chebyshev_bound"),
            (col("tail_count").cast("double") / col("n").cast("double") <=
              lit(1.0) / (col("k") * col("k")).cast("double"))
              .as("holds"))
          .orderBy("event_type", "k")
      },
      Some(s"""WITH e AS (
             |  SELECT event_type,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
             |  FROM events),
             |m AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS sx,
             |    CAST(sum(x * x) AS BIGINT) AS qx
             |  FROM e GROUP BY 1),
             |ms AS (
             |  SELECT event_type, n,
             |    sx::DOUBLE / n::DOUBLE AS mu,
             |    sqrt(qx::DOUBLE / n::DOUBLE
             |      - (sx::DOUBLE / n::DOUBLE) * (sx::DOUBLE / n::DOUBLE))
             |      AS sd
             |  FROM m),
             |t AS (
             |  SELECT e.event_type, k,
             |    CAST(sum(CASE WHEN abs(e.x::DOUBLE - ms.mu)
             |      >= k::DOUBLE * ms.sd THEN 1 ELSE 0 END) AS BIGINT)
             |      AS tail_count,
             |    CAST(max(ms.n) AS BIGINT) AS n
             |  FROM e
             |  JOIN ms ON ms.event_type = e.event_type
             |  CROSS JOIN (SELECT unnest([2, 3, 4]) AS k)
             |  GROUP BY e.event_type, k)
             |SELECT event_type, CAST(k AS BIGINT) AS k, n, tail_count,
             |  ${Rounding.duckSql(
                  "tail_count::DOUBLE / n::DOUBLE")} AS tail_share,
             |  ${Rounding.duckSql("1.0 / (k * k)::DOUBLE")}
             |    AS chebyshev_bound,
             |  tail_count::DOUBLE / n::DOUBLE <= 1.0 / (k * k)::DOUBLE
             |    AS holds
             |FROM t
             |ORDER BY event_type, k""".stripMargin)),

    // ------------------------------------------------------------------
    // q384: RLE layout advisor — how many runs would run-length
    // encoding see in l_returnflag / l_linestatus under the table's
    // natural clustering (ordered by line number within each order, a
    // KEY-PARTITIONED window — runs are counted per order group and
    // summed, never a global sort) versus the value-sorted best case
    // (runs = distinct values)? The rows/runs ratios say whether
    // re-sorting before the parquet write buys compression — q373's
    // dictionary advisor for the run-length axis.
    Q(
      "q384_rle_layout_audit",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        def audit(c: String) = {
          // l_linenumber is NOT unique within an order in this fixture —
          // the value itself is the tiebreak, which leaves the run count
          // invariant (equal-key equal-value rows permute freely)
          val w = Window.partitionBy("l_orderkey")
            .orderBy(col("l_linenumber"), col("v"))
          li.select(col("l_orderkey"), col("l_linenumber"), col(c).as("v"))
            .withColumn("chg",
              when(lag("v", 1).over(w).isNull ||
                col("v") =!= lag("v", 1).over(w), 1L).otherwise(0L))
            .agg(count(lit(1)).as("n_rows"), sum("chg").as("natural_runs"),
              countDistinct(col("v")).as("sorted_runs"))
            .select(lit(c).as("column"), col("n_rows"),
              col("natural_runs"), col("sorted_runs"))
        }
        audit("l_returnflag").unionAll(audit("l_linestatus"))
          .withColumn("natural_ratio",
            Rounding.stableRound6(col("n_rows").cast("double") /
              col("natural_runs").cast("double")))
          .withColumn("sorted_ratio",
            Rounding.stableRound6(col("n_rows").cast("double") /
              col("sorted_runs").cast("double")))
          .withColumn("resort_gain",
            Rounding.stableRound6(col("natural_runs").cast("double") /
              col("sorted_runs").cast("double")))
          .orderBy("column")
      },
      Some {
        def one(c: String) =
          s"""SELECT '$c' AS "column",
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(chg) AS BIGINT) AS natural_runs,
             |  CAST(count(DISTINCT v) AS BIGINT) AS sorted_runs
             |FROM (
             |  SELECT $c AS v,
             |    CASE WHEN lag($c) OVER (PARTITION BY l_orderkey
             |      ORDER BY l_linenumber, $c) IS DISTINCT FROM $c
             |    THEN 1 ELSE 0 END AS chg
             |  FROM lineitem)"""
        s"""WITH u AS (
           |  ${one("l_returnflag")}
           |  UNION ALL ${one("l_linestatus")})
           |SELECT "column", n_rows, natural_runs, sorted_runs,
           |  ${Rounding.duckSql(
                "n_rows::DOUBLE / natural_runs::DOUBLE")}
           |    AS natural_ratio,
           |  ${Rounding.duckSql(
                "n_rows::DOUBLE / sorted_runs::DOUBLE")} AS sorted_ratio,
           |  ${Rounding.duckSql(
                "natural_runs::DOUBLE / sorted_runs::DOUBLE")}
           |    AS resort_gain
           |FROM u
           |ORDER BY "column"""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q385: conditional entropy of the next event — H(next | current)
    // per current type from the transition counts (self-transitions
    // included): how predictable is behavior given where the user is
    // now, the information-theoretic companion to q374's expected
    // steps and q359's draft acceptance. Each −p·ln(p) term snaps to
    // the 1e-9 LONG grid before the per-state sum (order-proof), the
    // normalized predictability is 1 − H/ln(#states), and the
    // out-count-weighted overall H rides along as a constant column
    // (per-state products snapped, LONG-summed). Everything after the
    // lag window is arithmetic on a ≤25-row frame.
    Q(
      "q385_transition_entropy",
      (s, dir) => {
        val wU = Window.partitionBy("user_id").orderBy("us", "event_id")
        val cnt = Tables.load(s, dir, "events")
          .select(col("user_id"),
            unix_micros(col("ts").cast("timestamp")).as("us"),
            col("event_id"), col("event_type"))
          .withColumn("nxt", lead("event_type", 1).over(wU))
          .where(col("nxt").isNotNull)
          .groupBy(col("event_type").as("src"), col("nxt").as("dst"))
          .agg(count(lit(1)).as("c"))
        val no = cnt.groupBy("src").agg(sum("c").as("n_out"))
        val ns = no.agg(count(lit(1)).as("ns"))
        val terms = cnt.join(no, "src")
          .withColumn("p", col("c").cast("double") /
            col("n_out").cast("double"))
          .withColumn("t9",
            floor(-col("p") * log(col("p")) * 1e9 + 0.5).cast("long"))
          .groupBy("src")
          .agg(sum("t9").as("h9"), max("n_out").as("n_out"))
        val tot = terms.agg(sum("n_out").as("tn"))
        val wsum = terms.crossJoin(tot)
          .withColumn("w9",
            floor(col("n_out").cast("double") / col("tn").cast("double")
              * (col("h9").cast("double") / 1e9) * 1e9 + 0.5).cast("long"))
          .agg(sum("w9").as("ov9"))
        terms.crossJoin(ns).crossJoin(wsum)
          .select(col("src"), col("n_out"),
            Rounding.stableRound6(col("h9").cast("double") / 1e9)
              .as("entropy_nats"),
            Rounding.stableRound6(lit(1.0) -
              col("h9").cast("double") / 1e9 /
                log(col("ns").cast("double"))).as("predictability"),
            Rounding.stableRound6(col("ov9").cast("double") / 1e9)
              .as("overall_entropy"))
          .orderBy("src")
      },
      Some(s"""WITH tr AS (
             |  SELECT event_type AS src, nxt AS dst FROM (
             |    SELECT event_type, lead(event_type) OVER (
             |      PARTITION BY user_id
             |      ORDER BY epoch_us(ts::TIMESTAMP), event_id) AS nxt
             |    FROM events)
             |  WHERE nxt IS NOT NULL),
             |cnt AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS c
             |        FROM tr GROUP BY 1, 2),
             |no AS (SELECT src, CAST(sum(c) AS BIGINT) AS n_out
             |       FROM cnt GROUP BY 1),
             |ns AS (SELECT CAST(count(*) AS BIGINT) AS ns FROM no),
             |terms AS (
             |  SELECT cnt.src,
             |    CAST(sum(CAST(floor(-(c::DOUBLE / n_out::DOUBLE)
             |      * ln(c::DOUBLE / n_out::DOUBLE) * 1000000000.0 + 0.5)
             |      AS BIGINT)) AS BIGINT) AS h9,
             |    CAST(max(n_out) AS BIGINT) AS n_out
             |  FROM cnt JOIN no ON no.src = cnt.src
             |  GROUP BY cnt.src),
             |tot AS (SELECT CAST(sum(n_out) AS BIGINT) AS tn FROM terms),
             |ws AS (
             |  SELECT CAST(sum(CAST(floor(n_out::DOUBLE / tn::DOUBLE
             |    * (h9::DOUBLE / 1000000000.0) * 1000000000.0 + 0.5)
             |    AS BIGINT)) AS BIGINT) AS ov9
             |  FROM terms CROSS JOIN tot)
             |SELECT src, n_out,
             |  ${Rounding.duckSql("h9::DOUBLE / 1000000000.0")}
             |    AS entropy_nats,
             |  ${Rounding.duckSql(
                  "1.0 - h9::DOUBLE / 1000000000.0 / ln(ns::DOUBLE)")}
             |    AS predictability,
             |  ${Rounding.duckSql("ov9::DOUBLE / 1000000000.0")}
             |    AS overall_entropy
             |FROM terms CROSS JOIN ns CROSS JOIN ws
             |ORDER BY src""".stripMargin))
  )
}
