package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{PolyHash, Rounding}
import graft.io.Tables
import graft.ops.Text

/** Round-9 twenty-second wave: n-gram coverage scaling (q394), Hurst
  * R/S long-memory analysis (q395), vocabulary-truncation OOV sweep
  * (q396), and cross-table order reconciliation (q397).
  */
object ExtensionQueries64 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q394: coverage scaling — how much of the eval set's bigram
    // vocabulary does a train slice cover at 25% / 50% / 100% of the
    // training corpus (doc_id-prefix slices, the acquisition order)?
    // The diminishing-returns curve that prices additional crawl data
    // against eval coverage (q361 measures novelty of the marginal
    // doc; this measures what the EVAL SET sees). Split is the q55
    // deterministic hash; slices are integer doc_id cuts; coverage is
    // a distinct-bigram semi-join — three conditional aggregates over
    // one shared gram frame, corpus scanned once per side.
    Q(
      "q394_coverage_scaling",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .withColumn("bucket",
            (PolyHash(concat(lit("cov#"), col("doc_id").cast("string")))
              * PolyHash(concat(lit("cov#"), col("doc_id").cast("string")))
              % 1000000007L) % 10000L)
        val mx = docs.agg((max("doc_id") + 1L).as("mx"))
        def bigrams(df: org.apache.spark.sql.DataFrame) = df
          .withColumn("ws", Text.words(Text.clean(col("text"))))
          .where(size(col("ws")) >= 2)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(ws) - 1), " +
              "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"))
            .as("g"))
        val evalG = bigrams(docs.where(col("bucket") < 2000L))
          .select("g").distinct().localCheckpoint()
        val trainG = bigrams(docs.where(col("bucket") >= 2000L))
          .crossJoin(mx)
          .select(col("g"), expr("doc_id * 4 div mx").as("quartile"))
          .groupBy("g").agg(min("quartile").as("first_q"))
          .localCheckpoint()
        val tot = evalG.agg(count(lit(1)).as("n_eval_bigrams"))
        val cov = evalG.join(trainG, Seq("g"), "left")
          .agg(sum(when(col("first_q") <= 0L, 1L).otherwise(0L)).as("c25"),
            sum(when(col("first_q") <= 1L, 1L).otherwise(0L)).as("c50"),
            sum(when(col("first_q").isNotNull, 1L).otherwise(0L))
              .as("c100"))
        cov.crossJoin(tot)
          .selectExpr("n_eval_bigrams",
            "stack(3, 25L, c25, 50L, c50, 100L, c100) " +
              "AS (train_pct, covered)")
          .select(col("train_pct"), col("covered"), col("n_eval_bigrams"),
            Rounding.stableRound6(col("covered").cast("double") /
              col("n_eval_bigrams").cast("double")).as("coverage"))
          .orderBy("train_pct")
      },
      Some(s"""WITH docs AS (
             |  SELECT doc_id, text,
             |    ((${PolyHash.duckSql("'cov#' || doc_id::VARCHAR")}
             |      * ${PolyHash.duckSql("'cov#' || doc_id::VARCHAR")})
             |      % 1000000007) % 10000 AS bucket
             |  FROM documents),
             |mx AS (SELECT max(doc_id) + 1 AS mx FROM documents),
             |toks AS (
             |  SELECT doc_id, bucket, list_filter(string_split(
             |    regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' '),
             |    w -> w <> '') AS ws
             |  FROM docs),
             |bg AS (
             |  SELECT doc_id, bucket,
             |    unnest(list_transform(range(1, len(ws)),
             |      i -> ws[i] || ' ' || ws[i+1])) AS g
             |  FROM toks WHERE len(ws) >= 2),
             |ev AS (SELECT DISTINCT g FROM bg WHERE bucket < 2000),
             |tr AS (
             |  SELECT g, min(doc_id * 4 // mx) AS first_q
             |  FROM bg CROSS JOIN mx
             |  WHERE bucket >= 2000
             |  GROUP BY g),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_eval_bigrams
             |        FROM ev),
             |cov AS (
             |  SELECT
             |    CAST(sum(CASE WHEN first_q <= 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS c25,
             |    CAST(sum(CASE WHEN first_q <= 1 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS c50,
             |    CAST(sum(CASE WHEN first_q IS NOT NULL THEN 1 ELSE 0 END)
             |      AS BIGINT) AS c100
             |  FROM ev LEFT JOIN tr USING (g)),
             |u AS (
             |  SELECT 25 AS train_pct, c25 AS covered FROM cov
             |  UNION ALL SELECT 50, c50 FROM cov
             |  UNION ALL SELECT 100, c100 FROM cov)
             |SELECT CAST(train_pct AS BIGINT) AS train_pct,
             |  CAST(covered AS BIGINT) AS covered, n_eval_bigrams,
             |  ${Rounding.duckSql(
                  "covered::DOUBLE / n_eval_bigrams::DOUBLE")}
             |    AS coverage
             |FROM u CROSS JOIN tot
             |ORDER BY train_pct""".stripMargin)),

    // ------------------------------------------------------------------
    // q395: Hurst exponent by rescaled-range analysis — does daily
    // revenue have long memory (H > 0.5: trending; H < 0.5: mean-
    // reverting)? Days are split into consecutive blocks of w ∈
    // {10, 15, 30}; per block R/S = (range of the zero-anchored
    // running deviation series) / population σ, both from exact LONG
    // cent sums; mean ln(R/S) per w snaps to the grid; the Hurst
    // slope is the 3-point least-squares fit against ln w in one
    // fixed-order expression. Everything past the daily groupBy is
    // windows over the 30-row day frame (value-domain-sized).
    Q(
      "q395_hurst_rs",
      (s, dir) => {
        val daily = Tables.load(s, dir, "events")
          .where(col("event_type") === "purchase")
          .groupBy(dayofmonth(col("ts").cast("timestamp")).as("day"))
          .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("x"))
          .localCheckpoint()
        val ws = Seq(10, 15, 30)
        val perW = ws.map { w =>
          val blk = daily.withColumn("blk", expr(s"(day - 1) div $w"))
            .where(col("blk") < lit(30 / w))
          val stats = blk.groupBy("blk")
            .agg(count(lit(1)).as("n"), sum("x").as("sx"),
              sum(col("x") * col("x")).as("qx"))
            .withColumn("mu", col("sx").cast("double") / col("n").cast("double"))
            .withColumn("sd", sqrt(
              col("qx").cast("double") / col("n").cast("double")
                - (col("sx").cast("double") / col("n").cast("double"))
                * (col("sx").cast("double") / col("n").cast("double"))))
          val wRun = Window.partitionBy("blk").orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val dev = blk.join(stats.select("blk", "mu", "sd"), "blk")
            .withColumn("d3",
              floor((col("x").cast("double") - col("mu")) * 1e3 + 0.5)
                .cast("long"))
            .withColumn("cum", sum("d3").over(wRun))
          dev.groupBy("blk")
            .agg(max("cum").as("mxc"), min("cum").as("mnc"),
              max("sd").as("sd"))
            .withColumn("r",
              (greatest(col("mxc"), lit(0L)) - least(col("mnc"), lit(0L)))
                .cast("double") / 1e3)
            .withColumn("lrs9",
              floor(log(col("r") / col("sd")) * 1e9 + 0.5).cast("long"))
            .agg(count(lit(1)).as("n_blocks"), sum("lrs9").as("sl9"))
            .select(lit(w.toLong).as("w"), col("n_blocks"),
              (col("sl9").cast("double") / col("n_blocks").cast("double")
                / 1e9).as("mean_ln_rs"))
        }.reduce(_ unionAll _)
        // 3-point least squares of mean_ln_rs against ln w — a 3-row
        // frame; the slope is the Hurst estimate
        val pts = perW
          .withColumn("lx", log(col("w").cast("double")))
        val fit = pts.agg(count(lit(1)).cast("double").as("m"),
            sum("lx").as("sx"), sum("mean_ln_rs").as("sy"),
            sum(col("lx") * col("lx")).as("sxx"),
            sum(col("lx") * col("mean_ln_rs")).as("sxy"))
          .select(((col("m") * col("sxy") - col("sx") * col("sy")) /
            (col("m") * col("sxx") - col("sx") * col("sx")))
            .as("hurst"))
        pts.crossJoin(fit)
          .select(col("w"), col("n_blocks"),
            Rounding.stableRound6(col("mean_ln_rs")).as("mean_ln_rs"),
            Rounding.stableRound6(col("hurst")).as("hurst_slope"))
          .orderBy("w")
      },
      Some {
        val blocks = Seq(10, 15, 30).map(w =>
          s"SELECT $w AS w, (day - 1) // $w AS blk, day, x FROM daily " +
            s"WHERE (day - 1) // $w < ${30 / w}").mkString(
          "\n  UNION ALL ")
        s"""WITH daily AS (
           |  SELECT EXTRACT(day FROM ts::TIMESTAMP) AS day,
           |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
           |      AS BIGINT) AS x
           |  FROM events WHERE event_type = 'purchase'
           |  GROUP BY 1),
           |blk AS (
           |  $blocks),
           |st AS (
           |  SELECT w, blk, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(x) AS BIGINT) AS sx,
           |    CAST(sum(x * x) AS BIGINT) AS qx
           |  FROM blk GROUP BY 1, 2),
           |ms AS (
           |  SELECT w, blk, sx::DOUBLE / n::DOUBLE AS mu,
           |    sqrt(qx::DOUBLE / n::DOUBLE
           |      - (sx::DOUBLE / n::DOUBLE) * (sx::DOUBLE / n::DOUBLE))
           |      AS sd
           |  FROM st),
           |dev AS (
           |  SELECT blk.w, blk.blk,
           |    sum(CAST(floor((x::DOUBLE - mu) * 1000 + 0.5) AS BIGINT))
           |      OVER (PARTITION BY blk.w, blk.blk ORDER BY day
           |        ROWS UNBOUNDED PRECEDING) AS cum,
           |    sd
           |  FROM blk JOIN ms ON ms.w = blk.w AND ms.blk = blk.blk),
           |rs AS (
           |  SELECT w, blk,
           |    (greatest(max(cum), 0) - least(min(cum), 0))::DOUBLE
           |      / 1000.0 AS r,
           |    max(sd) AS sd
           |  FROM dev GROUP BY 1, 2),
           |pw AS (
           |  SELECT w, CAST(count(*) AS BIGINT) AS n_blocks,
           |    CAST(sum(CAST(floor(ln(r / sd) * 1000000000.0 + 0.5)
           |      AS BIGINT)) AS BIGINT) AS sl9
           |  FROM rs GROUP BY 1),
           |pts AS (
           |  SELECT w, n_blocks,
           |    sl9::DOUBLE / n_blocks::DOUBLE / 1000000000.0
           |      AS mean_ln_rs,
           |    ln(w::DOUBLE) AS lx
           |  FROM pw),
           |fit AS (
           |  SELECT (count(*)::DOUBLE * sum(lx * mean_ln_rs)
           |      - sum(lx) * sum(mean_ln_rs))
           |    / (count(*)::DOUBLE * sum(lx * lx) - sum(lx) * sum(lx))
           |    AS hurst
           |  FROM pts)
           |SELECT CAST(w AS BIGINT) AS w, n_blocks,
           |  ${Rounding.duckSql("mean_ln_rs")} AS mean_ln_rs,
           |  ${Rounding.duckSql("hurst")} AS hurst_slope
           |FROM pts CROSS JOIN fit
           |ORDER BY w""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q396: vocabulary-truncation sweep — the OOV token-mass rate at
    // vocab caps 1k/5k/10k: what fraction of running text a model
    // with a top-k word vocabulary cannot express. Word ranks come
    // from ext.Ranking.withGlobalRank over the vocab frame (the
    // two-pass distributed rank — q283's discipline, never a
    // single-partition window), the sweep is three conditional sums
    // over one ranked frame, and all masses are exact LONGs.
    Q(
      "q396_vocab_truncation_sweep",
      (s, dir) => {
        val vocab = Tables.load(s, dir, "documents")
          .select(explode(Text.words(Text.clean(col("text")))).as("w"))
          .groupBy("w").agg(count(lit(1)).as("c"))
        val ranked = graft.ext.Ranking.withGlobalRank(
          vocab, Seq(col("c").desc, col("w")))
        val agg = ranked.agg(count(lit(1)).as("vocab_size"),
          sum("c").as("total_mass"),
          sum(when(col("global_rank") <= 1000L, col("c")).otherwise(0L))
            .as("m1k"),
          sum(when(col("global_rank") <= 5000L, col("c")).otherwise(0L))
            .as("m5k"),
          sum(when(col("global_rank") <= 10000L, col("c")).otherwise(0L))
            .as("m10k"))
        agg.selectExpr("vocab_size", "total_mass",
            "stack(3, 1000L, m1k, 5000L, m5k, 10000L, m10k) " +
              "AS (vocab_cap, kept_mass)")
          .select(col("vocab_cap"),
            least(col("vocab_cap"), col("vocab_size")).as("vocab_kept"),
            col("kept_mass"), col("total_mass"),
            Rounding.stableRound6(lit(1.0) -
              col("kept_mass").cast("double") /
                col("total_mass").cast("double")).as("oov_rate"))
          .orderBy("vocab_cap")
      },
      Some(s"""WITH toks AS (
             |  SELECT unnest(list_filter(string_split(
             |    regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' '),
             |    w -> w <> '')) AS w
             |  FROM documents),
             |vocab AS (
             |  SELECT w, CAST(count(*) AS BIGINT) AS c
             |  FROM toks GROUP BY w),
             |ranked AS (
             |  SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rk
             |  FROM vocab),
             |agg AS (
             |  SELECT CAST(count(*) AS BIGINT) AS vocab_size,
             |    CAST(sum(c) AS BIGINT) AS total_mass,
             |    CAST(sum(CASE WHEN rk <= 1000 THEN c ELSE 0 END)
             |      AS BIGINT) AS m1k,
             |    CAST(sum(CASE WHEN rk <= 5000 THEN c ELSE 0 END)
             |      AS BIGINT) AS m5k,
             |    CAST(sum(CASE WHEN rk <= 10000 THEN c ELSE 0 END)
             |      AS BIGINT) AS m10k
             |  FROM ranked),
             |u AS (
             |  SELECT 1000 AS vocab_cap, m1k AS kept_mass FROM agg
             |  UNION ALL SELECT 5000, m5k FROM agg
             |  UNION ALL SELECT 10000, m10k FROM agg)
             |SELECT CAST(vocab_cap AS BIGINT) AS vocab_cap,
             |  CAST(least(vocab_cap, vocab_size) AS BIGINT)
             |    AS vocab_kept,
             |  CAST(kept_mass AS BIGINT) AS kept_mass, total_mass,
             |  ${Rounding.duckSql(
                  "1.0 - kept_mass::DOUBLE / total_mass::DOUBLE")}
             |    AS oov_rate
             |FROM u CROSS JOIN agg
             |ORDER BY vocab_cap""".stripMargin)),

    // ------------------------------------------------------------------
    // q397: order reconciliation — the cross-table DQ check finance
    // actually runs: does o_totalprice match the order's lineitem
    // revenue? Per order the ratio total/Σ(extendedprice) lands in a
    // named bucket (plus 'no_lineitems' for orphaned orders via a
    // left join); the profile shows this fixture's header and detail
    // are NOT reconciled (ratios 0.004–286) — which is exactly what
    // the check exists to surface. Exact integer cents; one keyed
    // join + a bucket-domain agg.
    Q(
      "q397_order_reconciliation",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"),
            floor(col("o_totalprice") * 100 + 0.5).cast("long")
              .as("total_cents"))
        val l = Tables.load(s, dir, "lineitem")
          .groupBy(col("l_orderkey").as("o_orderkey"))
          .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
            .as("li_cents"))
        val r = o.join(l, Seq("o_orderkey"), "left")
          .withColumn("bucket",
            when(col("li_cents").isNull, "0_no_lineitems")
              .when(col("total_cents").cast("double") /
                col("li_cents").cast("double") < 0.5, "1_lt_half")
              .when(col("total_cents").cast("double") /
                col("li_cents").cast("double") < 0.9, "2_low")
              .when(col("total_cents").cast("double") /
                col("li_cents").cast("double") <= 1.1, "3_reconciled")
              .when(col("total_cents").cast("double") /
                col("li_cents").cast("double") <= 2.0, "4_high")
              .otherwise("5_gt_double"))
        val tot = r.agg(count(lit(1)).as("n_orders"))
        r.groupBy("bucket").agg(count(lit(1)).as("n"))
          .crossJoin(tot)
          .select(col("bucket"), col("n"),
            Rounding.stableRound6(col("n").cast("double") /
              col("n_orders").cast("double")).as("share"))
          .orderBy("bucket")
      },
      Some(s"""WITH l AS (
             |  SELECT l_orderkey AS o_orderkey,
             |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
             |      AS BIGINT)) AS BIGINT) AS li_cents
             |  FROM lineitem GROUP BY 1),
             |r AS (
             |  SELECT CASE
             |    WHEN li_cents IS NULL THEN '0_no_lineitems'
             |    WHEN tc::DOUBLE / li_cents::DOUBLE < 0.5
             |      THEN '1_lt_half'
             |    WHEN tc::DOUBLE / li_cents::DOUBLE < 0.9 THEN '2_low'
             |    WHEN tc::DOUBLE / li_cents::DOUBLE <= 1.1
             |      THEN '3_reconciled'
             |    WHEN tc::DOUBLE / li_cents::DOUBLE <= 2.0 THEN '4_high'
             |    ELSE '5_gt_double' END AS bucket
             |  FROM (
             |    SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             |      AS tc, li_cents
             |    FROM orders LEFT JOIN l USING (o_orderkey))),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_orders FROM r)
             |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
             |  ${Rounding.duckSql(
                  "count(*)::DOUBLE / n_orders::DOUBLE")} AS share
             |FROM r CROSS JOIN tot
             |GROUP BY bucket, n_orders
             |ORDER BY bucket""".stripMargin))
  )
}
