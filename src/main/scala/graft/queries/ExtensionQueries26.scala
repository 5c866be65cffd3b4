package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.Sampling
import graft.functions.Rounding
import graft.io.Tables
import graft.ops.Text

/** Round-8 continuation wave: sketch set-algebra (pairwise overlap via
  * HLL inclusion-exclusion, q225), temperature-scaled mixture weighting
  * (q226), t-closeness completing the privacy trio (q227), two-sample
  * Kolmogorov-Smirnov drift (q228), seasonal-naive MASE backtest (q229),
  * and the embedding dimension-energy audit (q230). Same contract as
  * every other module: each Spark pipeline pairs with DuckDB oracle SQL
  * replaying it.
  */
object ExtensionQueries26 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q225: pairwise vocab overlap via HLL set algebra — q150 computes
    // the exact source-pair vocabulary Jaccard with a word-level
    // self-join, which at 100 TB is a shuffle whose width is the corpus
    // vocabulary × source fan-out. The sketch path replaces it: ONE
    // distinct-vocab scan folds each source to a KB-sized HLL sketch
    // (hll_sketch_agg, lgK=12), and every pair statistic is then sketch
    // algebra on the 20-row frame — |A∪B| from a binary register merge
    // (hll_union), |A∩B| by inclusion-exclusion, Jaccard from the three
    // estimates. A P-source overlap matrix costs P² register merges of
    // 4 KB sketches instead of P² data joins. Estimates are approximate
    // by construction, so the GATE follows q206's self-audit discipline:
    // the exact common/jaccard (which the oracle replays with q150's
    // join) plus pinned-true tolerance booleans — lgK=12 is ~1.6%
    // relative 1-sigma per cardinality; inclusion-exclusion compounds
    // three of them, so the union gets a 5% bound and the derived
    // Jaccard an absolute 0.15 bound (both hold with >=3x margin on the
    // fixtures at both gated SFs; HLL register maxima are
    // merge-order-invariant, so the estimates are deterministic).
    Q(
      "q225_vocab_overlap_sketch",
      (s, dir) => {
        val sw = Tables.load(s, dir, "documents")
          .select(col("source"),
            explode(Text.words(Text.clean(col("text")))).as("word"))
          .distinct().localCheckpoint()
        val sk = sw.groupBy("source")
          .agg(hll_sketch_agg(col("word")).as("sk"),
            count(lit(1)).as("vocab"))
        val pairs = sk.select(col("source").as("sa"), col("sk").as("ska"),
            col("vocab").as("va"))
          .join(sk.select(col("source").as("sb"), col("sk").as("skb"),
            col("vocab").as("vb")), col("sa") < col("sb"))
          .select(col("sa"), col("sb"), col("va"), col("vb"),
            hll_sketch_estimate(col("ska")).as("ea"),
            hll_sketch_estimate(col("skb")).as("eb"),
            hll_sketch_estimate(hll_union(col("ska"), col("skb")))
              .as("eu"))
        val exact = sw.select(col("source").as("sa"), col("word"))
          .join(sw.select(col("source").as("sb"), col("word")), "word")
          .where(col("sa") < col("sb"))
          .groupBy("sa", "sb").agg(count(lit(1)).as("common"))
        val estJ = (col("ea") + col("eb") - col("eu")).cast("double") /
          col("eu").cast("double")
        val exactJ = col("common").cast("double") /
          (col("va") + col("vb") - col("common")).cast("double")
        pairs.join(exact, Seq("sa", "sb"))
          .select(col("sa"), col("sb"),
            col("common").cast("long").as("common"),
            Rounding.stableRound6(exactJ).as("jaccard"),
            (abs(col("eu").cast("double") /
              (col("va") + col("vb") - col("common")).cast("double") - 1.0)
              <= 0.05).as("union_ok"),
            (abs(estJ - exactJ) <= 0.15).as("jaccard_ok"))
          .orderBy("sa", "sb")
      },
      Some(s"""WITH sw AS (
             |  SELECT DISTINCT source, word FROM (
             |    SELECT source, unnest(list_filter(string_split(
             |      regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' '),
             |      w -> w <> '')) AS word
             |    FROM documents)),
             |sizes AS (SELECT source, count(*) AS vocab FROM sw GROUP BY 1),
             |inter AS (
             |  SELECT a.source AS sa, b.source AS sb, count(*) AS common
             |  FROM sw a JOIN sw b ON a.word = b.word AND a.source < b.source
             |  GROUP BY 1, 2)
             |SELECT sa, sb, CAST(common AS BIGINT) AS common,
             |  ${Rounding.duckSql("common::DOUBLE / (va.vocab + vb.vocab - common)")}
             |    AS jaccard,
             |  true AS union_ok, true AS jaccard_ok
             |FROM inter
             |JOIN sizes va ON va.source = sa
             |JOIN sizes vb ON vb.source = sb
             |ORDER BY sa, sb""".stripMargin)),

    // ------------------------------------------------------------------
    // q226: temperature-scaled mixture weights (UniMax/mT5 discipline) —
    // source sampling weights w_s ∝ size_s^τ with τ = 0.5: the standard
    // rebalance that upsamples small sources relative to proportional
    // mixing without inverting the order. The entire float surface is
    // pinned to the integer-grid discipline: sqrt of an exact integer
    // byte count is one correctly-rounded IEEE op (identical in both
    // engines), the normalized share is snapped to a 1e-9 grid
    // (share9, the stableRound construction), and the per-source doc
    // target + basis-point sampling rate are then EXACT integer
    // arithmetic on share9 — so the deterministic hash-sample keep set
    // (Sampling.bucket, the q55 splitter) is bit-reproducible across
    // engines and runs. Scale shape: one 20-row source agg + one
    // shuffle-free membership filter; no data-sized shuffle beyond the
    // source rollup.
    Q(
      "q226_temperature_mixture",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val tot = Window.partitionBy()
        val src = docs.groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("chars"))
          .withColumn("w", sqrt(col("chars").cast("double")))
          .withColumn("share9",
            floor(col("w") / sum(col("w")).over(tot) * lit(1000000000.0)
              + lit(0.5)).cast("long"))
          .withColumn("target_docs",
            expr("(200 * share9 + 500000000) div 1000000000"))
          .withColumn("rate_bp",
            least(lit(10000L), expr("(target_docs * 10000) div n_docs")))
        val kept = docs
          .join(broadcast(src.select(col("source"), col("rate_bp"))), "source")
          .where(Sampling.bucket(col("doc_id"), "mix26") < col("rate_bp"))
          .groupBy("source").agg(count(lit(1)).as("achieved_docs"))
        src.join(kept, Seq("source"), "left")
          .withColumn("achieved_docs",
            coalesce(col("achieved_docs"), lit(0L)))
          .select(col("source"), col("n_docs").cast("long").as("n_docs"),
            col("chars").cast("long").as("chars"),
            (col("share9").cast("double") / lit(1000000000.0)).as("share"),
            col("target_docs").cast("long").as("target_docs"),
            col("achieved_docs").cast("long").as("achieved_docs"),
            Rounding.stableRound6(col("achieved_docs").cast("double") /
              sum(col("achieved_docs")).over(tot).cast("double"))
              .as("achieved_share"))
          .orderBy("source")
      },
      Some(s"""WITH src AS (
             |  SELECT source, count(*) AS n_docs, sum(n_chars) AS chars
             |  FROM documents GROUP BY 1),
             |sh AS (
             |  SELECT source, n_docs, chars,
             |    CAST(floor(sqrt(chars::DOUBLE) /
             |      sum(sqrt(chars::DOUBLE)) OVER () * 1000000000 + 0.5)
             |      AS BIGINT) AS share9
             |  FROM src),
             |t AS (
             |  SELECT *, (200 * share9 + 500000000) // 1000000000
             |      AS target_docs
             |  FROM sh),
             |r AS (
             |  SELECT *, least(10000, (target_docs * 10000) // n_docs)
             |      AS rate_bp
             |  FROM t),
             |kept AS (
             |  SELECT d.source, count(*) AS achieved_docs
             |  FROM documents d JOIN r ON d.source = r.source
             |  WHERE ${Sampling.bucketDuckSql("mix26", "d.doc_id")} < r.rate_bp
             |  GROUP BY 1)
             |SELECT r.source, CAST(r.n_docs AS BIGINT) AS n_docs,
             |  CAST(r.chars AS BIGINT) AS chars,
             |  r.share9::DOUBLE / 1000000000 AS share,
             |  CAST(r.target_docs AS BIGINT) AS target_docs,
             |  CAST(coalesce(kept.achieved_docs, 0) AS BIGINT)
             |    AS achieved_docs,
             |  ${Rounding.duckSql(
                  "coalesce(kept.achieved_docs, 0)::DOUBLE / " +
                  "sum(coalesce(kept.achieved_docs, 0)) OVER ()")}
             |    AS achieved_share
             |FROM r LEFT JOIN kept ON r.source = kept.source
             |ORDER BY r.source""".stripMargin)),

    // ------------------------------------------------------------------
    // q227: t-closeness audit — completes the privacy trio: q177 bounds
    // group SIZES (k-anonymity), q211 bounds distinct sensitive VALUES
    // per group (l-diversity); t-closeness bounds the group's sensitive
    // DISTRIBUTION's distance from the global one, closing the skewness
    // attack l-diversity misses (a group can hold l distinct values yet
    // be 99% one of them). Distance = total variation (the categorical
    // EMD): tvd_g = ½ Σ_l |p_gl − p_l|, computed as an EXACT integer
    // numerator Σ_l |n_gl·N − n_l·n_g| over the densified (source ×
    // lang) frame (absent langs contribute |0 − n_l·n_g|), with ONE
    // final division onto the stableRound6 grid — the t_ok comparison
    // runs on the already-rounded grid point so it cannot flip across
    // engines. Scale shape: one grouped count + two broadcast-sized
    // rollups; the densify cross join is |groups| × |sensitive domain|.
    Q(
      "q227_t_closeness",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val gl = d.groupBy("source", "lang").agg(count(lit(1)).as("n_gl"))
        val g = d.groupBy("source").agg(count(lit(1)).as("n_g"))
        val l = d.groupBy("lang").agg(count(lit(1)).as("n_l"))
        val n = d.agg(count(lit(1)).as("n"))
        val dense = g.crossJoin(broadcast(l)).crossJoin(broadcast(n))
          .join(gl, Seq("source", "lang"), "left")
          .withColumn("n_gl", coalesce(col("n_gl"), lit(0L)))
        dense.groupBy("source")
          .agg(first("n_g").as("n_g"), first("n").as("n"),
            sum(abs(col("n_gl") * col("n") - col("n_l") * col("n_g")))
              .as("num"))
          .withColumn("tvd", Rounding.stableRound6(
            col("num").cast("double") /
              (lit(2.0) * col("n_g").cast("double") *
                col("n").cast("double"))))
          .select(col("source"), col("n_g").cast("long").as("n_g"),
            col("tvd"), (col("tvd") <= 0.2).as("t_ok"))
          .orderBy("source")
      },
      Some(s"""WITH gl AS (
             |  SELECT source, lang, count(*) AS n_gl
             |  FROM documents GROUP BY 1, 2),
             |g AS (SELECT source, count(*) AS n_g FROM documents GROUP BY 1),
             |l AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY 1),
             |n AS (SELECT count(*) AS n FROM documents),
             |dense AS (
             |  SELECT g.source, l.lang, g.n_g, l.n_l, n.n,
             |    coalesce(gl.n_gl, 0) AS n_gl
             |  FROM g CROSS JOIN l CROSS JOIN n
             |  LEFT JOIN gl ON gl.source = g.source AND gl.lang = l.lang),
             |agg AS (
             |  SELECT source, any_value(n_g) AS n_g, any_value(n) AS n,
             |    sum(abs(n_gl * n - n_l * n_g)) AS num
             |  FROM dense GROUP BY source)
             |SELECT source, CAST(n_g AS BIGINT) AS n_g,
             |  ${Rounding.duckSql("num::DOUBLE / (2.0 * n_g::DOUBLE * n::DOUBLE)")}
             |    AS tvd,
             |  ${Rounding.duckSql("num::DOUBLE / (2.0 * n_g::DOUBLE * n::DOUBLE)")}
             |    <= 0.2 AS t_ok
             |FROM agg
             |ORDER BY source""".stripMargin)),

    // ------------------------------------------------------------------
    // q228: two-sample Kolmogorov-Smirnov drift — the nonparametric
    // member of the drift family (q143 PSI needs binning, q141
    // chi-square needs categories; KS compares the full empirical CDFs).
    // D = max_x |F_click(x) − F_purchase(x)| computed EXACTLY as integer
    // arithmetic: counts per integer-cents value, cumulative counts c1,
    // c2 over the sorted value grid, numerator max|c1·n2 − c2·n1| as
    // LONG, one final division onto the stableRound6 grid. The
    // unpartitioned window runs over the DISTINCT price grid — bounded
    // by the value domain, not the row count (the q203 distinct-value-
    // frame discipline); a 100 TB run keeps the same shape because the
    // support of a 2-decimal price column is domain-bounded.
    Q(
      "q228_ks_drift",
      (s, dir) => {
        val w = Window.orderBy("cents")
        val tot = Window.partitionBy()
        val cdf = Tables.load(s, dir, "events")
          .where(col("event_type").isin("click", "purchase"))
          .select(col("event_type"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
          .groupBy("cents")
          .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
              .as("dc"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("dp"))
          .withColumn("c1", sum("dc").over(w))
          .withColumn("c2", sum("dp").over(w))
          .withColumn("n1", sum("dc").over(tot))
          .withColumn("n2", sum("dp").over(tot))
          .withColumn("num", abs(col("c1") * col("n2") - col("c2") * col("n1")))
        cdf.orderBy(col("num").desc, col("cents").asc).limit(1)
          .select(col("n1").cast("long").as("n_click"),
            col("n2").cast("long").as("n_purchase"),
            col("num").cast("long").as("ks_num"),
            Rounding.stableRound6(col("num").cast("double") /
              (col("n1").cast("double") * col("n2").cast("double")))
              .as("ks"),
            (col("cents").cast("double") / 100.0).as("at_value"))
      },
      Some(s"""WITH cents AS (
             |  SELECT event_type,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |  FROM events WHERE event_type IN ('click', 'purchase')),
             |grid AS (
             |  SELECT cents,
             |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS dc,
             |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS dp
             |  FROM cents GROUP BY 1),
             |cdf AS (
             |  SELECT cents,
             |    sum(dc) OVER (ORDER BY cents) AS c1,
             |    sum(dp) OVER (ORDER BY cents) AS c2,
             |    sum(dc) OVER () AS n1,
             |    sum(dp) OVER () AS n2
             |  FROM grid)
             |SELECT CAST(n1 AS BIGINT) AS n_click,
             |  CAST(n2 AS BIGINT) AS n_purchase,
             |  CAST(abs(c1 * n2 - c2 * n1) AS BIGINT) AS ks_num,
             |  ${Rounding.duckSql("abs(c1 * n2 - c2 * n1)::DOUBLE / (n1::DOUBLE * n2::DOUBLE)")}
             |    AS ks,
             |  cents::DOUBLE / 100.0 AS at_value
             |FROM cdf
             |ORDER BY abs(c1 * n2 - c2 * n1) DESC, cents ASC
             |LIMIT 1""".stripMargin)),

    // ------------------------------------------------------------------
    // q229: seasonal-naive MASE backtest — forecast-quality evaluation
    // for the daily revenue series: the lag-7 seasonal-naive forecast's
    // MAE scaled by the lag-1 naive MAE (Hyndman's MASE, the
    // scale-free standard for comparing across series). All error sums
    // are integer CENTS (the q142/q148 discipline); the lags are
    // CALENDAR joins on day−7 / day−1 (not row lags), so a missing day
    // drops its comparison instead of silently comparing across a gap.
    // mase < 1 ⇔ the seasonal forecast beats naive persistence. Scale
    // shape: one grouped day rollup, then two self-joins co-partitioned
    // on (event_type) over the 30-row-per-type day frame.
    Q(
      "q229_mase_backtest",
      (s, dir) => {
        val daily = Tables.load(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long"))
            .as("cents"))
          .localCheckpoint()
        val s7 = daily.select(col("event_type").as("et7"),
          col("day").as("day7"), col("cents").as("cents7"))
        val s1 = daily.select(col("event_type").as("et1"),
          col("day").as("day1"), col("cents").as("cents1"))
        val err7 = daily
          .join(s7, col("event_type") === col("et7") &&
            col("day") === date_add(col("day7"), 7))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_eval"),
            sum(abs(col("cents") - col("cents7"))).as("sum_abs_err7"))
        val err1 = daily
          .join(s1, col("event_type") === col("et1") &&
            col("day") === date_add(col("day1"), 1))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_naive"),
            sum(abs(col("cents") - col("cents1"))).as("sum_abs_err1"))
        err7.join(err1, "event_type")
          .select(col("event_type"), col("n_eval").cast("long").as("n_eval"),
            col("n_naive").cast("long").as("n_naive"),
            col("sum_abs_err7").cast("long").as("sum_abs_err7"),
            col("sum_abs_err1").cast("long").as("sum_abs_err1"),
            Rounding.stableRound6(
              (col("sum_abs_err7") * col("n_naive")).cast("double") /
                (col("sum_abs_err1") * col("n_eval")).cast("double"))
              .as("mase"))
          .orderBy("event_type")
      },
      Some(s"""WITH daily AS (
             |  SELECT event_type, ts::DATE AS day,
             |    sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
             |  FROM events GROUP BY 1, 2),
             |e7 AS (
             |  SELECT a.event_type, count(*) AS n_eval,
             |    sum(abs(a.cents - b.cents)) AS sum_abs_err7
             |  FROM daily a JOIN daily b
             |    ON a.event_type = b.event_type AND a.day = b.day + 7
             |  GROUP BY 1),
             |e1 AS (
             |  SELECT a.event_type, count(*) AS n_naive,
             |    sum(abs(a.cents - b.cents)) AS sum_abs_err1
             |  FROM daily a JOIN daily b
             |    ON a.event_type = b.event_type AND a.day = b.day + 1
             |  GROUP BY 1)
             |SELECT e7.event_type, CAST(n_eval AS BIGINT) AS n_eval,
             |  CAST(n_naive AS BIGINT) AS n_naive,
             |  CAST(sum_abs_err7 AS BIGINT) AS sum_abs_err7,
             |  CAST(sum_abs_err1 AS BIGINT) AS sum_abs_err1,
             |  ${Rounding.duckSql("(sum_abs_err7 * n_naive)::DOUBLE / (sum_abs_err1 * n_eval)::DOUBLE")}
             |    AS mase
             |FROM e7 JOIN e1 ON e7.event_type = e1.event_type
             |ORDER BY e7.event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // q230: embedding dimension-energy audit — per-dimension mean and
    // variance over the corpus plus the cumulative energy (variance
    // mass) of each dimension prefix: the Matryoshka/PCA-style check of
    // how much signal the first d' of 64 dimensions retain, run before
    // truncating stored embeddings (a 4x storage cut at 100 TB if the
    // prefix carries the mass). Shape: ONE posexplode scan folding to a
    // 64-row (dim) frame — sums and sums-of-squares of float32 values
    // widened exactly to double; cross-engine summation-order drift
    // (~1e-13) is absorbed by the stableRound6 grid, and the cumulative
    // ratio runs over 1e-6-grid LONG variance units (exact window
    // arithmetic, the q204 discipline).
    Q(
      "q230_dim_energy",
      (s, dir) => {
        val w = Window.orderBy("dim")
        val tot = Window.partitionBy()
        Tables.load(s, dir, "embeddings")
          .select(posexplode(col("embedding")).as(Seq("dim", "x")))
          .select(col("dim").cast("long").as("dim"),
            col("x").cast("double").as("x"))
          .groupBy("dim")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"),
            sum(col("x") * col("x")).as("sxx"))
          .withColumn("mean", col("sx") / col("n").cast("double"))
          .withColumn("variance",
            (col("sxx") - col("sx") * col("sx") / col("n").cast("double")) /
              col("n").cast("double"))
          .withColumn("var_u",
            floor(col("variance") * lit(1000000.0) + lit(0.5)).cast("long"))
          .select(col("dim"),
            Rounding.stableRound6(col("mean")).as("mean"),
            Rounding.stableRound6(col("variance")).as("variance"),
            Rounding.stableRound6(
              sum("var_u").over(w).cast("double") /
                sum("var_u").over(tot).cast("double")).as("cum_energy"))
          .orderBy("dim")
      },
      Some(s"""WITH x AS (
             |  SELECT i::BIGINT AS dim, embedding[i + 1]::DOUBLE AS x
             |  FROM embeddings, (SELECT unnest(range(64)) AS i)),
             |agg AS (
             |  SELECT dim, count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx
             |  FROM x GROUP BY 1),
             |v AS (
             |  SELECT dim, sx / n AS mean,
             |    (sxx - sx * sx / n) / n AS variance
             |  FROM agg),
             |u AS (
             |  SELECT dim, mean, variance,
             |    CAST(floor(variance * 1000000 + 0.5) AS BIGINT) AS var_u
             |  FROM v)
             |SELECT dim, ${Rounding.duckSql("mean")} AS mean,
             |  ${Rounding.duckSql("variance")} AS variance,
             |  ${Rounding.duckSql(
                  "(sum(var_u) OVER (ORDER BY dim))::DOUBLE / " +
                  "(sum(var_u) OVER ())::DOUBLE")} AS cum_energy
             |FROM u
             |ORDER BY dim""".stripMargin)))
}
