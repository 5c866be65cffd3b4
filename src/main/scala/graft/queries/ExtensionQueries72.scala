package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.{PolyHash, Rounding}
import graft.io.Tables
import DriverSide._

/** Round-9 thirtieth wave: Shapley data valuation (q426), interrupted
  * time series (q427), negative-binomial count-model fitting (q428),
  * and a sampled join-cardinality estimator bake-off (q429).
  */
object ExtensionQueries72 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q426: EXACT Shapley data valuation of the five sales regions —
    // each region's fair marginal contribution to HIGH-VOLUME PART
    // COVERAGE (the characteristic function v(S) = |distinct parts that
    // received a quantity ≥ 45 line from a customer in S|; the quantity
    // floor keeps the bipartite relation sparse enough that coalitions
    // genuinely overlap and differ — full-corpus coverage is saturated
    // and Shapley degenerates to 1/n). v(S) reduces to a bitmask
    // aggregation: each part carries a 5-bit region-membership mask, so
    // every v(S) is one filtered sum over the ≤2⁵-row (mask → count)
    // frame and the full 2⁵-subset Shapley sum is exact (weights
    // s!(n−1−s)!/n! from a factorial table — no sampling). The corpus-
    // sized work is ONE distinct (region, part) aggregation; everything
    // after is a 32-row frame. Efficiency axiom Σφ = v(full) is the
    // built-in audit (Extension72Spec).
    Q(
      "q426_shapley_coverage",
      (s, dir) => {
        val wl = Tables.load(s, dir, "lineitem")
          .where(col("l_quantity") >= 45)
          .join(Tables.load(s, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables.load(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.load(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.load(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("r_name").as("grp"), col("l_partkey").as("w"))
          .distinct()
        val langs = wl.select("grp").distinct()
          .collectBounded("group domain").map(_.getString(0)).sorted
        val n = langs.length
        val idx = langs.zipWithIndex.toMap
        val idxDf = {
          import s.implicits._
          langs.toSeq.map(l => (l, 1L << idx(l))).toDF("grp", "bit")
        }
        val maskCnt = wl.join(broadcast(idxDf), "grp")
          .groupBy("w").agg(sum("bit").as("mask"))
          .groupBy("mask").agg(count(lit(1)).as("cnt"))
          .collectBounded("mask histogram").map(r => (r.getLong(0), r.getLong(1)))
        def v(sMask: Long): Long =
          maskCnt.filter { case (m, _) => (m & sMask) != 0L }
            .map(_._2).sum
        val fac = Array(1L, 1L, 2L, 6L, 24L, 120L, 720L)
        val full = v((1L << n) - 1)
        import s.implicits._
        langs.map { l =>
          val i = idx(l)
          var phi = 0.0
          (0 until (1 << n)).foreach { sm =>
            if ((sm & (1 << i)) == 0) {
              val ps = Integer.bitCount(sm)
              val w = fac(ps).toDouble * fac(n - 1 - ps).toDouble /
                fac(n).toDouble
              phi += w * (v(sm | (1L << i)) - v(sm)).toDouble
            }
          }
          (l, v(1L << i),
            math.floor(phi * 1e6 + 0.5) / 1e6,
            math.floor(phi / full.toDouble * 1e6 + 0.5) / 1e6)
        }.toSeq
          .toDF("region", "solo_parts", "shapley_parts", "shapley_share")
          .orderBy("region")
      },
      Some("""WITH wl AS (
             |  SELECT DISTINCT r_name AS grp, l_partkey AS w
             |  FROM lineitem
             |  JOIN orders ON o_orderkey = l_orderkey
             |  JOIN customer ON c_custkey = o_custkey
             |  JOIN nation ON n_nationkey = c_nationkey
             |  JOIN region ON r_regionkey = n_regionkey
             |  WHERE l_quantity >= 45),
             |li AS (
             |  SELECT grp, CAST(1 << (row_number() OVER (ORDER BY grp)
             |    - 1) AS BIGINT) AS bit
             |  FROM (SELECT DISTINCT grp FROM wl)),
             |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM li),
             |mc AS (
             |  SELECT mask, CAST(count(*) AS BIGINT) AS cnt FROM (
             |    SELECT w, CAST(sum(bit) AS BIGINT) AS mask
             |    FROM wl JOIN li USING (grp) GROUP BY w)
             |  GROUP BY mask),
             |subs AS (
             |  SELECT CAST(unnest(range(1 << (SELECT n FROM nn)))
             |    AS BIGINT) AS sm),
             |v AS (
             |  SELECT sm, CAST(coalesce(sum(cnt) FILTER (
             |    WHERE (mask & sm) <> 0), 0) AS BIGINT) AS vv
             |  FROM subs CROSS JOIN mc GROUP BY sm),
             |fl AS (SELECT [1, 1, 2, 6, 24, 120, 720] AS f),
             |shap AS (
             |  SELECT li.grp, li.bit,
             |    sum((f[bit_count(v0.sm) + 1]::DOUBLE
             |      * f[(n - 1 - bit_count(v0.sm)) + 1]::DOUBLE
             |      / f[n + 1]::DOUBLE)
             |      * (v1.vv - v0.vv)::DOUBLE) AS phi
             |  FROM li CROSS JOIN nn CROSS JOIN fl
             |  JOIN v v0 ON (v0.sm & li.bit) = 0
             |  JOIN v v1 ON v1.sm = v0.sm + li.bit
             |  GROUP BY li.grp, li.bit, n),
             |solo AS (
             |  SELECT li.grp, v.vv AS solo_parts
             |  FROM li JOIN v ON v.sm = li.bit),
             |fullv AS (
             |  SELECT vv AS fv FROM v
             |  WHERE sm = (1 << (SELECT n FROM nn)) - 1)
             |SELECT shap.grp AS region, solo.solo_parts,
             |  floor(phi * 1000000 + 0.5) / 1000000 AS shapley_parts,
             |  floor(phi / fv::DOUBLE * 1000000 + 0.5) / 1000000
             |    AS shapley_share
             |FROM shap
             |JOIN solo ON solo.grp = shap.grp
             |CROSS JOIN fullv
             |ORDER BY shap.grp""".stripMargin)),

    // ------------------------------------------------------------------
    // q427: interrupted time series — the level/slope-change reading a
    // causal analyst takes when an intervention lands mid-series: split
    // the 30-day revenue series at its midpoint, fit y = a + b·t to
    // each segment from EXACT integer power sums (the q421 closed
    // form), and report both fits plus the level jump at the boundary
    // (post intercept+slope extrapolated vs pre) and the slope change.
    // All doubles come from one fixed op sequence on exact sums.
    Q(
      "q427_interrupted_ts",
      (s, dir) => {
        val daily = Tables.load(s, dir, "events")
          .where(col("event_type") === "purchase")
          .groupBy(to_date(col("ts")).as("day"))
          .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("y"))
        val d0 = daily.agg(min("day").as("day0"),
          count(lit(1)).as("nd"))
        val seg = daily.crossJoin(broadcast(d0))
          .withColumn("t", datediff(col("day"), col("day0")).cast("long"))
          .withColumn("post", col("t") >= expr("nd div 2"))
        val sums = seg.groupBy("post").agg(count(lit(1)).as("n"),
            sum("t").as("st"), sum("y").as("sy"),
            sum((col("t") * col("t")).cast("decimal(38,0)")).as("stt"),
            sum((col("t") * col("y")).cast("decimal(38,0)")).as("sty"))
          .withColumn("nd2", col("n").cast("double"))
          .withColumn("b1", (col("sty").cast("double")
            - col("st").cast("double") * col("sy").cast("double")
              / col("nd2"))
            / (col("stt").cast("double") - col("st").cast("double")
              * col("st").cast("double") / col("nd2")))
          .withColumn("b0", col("sy").cast("double") / col("nd2")
            - col("b1") * col("st").cast("double") / col("nd2"))
        val pre = sums.where(!col("post"))
          .select(col("b0").as("pre_b0"), col("b1").as("pre_b1"))
        val post = sums.where(col("post"))
          .select(col("b0").as("post_b0"), col("b1").as("post_b1"))
        pre.crossJoin(post).crossJoin(broadcast(d0))
          .withColumn("cut", expr("nd div 2").cast("double"))
          .select(
            col("cut").cast("long").as("intervention_t"),
            Rounding.stableRound6(col("pre_b0")).as("pre_intercept"),
            Rounding.stableRound6(col("pre_b1")).as("pre_slope"),
            Rounding.stableRound6(col("post_b0")).as("post_intercept"),
            Rounding.stableRound6(col("post_b1")).as("post_slope"),
            Rounding.stableRound6(
              (col("post_b0") + col("post_b1") * col("cut"))
                - (col("pre_b0") + col("pre_b1") * col("cut")))
              .as("level_change_at_cut"),
            Rounding.stableRound6(col("post_b1") - col("pre_b1"))
              .as("slope_change"))
      },
      Some(s"""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS day,
             |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
             |      AS BIGINT) AS y
             |  FROM events WHERE event_type = 'purchase'
             |  GROUP BY 1),
             |d0 AS (SELECT min(day) AS day0,
             |  CAST(count(*) AS BIGINT) AS nd FROM daily),
             |seg AS (
             |  SELECT datediff('day', day0, day) AS t, y,
             |    datediff('day', day0, day) >= nd // 2 AS post, nd
             |  FROM daily CROSS JOIN d0),
             |sums AS (
             |  SELECT post, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(t) AS BIGINT) AS st,
             |    CAST(sum(y) AS BIGINT) AS sy,
             |    sum(t * t) AS stt, sum(t * y) AS sty
             |  FROM seg GROUP BY post),
             |fit AS (
             |  SELECT post,
             |    (sty::DOUBLE - st::DOUBLE * sy::DOUBLE / n::DOUBLE)
             |      / (stt::DOUBLE - st::DOUBLE * st::DOUBLE / n::DOUBLE)
             |      AS b1,
             |    sy::DOUBLE / n::DOUBLE
             |      - ((sty::DOUBLE - st::DOUBLE * sy::DOUBLE / n::DOUBLE)
             |        / (stt::DOUBLE - st::DOUBLE * st::DOUBLE
             |          / n::DOUBLE)) * st::DOUBLE / n::DOUBLE AS b0
             |  FROM sums),
             |cut AS (SELECT (nd // 2)::DOUBLE AS c,
             |  CAST(nd // 2 AS BIGINT) AS ct FROM d0)
             |SELECT ct AS intervention_t,
             |  ${Rounding.duckSql("pre.b0")} AS pre_intercept,
             |  ${Rounding.duckSql("pre.b1")} AS pre_slope,
             |  ${Rounding.duckSql("post.b0")} AS post_intercept,
             |  ${Rounding.duckSql("post.b1")} AS post_slope,
             |  ${Rounding.duckSql(
                  "(post.b0 + post.b1 * c) - (pre.b0 + pre.b1 * c)")}
             |    AS level_change_at_cut,
             |  ${Rounding.duckSql("post.b1 - pre.b1")} AS slope_change
             |FROM (SELECT * FROM fit WHERE NOT post) pre
             |CROSS JOIN (SELECT * FROM fit WHERE post) post
             |CROSS JOIN cut""".stripMargin)),

    // ------------------------------------------------------------------
    // q428: negative-binomial method-of-moments fit — count-model
    // selection for daily event volumes: per event type the exact
    // mean/variance of the 30 daily counts, the MoM parameters
    // r = m²/(v−m), p = m/v, and the dispersion index v/m. Types whose
    // variance does not exceed the mean (Poisson-compatible) emit NULL
    // parameters through an explicit CASE. Pairs with q320's formal
    // dispersion TEST: this one fits the model the test motivates.
    Q(
      "q428_negbin_fit",
      (s, dir) => {
        val dc = Tables.load(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("c"))
        val g = dc.groupBy("event_type").agg(count(lit(1)).as("nd"),
            sum("c").as("sc"), sum(col("c") * col("c")).as("scc"))
          .withColumn("m", col("sc").cast("double") / col("nd").cast("double"))
          .withColumn("v", col("scc").cast("double")
            / col("nd").cast("double") - col("m") * col("m"))
        g.select(col("event_type"), col("nd").as("n_days"),
            Rounding.stableRound6(col("m")).as("mean_daily"),
            Rounding.stableRound6(col("v")).as("var_daily"),
            Rounding.stableRound6(col("v") / col("m"))
              .as("dispersion_index"),
            when(col("v") > col("m"), Rounding.stableRound6(
              col("m") * col("m") / (col("v") - col("m"))))
              .otherwise(lit(null).cast("double")).as("nb_r"),
            when(col("v") > col("m"), Rounding.stableRound6(
              col("m") / col("v")))
              .otherwise(lit(null).cast("double")).as("nb_p"),
            (col("v") > col("m")).as("overdispersed"))
          .orderBy("event_type")
      },
      Some(s"""WITH dc AS (
             |  SELECT event_type, CAST(ts AS DATE) AS day,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2),
             |g AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS nd,
             |    CAST(sum(c) AS BIGINT) AS sc,
             |    CAST(sum(c * c) AS BIGINT) AS scc
             |  FROM dc GROUP BY 1),
             |m AS (
             |  SELECT *, sc::DOUBLE / nd::DOUBLE AS mm,
             |    scc::DOUBLE / nd::DOUBLE
             |      - (sc::DOUBLE / nd::DOUBLE) * (sc::DOUBLE / nd::DOUBLE)
             |      AS vv
             |  FROM g)
             |SELECT event_type, nd AS n_days,
             |  ${Rounding.duckSql("mm")} AS mean_daily,
             |  ${Rounding.duckSql("vv")} AS var_daily,
             |  ${Rounding.duckSql("vv / mm")} AS dispersion_index,
             |  CASE WHEN vv > mm THEN
             |    ${Rounding.duckSql("mm * mm / (vv - mm)")}
             |    ELSE NULL END AS nb_r,
             |  CASE WHEN vv > mm THEN ${Rounding.duckSql("mm / vv")}
             |    ELSE NULL END AS nb_p,
             |  vv > mm AS overdispersed
             |FROM m
             |ORDER BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // q429: sampled join-cardinality estimation bake-off — the two
    // textbook samplers for |orders ⋈ lineitem| with their real error
    // behavior: (a) UNIVERSE sampling (both sides keep the SAME 1/16
    // hash slice of the join key — sampled sides still join, scale by
    // 16) vs (b) independent BERNOULLI row sampling at 1/16 per side
    // (matches survive with probability 1/256, scale by 256 — high
    // variance, the known weakness). Both estimates and the exact
    // count, with relative errors — universe sampling must land far
    // closer. The audit shape mirrors q375/q388: sketch next to exact.
    Q(
      "q429_sampled_join_estimate",
      (s, dir) => {
        val hK = PolyHash(concat(lit("uj#"), col("o_orderkey").cast("string")))
        val hKL = PolyHash(concat(lit("uj#"), col("l_orderkey").cast("string")))
        val hO = PolyHash(concat(lit("bo#"), col("o_orderkey").cast("string")))
        val hL = PolyHash(concat(lit("bl#"), col("l_orderkey").cast("string"),
          lit("#"), col("l_linenumber").cast("string")))
        val o = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"),
            (hK * hK % lit(PolyHash.Mod) % lit(16L) === 0L).as("u_keep"),
            (hO * hO % lit(PolyHash.Mod) % lit(16L) === 0L).as("b_keep"))
        val l = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"),
            (hKL * hKL % lit(PolyHash.Mod) % lit(16L) === 0L).as("u_keep_l"),
            (hL * hL % lit(PolyHash.Mod) % lit(16L) === 0L).as("b_keep_l"))
        val j = o.join(l, col("o_orderkey") === col("l_orderkey"))
        val agg = j.agg(count(lit(1)).as("exact"),
          sum(when(col("u_keep") && col("u_keep_l"), 1L).otherwise(0L))
            .as("u_pairs"),
          sum(when(col("b_keep") && col("b_keep_l"), 1L).otherwise(0L))
            .as("b_pairs"))
        agg.selectExpr(
            "stack(2, " +
              "'universe', u_pairs, 16L, u_pairs * 16L, exact, " +
              "'bernoulli', b_pairs, 256L, b_pairs * 256L, exact) " +
              "AS (sampler, sample_pairs, scale, estimate, exact_pairs)")
          .withColumn("rel_err", Rounding.stableRound6(
            (col("estimate") - col("exact_pairs")).cast("double")
              / col("exact_pairs").cast("double")))
          .orderBy("sampler")
      },
      Some {
        val hK = PolyHash.duckSql("'uj#' || o_orderkey::VARCHAR")
        val hKL = PolyHash.duckSql("'uj#' || l_orderkey::VARCHAR")
        val hO = PolyHash.duckSql("'bo#' || o_orderkey::VARCHAR")
        val hL = PolyHash.duckSql(
          "'bl#' || l_orderkey::VARCHAR || '#' || l_linenumber::VARCHAR")
        s"""WITH o AS (
           |  SELECT o_orderkey,
           |    $hK * $hK % ${PolyHash.Mod} % 16 = 0 AS u_keep,
           |    $hO * $hO % ${PolyHash.Mod} % 16 = 0 AS b_keep
           |  FROM orders),
           |l AS (
           |  SELECT l_orderkey,
           |    $hKL * $hKL % ${PolyHash.Mod} % 16 = 0 AS u_keep_l,
           |    $hL * $hL % ${PolyHash.Mod} % 16 = 0 AS b_keep_l
           |  FROM lineitem),
           |j AS (
           |  SELECT CAST(count(*) AS BIGINT) AS exact,
           |    CAST(sum(CASE WHEN u_keep AND u_keep_l THEN 1 ELSE 0 END)
           |      AS BIGINT) AS u_pairs,
           |    CAST(sum(CASE WHEN b_keep AND b_keep_l THEN 1 ELSE 0 END)
           |      AS BIGINT) AS b_pairs
           |  FROM o JOIN l ON l_orderkey = o_orderkey),
           |u AS (
           |  SELECT 'universe' AS sampler, u_pairs AS sample_pairs,
           |    CAST(16 AS BIGINT) AS scale,
           |    u_pairs * 16 AS estimate, exact AS exact_pairs
           |  FROM j
           |  UNION ALL
           |  SELECT 'bernoulli', b_pairs, CAST(256 AS BIGINT),
           |    b_pairs * 256, exact
           |  FROM j)
           |SELECT sampler, sample_pairs, scale,
           |  CAST(estimate AS BIGINT) AS estimate, exact_pairs,
           |  ${Rounding.duckSql(
                "(estimate - exact_pairs)::DOUBLE / exact_pairs::DOUBLE")}
           |    AS rel_err
           |FROM u
           |ORDER BY sampler""".stripMargin
      })
  )
}
