package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{PolyHash, Rounding}
import graft.io.Tables
import graft.ops.Text

/** Round-9 twenty-eighth wave: an AMS F₂ sketch with a self-audit
  * (q418), Matryoshka prefix-dimension recall (q419), the
  * Cochran-Armitage trend test (q420), and a two-regressor OLS with
  * the Durbin-Watson residual-autocorrelation statistic (q421).
  */
object ExtensionQueries70 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q418: AMS (Alon-Matias-Szegedy) F₂ sketch — the tug-of-war
    // estimator for the second frequency moment of the word
    // distribution: 15 independent ±1 hash signs (PolyHash-derived,
    // low digits uniformized), each estimator's Z_j = Σ_w sign_j(w)·c_w
    // an EXACT LONG, estimates Z_j² median-of-means'd as 5 groups × 3.
    // The median is picked on exact integer group SUMS (dividing by 3
    // is monotone, so median-of-sums = median-of-means — no fp compare
    // decides anything). Audited against the exact F₂ = Σc_w² the way
    // q210/q388 audit their sketches. The sketch state is 15 counters
    // regardless of vocabulary size — the point of AMS at 100 TB.
    Q(
      "q418_ams_f2_sketch",
      (s, dir) => {
        val wc = Tables.load(s, dir, "documents")
          .select(explode(Text.words(Text.clean(col("text")))).as("w"))
          .groupBy("w").agg(count(lit(1)).as("c"))
        val exact = wc.agg(count(lit(1)).as("vocab"),
          sum(col("c") * col("c")).as("f2_exact"))
        import s.implicits._
        val js = (0L until 15L).toDF("j")
        val h = PolyHash(concat(lit("ams"), col("j").cast("string"),
          lit("#"), col("w")))
        val z = wc.crossJoin(broadcast(js))
          .withColumn("sign",
            (h * h % lit(PolyHash.Mod) % lit(2L)) * 2L - 1L)
          .groupBy("j").agg(sum(col("sign") * col("c")).as("z"))
        val grp = z.groupBy(expr("j div 3").as("g"))
          .agg(sum(col("z") * col("z")).as("s3"))
        val med = grp
          .withColumn("rn", row_number().over(Window.orderBy("s3", "g")))
          .where(col("rn") === 3)
          .select(col("s3"))
        exact.crossJoin(broadcast(med))
          .select(col("vocab"), col("f2_exact"),
            lit(15L).as("n_estimators"),
            Rounding.stableRound6(col("s3").cast("double") / 3.0)
              .as("f2_estimate"),
            Rounding.stableRound6(
              abs(col("s3").cast("double") / 3.0
                - col("f2_exact").cast("double"))
                / col("f2_exact").cast("double")).as("rel_err"))
      },
      Some {
        val h = PolyHash.duckSql("'ams' || j::VARCHAR || '#' || w")
        s"""WITH toks0 AS (
           |  SELECT unnest(string_split(
           |    regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' ')) AS w
           |  FROM documents),
           |wc AS (
           |  SELECT w, CAST(count(*) AS BIGINT) AS c
           |  FROM toks0 WHERE w <> '' GROUP BY w),
           |exact AS (
           |  SELECT CAST(count(*) AS BIGINT) AS vocab,
           |    CAST(sum(c * c) AS BIGINT) AS f2_exact
           |  FROM wc),
           |js AS (SELECT CAST(unnest(range(15)) AS BIGINT) AS j),
           |z AS (
           |  SELECT j, CAST(sum((($h * $h % ${PolyHash.Mod} % 2) * 2 - 1)
           |    * c) AS BIGINT) AS z
           |  FROM wc CROSS JOIN js
           |  GROUP BY j),
           |grp AS (
           |  SELECT j // 3 AS g, CAST(sum(z * z) AS BIGINT) AS s3
           |  FROM z GROUP BY 1),
           |med AS (
           |  SELECT s3 FROM (
           |    SELECT s3, row_number() OVER (ORDER BY s3, g) AS rn
           |    FROM grp)
           |  WHERE rn = 3)
           |SELECT vocab, f2_exact, CAST(15 AS BIGINT) AS n_estimators,
           |  ${Rounding.duckSql("s3::DOUBLE / 3.0")} AS f2_estimate,
           |  ${Rounding.duckSql(
                "abs(s3::DOUBLE / 3.0 - f2_exact::DOUBLE) " +
                  "/ f2_exact::DOUBLE")} AS rel_err
           |FROM exact CROSS JOIN med""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q419: Matryoshka prefix-dimension recall — how much top-10
    // neighbor fidelity survives truncating embeddings to their first
    // 8/16/32/64 dims (the deployment question matryoshka-trained
    // embeddings exist to answer: a 8× cheaper index for how much
    // recall?). Ground truth = full-dim brute top-10 (the q48
    // reference pattern, 1e-6-snapped cosine + id tie-break); each
    // prefix re-ranks the same 16-query broadcast panel over sliced
    // vectors. Recall@10 is an exact match-count ratio. The full-dim
    // row must read exactly 1.0 — a built-in self-check.
    Q(
      "q419_matryoshka_recall",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val dims = Seq(8, 16, 32, 64)
        val truth = graft.ext.SimilaritySearch
          .bruteTopK(e.filter(col("vec_id") < 16), e, 10)
          .select(col("query_id"), col("neighbor_id"))
          .localCheckpoint()
        val nTruth = truth.count().toDouble
        val perDim = dims.map { d =>
          val sliced = e.select(col("vec_id"),
            slice(col("embedding"), 1, d).as("embedding"))
          graft.ext.SimilaritySearch
            .bruteTopK(sliced.filter(col("vec_id") < 16), sliced, 10)
            .select(col("query_id"), col("neighbor_id"))
            .join(truth, Seq("query_id", "neighbor_id"), "left_semi")
            .agg(count(lit(1)).as("n_matches"))
            .select(lit(d.toLong).as("dim"), col("n_matches"),
              Rounding.stableRound6(col("n_matches").cast("double")
                / lit(nTruth)).as("recall_at_10"))
        }
        perDim.reduce(_ unionAll _).orderBy("dim")
      },
      Some {
        def ranked(vExpr: String, d: Int): String =
          s"""SELECT $d AS dim, q.vec_id AS query_id,
             |    e.vec_id AS neighbor_id,
             |    row_number() OVER (PARTITION BY q.vec_id
             |      ORDER BY floor(list_cosine_similarity(
             |        ${vExpr.replace("X", "q")},
             |        ${vExpr.replace("X", "e")}) * 1000000 + 0.5)
             |        / 1000000 DESC, e.vec_id) AS rank
             |  FROM qs q CROSS JOIN es e
             |  WHERE q.vec_id <> e.vec_id""".stripMargin
        val branches = Seq(8, 16, 32, 64)
          .map(d => ranked(s"X.v[1:$d]", d))
          .mkString("\n  UNION ALL\n  ")
        s"""WITH es AS (
           |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |qs AS (SELECT * FROM es WHERE vec_id < 16),
           |truth AS (
           |  SELECT query_id, neighbor_id FROM (
           |  ${ranked("X.v[1:64]", 64)})
           |  WHERE rank <= 10),
           |cand AS (
           |  SELECT dim, query_id, neighbor_id FROM (
           |  $branches)
           |  WHERE rank <= 10),
           |nt AS (SELECT count(*)::DOUBLE AS n FROM truth)
           |SELECT CAST(dim AS BIGINT) AS dim,
           |  CAST(count(*) AS BIGINT) AS n_matches,
           |  ${Rounding.duckSql("count(*)::DOUBLE / any_value(nt.n)")}
           |    AS recall_at_10
           |FROM cand
           |JOIN truth USING (query_id, neighbor_id)
           |CROSS JOIN nt
           |GROUP BY dim
           |ORDER BY dim""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q420: Cochran-Armitage trend test — is the fulfilled-order rate
    // MONOTONICALLY associated with order priority (scores 1..5 parsed
    // from the priority label)? The z statistic is built entirely from
    // five exact integer sums (Σtᵢrᵢ, Σtᵢnᵢ, Σtᵢ²nᵢ, N, R) in one
    // fixed double sequence — unlike a per-pair Mann-Whitney this costs
    // one tiny groupBy at any scale. Emits per-priority rates plus the
    // shared z, χ², and trend direction.
    Q(
      "q420_cochran_armitage",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
          .select(substring(col("o_orderpriority"), 1, 1).cast("long")
            .as("t"),
            col("o_orderpriority").as("priority"),
            when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("pos"))
        val g = o.groupBy("priority", "t")
          .agg(count(lit(1)).as("n_i"), sum("pos").as("r_i"))
          .localCheckpoint()
        val tot = g.agg(sum("n_i").as("n"), sum("r_i").as("r"),
          sum(col("t") * col("r_i")).as("t1"),
          sum(col("t") * col("n_i")).as("t2"),
          sum(col("t") * col("t") * col("n_i")).as("t3"))
          .withColumn("pbar", col("r").cast("double") / col("n").cast("double"))
          .withColumn("u", col("t1").cast("double")
            - col("pbar") * col("t2").cast("double"))
          .withColumn("vr", col("pbar") * (lit(1.0) - col("pbar"))
            * (col("t3").cast("double") - col("t2").cast("double")
              * col("t2").cast("double") / col("n").cast("double")))
          .withColumn("z", col("u") / sqrt(col("vr")))
        g.crossJoin(broadcast(tot))
          .select(col("priority"), col("t").as("score"), col("n_i").as("n"),
            col("r_i").as("n_fulfilled"),
            Rounding.stableRound6(col("r_i").cast("double")
              / col("n_i").cast("double")).as("rate"),
            Rounding.stableRound6(col("z")).as("z_stat"),
            Rounding.stableRound6(col("z") * col("z")).as("chi2_stat"),
            when(col("z") > 0, lit("increasing"))
              .when(col("z") < 0, lit("decreasing"))
              .otherwise(lit("flat")).as("trend"))
          .orderBy("priority")
      },
      Some(s"""WITH o AS (
             |  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS t,
             |    o_orderpriority AS priority,
             |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
             |  FROM orders),
             |g AS (
             |  SELECT priority, t, CAST(count(*) AS BIGINT) AS n_i,
             |    CAST(sum(pos) AS BIGINT) AS r_i
             |  FROM o GROUP BY 1, 2),
             |tot AS (
             |  SELECT CAST(sum(n_i) AS BIGINT) AS n,
             |    CAST(sum(r_i) AS BIGINT) AS r,
             |    CAST(sum(t * r_i) AS BIGINT) AS t1,
             |    CAST(sum(t * n_i) AS BIGINT) AS t2,
             |    CAST(sum(t * t * n_i) AS BIGINT) AS t3
             |  FROM g),
             |st AS (
             |  SELECT *,
             |    (t1::DOUBLE - (r::DOUBLE / n::DOUBLE) * t2::DOUBLE)
             |    / sqrt((r::DOUBLE / n::DOUBLE)
             |      * (1.0 - r::DOUBLE / n::DOUBLE)
             |      * (t3::DOUBLE - t2::DOUBLE * t2::DOUBLE / n::DOUBLE))
             |      AS z
             |  FROM tot)
             |SELECT priority, t AS score, n_i AS n, r_i AS n_fulfilled,
             |  ${Rounding.duckSql("r_i::DOUBLE / n_i::DOUBLE")} AS rate,
             |  ${Rounding.duckSql("z")} AS z_stat,
             |  ${Rounding.duckSql("z * z")} AS chi2_stat,
             |  CASE WHEN z > 0 THEN 'increasing'
             |    WHEN z < 0 THEN 'decreasing' ELSE 'flat' END AS trend
             |FROM g CROSS JOIN st
             |ORDER BY priority""".stripMargin)),

    // ------------------------------------------------------------------
    // q421: two-regressor OLS + Durbin-Watson — daily revenue regressed
    // on its own lag and a linear trend, the autocorrelation-diagnosis
    // companion to q300's Ljung-Box. The 2×2 normal equations solve in
    // closed form from EXACT integer power sums (lag/trend/revenue
    // cross-products summed in decimal(38,0) — each element fits
    // BIGINT, the sf1 sums would not), so the coefficients are a fixed
    // double sequence on identical inputs in both engines. Residuals
    // snap to the 1e-3 cents grid before the DW/R² sums. Windows only
    // over the 30-row day domain.
    Q(
      "q421_dw_ols",
      (s, dir) => {
        val w = Window.orderBy("day")
        val daily = Tables.load(s, dir, "events")
          .where(col("event_type") === "purchase")
          .groupBy(to_date(col("ts")).as("day"))
          .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("y"))
          .withColumn("x1", lag("y", 1).over(w))
          .withColumn("t", row_number().over(w).cast("long"))
          .where(col("x1").isNotNull)
          .localCheckpoint()
        val sums = daily.agg(count(lit(1)).as("n"),
          sum("y").as("sy"), sum("x1").as("s1"), sum("t").as("s2"),
          sum((col("x1") * col("x1")).cast("decimal(38,0)")).as("s11"),
          sum((col("t") * col("t")).cast("decimal(38,0)")).as("s22"),
          sum((col("x1") * col("t")).cast("decimal(38,0)")).as("s12"),
          sum((col("x1") * col("y")).cast("decimal(38,0)")).as("s1y"),
          sum((col("t") * col("y")).cast("decimal(38,0)")).as("s2y"),
          sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"))
          .withColumn("nd", col("n").cast("double"))
          .withColumn("a11", col("s11").cast("double")
            - col("s1").cast("double") * col("s1").cast("double") / col("nd"))
          .withColumn("a22", col("s22").cast("double")
            - col("s2").cast("double") * col("s2").cast("double") / col("nd"))
          .withColumn("a12", col("s12").cast("double")
            - col("s1").cast("double") * col("s2").cast("double") / col("nd"))
          .withColumn("c1", col("s1y").cast("double")
            - col("s1").cast("double") * col("sy").cast("double") / col("nd"))
          .withColumn("c2", col("s2y").cast("double")
            - col("s2").cast("double") * col("sy").cast("double") / col("nd"))
          .withColumn("det", col("a11") * col("a22")
            - col("a12") * col("a12"))
          .withColumn("b1", (col("c1") * col("a22")
            - col("c2") * col("a12")) / col("det"))
          .withColumn("b2", (col("a11") * col("c2")
            - col("a12") * col("c1")) / col("det"))
          .withColumn("b0", col("sy").cast("double") / col("nd")
            - col("b1") * col("s1").cast("double") / col("nd")
            - col("b2") * col("s2").cast("double") / col("nd"))
          .withColumn("sst", col("syy").cast("double")
            - col("sy").cast("double") * col("sy").cast("double") / col("nd"))
        val res = daily.crossJoin(broadcast(
            sums.select("b0", "b1", "b2", "sst", "n")))
          .withColumn("e", floor((col("y").cast("double") - col("b0")
            - col("b1") * col("x1").cast("double")
            - col("b2") * col("t").cast("double")) * 1000.0 + 0.5) / 1000.0)
          .withColumn("e_prev", lag("e", 1).over(w))
        res.groupBy("n", "b0", "b1", "b2", "sst")
          .agg(sum(col("e") * col("e")).as("ssr"),
            sum(when(col("e_prev").isNotNull,
              (col("e") - col("e_prev")) * (col("e") - col("e_prev")))
              .otherwise(0.0)).as("dnum"))
          .select(col("n"),
            Rounding.stableRound6(col("b0")).as("intercept"),
            Rounding.stableRound6(col("b1")).as("beta_lag1"),
            Rounding.stableRound6(col("b2")).as("beta_trend"),
            Rounding.stableRound6(lit(1.0) - col("ssr") / col("sst"))
              .as("r_squared"),
            Rounding.stableRound6(col("dnum") / col("ssr")).as("dw_stat"))
      },
      Some(s"""WITH d0 AS (
             |  SELECT CAST(ts AS DATE) AS day,
             |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
             |      AS BIGINT) AS y
             |  FROM events WHERE event_type = 'purchase'
             |  GROUP BY 1),
             |daily AS (
             |  SELECT day, y,
             |    lag(y, 1) OVER (ORDER BY day) AS x1,
             |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
             |  FROM d0
             |  QUALIFY x1 IS NOT NULL),
             |sums AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(y) AS BIGINT) AS sy,
             |    CAST(sum(x1) AS BIGINT) AS s1,
             |    CAST(sum(t) AS BIGINT) AS s2,
             |    sum(x1 * x1) AS s11, sum(t * t) AS s22,
             |    sum(x1 * t) AS s12, sum(x1 * y) AS s1y,
             |    sum(t * y) AS s2y, sum(y * y) AS syy
             |  FROM daily),
             |co AS (
             |  SELECT *, n::DOUBLE AS nd,
             |    s11::DOUBLE - s1::DOUBLE * s1::DOUBLE / n::DOUBLE AS a11,
             |    s22::DOUBLE - s2::DOUBLE * s2::DOUBLE / n::DOUBLE AS a22,
             |    s12::DOUBLE - s1::DOUBLE * s2::DOUBLE / n::DOUBLE AS a12,
             |    s1y::DOUBLE - s1::DOUBLE * sy::DOUBLE / n::DOUBLE AS c1,
             |    s2y::DOUBLE - s2::DOUBLE * sy::DOUBLE / n::DOUBLE AS c2,
             |    syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n::DOUBLE AS sst
             |  FROM sums),
             |b AS (
             |  SELECT *,
             |    (c1 * a22 - c2 * a12) / (a11 * a22 - a12 * a12) AS b1,
             |    (a11 * c2 - a12 * c1) / (a11 * a22 - a12 * a12) AS b2
             |  FROM co),
             |b2 AS (
             |  SELECT *,
             |    sy::DOUBLE / nd - b1 * s1::DOUBLE / nd
             |      - b2 * s2::DOUBLE / nd AS b0
             |  FROM b),
             |res AS (
             |  SELECT daily.day,
             |    floor((daily.y::DOUBLE - b2.b0 - b2.b1 * daily.x1::DOUBLE
             |      - b2.b2 * daily.t::DOUBLE) * 1000.0 + 0.5) / 1000.0 AS e
             |  FROM daily CROSS JOIN b2),
             |rl AS (
             |  SELECT e, lag(e, 1) OVER (ORDER BY day) AS e_prev
             |  FROM res),
             |agg AS (
             |  SELECT sum(e * e) AS ssr,
             |    sum(CASE WHEN e_prev IS NOT NULL
             |      THEN (e - e_prev) * (e - e_prev) ELSE 0.0 END) AS dnum
             |  FROM rl)
             |SELECT n,
             |  ${Rounding.duckSql("b0")} AS intercept,
             |  ${Rounding.duckSql("b1")} AS beta_lag1,
             |  ${Rounding.duckSql("b2")} AS beta_trend,
             |  ${Rounding.duckSql("1.0 - ssr / sst")} AS r_squared,
             |  ${Rounding.duckSql("dnum / ssr")} AS dw_stat
             |FROM b2 CROSS JOIN agg""".stripMargin))
  )
}
