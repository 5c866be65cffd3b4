package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.SimilaritySearch
import graft.functions.{Rounding, VectorFunctions}
import graft.io.Tables

/** Round-8 eleventh continuation wave: clustering-quality silhouette
  * (q301), Kneser-Ney smoothed bigram probabilities (q302), the
  * Nelson-Aalen cumulative hazard (q303), and an energy-distance
  * two-sample test over embedding classes (q304). Same contract as
  * every other module: each Spark pipeline pairs with DuckDB oracle
  * SQL replaying it.
  */
object ExtensionQueries36 {

  private val SampPerLabel = 64

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q301: per-label silhouette score against label centroids (the
    // "simplified silhouette" — a(i) = distance to OWN centroid, b(i) =
    // distance to the nearest OTHER centroid) using cosine distance.
    // The q190 purity gate says how often the majority label wins a
    // cluster; silhouette says how SEPARATED the classes actually are —
    // the embedding-quality number a curation pipeline reads before
    // trusting label-balanced sampling. Full silhouette is O(N²)
    // pairwise; the centroid form is one broadcast of L centroids and a
    // single pass — the only shape that survives 100 TB (same argument
    // as q123, whose snapped-centroid discipline this reuses: centroid
    // dims are round6'd and cast to REAL so both engines score against
    // byte-identical centroids; per-row cosine is snapped before the
    // a/b compare).
    Q(
      "q301_silhouette",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val dim = SimilaritySearch.deriveDim(e, "embedding")
        val avgs = (0 until dim).map(i =>
          avg(element_at(col("embedding"), i + 1)).as(s"c_$i"))
        val rows = e.groupBy("label").agg(avgs.head, avgs.tail: _*)
          .collect()
        require(rows.length <= 10000,
          s"label cardinality ${rows.length} too high for a centroid " +
            "silhouette (driver collects one centroid per label)")
        def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
        val cents = rows.map { r =>
          (r.getInt(0),
            (0 until dim).map(i => r6(r.getDouble(i + 1)).toFloat).toArray)
        }
        import s.implicits._
        val cdf = cents.toSeq.toDF("clabel", "cv")
        val d = e.crossJoin(broadcast(cdf))
          .withColumn("dist", lit(1.0) - Rounding.stableRound6(
            VectorFunctions.cosineSim(col("embedding"), col("cv"))))
        val ab = d.groupBy("vec_id", "label")
          .agg(max(when(col("clabel") === col("label"), col("dist")))
            .as("a"),
            min(when(col("clabel") =!= col("label"), col("dist")))
              .as("b"))
        val sil = ab.select(col("label"),
          when(greatest(col("a"), col("b")) === 0.0, lit(0.0))
            .otherwise(Rounding.stableRound6(
              (col("b") - col("a")) / greatest(col("a"), col("b"))))
            .as("sil"))
        sil.groupBy("label")
          .agg(count(lit(1)).as("n_vectors"),
            Rounding.stableRound6(avg("sil")).as("mean_silhouette"),
            Rounding.stableRound6(
              avg(when(col("sil") > 0.0, 1.0).otherwise(0.0)))
              .as("pos_share"))
          .orderBy("label")
      },
      Some {
        val meanList = (1 to Tables.EmbeddingDim)
          .map(j => "CAST(CAST(floor(avg(v[" + j + "]) * 1000000 + 0.5)" +
            " / 1000000 AS REAL) AS DOUBLE)")
          .mkString("[", ", ", "]")
        s"""WITH e AS (
           |  SELECT vec_id, label, embedding::DOUBLE[] AS v
           |  FROM embeddings),
           |c AS (
           |  SELECT label AS clabel, $meanList AS cv FROM e
           |  GROUP BY label),
           |d AS (
           |  SELECT vec_id, label, clabel,
           |    1.0 - floor(list_cosine_similarity(e.v, c.cv)
           |      * 1000000 + 0.5)/1000000 AS dist
           |  FROM e, c),
           |ab AS (
           |  SELECT vec_id, label,
           |    max(CASE WHEN clabel = label THEN dist END) AS a,
           |    min(CASE WHEN clabel <> label THEN dist END) AS b
           |  FROM d GROUP BY vec_id, label),
           |sil AS (
           |  SELECT label,
           |    CASE WHEN greatest(a, b) = 0.0 THEN 0.0
           |    ELSE floor((b - a)/greatest(a, b)*1000000.0+0.5)/1000000.0
           |    END AS sil
           |  FROM ab)
           |SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
           |  ${Rounding.duckSql("avg(sil)")} AS mean_silhouette,
           |  ${Rounding.duckSql(
              "avg(CASE WHEN sil > 0.0 THEN 1.0 ELSE 0.0 END)")}
           |    AS pos_share
           |FROM sil GROUP BY label ORDER BY label""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q302: interpolated Kneser-Ney bigram probabilities for the top-20
    // corpus bigrams — the smoothing the n-gram-LM family (q94 unigram,
    // q110 add-one bigram surprisal) was missing, and the one actually
    // used for LM-data quality scoring: continuation counts (how many
    // DISTINCT contexts a word follows/precedes) rather than raw
    // frequency. With observed bigrams c12 ≥ 1 > d = 0.75 the
    // discounted term needs no max(); every input is an integer count
    // off two keyed aggregations of the bigram table, so P_KN is one
    // fixed-shape double expression both engines evaluate identically:
    // (c12−0.75)/c1 + (0.75·N1+(w1·)/c1)·(N1+(·w2)/T).
    Q(
      "q302_kneser_ney",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .withColumn("ws",
            graft.ops.Text.words(graft.ops.Text.clean(col("text"))))
          .where(size(col("ws")) >= 2)
        val bi = docs.select(expr(
          "explode(transform(sequence(1, size(ws) - 1), " +
            "i -> struct(element_at(ws, i) AS w1, " +
            "element_at(ws, i + 1) AS w2)))").as("b"))
          .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
        // r14 opt (guide §2.4/§5): the bigram-count frame feeds FOUR
        // consumers (c1, n1b, the scalar total, and the final join) —
        // un-materialized, each re-ran the corpus scan + explode +
        // (w1,w2) shuffle (plan audit: 8 parquet scans before, 1 after).
        // localCheckpoint pins the vocabulary-sized aggregate once;
        // counts are unchanged integers so p_kn is bit-identical.
        val cnt = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
          .localCheckpoint()
        val c1 = cnt.groupBy("w1")
          .agg(sum("c12").as("c1"), count(lit(1)).as("n1f"))
        val n1b = cnt.groupBy("w2").agg(count(lit(1)).as("n1b"))
        val t = cnt.agg(count(lit(1)).as("tt"))
        cnt.join(c1, "w1").join(n1b, "w2").crossJoin(broadcast(t))
          .select(col("w1"), col("w2"), col("c12"),
            Rounding.stableRound6(
              (col("c12").cast("double") - lit(0.75)) /
                col("c1").cast("double") +
                (lit(0.75) * col("n1f").cast("double") /
                  col("c1").cast("double")) *
                  (col("n1b").cast("double") / col("tt").cast("double")))
              .as("p_kn"))
          .orderBy(col("c12").desc, col("w1"), col("w2"))
          .limit(20)
      },
      Some(s"""WITH toks AS (
             |  SELECT doc_id, list_filter(string_split(
             |    regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' '),
             |    w -> w <> '') AS ws
             |  FROM documents),
             |bi AS (
             |  SELECT unnest(list_transform(range(1, len(ws)),
             |    i -> {'w1': ws[i], 'w2': ws[i+1]}), recursive := true)
             |  FROM toks WHERE len(ws) >= 2),
             |cnt AS (
             |  SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
             |c1t AS (
             |  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
             |    count(*) AS n1f
             |  FROM cnt GROUP BY 1),
             |n1bt AS (SELECT w2, count(*) AS n1b FROM cnt GROUP BY 1),
             |tt AS (SELECT count(*) AS tt FROM cnt)
             |SELECT w1, w2, CAST(c12 AS BIGINT) AS c12,
             |  ${Rounding.duckSql(
                "(c12::DOUBLE - 0.75) / c1::DOUBLE + " +
                "(0.75 * n1f::DOUBLE / c1::DOUBLE) * " +
                "(n1b::DOUBLE / tt::DOUBLE)")} AS p_kn
             |FROM cnt JOIN c1t USING (w1) JOIN n1bt USING (w2)
             |CROSS JOIN tt
             |ORDER BY c12 DESC, w1, w2 LIMIT 20""".stripMargin)),

    // ------------------------------------------------------------------
    // q303: Nelson-Aalen cumulative hazard over the view→purchase
    // conversion durations — the estimator-side complement of the q261
    // Kaplan-Meier gate on the SAME duration grid (first view to first
    // at-or-after purchase, last event as censor time). H(t) = Σ d/n is
    // arithmetically friendlier than KM's product: each d/n term snaps
    // to one 1e-9-grid LONG and the cumulative sum is EXACT integer
    // window arithmetic — no log/exp walk at all. exp(−H) rides along
    // as the NA survival estimate (always ≥ the KM curve, a spec-level
    // invariant).
    Q(
      "q303_nelson_aalen",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts").cast("timestamp")).as("t"))
        val perUser = e.groupBy("user_id")
          .agg(min(when(col("event_type") === "view", col("t"))).as("tv"),
            max("t").as("tlast"))
          .where(col("tv").isNotNull)
        val durs = perUser
          .join(e.where(col("event_type") === "purchase")
            .select(col("user_id"), col("t").as("pt")),
            Seq("user_id"), "left")
          .groupBy("user_id")
          .agg(first("tv").as("tv"), first("tlast").as("tlast"),
            min(when(col("pt") >= col("tv"), col("pt"))).as("tp"))
          .select(
            when(col("tp").isNotNull, lit(1L)).otherwise(lit(0L))
              .as("event"),
            (coalesce(col("tp"), col("tlast")) - col("tv")).as("dur_us"))
          .withColumn("t_days", expr("dur_us div 86400000000"))
        val grid = durs.groupBy("t_days")
          .agg(sum("event").as("d"), count(lit(1)).as("cnt"))
        val wPrev = Window.orderBy("t_days")
          .rowsBetween(Window.unboundedPreceding, -1)
        val wCum = Window.orderBy("t_days")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = Window.partitionBy()
        grid
          .withColumn("n_risk",
            sum("cnt").over(tot) - coalesce(sum("cnt").over(wPrev), lit(0L)))
          .withColumn("h9",
            floor(col("d").cast("double") / col("n_risk").cast("double") *
              lit(1000000000.0) + lit(0.5)).cast("long"))
          .withColumn("cum9", sum("h9").over(wCum))
          .where(col("d") > 0)
          .select(col("t_days").cast("long").as("t_days"),
            col("n_risk").cast("long").as("n_risk"),
            col("d").cast("long").as("d"),
            Rounding.stableRound6(
              col("cum9").cast("double") / lit(1000000000.0))
              .as("cum_hazard"),
            Rounding.stableRound6(
              exp(-col("cum9").cast("double") / lit(1000000000.0)))
              .as("na_survival"))
          .orderBy("t_days")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type,
             |    epoch_us(ts::TIMESTAMP) AS t
             |  FROM events),
             |pu AS (
             |  SELECT user_id,
             |    min(CASE WHEN event_type = 'view' THEN t END) AS tv,
             |    max(t) AS tlast
             |  FROM e GROUP BY user_id HAVING tv IS NOT NULL),
             |durs AS (
             |  SELECT pu.user_id,
             |    CASE WHEN min(CASE WHEN p.t >= pu.tv THEN p.t END)
             |      IS NOT NULL THEN 1 ELSE 0 END AS event,
             |    (coalesce(min(CASE WHEN p.t >= pu.tv THEN p.t END),
             |      any_value(pu.tlast)) - any_value(pu.tv))
             |      // 86400000000 AS t_days
             |  FROM pu LEFT JOIN
             |    (SELECT user_id, t FROM e WHERE event_type = 'purchase') p
             |    USING (user_id)
             |  GROUP BY pu.user_id),
             |grid AS (
             |  SELECT t_days, sum(event) AS d, count(*) AS cnt
             |  FROM durs GROUP BY t_days),
             |walk AS (
             |  SELECT t_days, d,
             |    sum(cnt) OVER () - coalesce(sum(cnt) OVER (
             |      ORDER BY t_days
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |      0) AS n_risk
             |  FROM grid),
             |haz AS (
             |  SELECT t_days, d, n_risk,
             |    sum(CAST(floor(d::DOUBLE / n_risk::DOUBLE
             |      * 1000000000.0 + 0.5) AS BIGINT)) OVER (
             |      ORDER BY t_days
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS cum9
             |  FROM walk)
             |SELECT CAST(t_days AS BIGINT) AS t_days,
             |  CAST(n_risk AS BIGINT) AS n_risk, CAST(d AS BIGINT) AS d,
             |  floor(cum9::DOUBLE / 1000000000.0 * 1000000.0 + 0.5)
             |    / 1000000.0 AS cum_hazard,
             |  floor(exp(-(cum9::DOUBLE / 1000000000.0))
             |    * 1000000.0 + 0.5) / 1000000.0 AS na_survival
             |FROM haz WHERE d > 0 ORDER BY t_days""".stripMargin)),

    // ------------------------------------------------------------------
    // q304: energy-distance two-sample statistic between embedding
    // classes — E(X,Y) = 2·E‖X−Y‖ − E‖X−X′‖ − E‖Y−Y′‖, the
    // multivariate distribution-distance the drift family (q143/q228/
    // q278 are all univariate) was missing: it compares WHOLE embedding
    // distributions, not per-feature histograms. Pairwise terms are
    // quadratic, so the scale shape is a FIXED-SIZE deterministic
    // hash-sample per class (rank on (vec_id·2654435761) mod 1e9+7 —
    // SQL-replayable, unbiased by ingestion order): 64 vectors per
    // label caps every class pair at 64² cross + 2·C(64,2) within
    // distances regardless of corpus size. Distances snap to 1e-6
    // LONGs so the three E-terms are exact integer sums; one double
    // expression combines them.
    Q(
      "q304_energy_distance",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val samp = e
          .withColumn("h",
            (col("vec_id") * lit(2654435761L)) % lit(1000000007L))
          .withColumn("rn", row_number().over(
            Window.partitionBy("label").orderBy("h", "vec_id")))
          .where(col("rn") <= SampPerLabel)
          .select(col("label"), col("vec_id"), col("embedding"))
        def d6(a: org.apache.spark.sql.Column,
               b: org.apache.spark.sql.Column) =
          floor(VectorFunctions.l2Dist(a, b) * lit(1000000.0) + lit(0.5))
            .cast("long")
        val within = samp.as("x").join(samp.as("y"),
            col("x.label") === col("y.label") &&
              col("x.vec_id") < col("y.vec_id"))
          .groupBy(col("x.label").as("label"))
          .agg(sum(d6(col("x.embedding"), col("y.embedding"))).as("sw"),
            count(lit(1)).as("nw"))
        val cross = samp.as("x").join(samp.as("y"),
            col("x.label") < col("y.label"))
          .groupBy(col("x.label").as("label_a"),
            col("y.label").as("label_b"))
          .agg(sum(d6(col("x.embedding"), col("y.embedding"))).as("sxy"),
            count(lit(1)).as("nxy"))
        cross
          .join(within.select(col("label").as("label_a"),
            col("sw").as("sxx"), col("nw").as("nxx")), "label_a")
          .join(within.select(col("label").as("label_b"),
            col("sw").as("syy"), col("nw").as("nyy")), "label_b")
          .select(col("label_a"), col("label_b"), col("nxy"),
            Rounding.stableRound6(
              (lit(2.0) * col("sxy").cast("double") /
                col("nxy").cast("double") -
                col("sxx").cast("double") / col("nxx").cast("double") -
                col("syy").cast("double") / col("nyy").cast("double")) /
                lit(1000000.0)).as("energy"))
          .orderBy("label_a", "label_b")
      },
      Some(s"""WITH samp AS (
             |  SELECT label, vec_id, embedding::DOUBLE[] AS v
             |  FROM (
             |    SELECT label, vec_id, embedding, row_number() OVER (
             |      PARTITION BY label
             |      ORDER BY (vec_id * 2654435761) % 1000000007, vec_id)
             |      AS rn
             |    FROM embeddings)
             |  WHERE rn <= $SampPerLabel),
             |within AS (
             |  SELECT x.label AS label,
             |    sum(CAST(floor(list_distance(x.v, y.v)
             |      * 1000000.0 + 0.5) AS BIGINT)) AS sw,
             |    count(*) AS nw
             |  FROM samp x JOIN samp y
             |    ON x.label = y.label AND x.vec_id < y.vec_id
             |  GROUP BY x.label),
             |crossp AS (
             |  SELECT x.label AS label_a, y.label AS label_b,
             |    sum(CAST(floor(list_distance(x.v, y.v)
             |      * 1000000.0 + 0.5) AS BIGINT)) AS sxy,
             |    count(*) AS nxy
             |  FROM samp x JOIN samp y ON x.label < y.label
             |  GROUP BY x.label, y.label)
             |SELECT label_a, label_b, CAST(nxy AS BIGINT) AS nxy,
             |  ${Rounding.duckSql(
                "(2.0 * sxy::DOUBLE / nxy::DOUBLE - " +
                "wa.sw::DOUBLE / wa.nw::DOUBLE - " +
                "wb.sw::DOUBLE / wb.nw::DOUBLE) / 1000000.0")}
             |    AS energy
             |FROM crossp
             |JOIN within wa ON wa.label = label_a
             |JOIN within wb ON wb.label = label_b
             |ORDER BY label_a, label_b""".stripMargin)))
}
