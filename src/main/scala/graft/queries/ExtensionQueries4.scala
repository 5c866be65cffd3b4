package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{Ranking, Sampling, SimilaritySearch, TextAnalysis}
import graft.functions.{PolyHash, Rounding}
import graft.io.Tables

/** Round-5 third wave: IVF-PQ composition (q111), int8 scalar
  * quantization (q112), time-series resample + linear interpolation
  * (q113), mixture-weighted selection (q114), distributed percent-rank
  * quality normalization (q115), and equi-depth histograms (q116) — the
  * last two over [[graft.ext.Ranking]], the two-pass global rank that
  * replaces single-partition rank windows. Same contract as every other
  * module: each Spark pipeline pairs with DuckDB oracle SQL replaying it.
  */
object ExtensionQueries4 {

  private val P = PolyHash.Mod

  /** q111's oracle — the full IVF-PQ replay (hash-pick centroids, cell
    * assign, codebook pick+slice, encode, probe, ADC). Shared with q207,
    * which serves the SAME probes from the PERSISTED index and must
    * produce byte-identical rows, and (via [[ivfPqOracleSqlPick]]) with
    * q322, whose centroid/codebook PICKS come from the base slice only
    * (frozen-sidecar increment) while cell assignment + encoding still
    * cover the full corpus.
    */
  private[queries] lazy val ivfPqOracleSql: String = ivfPqOracleSqlPick("TRUE")

  /** [[ivfPqOracleSql]] with the centroid/codebook pick restricted to
    * `pickWhere` rows of `embeddings` — everything downstream of the
    * picks (cell assignment, encoding, probing, ADC) stays full-corpus.
    */
  private[queries] def ivfPqOracleSqlPick(pickWhere: String,
                                          candWhere: String = "TRUE"): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |ipick AS (
             |  SELECT vec_id, v FROM (
             |    SELECT vec_id, v,
             |      ${PolyHash.duckSql("'ivf#' || vec_id::VARCHAR")} AS h
             |    FROM e WHERE $pickWhere)
             |  ORDER BY h, vec_id LIMIT 16),
             |cents AS (
             |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
             |  FROM ipick),
             |cell_ranks AS (
             |  SELECT e.vec_id, c.cid,
             |    row_number() OVER (PARTITION BY e.vec_id
             |      ORDER BY list_dot_product(e.v, c.cv) DESC, c.cid) AS rnk
             |  FROM e CROSS JOIN cents c),
             |ccell AS (SELECT vec_id, cid FROM cell_ranks WHERE rnk = 1),
             |qcell AS (
             |  SELECT vec_id AS query_id, cid FROM cell_ranks
             |  WHERE rnk <= 4 AND vec_id < 5),
             |ppick AS (
             |  SELECT vec_id, v FROM (
             |    SELECT vec_id, v,
             |      ${PolyHash.duckSql("'pq#' || vec_id::VARCHAR")} AS h
             |    FROM e WHERE $pickWhere)
             |  ORDER BY h, vec_id LIMIT 16),
             |cwi AS (
             |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS i, v
             |  FROM ppick),
             |js AS (SELECT unnest(range(8)) AS j),
             |cw AS (
             |  SELECT j.j, c.i, c.v[j.j*8+1 : j.j*8+8] AS cv
             |  FROM js j CROSS JOIN cwi c),
             |cc AS (SELECT j, i, list_dot_product(cv, cv) AS cc, cv FROM cw),
             |subs AS (
             |  SELECT e.vec_id, j.j, e.v[j.j*8+1 : j.j*8+8] AS sub
             |  FROM e CROSS JOIN js j),
             |enc AS (
             |  SELECT vec_id, j, cv FROM (
             |    SELECT s.vec_id, s.j, c.i, c.cv,
             |      row_number() OVER (PARTITION BY s.vec_id, s.j
             |        ORDER BY c.cc - 2*list_dot_product(s.sub, c.cv) ASC, c.i) AS rnk
             |    FROM subs s JOIN cc c ON s.j = c.j)
             |  WHERE rnk = 1),
             |cand AS (
             |  SELECT q.query_id, c.vec_id AS neighbor_id
             |  FROM qcell q JOIN ccell c USING (cid)
             |  WHERE q.query_id <> c.vec_id AND (c.vec_id IS NOT NULL
             |    AND ($candWhere))),
             |scored AS (
             |  SELECT ca.query_id, ca.neighbor_id,
             |    ${Rounding.duckSql("sum(list_dot_product(qs.sub, en.cv))")} AS score
             |  FROM cand ca
             |  JOIN subs qs ON qs.vec_id = ca.query_id
             |  JOIN enc en ON en.vec_id = ca.neighbor_id AND en.j = qs.j
             |  GROUP BY ca.query_id, ca.neighbor_id),
             |ranked AS (
             |  SELECT query_id, neighbor_id, score,
             |    row_number() OVER (PARTITION BY query_id
             |      ORDER BY score DESC, neighbor_id) AS rank
             |  FROM scored)
             |SELECT query_id, rank, neighbor_id, score
             |FROM ranked WHERE rank <= 5
             |ORDER BY query_id, rank""".stripMargin

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q111: IVF-PQ — the big-corpus ANN composition: IVF's cell
    // equi-join prunes WHICH vectors a query touches (nProbe/C of the
    // corpus), PQ codes shrink WHAT each touched vector costs (8 bytes +
    // m LUT lookups). One corpus scan computes (cell, codes); at 100 TB
    // that table IS the persisted index, partitioned by cell (q207
    // round-trips exactly that persisted form). The oracle composes
    // q64's cell CTEs with q104's encode/ADC CTEs.
    Q(
      "q111_ivfpq",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        SimilaritySearch.ivfPqTopK(e.filter(col("vec_id") < 5), e, 5,
            nCentroids = 16, nProbe = 4, m = 8, ksub = 16)
          .orderBy("query_id", "rank")
      },
      Some(ivfPqOracleSql)),

    // ------------------------------------------------------------------
    // q112: int8 scalar quantization (SQ8) — the cheap vector
    // compression: per-dimension min/max stretch into [0, 255], 4x
    // smaller than float32. Two scans total: one 128-aggregate pass for
    // the per-dim ranges (collected at plan build, the q101 two-scalars
    // pattern), then a shuffle-free encode projection. Codes and the
    // per-vector reconstruction MSE are emitted; floor/div arithmetic is
    // the same IEEE sequence both engines run. HOF lambdas (not a custom
    // expression) are acceptable here: encoding is a one-time offline
    // pass, not the per-query hot loop ADC is. The codes column is
    // emitted as a comma-joined STRING, not ARRAY<INT>: the gate's
    // pandas canonicalization sorts cell values, and ndarray cells are
    // unsortable (round-5 red row) — a scalar projection of the same 64
    // values gates identical information.
    Q(
      "q112_int8_quantize",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val dim = SimilaritySearch.deriveDim(e, "embedding")
        val aggs = (0 until dim).flatMap(i => Seq(
          min(element_at(col("embedding"), i + 1)).as(s"mn_$i"),
          max(element_at(col("embedding"), i + 1)).as(s"mx_$i")))
        val r = e.agg(aggs.head, aggs.tail: _*).head()
        val mins = (0 until dim).map(i => r.getFloat(2 * i).toDouble)
        val scales = (0 until dim).map(i =>
          (r.getFloat(2 * i + 1).toDouble - r.getFloat(2 * i).toDouble) / 255.0)
        val minsL = typedlit(mins)
        val scalesL = typedlit(scales)
        def mn(i: org.apache.spark.sql.Column) = element_at(minsL, i + 1)
        def sc(i: org.apache.spark.sql.Column) = element_at(scalesL, i + 1)
        def code(x: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
          when(sc(i) === 0.0, lit(0)).otherwise(
            least(lit(255), greatest(lit(0),
              floor((x.cast("double") - mn(i)) / sc(i)).cast("int"))))
        val codes = transform(col("embedding"), (x, i) => code(x, i))
        val errs = transform(col("embedding"), (x, i) => {
          val rec = when(sc(i) === 0.0, mn(i))
            .otherwise((code(x, i).cast("double") + 0.5) * sc(i) + mn(i))
          val d = rec - x.cast("double")
          d * d
        })
        e.select(col("vec_id"),
            array_join(transform(codes, c => c.cast("string")), ",")
              .as("codes"),
            Rounding.stableRound6(
              aggregate(errs, lit(0.0), (a, b) => a + b) / dim).as("mse"))
          .orderBy("vec_id")
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |js AS (SELECT unnest(range(64)) AS i),
             |mm AS (
             |  SELECT j.i, min(e.v[j.i+1]) AS mn, max(e.v[j.i+1]) AS mx
             |  FROM e CROSS JOIN js j GROUP BY j.i),
             |ml AS (
             |  SELECT list(mn ORDER BY i) AS mns,
             |    list((mx - mn) / 255.0 ORDER BY i) AS scs
             |  FROM mm)
             |SELECT vec_id,
             |  array_to_string(list_transform(v, (x, i) -> CASE WHEN scs[i] = 0 THEN 0
             |    ELSE least(255, greatest(0,
             |      CAST(floor((x - mns[i]) / scs[i]) AS INTEGER))) END), ',') AS codes,
             |  ${Rounding.duckSql(
                  "list_reduce(list_transform(v, (x, i) -> CASE " +
                    "WHEN scs[i] = 0 THEN (mns[i] - x) * (mns[i] - x) " +
                    "ELSE ((CAST(CASE WHEN scs[i] = 0 THEN 0 " +
                    "ELSE least(255, greatest(0, CAST(floor((x - mns[i]) / scs[i]) AS INTEGER))) END" +
                    " AS DOUBLE) + 0.5) * scs[i] + mns[i] - x) * " +
                    "((CAST(CASE WHEN scs[i] = 0 THEN 0 " +
                    "ELSE least(255, greatest(0, CAST(floor((x - mns[i]) / scs[i]) AS INTEGER))) END" +
                    " AS DOUBLE) + 0.5) * scs[i] + mns[i] - x) END), (a, b) -> a + b) / 64")} AS mse
             |FROM e CROSS JOIN ml
             |ORDER BY vec_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q113: hourly resample with linear interpolation — the
    // time-series regularization op (metrics alignment, feature grids).
    // The grid is pure integer epoch arithmetic (exact in both engines);
    // each grid point takes the last known value before it and the first
    // after via IGNORE-NULLS window fills over the union of events and
    // grid rows — one shuffle to the user key, O(1) state per row. A
    // grid point outside the observed range forward/backward-fills; one
    // landing exactly on an event reproduces that event's value (frame
    // includes the current row; events sort before grid rows at equal ts).
    Q(
      "q113_resample_interpolate",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        val te = unix_micros(col("ts").cast("timestamp"))
        val grid = e.groupBy("user_id")
          .agg(min(te).as("t0"), max(te).as("t1"))
          .where(expr("(t0 + 3599999999) div 3600000000 <= t1 div 3600000000"))
          .select(col("user_id"), explode(expr(
            "sequence((t0 + 3599999999) div 3600000000, t1 div 3600000000)"))
            .as("g"))
          .select(col("user_id"),
            timestamp_micros(col("g") * 3600000000L).cast("timestamp_ntz").as("ts"),
            lit(null).cast("double").as("value"), lit(-1L).as("event_id"),
            lit(1).as("is_grid"))
        val u = e.withColumn("is_grid", lit(0))
          .select("user_id", "ts", "value", "event_id", "is_grid")
          .unionByName(grid)
        val ord = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("is_grid"), col("event_id"))
        val back = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // the forward fill is computed as a BACKWARD fill over the
        // REVERSED sort: Spark executes (CURRENT ROW, UNBOUNDED
        // FOLLOWING) frames by re-scanning the rest of the partition for
        // every row — O(rows²) per user, measured 55s at sf0.1 — while
        // (UNBOUNDED PRECEDING, CURRENT ROW) maintains running state in
        // O(1) per row. `last` over the reversed prefix is exactly
        // `first` over the forward suffix (full tiebreak ⇒ exact reverse)
        val revBack = Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("is_grid").desc, col("event_id").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tsE = unix_micros(col("ts").cast("timestamp"))
        val knownT = when(col("value").isNotNull, tsE)
        val pv = last(col("value"), ignoreNulls = true).over(back)
        val pt = last(knownT, ignoreNulls = true).over(back)
        val nv = last(col("value"), ignoreNulls = true).over(revBack)
        val nt = last(knownT, ignoreNulls = true).over(revBack)
        u.withColumn("pv", pv).withColumn("pt", pt)
          .withColumn("nv", nv).withColumn("nt", nt)
          .where(col("is_grid") === 1)
          .select(col("user_id"), col("ts"),
            Rounding.stableRound6(
              when(col("pv").isNull, col("nv"))
                .when(col("nv").isNull, col("pv"))
                .when(col("nt") === col("pt"), col("pv"))
                .otherwise(col("pv") + (col("nv") - col("pv")) *
                  ((tsE - col("pt")).cast("double") /
                    (col("nt") - col("pt")).cast("double"))))
              .as("value_interp"))
          .orderBy("user_id", "ts")
      },
      Some(s"""WITH e AS (
             |  SELECT user_id, ts, event_id, value, epoch_us(ts) AS te
             |  FROM events),
             |b AS (SELECT user_id, min(te) AS t0, max(te) AS t1 FROM e GROUP BY 1),
             |g AS (
             |  SELECT user_id, unnest(generate_series(
             |    (t0 + 3599999999) // 3600000000, t1 // 3600000000)) AS gi
             |  FROM b),
             |gr AS (
             |  SELECT user_id, make_timestamp(gi * 3600000000) AS ts,
             |    NULL::DOUBLE AS value, -1::BIGINT AS event_id, 1 AS is_grid
             |  FROM g),
             |ev AS (SELECT user_id, ts, value, event_id, 0 AS is_grid FROM e),
             |u AS (SELECT * FROM ev UNION ALL SELECT * FROM gr),
             |w AS (
             |  SELECT user_id, ts, is_grid, epoch_us(ts) AS te,
             |    last_value(value IGNORE NULLS) OVER pw AS pv,
             |    last_value(CASE WHEN value IS NOT NULL THEN epoch_us(ts) END
             |      IGNORE NULLS) OVER pw AS pt,
             |    first_value(value IGNORE NULLS) OVER fw AS nv,
             |    first_value(CASE WHEN value IS NOT NULL THEN epoch_us(ts) END
             |      IGNORE NULLS) OVER fw AS nt
             |  FROM u
             |  WINDOW pw AS (PARTITION BY user_id ORDER BY ts, is_grid, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |    fw AS (PARTITION BY user_id ORDER BY ts, is_grid, event_id
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
             |SELECT user_id, ts,
             |  ${Rounding.duckSql(
                  "CASE WHEN pv IS NULL THEN nv WHEN nv IS NULL THEN pv " +
                    "WHEN nt = pt THEN pv " +
                    "ELSE pv + (nv - pv) * (CAST(te - pt AS DOUBLE) / " +
                    "CAST(nt - pt AS DOUBLE)) END")} AS value_interp
             |FROM w WHERE is_grid = 1
             |ORDER BY user_id, ts""".stripMargin)),

    // ------------------------------------------------------------------
    // q114: mixture-weighted selection — the data-mixing step: given a
    // token budget (50% of the corpus) split uniformly across sources,
    // compute each source's acceptance rate (capped at 1) and select
    // docs by the deterministic hash bucket, so the SAME docs are chosen
    // on any engine, any partitioning, any run. Two corpus scans (per-
    // source totals; filtered selection) with rates meeting docs through
    // a broadcast — the selection predicate is a pure function of
    // (salt, doc_id, rate).
    Q(
      "q114_mixture_select",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            size(TextAnalysis.wsTokens(col("text"))).cast("long").as("toks"))
        val bySrc = d.groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum("toks").cast("long").as("tokens_total"))
        val wAll = Window.partitionBy()
        val rates = bySrc
          .withColumn("tot", sum(col("tokens_total").cast("double")).over(wAll))
          .withColumn("nsrc", count(lit(1)).over(wAll).cast("double"))
          .withColumn("accept", least(lit(1.0),
            (col("tot") * 0.5 / col("nsrc")) / col("tokens_total").cast("double")))
        // broadcast: one row per SOURCE (the mixture's domain count —
        // dimension-sized by construction; at web-scale domain counts
        // drop the hint and let AQE choose, as q97's window path does)
        val sel = d.join(broadcast(rates.select("source", "accept")), "source")
          .where(Sampling.bucket(col("doc_id"), "mix1") < col("accept") * 10000)
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_selected"),
            sum("toks").cast("long").as("tokens_selected"))
        rates.join(sel, Seq("source"), "left")
          .select(col("source"), col("n_docs"), col("tokens_total"),
            Rounding.stableRound6(col("accept")).as("accept_rate"),
            coalesce(col("n_selected"), lit(0L)).as("n_selected"),
            coalesce(col("tokens_selected"), lit(0L)).as("tokens_selected"))
          .orderBy("source")
      },
      Some(s"""WITH d AS (
             |  SELECT doc_id, source,
             |    len(regexp_extract_all(text, '\\S+'))::BIGINT AS toks
             |  FROM documents),
             |s AS (
             |  SELECT source, count(*)::BIGINT AS n_docs,
             |    CAST(sum(toks) AS BIGINT) AS tokens_total
             |  FROM d GROUP BY 1),
             |t AS (SELECT sum(tokens_total)::DOUBLE AS tot,
             |             count(*)::DOUBLE AS nsrc FROM s),
             |r AS (
             |  SELECT source, n_docs, tokens_total,
             |    least(1.0, (tot * 0.5 / nsrc) / tokens_total::DOUBLE) AS accept
             |  FROM s CROSS JOIN t),
             |bd AS (
             |  SELECT doc_id, source, toks, (h * h % $P) % 10000 AS bucket
             |  FROM (
             |    SELECT doc_id, source, toks,
             |      ${PolyHash.duckSql("'mix1#' || doc_id::VARCHAR")} AS h
             |    FROM d)),
             |sel AS (
             |  SELECT bd.source, count(*)::BIGINT AS n_selected,
             |    CAST(sum(bd.toks) AS BIGINT) AS tokens_selected
             |  FROM bd JOIN r USING (source)
             |  WHERE bd.bucket < r.accept * 10000
             |  GROUP BY 1)
             |SELECT r.source, r.n_docs, r.tokens_total,
             |  ${Rounding.duckSql("r.accept")} AS accept_rate,
             |  coalesce(sel.n_selected, 0) AS n_selected,
             |  coalesce(sel.tokens_selected, 0) AS tokens_selected
             |FROM r LEFT JOIN sel USING (source)
             |ORDER BY source""".stripMargin)),

    // ------------------------------------------------------------------
    // q115: cross-source quality normalization — raw quality scores are
    // not comparable across sources (a mid-tier web doc outscores a
    // top-tier forum doc), so curation thresholds are set on the
    // per-source percent rank instead. The rank comes from
    // ext.Ranking's two-pass global rank (source is the leading sort
    // key, so within-source ranks are contiguous) — NOT a rank window,
    // which would serialize each source through one task; per-source
    // offsets and counts then arrive via a dimension-sized broadcast.
    // percent_rank = (rank-1)/(n-1) over a UNIQUE (quality, doc_id)
    // order, which is exactly what the oracle's window replays.
    Q(
      "q115_quality_normalize",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            TextAnalysis.qualityScore(col("text")).as("quality"))
        val ranked = Ranking.withGlobalRank(docs,
          Seq(col("source"), col("quality"), col("doc_id")))
        val stats = ranked.groupBy("source")
          .agg(min("global_rank").as("r0"),
            count(lit(1)).cast("long").as("ns"))
        ranked.join(broadcast(stats), "source")
          .select(col("doc_id"), col("source"), col("quality"),
            Rounding.stableRound6(
              (col("global_rank") - col("r0")).cast("double") /
                greatest(col("ns") - 1, lit(1L)).cast("double")).as("pr"))
          .orderBy("doc_id")
      },
      Some(s"""WITH q AS (
             |  SELECT doc_id, source, ${ExtensionQueries.QualityScoreSql} AS quality
             |  FROM documents),
             |r AS (
             |  SELECT doc_id, source, quality,
             |    rank() OVER (PARTITION BY source ORDER BY quality, doc_id) AS rk,
             |    count(*) OVER (PARTITION BY source) AS ns
             |  FROM q)
             |SELECT doc_id, source, quality,
             |  ${Rounding.duckSql(
                  "CAST(rk - 1 AS DOUBLE) / CAST(greatest(ns - 1, 1) AS DOUBLE)")} AS pr
             |FROM r
             |ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q116: equi-depth histogram — ten buckets with (near-)equal ROW
    // counts, the statistics a cost-based optimizer or drift monitor
    // wants (equi-WIDTH is q61's sketch). Bucket ids come from
    // ext.Ranking's global rank + the exact ntile closed form (first
    // n%10 tiles get one extra row) — no single-partition ntile window
    // anywhere; the oracle computes the identical arithmetic from its
    // own rank() window.
    Q(
      "q116_equidepth_histogram",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
          .select(col("l_extendedprice").as("price"),
            col("l_orderkey"), col("l_linenumber"))
        val (ranked, n) = Ranking.withGlobalRankAndCount(li,
          Seq(col("price"), col("l_orderkey"), col("l_linenumber")))
        ranked
          .withColumn("bucket", Ranking.ntileFromRank(col("global_rank"), n, 10))
          .groupBy("bucket")
          .agg(count(lit(1)).cast("long").as("n"),
            min("price").as("lo"), max("price").as("hi"),
            round(sum("price"), 2).as("sum_price"))
          .orderBy("bucket")
      },
      Some("""WITH r AS (
             |  SELECT l_extendedprice AS price,
             |    rank() OVER (ORDER BY l_extendedprice, l_orderkey,
             |      l_linenumber) AS rk,
             |    count(*) OVER () AS n
             |  FROM lineitem),
             |t AS (
             |  SELECT price,
             |    CASE WHEN n < 10 THEN rk
             |         WHEN rk <= (n % 10) * (n // 10 + 1)
             |           THEN (rk - 1) // (n // 10 + 1) + 1
             |         ELSE n % 10 + (rk - (n % 10) * (n // 10 + 1) - 1)
             |           // (n // 10) + 1 END AS bucket
             |  FROM r)
             |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
             |  min(price) AS lo, max(price) AS hi,
             |  round(sum(price), 2) AS sum_price
             |FROM t
             |GROUP BY bucket
             |ORDER BY bucket""".stripMargin))
  )
}
