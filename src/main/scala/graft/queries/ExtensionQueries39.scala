package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Rounding
import graft.io.Tables

/** Round-8 fourteenth continuation wave: circular block bootstrap SE
  * (q312), seasonal-trend decomposition by day-of-week (q313), and the
  * exact 1-D Wasserstein distance between per-source length
  * distributions (q314). Same contract as every other module: each
  * Spark pipeline pairs with DuckDB oracle SQL replaying it.
  */
object ExtensionQueries39 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q312: circular block bootstrap standard error of the mean daily
    // order count — the companion q300 demands: once the ACF shows the
    // series is autocorrelated, the iid bootstrap (q257) understates
    // the SE; 7-day circular blocks preserve the within-week
    // dependence. 32 replicates, block starts a pure integer hash of
    // (replicate, block) both engines replay; each replicate's sum is
    // an exact LONG, replicate means snap to 1e-6 integer units by
    // integer division, and the across-replicate variance is the exact
    // R·Σm² − (Σm)² form — the three sqrt/division ops at the end are
    // the only fp. Resample length truncates to 7·⌊n/7⌋ (the standard
    // whole-blocks convention). Single summary row (RegistrySpec
    // single-row exemption).
    Q(
      "q312_block_bootstrap",
      (s, dir) => {
        val daily = Tables.load(s, dir, "orders")
          .groupBy(col("o_orderdate").as("d"))
          .agg(count(lit(1)).as("x"))
        val idx = daily
          .withColumn("t", row_number().over(Window.orderBy("d")))
          .select("t", "x")
        val st = idx.agg(count(lit(1)).as("n"), sum("x").as("sx"),
          sum(col("x") * col("x")).as("sx2"))
        val picks = s.range(1, 33).select(col("id").as("r"))
          .crossJoin(broadcast(st.select(col("n"))))
          .crossJoin(s.range(0, 400).select(col("id").as("m")))
          .where(col("m") < expr("n div 7"))
          .crossJoin(s.range(0, 7).select(col("id").as("i")))
          .withColumn("pos",
            expr("((((r * 1000003 + m) * 2654435761) % 1000000007) % n" +
              " + i) % n + 1"))
        val reps = picks
          .join(idx, col("pos") === col("t"))
          .groupBy("r")
          .agg(sum("x").as("sr"), first("n").as("n"))
          .withColumn("m6", expr("(sr * 1000000) div ((n div 7) * 7)"))
        val bvar = reps.agg(
          sum(col("m6") * col("m6")).as("sm2"), sum("m6").as("sm"),
          first("n").as("n"))
        bvar.crossJoin(broadcast(st.select(col("sx"), col("sx2"))))
          .select(
            col("n").as("n_days"),
            expr("(n div 7) * 7").as("l_used"),
            Rounding.stableRound6(
              sqrt((col("n") * col("sx2") - col("sx") * col("sx"))
                .cast("double")) /
                (col("n").cast("double") * sqrt(col("n").cast("double"))))
              .as("naive_se"),
            Rounding.stableRound6(
              sqrt((lit(32L) * col("sm2") - col("sm") * col("sm"))
                .cast("double")) / lit(32.0) / lit(1000000.0))
              .as("block_se"),
            Rounding.stableRound6(
              (sqrt((lit(32L) * col("sm2") - col("sm") * col("sm"))
                .cast("double")) / lit(32.0) / lit(1000000.0)) /
                (sqrt((col("n") * col("sx2") - col("sx") * col("sx"))
                  .cast("double")) /
                  (col("n").cast("double") *
                    sqrt(col("n").cast("double")))))
              .as("se_ratio"))
      },
      Some("""WITH daily AS (
             |  SELECT o_orderdate AS d, count(*) AS x FROM orders
             |  GROUP BY 1),
             |idx AS (
             |  SELECT row_number() OVER (ORDER BY d) AS t, x FROM daily),
             |st AS (
             |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
             |    CAST(sum(x*x) AS BIGINT) AS sx2
             |  FROM idx),
             |picks AS (
             |  SELECT r, ((((r * 1000003 + m) * 2654435761)
             |    % 1000000007) % n + i) % n + 1 AS pos
             |  FROM range(1, 33) rr(r), st, range(0, 400) mm(m),
             |    range(0, 7) ii(i)
             |  WHERE m < n // 7),
             |reps AS (
             |  SELECT r, CAST(sum(x) AS BIGINT) AS sr FROM picks
             |  JOIN idx ON idx.t = picks.pos GROUP BY r),
             |m6 AS (
             |  SELECT r, (sr * 1000000) // ((n // 7) * 7) AS m6
             |  FROM reps, st),
             |bv AS (
             |  SELECT CAST(sum(m6*m6) AS BIGINT) AS sm2,
             |    CAST(sum(m6) AS BIGINT) AS sm
             |  FROM m6)
             |SELECT CAST(n AS BIGINT) AS n_days,
             |  CAST((n // 7) * 7 AS BIGINT) AS l_used,
             |  floor(sqrt((n*sx2 - sx*sx)::DOUBLE)
             |    / (n::DOUBLE * sqrt(n::DOUBLE)) * 1000000.0 + 0.5)
             |    / 1000000.0 AS naive_se,
             |  floor(sqrt((32*sm2 - sm*sm)::DOUBLE) / 32.0 / 1000000.0
             |    * 1000000.0 + 0.5) / 1000000.0 AS block_se,
             |  floor((sqrt((32*sm2 - sm*sm)::DOUBLE) / 32.0 / 1000000.0)
             |    / (sqrt((n*sx2 - sx*sx)::DOUBLE)
             |       / (n::DOUBLE * sqrt(n::DOUBLE)))
             |    * 1000000.0 + 0.5) / 1000000.0 AS se_ratio
             |FROM st, bv""".stripMargin)),

    // ------------------------------------------------------------------
    // q313: seasonal-trend decomposition of the daily order series by
    // day-of-week — STL's additive skeleton with exact arithmetic:
    // trend is the centered 7-day moving average (full windows only),
    // so the detrended value scaled by 7 is the LONG 7·x_t − Σ₇; the
    // day-of-week seasonal component is the group mean of those
    // integers, and the seasonal STRENGTH is the between/total variance
    // share from the exact sum/sum-of-squares identities (per-group
    // A²/n terms snapped to 1e-6 integer units before the 7-term sum).
    // The q266 gate asks "which weekday peaks"; this one answers "how
    // much of the detrended variance the weekly cycle explains".
    Q(
      "q313_stl_dow",
      (s, dir) => {
        val daily = Tables.load(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("d"))
          .agg(count(lit(1)).as("x"))
        val w7 = Window.orderBy("d").rowsBetween(-3, 3)
        val det = daily
          .withColumn("s7", sum("x").over(w7))
          .withColumn("c7", count(lit(1)).over(w7))
          .where(col("c7") === 7)
          .select((lit(7L) * col("x") - col("s7")).as("d7"),
            (weekday(col("d")) + lit(1)).as("dow"))
        val g = det.groupBy("dow")
          .agg(sum("d7").as("ag"), count(lit(1)).as("ng"))
          .withColumn("t6",
            floor((col("ag") * col("ag")).cast("double") /
              col("ng").cast("double") * lit(1000000.0) + lit(0.5))
              .cast("long"))
        val tot = det.agg(sum("d7").as("a"), count(lit(1)).as("nn"),
          sum(col("d7") * col("d7")).as("q"))
        val t6s = g.agg(sum("t6").as("t6s"))
        g.crossJoin(broadcast(tot)).crossJoin(broadcast(t6s))
          .select(col("dow").cast("long").as("dow"),
            col("ng").as("n_days"),
            Rounding.stableRound6(col("ag").cast("double") /
              (lit(7L) * col("ng")).cast("double")).as("seasonal"),
            Rounding.stableRound6(
              (col("t6s").cast("double") / lit(1000000.0) -
                (col("a") * col("a")).cast("double") /
                  col("nn").cast("double")) /
                (col("q").cast("double") -
                  (col("a") * col("a")).cast("double") /
                    col("nn").cast("double"))).as("dow_strength"))
          .orderBy("dow")
      },
      Some("""WITH daily AS (
             |  SELECT o_orderdate::DATE AS d, count(*) AS x FROM orders
             |  GROUP BY 1),
             |det AS (
             |  SELECT 7*x - s7 AS d7, isodow(d) AS dow FROM (
             |    SELECT d, x,
             |      CAST(sum(x) OVER w AS BIGINT) AS s7,
             |      count(*) OVER w AS c7
             |    FROM daily
             |    WINDOW w AS (ORDER BY d
             |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
             |  WHERE c7 = 7),
             |g AS (
             |  SELECT dow, CAST(sum(d7) AS BIGINT) AS ag,
             |    count(*) AS ng
             |  FROM det GROUP BY dow),
             |g2 AS (
             |  SELECT dow, ag, ng,
             |    CAST(floor((ag*ag)::DOUBLE / ng::DOUBLE * 1000000.0
             |      + 0.5) AS BIGINT) AS t6
             |  FROM g),
             |tot AS (
             |  SELECT CAST(sum(d7) AS BIGINT) AS a, count(*) AS nn,
             |    CAST(sum(d7*d7) AS BIGINT) AS q
             |  FROM det),
             |t6s AS (SELECT CAST(sum(t6) AS BIGINT) AS t6s FROM g2)
             |SELECT CAST(dow AS BIGINT) AS dow,
             |  CAST(ng AS BIGINT) AS n_days,
             |  floor(ag::DOUBLE / (7*ng)::DOUBLE * 1000000.0 + 0.5)
             |    / 1000000.0 AS seasonal,
             |  floor((t6s::DOUBLE / 1000000.0
             |      - (a*a)::DOUBLE / nn::DOUBLE)
             |    / (q::DOUBLE - (a*a)::DOUBLE / nn::DOUBLE)
             |    * 1000000.0 + 0.5) / 1000000.0 AS dow_strength
             |FROM g2, tot, t6s
             |ORDER BY dow""".stripMargin)),

    // ------------------------------------------------------------------
    // q314: exact 1-D Wasserstein-1 (earth mover's) distance between
    // every source pair's document-length distribution — the transport
    // metric the drift family (q143 PSI, q228 KS, q278 JSD) lacks:
    // unlike bin-overlap scores it weights HOW FAR mass must move, in
    // characters. For discrete 1-D distributions W₁ = ∫|F_a − F_b| dx
    // collapses to a sum over the merged value grid of
    // |cumA·nB − cumB·nA|·Δx — EXACT integers end to end with one
    // double division by nA·nB at the end. The grid join is per pair
    // over distinct n_chars values (≈300), so the 190-pair frame is
    // bounded by value cardinality, never corpus size.
    Q(
      "q314_wasserstein_1d",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val vals = docs.groupBy(col("source"), col("n_chars").as("v"))
          .agg(count(lit(1)).as("cnt"))
        val srcN = docs.groupBy("source").agg(count(lit(1)).as("n"))
        val pairs = srcN.select(col("source").as("sa"), col("n").as("na"))
          .crossJoin(srcN.select(col("source").as("sb"),
            col("n").as("nb")))
          .where(col("sa") < col("sb"))
        val va = vals.select(col("source").as("sa"), col("v"),
          col("cnt").as("ca"))
        val vb = vals.select(col("source").as("sb"), col("v"),
          col("cnt").as("cb"))
        // the pair×value grid is the union of the pair's distinct
        // values (a pair-scoped full-outer in join form)
        val pv = pairs.join(
            vals.select(col("source"), col("v")).distinct()
              .select(col("source").as("vsrc"), col("v")),
            col("vsrc") === col("sa") || col("vsrc") === col("sb"))
          .select(col("sa"), col("sb"), col("na"), col("nb"), col("v"))
          .distinct()
        val grid = pv
          .join(va, Seq("sa", "v"), "left")
          .join(vb, Seq("sb", "v"), "left")
          .select(col("sa"), col("sb"), col("na"), col("nb"), col("v"),
            coalesce(col("ca"), lit(0L)).as("ca"),
            coalesce(col("cb"), lit(0L)).as("cb"))
        val wPair = Window.partitionBy("sa", "sb").orderBy("v")
        grid
          .withColumn("cuma", sum("ca").over(
            wPair.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)))
          .withColumn("cumb", sum("cb").over(
            wPair.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)))
          .withColumn("dx",
            coalesce(lead("v", 1).over(wPair) - col("v"), lit(0L)))
          .withColumn("term",
            abs(col("cuma") * col("nb") - col("cumb") * col("na")) *
              col("dx"))
          .groupBy(col("sa").as("source_a"), col("sb").as("source_b"))
          .agg(first("na").as("na"), first("nb").as("nb"),
            sum("term").as("ts"))
          .select(col("source_a"), col("source_b"),
            Rounding.stableRound6(col("ts").cast("double") /
              (col("na") * col("nb")).cast("double")).as("w1"))
          .orderBy("source_a", "source_b")
      },
      Some("""WITH vals AS (
             |  SELECT source, n_chars AS v, count(*) AS cnt
             |  FROM documents GROUP BY 1, 2),
             |srcn AS (
             |  SELECT source, count(*) AS n FROM documents GROUP BY 1),
             |pairs AS (
             |  SELECT a.source AS sa, a.n AS na, b.source AS sb,
             |    b.n AS nb
             |  FROM srcn a JOIN srcn b ON a.source < b.source),
             |pv AS (
             |  SELECT DISTINCT sa, sb, na, nb, v
             |  FROM pairs JOIN (SELECT DISTINCT source, v FROM vals) s
             |    ON s.source = sa OR s.source = sb),
             |grid AS (
             |  SELECT pv.sa, pv.sb, pv.na, pv.nb, pv.v,
             |    coalesce(va.cnt, 0) AS ca, coalesce(vb.cnt, 0) AS cb
             |  FROM pv
             |  LEFT JOIN vals va ON va.source = pv.sa AND va.v = pv.v
             |  LEFT JOIN vals vb ON vb.source = pv.sb AND vb.v = pv.v),
             |walk AS (
             |  SELECT sa, sb, na, nb,
             |    CAST(sum(ca) OVER w AS BIGINT) AS cuma,
             |    CAST(sum(cb) OVER w AS BIGINT) AS cumb,
             |    coalesce(lead(v) OVER w2 - v, 0) AS dx
             |  FROM grid
             |  WINDOW w AS (PARTITION BY sa, sb ORDER BY v
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |  w2 AS (PARTITION BY sa, sb ORDER BY v))
             |SELECT sa AS source_a, sb AS source_b,
             |  floor(CAST(sum(abs(cuma*nb - cumb*na) * dx) AS BIGINT)
             |      ::DOUBLE / (na*nb)::DOUBLE * 1000000.0 + 0.5)
             |    / 1000000.0 AS w1
             |FROM walk GROUP BY sa, sb, na, nb
             |ORDER BY source_a, source_b""".stripMargin)))
}
