package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.{PolyHash, Rounding}
import graft.io.Tables
import DriverSide._

/** Round-9 twenty-ninth wave: regression influence diagnostics (q422),
  * Bradley-Terry pairwise-preference strengths — the arena-ranking
  * estimator (q423), the Markov stationary distribution with an
  * empirical-frequency audit (q424), and leakage-safe k-fold
  * cross-validation (q425).
  */
object ExtensionQueries71 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q422: Cook's distance influence audit — which lineitem rows most
    // distort the price~quantity regression? For simple OLS every
    // ingredient has a closed form off FIVE exact integer sums (the
    // quantity domain is 1..50, so Σx/Σx² are small LONGs; Σxy/Σy²
    // sum in decimal(38,0)): slope/intercept, per-row leverage
    // hᵢ = 1/n + (xᵢ−x̄)²/Sxx, residual, and
    // Dᵢ = eᵢ²hᵢ/(2s²(1−hᵢ)²). Because b0/b1/s² come from exact sums
    // through one fixed op sequence, the D > 4/n influence filter
    // compares IDENTICAL doubles in both engines — no boundary drift.
    // One scan + a broadcast statistics row; emits only the
    // influential rows.
    Q(
      "q422_cooks_distance",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity").cast("long").as("x"),
            floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("y"))
        val sums = li.agg(count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
          sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"))
          .withColumn("nd", col("n").cast("double"))
          .withColumn("xbar", col("sx").cast("double") / col("nd"))
          .withColumn("ybar", col("sy").cast("double") / col("nd"))
          .withColumn("sxx_c", col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double")
              / col("nd"))
          .withColumn("sxy_c", col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double")
              / col("nd"))
          .withColumn("syy_c", col("syy").cast("double")
            - col("sy").cast("double") * col("sy").cast("double")
              / col("nd"))
          .withColumn("b1", col("sxy_c") / col("sxx_c"))
          .withColumn("b0", col("ybar") - col("b1") * col("xbar"))
          .withColumn("s2", (col("syy_c")
            - col("b1") * col("b1") * col("sxx_c"))
            / (col("nd") - 2.0))
        li.crossJoin(broadcast(sums))
          .withColumn("e", col("y").cast("double") - col("b0")
            - col("b1") * col("x").cast("double"))
          .withColumn("h", lit(1.0) / col("nd")
            + (col("x").cast("double") - col("xbar"))
              * (col("x").cast("double") - col("xbar")) / col("sxx_c"))
          .withColumn("d", col("e") * col("e") * col("h")
            / (lit(2.0) * col("s2") * (lit(1.0) - col("h"))
              * (lit(1.0) - col("h"))))
          .where(col("d") > lit(4.0) / col("nd"))
          .select(col("l_orderkey"), col("l_linenumber"),
            col("x").as("quantity"), col("y").as("price_cents"),
            Rounding.stableRound6(col("e")).as("residual"),
            Rounding.stableRound6(col("h")).as("leverage"),
            Rounding.stableRound6(col("d")).as("cook_d"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some(s"""WITH li AS (
             |  SELECT l_orderkey, l_linenumber,
             |    CAST(l_quantity AS BIGINT) AS x,
             |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
             |  FROM lineitem),
             |sums AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS sx,
             |    CAST(sum(y) AS BIGINT) AS sy,
             |    CAST(sum(x * x) AS BIGINT) AS sxx,
             |    sum(x * y) AS sxy, sum(y * y) AS syy
             |  FROM li),
             |st AS (
             |  SELECT *, n::DOUBLE AS nd,
             |    sx::DOUBLE / n::DOUBLE AS xbar,
             |    sy::DOUBLE / n::DOUBLE AS ybar,
             |    sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n::DOUBLE AS sxx_c,
             |    sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE / n::DOUBLE AS sxy_c,
             |    syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n::DOUBLE AS syy_c
             |  FROM sums),
             |b AS (
             |  SELECT *, sxy_c / sxx_c AS b1,
             |    ybar - (sxy_c / sxx_c) * xbar AS b0,
             |    (syy_c - (sxy_c / sxx_c) * (sxy_c / sxx_c) * sxx_c)
             |      / (nd - 2.0) AS s2
             |  FROM st),
             |d AS (
             |  SELECT li.l_orderkey, li.l_linenumber, li.x, li.y,
             |    li.y::DOUBLE - b.b0 - b.b1 * li.x::DOUBLE AS e,
             |    1.0 / b.nd + (li.x::DOUBLE - b.xbar)
             |      * (li.x::DOUBLE - b.xbar) / b.sxx_c AS h,
             |    b.nd
             |  FROM li CROSS JOIN b),
             |dd AS (
             |  SELECT *, e * e * h
             |    / (2.0 * (SELECT s2 FROM b) * (1.0 - h) * (1.0 - h)) AS d
             |  FROM d)
             |SELECT l_orderkey, l_linenumber, x AS quantity,
             |  y AS price_cents,
             |  ${Rounding.duckSql("e")} AS residual,
             |  ${Rounding.duckSql("h")} AS leverage,
             |  ${Rounding.duckSql("d")} AS cook_d
             |FROM dd
             |WHERE d > 4.0 / nd
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ------------------------------------------------------------------
    // q423: Bradley-Terry strengths — the pairwise-preference model
    // behind LLM-arena leaderboards, fit on brand "matches": two brands
    // meeting in one order, the higher line revenue winning (exact-tie
    // pairs excluded — no fp coin-flip). The minorization-maximization
    // update πᵢ ← Wᵢ / Σⱼ nᵢⱼ/(πᵢ+πⱼ) iterates 30 times DRIVER-SIDE over
    // the 25-brand domain (the q374 discipline), normalized and snapped
    // to the 1e-9 grid each step so both engines walk the same
    // trajectory; the oracle replays it in a recursive CTE over dense
    // list matrices. The corpus-sized work is one groupBy(order, brand)
    // and a per-order self-join bounded by Σ(brands/order)².
    Q(
      "q423_bradley_terry",
      (s, dir) => {
        val br = Tables.load(s, dir, "lineitem")
          .join(broadcast(Tables.load(s, dir, "part")
            .select("p_partkey", "p_brand")),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_orderkey").as("o"), col("p_brand").as("b"))
          .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
            .as("rev"))
        val m = br.as("x").join(br.as("y"),
            col("x.o") === col("y.o") && col("x.b") < col("y.b")
              && col("x.rev") =!= col("y.rev"))
          .select(col("x.b").as("a"), col("y.b").as("c"),
            (col("x.rev") > col("y.rev")).as("a_wins"))
        val cnt = m.groupBy("a", "c")
          .agg(count(lit(1)).as("n_ac"),
            sum(when(col("a_wins"), 1L).otherwise(0L)).as("w_a"))
          .collectBounded("pairwise-preference cells")
          .map(r => ((r.getString(0), r.getString(1)),
            (r.getLong(2), r.getLong(3))))
          .toMap
        val brands = cnt.keys.flatMap(k => Seq(k._1, k._2))
          .toSeq.distinct.sorted
        val k = brands.length
        def nOf(i: String, j: String): Long =
          cnt.get((i, j)).map(_._1)
            .orElse(cnt.get((j, i)).map(_._1)).getOrElse(0L)
        def wOf(i: String, j: String): Long =
          cnt.get((i, j)).map(_._2)
            .orElse(cnt.get((j, i)).map(v => v._1 - v._2)).getOrElse(0L)
        val wTot = brands.map(i => i -> brands.map(j => wOf(i, j)).sum).toMap
        val nTot = brands.map(i => i -> brands.map(j => nOf(i, j)).sum).toMap
        def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
        var pi = brands.map(_ => 1.0 / k)
        for (_ <- 1 to 30) {
          val raw = brands.zipWithIndex.map { case (bi, i) =>
            if (wTot(bi) == 0L) 0.0
            else wTot(bi).toDouble / brands.zipWithIndex.map {
              case (bj, j) =>
                val nij = nOf(bi, bj)
                if (nij == 0L) 0.0
                else nij.toDouble / (pi(i) + pi(j))
            }.sum
          }
          val sSum = raw.sum
          pi = raw.map(v => snap9(v / sSum))
        }
        import s.implicits._
        brands.zipWithIndex
          .map { case (bi, i) => (bi, nTot(bi), wTot(bi),
            math.floor(pi(i) * 1e6 + 0.5) / 1e6) }
          .toDF("brand", "n_matches", "n_wins", "strength")
          .orderBy("brand")
      },
      Some("""WITH br AS (
             |  SELECT l_orderkey AS o, p_brand AS b,
             |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
             |      AS BIGINT)) AS BIGINT) AS rev
             |  FROM lineitem JOIN part ON p_partkey = l_partkey
             |  GROUP BY 1, 2),
             |m AS (
             |  SELECT x.b AS a, y.b AS c, x.rev > y.rev AS a_wins
             |  FROM br x JOIN br y
             |    ON x.o = y.o AND x.b < y.b AND x.rev <> y.rev),
             |cnt AS (
             |  SELECT a, c, CAST(count(*) AS BIGINT) AS n_ac,
             |    CAST(sum(CASE WHEN a_wins THEN 1 ELSE 0 END) AS BIGINT)
             |      AS w_a
             |  FROM m GROUP BY 1, 2),
             |st AS (SELECT DISTINCT b AS s FROM (
             |  SELECT a AS b FROM cnt UNION SELECT c FROM cnt)),
             |sti AS (SELECT s, row_number() OVER (ORDER BY s) AS i
             |        FROM st),
             |dense AS (
             |  SELECT x.i AS i, y.i AS j,
             |    coalesce(cab.n_ac, cba.n_ac, 0) AS n,
             |    coalesce(cab.w_a, cba.n_ac - cba.w_a, 0) AS w
             |  FROM sti x CROSS JOIN sti y
             |  LEFT JOIN cnt cab ON cab.a = x.s AND cab.c = y.s
             |  LEFT JOIN cnt cba ON cba.a = y.s AND cba.c = x.s),
             |wt AS (SELECT i, CAST(sum(w) AS BIGINT) AS w_tot,
             |         CAST(sum(n) AS BIGINT) AS n_tot
             |       FROM dense GROUP BY i),
             |pm AS (
             |  SELECT list(rowlist ORDER BY i) AS nmat,
             |    (SELECT list(w_tot ORDER BY i) FROM wt) AS wv,
             |    (SELECT list(s ORDER BY s) FROM st) AS names,
             |    (SELECT count(*) FROM st) AS ns
             |  FROM (SELECT i, list(n ORDER BY j) AS rowlist
             |        FROM dense GROUP BY i)),
             |fit AS (
             |  SELECT * FROM (
             |    WITH RECURSIVE it AS (
             |      SELECT 0 AS kk,
             |        (SELECT list_transform(range(1, ns + 1),
             |          ii -> 1.0::DOUBLE / ns) FROM pm) AS pi
             |      UNION ALL
             |      SELECT kk + 1,
             |        list_transform(raw, v ->
             |          floor(v / s * 1000000000.0 + 0.5) / 1000000000.0)
             |      FROM (
             |        SELECT kk, raw,
             |          list_reduce(raw, (a, b) -> a + b) AS s
             |        FROM (
             |          SELECT it.kk,
             |            list_transform(range(1, pm.ns + 1), ii ->
             |              CASE WHEN pm.wv[ii] = 0 THEN 0.0::DOUBLE
             |              ELSE pm.wv[ii]::DOUBLE / list_reduce(
             |                list_transform(range(1, pm.ns + 1), jj ->
             |                  CASE WHEN pm.nmat[ii][jj] = 0
             |                    THEN 0.0::DOUBLE
             |                  ELSE pm.nmat[ii][jj]::DOUBLE
             |                    / (it.pi[ii] + it.pi[jj]) END),
             |                (a, b) -> a + b) END) AS raw
             |          FROM it, pm WHERE it.kk < 30)))
             |    SELECT pi FROM it WHERE kk = 30))
             |SELECT sti.s AS brand, wt.n_tot AS n_matches,
             |  wt.w_tot AS n_wins,
             |  floor(pi[sti.i] * 1000000 + 0.5) / 1000000 AS strength
             |FROM sti
             |JOIN wt ON wt.i = sti.i
             |CROSS JOIN fit
             |ORDER BY brand""".stripMargin)),

    // ------------------------------------------------------------------
    // q424: Markov stationary distribution — the long-run occupancy of
    // the event-type chain (the equilibrium companion to q374's hitting
    // times and q98's transition counts): 60 power iterations of
    // π ← πP driver-side over the ≤5-state domain, snapped to the 1e-9
    // grid per step, audited against the EMPIRICAL source-state
    // frequency (for a chain estimated from trajectories the two agree
    // up to boundary effects — the gap column measures exactly that).
    Q(
      "q424_markov_stationary",
      (s, dir) => {
        val wU = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("us", "event_id")
        val tr = Tables.load(s, dir, "events")
          .select(col("user_id"),
            unix_micros(col("ts").cast("timestamp")).as("us"),
            col("event_id"), col("event_type"))
          .withColumn("nxt", lead("event_type", 1).over(wU))
          .where(col("nxt").isNotNull)
          .groupBy(col("event_type").as("src"), col("nxt").as("dst"))
          .agg(count(lit(1)).as("c"))
        val cnt = tr.collectBounded("event-type transition cells")
          .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
          .toMap
        val states = cnt.keys.flatMap(k => Seq(k._1, k._2))
          .toSeq.distinct.sorted
        val nOut = states.map(si =>
          si -> states.map(sj => cnt.getOrElse((si, sj), 0L)).sum).toMap
        val nAll = nOut.values.sum
        def p(i: String, j: String): Double =
          cnt.getOrElse((i, j), 0L).toDouble / nOut(i).toDouble
        def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
        var pi = states.map(_ => 1.0 / states.length)
        for (_ <- 1 to 60) {
          val raw = states.map { sj =>
            states.zipWithIndex.map { case (si, i) => pi(i) * p(si, sj) }.sum
          }
          val sSum = raw.sum
          pi = raw.map(v => snap9(v / sSum))
        }
        import s.implicits._
        states.zipWithIndex
          .map { case (st, i) =>
            val emp = nOut(st).toDouble / nAll.toDouble
            (st, nOut(st), math.floor(pi(i) * 1e6 + 0.5) / 1e6,
              math.floor(emp * 1e6 + 0.5) / 1e6,
              math.floor(math.abs(pi(i) - emp) * 1e6 + 0.5) / 1e6)
          }
          .toDF("state", "n_out", "stationary", "empirical_share",
            "abs_gap")
          .orderBy("state")
      },
      Some("""WITH tr AS (
             |  SELECT event_type AS src, nxt AS dst FROM (
             |    SELECT event_type, lead(event_type) OVER (
             |      PARTITION BY user_id
             |      ORDER BY epoch_us(ts::TIMESTAMP), event_id) AS nxt
             |    FROM events)
             |  WHERE nxt IS NOT NULL),
             |cnt AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS c
             |        FROM tr GROUP BY 1, 2),
             |st AS (SELECT DISTINCT src AS s FROM tr
             |       UNION SELECT DISTINCT dst FROM tr),
             |sti AS (SELECT s, row_number() OVER (ORDER BY s) AS i
             |        FROM st),
             |no AS (SELECT src, CAST(sum(c) AS BIGINT) AS n_out
             |       FROM cnt GROUP BY src),
             |na AS (SELECT CAST(sum(n_out) AS BIGINT) AS n_all FROM no),
             |dense AS (
             |  SELECT a.i AS i, b.i AS j,
             |    coalesce(c.c, 0)::DOUBLE / no.n_out::DOUBLE AS p
             |  FROM sti a CROSS JOIN sti b
             |  JOIN no ON no.src = a.s
             |  LEFT JOIN cnt c ON c.src = a.s AND c.dst = b.s),
             |pm AS (
             |  SELECT list(rowlist ORDER BY i) AS pmat,
             |    (SELECT count(*) FROM st) AS ns
             |  FROM (SELECT i, list(p ORDER BY j) AS rowlist
             |        FROM dense GROUP BY i)),
             |fit AS (
             |  SELECT * FROM (
             |    WITH RECURSIVE it AS (
             |      SELECT 0 AS kk,
             |        (SELECT list_transform(range(1, ns + 1),
             |          ii -> 1.0::DOUBLE / ns) FROM pm) AS pi
             |      UNION ALL
             |      SELECT kk + 1,
             |        list_transform(raw, v ->
             |          floor(v / s * 1000000000.0 + 0.5) / 1000000000.0)
             |      FROM (
             |        SELECT kk, raw,
             |          list_reduce(raw, (a, b) -> a + b) AS s
             |        FROM (
             |          SELECT it.kk,
             |            list_transform(range(1, pm.ns + 1), jj ->
             |              list_reduce(list_transform(range(1, pm.ns + 1),
             |                ii -> it.pi[ii] * pm.pmat[ii][jj]),
             |                (a, b) -> a + b)) AS raw
             |          FROM it, pm WHERE it.kk < 60)))
             |    SELECT pi FROM it WHERE kk = 60))
             |SELECT sti.s AS state, no.n_out,
             |  floor(pi[sti.i] * 1000000 + 0.5) / 1000000 AS stationary,
             |  floor(no.n_out::DOUBLE / na.n_all::DOUBLE * 1000000 + 0.5)
             |    / 1000000 AS empirical_share,
             |  floor(abs(pi[sti.i] - no.n_out::DOUBLE / na.n_all::DOUBLE)
             |    * 1000000 + 0.5) / 1000000 AS abs_gap
             |FROM sti
             |JOIN no ON no.src = sti.s
             |CROSS JOIN na
             |CROSS JOIN fit
             |ORDER BY state""".stripMargin)),

    // ------------------------------------------------------------------
    // q425: leakage-safe k-fold cross-validation — the evaluation
    // harness primitive: 5 uniformized-PolyHash folds over orders, the
    // model "per-priority mean price" trained on the 4 held-in folds
    // WITHOUT a second scan (train sums = broadcast totals MINUS the
    // fold's own sums — the algebra that makes k-fold one-pass at
    // 100 TB), scored on the held-out fold. Per-row errors snap to the
    // 1e-3 cents grid and square in decimal(19,0)² so the fold RMSEs
    // are exact; the skill column compares against the pooled-mean
    // baseline trained the same leakage-safe way.
    Q(
      "q425_kfold_cv",
      (s, dir) => {
        val h = PolyHash(concat(lit("cv#"), col("o_orderkey").cast("string")))
        val o = Tables.load(s, dir, "orders")
          .select(col("o_orderpriority").as("priority"),
            floor(col("o_totalprice") * 100 + 0.5).cast("long").as("y"),
            (h * h % lit(PolyHash.Mod) % lit(5L)).as("fold"))
        val fp = o.groupBy("fold", "priority")
          .agg(count(lit(1)).as("n_fp"), sum("y").as("s_fp"))
          .localCheckpoint()
        val pTot = fp.groupBy("priority")
          .agg(sum("n_fp").as("n_p"), sum("s_fp").as("s_p"))
        val fTot = fp.groupBy("fold")
          .agg(sum("n_fp").as("n_f"), sum("s_fp").as("s_f"))
        val gTot = fp.agg(sum("n_fp").as("n_g"), sum("s_fp").as("s_g"))
        val trainMean = fp.join(broadcast(pTot), "priority")
          .withColumn("mu", (col("s_p") - col("s_fp")).cast("double")
            / (col("n_p") - col("n_fp")).cast("double"))
          .select("fold", "priority", "mu")
        val baseMean = fTot.crossJoin(broadcast(gTot))
          .withColumn("mu0", (col("s_g") - col("s_f")).cast("double")
            / (col("n_g") - col("n_f")).cast("double"))
          .select("fold", "mu0")
        val scored = o.join(broadcast(trainMean), Seq("fold", "priority"))
          .join(broadcast(baseMean), "fold")
          .withColumn("e3", floor((col("y").cast("double") - col("mu"))
            * 1000.0 + 0.5).cast("decimal(19,0)"))
          .withColumn("b3", floor((col("y").cast("double") - col("mu0"))
            * 1000.0 + 0.5).cast("decimal(19,0)"))
        scored.groupBy("fold")
          .agg(count(lit(1)).as("n_test"),
            sum(col("e3") * col("e3")).as("se2"),
            sum(col("b3") * col("b3")).as("sb2"))
          .withColumn("rmse_model", sqrt(col("se2").cast("double")
            / col("n_test").cast("double")) / 1000.0 / 100.0)
          .withColumn("rmse_baseline", sqrt(col("sb2").cast("double")
            / col("n_test").cast("double")) / 1000.0 / 100.0)
          .select(col("fold"), col("n_test"),
            Rounding.stableRound6(col("rmse_model")).as("rmse_model"),
            Rounding.stableRound6(col("rmse_baseline"))
              .as("rmse_baseline"),
            Rounding.stableRound6(lit(1.0)
              - col("rmse_model") / col("rmse_baseline")).as("skill"))
          .orderBy("fold")
      },
      Some {
        val h = PolyHash.duckSql("'cv#' || o_orderkey::VARCHAR")
        s"""WITH o AS (
           |  SELECT o_orderpriority AS priority,
           |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y,
           |    $h * $h % ${PolyHash.Mod} % 5 AS fold
           |  FROM orders),
           |fp AS (
           |  SELECT fold, priority, CAST(count(*) AS BIGINT) AS n_fp,
           |    CAST(sum(y) AS BIGINT) AS s_fp
           |  FROM o GROUP BY 1, 2),
           |pt AS (
           |  SELECT priority, CAST(sum(n_fp) AS BIGINT) AS n_p,
           |    CAST(sum(s_fp) AS BIGINT) AS s_p
           |  FROM fp GROUP BY 1),
           |ft AS (
           |  SELECT fold, CAST(sum(n_fp) AS BIGINT) AS n_f,
           |    CAST(sum(s_fp) AS BIGINT) AS s_f
           |  FROM fp GROUP BY 1),
           |gt AS (
           |  SELECT CAST(sum(n_fp) AS BIGINT) AS n_g,
           |    CAST(sum(s_fp) AS BIGINT) AS s_g
           |  FROM fp),
           |tm AS (
           |  SELECT fold, fp.priority,
           |    (s_p - s_fp)::DOUBLE / (n_p - n_fp)::DOUBLE AS mu
           |  FROM fp JOIN pt ON pt.priority = fp.priority),
           |bm AS (
           |  SELECT fold, (s_g - s_f)::DOUBLE / (n_g - n_f)::DOUBLE AS mu0
           |  FROM ft CROSS JOIN gt),
           |sc AS (
           |  SELECT o.fold,
           |    CAST(floor((o.y::DOUBLE - tm.mu) * 1000.0 + 0.5)
           |      AS HUGEINT) AS e3,
           |    CAST(floor((o.y::DOUBLE - bm.mu0) * 1000.0 + 0.5)
           |      AS HUGEINT) AS b3
           |  FROM o
           |  JOIN tm ON tm.fold = o.fold AND tm.priority = o.priority
           |  JOIN bm ON bm.fold = o.fold),
           |agg AS (
           |  SELECT fold, CAST(count(*) AS BIGINT) AS n_test,
           |    sum(e3 * e3) AS se2, sum(b3 * b3) AS sb2
           |  FROM sc GROUP BY fold)
           |SELECT fold, n_test,
           |  ${Rounding.duckSql(
                "sqrt(se2::DOUBLE / n_test::DOUBLE) / 1000.0 / 100.0")}
           |    AS rmse_model,
           |  ${Rounding.duckSql(
                "sqrt(sb2::DOUBLE / n_test::DOUBLE) / 1000.0 / 100.0")}
           |    AS rmse_baseline,
           |  ${Rounding.duckSql(
                "1.0 - (sqrt(se2::DOUBLE / n_test::DOUBLE) / 1000.0 " +
                  "/ 100.0) / (sqrt(sb2::DOUBLE / n_test::DOUBLE) " +
                  "/ 1000.0 / 100.0)")} AS skill
           |FROM agg
           |ORDER BY fold""".stripMargin
      })
  )
}
