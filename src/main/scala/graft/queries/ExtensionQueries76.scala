package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.{PolyHash, Rounding}
import graft.io.Tables
import DriverSide._

/** Round-9 thirty-fourth wave: exact combinatorial assignment (q442),
  * capture-recapture population estimation (q443), a learned-index
  * error-bound audit (q444), and min-plus (shortest-path) matrix
  * iteration (q445).
  */
object ExtensionQueries76 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q442: optimal assignment, EXACTLY — route each region to a
    // dedicated order priority minimizing total mean ship latency. The
    // 5×5 cost matrix comes from exact day sums; the optimum is found
    // by exhaustive 5!-permutation search (driver-side — the "small
    // domain, exact answer" discipline; the oracle enumerates the same
    // 120 assignments via a 5-way self-join with distinctness
    // predicates and the same lexicographic tie-break). A greedy
    // row-by-row baseline is computed alongside: the optimality gap it
    // leaves is the point of the query.
    Q(
      "q442_optimal_assignment",
      (s, dir) => {
        val cells = Tables.load(s, dir, "lineitem")
          .join(Tables.load(s, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables.load(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.load(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.load(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name").as("region"),
            col("o_orderpriority").as("priority"))
          .agg(count(lit(1)).as("n"),
            sum(datediff(col("l_shipdate"), col("o_orderdate"))
              .cast("long")).as("sdays"))
          .collectBounded("region-priority cells")
          .map(r => ((r.getString(0), r.getString(1)),
            r.getLong(3).toDouble / r.getLong(2).toDouble))
          .toMap
        val regions = cells.keys.map(_._1).toSeq.distinct.sorted
        val prios = cells.keys.map(_._2).toSeq.distinct.sorted
        // an empty region×priority cell at some scale factor degrades to
        // an "infinite" assignment cost (matching the oracle's inner-join
        // semantics, which would never pick a missing cell) instead of
        // throwing NoSuchElementException mid-permutation-search
        def cost(r: String, p: String): Double =
          cells.getOrElse((r, p), Double.MaxValue)
        // exhaustive optimum, lexicographically-first among ties (seeded
        // with the identity assignment so bestPerm is never null even if
        // every permutation hits a missing cell)
        var bestPerm: Seq[String] = prios
        var bestCost = regions.zip(prios).map { case (r, p) => cost(r, p) }.sum
        prios.permutations.foreach { perm =>
          val c = regions.zip(perm).map { case (r, p) => cost(r, p) }.sum
          if (c < bestCost) { bestCost = c; bestPerm = perm }
        }
        // greedy: regions alphabetically pick the cheapest remaining
        var remaining = prios
        val greedy = regions.map { r =>
          val pick = remaining.minBy(p => (cost(r, p), p))
          remaining = remaining.filterNot(_ == pick)
          pick
        }
        val greedyCost = regions.zip(greedy).map { case (r, p) => cost(r, p) }.sum
        import s.implicits._
        regions.zipWithIndex.map { case (r, i) =>
          (r, bestPerm(i), greedy(i),
            math.floor(cost(r, bestPerm(i)) * 1e6 + 0.5) / 1e6,
            math.floor(bestCost * 1e6 + 0.5) / 1e6,
            math.floor(greedyCost * 1e6 + 0.5) / 1e6,
            greedyCost <= bestCost + 1e-12)
        }.toDF("region", "optimal_priority", "greedy_priority",
            "cell_cost_days", "optimal_total", "greedy_total",
            "greedy_is_optimal")
          .orderBy("region")
      },
      Some("""WITH cells AS MATERIALIZED (
             |  SELECT r_name AS region, o_orderpriority AS priority,
             |    sum(datediff('day', o_orderdate, l_shipdate))::DOUBLE
             |      / count(*)::DOUBLE AS cost
             |  FROM lineitem
             |  JOIN orders ON o_orderkey = l_orderkey
             |  JOIN customer ON c_custkey = o_custkey
             |  JOIN nation ON n_nationkey = c_nationkey
             |  JOIN region ON r_regionkey = n_regionkey
             |  GROUP BY 1, 2),
             |rg AS (SELECT region,
             |  row_number() OVER (ORDER BY region) AS i
             |  FROM (SELECT DISTINCT region FROM cells)),
             |perm AS (
             |  SELECT c0.priority AS p1, c1.priority AS p2,
             |    c2.priority AS p3, c3.priority AS p4,
             |    c4.priority AS p5,
             |    c0.cost + c1.cost + c2.cost + c3.cost + c4.cost
             |      AS total
             |  FROM (SELECT * FROM cells WHERE region =
             |    (SELECT region FROM rg WHERE i = 1)) c0
             |  JOIN (SELECT * FROM cells WHERE region =
             |    (SELECT region FROM rg WHERE i = 2)) c1
             |    ON c1.priority <> c0.priority
             |  JOIN (SELECT * FROM cells WHERE region =
             |    (SELECT region FROM rg WHERE i = 3)) c2
             |    ON c2.priority NOT IN (c0.priority, c1.priority)
             |  JOIN (SELECT * FROM cells WHERE region =
             |    (SELECT region FROM rg WHERE i = 4)) c3
             |    ON c3.priority NOT IN (c0.priority, c1.priority,
             |      c2.priority)
             |  JOIN (SELECT * FROM cells WHERE region =
             |    (SELECT region FROM rg WHERE i = 5)) c4
             |    ON c4.priority NOT IN (c0.priority, c1.priority,
             |      c2.priority, c3.priority)),
             |best AS MATERIALIZED (
             |  SELECT * FROM perm
             |  ORDER BY total, p1, p2, p3, p4, p5 LIMIT 1),
             |g1 AS MATERIALIZED (
             |  SELECT priority AS gp, cost FROM cells
             |  WHERE region = (SELECT region FROM rg WHERE i = 1)
             |  ORDER BY cost, priority LIMIT 1),
             |g2 AS MATERIALIZED (
             |  SELECT priority AS gp, cost FROM cells
             |  WHERE region = (SELECT region FROM rg WHERE i = 2)
             |    AND priority NOT IN (SELECT gp FROM g1)
             |  ORDER BY cost, priority LIMIT 1),
             |g3 AS MATERIALIZED (
             |  SELECT priority AS gp, cost FROM cells
             |  WHERE region = (SELECT region FROM rg WHERE i = 3)
             |    AND priority NOT IN (SELECT gp FROM g1
             |      UNION SELECT gp FROM g2)
             |  ORDER BY cost, priority LIMIT 1),
             |g4 AS MATERIALIZED (
             |  SELECT priority AS gp, cost FROM cells
             |  WHERE region = (SELECT region FROM rg WHERE i = 4)
             |    AND priority NOT IN (SELECT gp FROM g1
             |      UNION SELECT gp FROM g2 UNION SELECT gp FROM g3)
             |  ORDER BY cost, priority LIMIT 1),
             |g5 AS MATERIALIZED (
             |  SELECT priority AS gp, cost FROM cells
             |  WHERE region = (SELECT region FROM rg WHERE i = 5)
             |    AND priority NOT IN (SELECT gp FROM g1
             |      UNION SELECT gp FROM g2 UNION SELECT gp FROM g3
             |      UNION SELECT gp FROM g4)
             |  ORDER BY cost, priority LIMIT 1),
             |gall AS (
             |  SELECT 1 AS i, gp, cost FROM g1
             |  UNION ALL SELECT 2, gp, cost FROM g2
             |  UNION ALL SELECT 3, gp, cost FROM g3
             |  UNION ALL SELECT 4, gp, cost FROM g4
             |  UNION ALL SELECT 5, gp, cost FROM g5),
             |gt AS (
             |  SELECT (SELECT cost FROM g1) + (SELECT cost FROM g2)
             |    + (SELECT cost FROM g3) + (SELECT cost FROM g4)
             |    + (SELECT cost FROM g5) AS gtotal),
             |opt AS (
             |  SELECT 1 AS i, p1 AS op FROM best
             |  UNION ALL SELECT 2, p2 FROM best
             |  UNION ALL SELECT 3, p3 FROM best
             |  UNION ALL SELECT 4, p4 FROM best
             |  UNION ALL SELECT 5, p5 FROM best)
             |SELECT rg.region, opt.op AS optimal_priority,
             |  gall.gp AS greedy_priority,
             |  floor(cells.cost * 1000000 + 0.5) / 1000000
             |    AS cell_cost_days,
             |  floor(best.total * 1000000 + 0.5) / 1000000
             |    AS optimal_total,
             |  floor(gt.gtotal * 1000000 + 0.5) / 1000000
             |    AS greedy_total,
             |  gt.gtotal <= best.total + 0.000000000001
             |    AS greedy_is_optimal
             |FROM rg
             |JOIN opt ON opt.i = rg.i
             |JOIN gall ON gall.i = rg.i
             |JOIN cells ON cells.region = rg.region
             |  AND cells.priority = opt.op
             |CROSS JOIN best CROSS JOIN gt
             |ORDER BY rg.region""".stripMargin)),

    // ------------------------------------------------------------------
    // q443: capture-recapture — the ecology estimator repurposed for
    // "how many distinct users does the full stream have, given two
    // independent 1/16 row slices": Lincoln-Petersen n₁n₂/m and the
    // small-sample Chapman correction, audited against the exact
    // distinct count (the q436 estimator-bake-off discipline, different
    // estimator family: overlap-based instead of frequency-based).
    Q(
      "q443_capture_recapture",
      (s, dir) => {
        val hA = PolyHash(concat(lit("capA#"), col("event_id").cast("string")))
        val hB = PolyHash(concat(lit("capB#"), col("event_id").cast("string")))
        val e = Tables.load(s, dir, "events")
          .select(col("user_id"),
            (hA * hA % lit(PolyHash.Mod) % lit(16L) === 0L).as("in_a"),
            (hB * hB % lit(PolyHash.Mod) % lit(16L) === 0L).as("in_b"))
        val per = e.groupBy("user_id").agg(
          max(when(col("in_a"), 1L).otherwise(0L)).as("a"),
          max(when(col("in_b"), 1L).otherwise(0L)).as("b"))
        val agg = per.agg(count(lit(1)).as("exact"),
          sum("a").as("n1"), sum("b").as("n2"),
          sum(col("a") * col("b")).as("m"))
        agg
          .withColumn("lp", col("n1").cast("double")
            * col("n2").cast("double") / col("m").cast("double"))
          .withColumn("chap", (col("n1").cast("double") + 1.0)
            * (col("n2").cast("double") + 1.0)
            / (col("m").cast("double") + 1.0) - 1.0)
          .select(col("n1").as("captured_1"), col("n2").as("captured_2"),
            col("m").as("recaptured"), col("exact").as("exact_distinct"),
            when(col("m") > 0L, Rounding.stableRound6(col("lp")))
              .otherwise(lit(null).cast("double")).as("lincoln_petersen"),
            Rounding.stableRound6(col("chap")).as("chapman"),
            Rounding.stableRound6((col("chap")
              - col("exact").cast("double"))
              / col("exact").cast("double")).as("chapman_rel_err"))
      },
      Some {
        val hA = PolyHash.duckSql("'capA#' || event_id::VARCHAR")
        val hB = PolyHash.duckSql("'capB#' || event_id::VARCHAR")
        s"""WITH e AS (
           |  SELECT user_id,
           |    $hA * $hA % ${PolyHash.Mod} % 16 = 0 AS in_a,
           |    $hB * $hB % ${PolyHash.Mod} % 16 = 0 AS in_b
           |  FROM events),
           |per AS (
           |  SELECT user_id,
           |    max(CASE WHEN in_a THEN 1 ELSE 0 END) AS a,
           |    max(CASE WHEN in_b THEN 1 ELSE 0 END) AS b
           |  FROM e GROUP BY user_id),
           |agg AS (
           |  SELECT CAST(count(*) AS BIGINT) AS exact,
           |    CAST(sum(a) AS BIGINT) AS n1,
           |    CAST(sum(b) AS BIGINT) AS n2,
           |    CAST(sum(a * b) AS BIGINT) AS m
           |  FROM per)
           |SELECT n1 AS captured_1, n2 AS captured_2, m AS recaptured,
           |  exact AS exact_distinct,
           |  CASE WHEN m > 0 THEN ${Rounding.duckSql(
                "n1::DOUBLE * n2::DOUBLE / m::DOUBLE")}
           |    ELSE NULL END AS lincoln_petersen,
           |  ${Rounding.duckSql(
                "(n1::DOUBLE + 1.0) * (n2::DOUBLE + 1.0) " +
                  "/ (m::DOUBLE + 1.0) - 1.0")} AS chapman,
           |  ${Rounding.duckSql(
                "((n1::DOUBLE + 1.0) * (n2::DOUBLE + 1.0) " +
                  "/ (m::DOUBLE + 1.0) - 1.0 - exact::DOUBLE) " +
                  "/ exact::DOUBLE")} AS chapman_rel_err
           |FROM agg""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q444: learned-index error-bound audit — how learnable is the key
    // distribution? Fit position ~ key by OLS over the sorted partkey
    // domain (exact decimal power sums), report the MAX absolute
    // position error — exactly the search-bound a single-segment
    // learned index (RMI root) would need — then the same per key
    // quartile, showing how 4 segments shrink the bound. Uniform-ish
    // synthetic keys → tight bounds; the audit quantifies it instead
    // of assuming it.
    Q(
      "q444_learned_index_audit",
      (s, dir) => {
        // r15 window census: this was the one remaining DATA-SIZED
        // partition-less window (row_number over every distinct part
        // key — the whole key domain through one task). Positions now
        // come from ext.Ranking's two-pass range-partitioned global
        // rank (the q115/q142 machinery); same (k, pos) rows, and nK
        // falls out of pass 1 for free.
        val (rankedK, nK) = graft.ext.Ranking.withGlobalRankAndCount(
          Tables.load(s, dir, "part")
            .select(PolyHash(concat(lit("li#"),
              col("p_partkey").cast("string"))).as("k")).distinct(),
          Seq(col("k")))
        val keys = rankedK
          .withColumn("pos", (col("global_rank") - 1L).cast("long"))
          .drop("global_rank")
          .localCheckpoint()
        val seg = keys.withColumn("segment",
          least(lit(3L), expr(s"(pos * 4) div $nK")))
        def fitErr(df: org.apache.spark.sql.DataFrame,
            segCol: String): org.apache.spark.sql.DataFrame = {
          val sums = df.groupBy(segCol).agg(count(lit(1)).as("n"),
            sum("k").as("sk"), sum("pos").as("sp"),
            sum((col("k") * col("k")).cast("decimal(38,0)")).as("skk"),
            sum((col("k") * col("pos")).cast("decimal(38,0)")).as("skp"))
            .withColumn("nd", col("n").cast("double"))
            .withColumn("b1", (col("skp").cast("double")
              - col("sk").cast("double") * col("sp").cast("double")
                / col("nd"))
              / (col("skk").cast("double") - col("sk").cast("double")
                * col("sk").cast("double") / col("nd")))
            .withColumn("b0", col("sp").cast("double") / col("nd")
              - col("b1") * col("sk").cast("double") / col("nd"))
          df.join(broadcast(sums), segCol)
            .withColumn("err", abs(col("pos").cast("double")
              - (col("b0") + col("b1") * col("k").cast("double"))))
            .groupBy(segCol, "n", "b0", "b1")
            .agg(max("err").as("max_err"))
        }
        val global = fitErr(keys.withColumn("segment", lit(-1L)),
          "segment")
        val perSeg = fitErr(seg, "segment")
        global.unionAll(perSeg)
          .select(col("segment"), col("n").as("n_keys"),
            Rounding.stableRound6(col("b1")).as("slope"),
            Rounding.stableRound6(col("b0")).as("intercept"),
            Rounding.stableRound6(col("max_err")).as("max_abs_err"))
          .orderBy("segment")
      },
      Some {
        val hk = PolyHash.duckSql("'li#' || p_partkey::VARCHAR")
        s"""WITH keys AS MATERIALIZED (
             |  SELECT k, row_number() OVER (ORDER BY k) - 1 AS pos
             |  FROM (SELECT DISTINCT $hk AS k FROM part)),
             |nk AS (SELECT CAST(count(*) AS BIGINT) AS n FROM keys),
             |segd AS (
             |  SELECT k, pos,
             |    least(3, (pos * 4) // (SELECT n FROM nk)) AS segment
             |  FROM keys),
             |allseg AS (
             |  SELECT k, pos, CAST(-1 AS BIGINT) AS segment FROM keys
             |  UNION ALL
             |  SELECT k, pos, CAST(segment AS BIGINT) FROM segd),
             |sums AS (
             |  SELECT segment, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(k) AS BIGINT) AS sk,
             |    CAST(sum(pos) AS BIGINT) AS sp,
             |    sum(k * k) AS skk, sum(k * pos) AS skp
             |  FROM allseg GROUP BY segment),
             |fit AS (
             |  SELECT segment, n,
             |    (skp::DOUBLE - sk::DOUBLE * sp::DOUBLE / n::DOUBLE)
             |      / (skk::DOUBLE - sk::DOUBLE * sk::DOUBLE / n::DOUBLE)
             |      AS b1,
             |    sp::DOUBLE / n::DOUBLE
             |      - ((skp::DOUBLE - sk::DOUBLE * sp::DOUBLE / n::DOUBLE)
             |        / (skk::DOUBLE - sk::DOUBLE * sk::DOUBLE
             |          / n::DOUBLE)) * sk::DOUBLE / n::DOUBLE AS b0
             |  FROM sums),
             |err AS (
             |  SELECT b.segment, any_value(fit.n) AS n,
             |    any_value(fit.b1) AS b1, any_value(fit.b0) AS b0,
             |    max(abs(b.pos::DOUBLE - (fit.b0 + fit.b1 * b.k::DOUBLE)))
             |      AS max_err
             |  FROM allseg b JOIN fit ON fit.segment = b.segment
             |  GROUP BY b.segment)
             |SELECT segment, n AS n_keys,
             |  floor(b1 * 1000000 + 0.5) / 1000000 AS slope,
             |  floor(b0 * 1000000 + 0.5) / 1000000 AS intercept,
             |  floor(max_err * 1000000 + 0.5) / 1000000 AS max_abs_err
             |FROM err
             |ORDER BY segment""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q445: single-source shortest paths by MIN-PLUS matrix iteration —
    // the weighted upgrade over q136's BFS: edge weight between
    // co-purchased brands is −ln(n_ij/n_max) ≥ 0 (strong associations
    // are short), and 24 Bellman-Ford relaxation rounds run as min-plus
    // products over the 25-brand domain (the q374 iteration discipline
    // in the (min, +) semiring instead of (+, ×)). Source = the
    // lexicographically-first brand; unreachable stays at the 1e18
    // sentinel and emits NULL. Distances need no grid snapping: every
    // candidate path length is the same fixed left-to-right double sum
    // in both engines, and min over identical sets is exact.
    Q(
      "q445_minplus_shortest_path",
      (s, dir) => {
        val br = Tables.load(s, dir, "lineitem")
          .join(broadcast(Tables.load(s, dir, "part")
            .select("p_partkey", "p_brand")),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("o"), col("p_brand").as("b"))
          .distinct()
        val pairs = br.as("x").join(br.as("y"),
            col("x.o") === col("y.o") && col("x.b") < col("y.b"))
          .groupBy(col("x.b").as("a"), col("y.b").as("c"))
          .agg(count(lit(1)).as("n"))
          .collectBounded("brand co-occurrence cells")
          .map(r => ((r.getString(0), r.getString(1)),
            r.getLong(2)))
        val nMax = pairs.map(_._2).max
        val brands = pairs.flatMap(p => Seq(p._1._1, p._1._2))
          .distinct.sorted
        val w = scala.collection.mutable.Map[(String, String), Double]()
        pairs.foreach { case ((a, c), n) =>
          val wt = -math.log(n.toDouble / nMax.toDouble)
          w((a, c)) = wt; w((c, a)) = wt
        }
        val inf = 1e18
        val src = brands.head
        var d = brands.map(b => if (b == src) 0.0 else inf)
        for (_ <- 1 to 24) {
          d = brands.zipWithIndex.map { case (bj, j) =>
            val relax = brands.zipWithIndex.map { case (bi, i) =>
              w.get((bi, bj)).map(d(i) + _).getOrElse(inf)
            }.min
            math.min(d(j), relax)
          }
        }
        import s.implicits._
        brands.zipWithIndex.map { case (b, j) =>
          (b, if (d(j) >= 1e17) None
          else Some(math.floor(d(j) * 1e6 + 0.5) / 1e6))
        }.toSeq
          .toDF("brand", "dist_from_source")
          .orderBy("brand")
      },
      Some("""WITH br AS (
             |  SELECT DISTINCT l_orderkey AS o, p_brand AS b
             |  FROM lineitem JOIN part ON p_partkey = l_partkey),
             |pr AS (
             |  SELECT x.b AS a, y.b AS c, CAST(count(*) AS BIGINT) AS n
             |  FROM br x JOIN br y ON x.o = y.o AND x.b < y.b
             |  GROUP BY 1, 2),
             |mx AS (SELECT max(n) AS nmax FROM pr),
             |ed AS (
             |  SELECT a, c, -ln(n::DOUBLE / nmax::DOUBLE) AS w
             |  FROM pr CROSS JOIN mx
             |  UNION ALL
             |  SELECT c, a, -ln(n::DOUBLE / nmax::DOUBLE)
             |  FROM pr CROSS JOIN mx),
             |st AS (SELECT DISTINCT a AS s FROM ed),
             |sti AS (SELECT s, row_number() OVER (ORDER BY s) AS i
             |        FROM st),
             |dense AS (
             |  SELECT x.i AS i, y.i AS j,
             |    coalesce(ed.w, 1e18) AS w
             |  FROM sti x CROSS JOIN sti y
             |  LEFT JOIN ed ON ed.a = x.s AND ed.c = y.s),
             |pm AS (
             |  SELECT list(rowlist ORDER BY i) AS wmat,
             |    (SELECT count(*) FROM st) AS ns
             |  FROM (SELECT i, list(w ORDER BY j) AS rowlist
             |        FROM dense GROUP BY i)),
             |fit AS (
             |  SELECT * FROM (
             |    WITH RECURSIVE it AS (
             |      SELECT 0 AS kk,
             |        (SELECT list_transform(range(1, ns + 1), ii ->
             |          CASE WHEN ii = 1 THEN 0.0::DOUBLE
             |          ELSE 1e18::DOUBLE END) FROM pm) AS d
             |      UNION ALL
             |      SELECT kk + 1,
             |        list_transform(range(1, pm.ns + 1), jj ->
             |          least(it.d[jj], list_min(
             |            list_transform(range(1, pm.ns + 1), ii ->
             |              it.d[ii] + pm.wmat[ii][jj]))))
             |      FROM it, pm WHERE kk < 24)
             |    SELECT d FROM it WHERE kk = 24))
             |SELECT sti.s AS brand,
             |  CASE WHEN fit.d[sti.i] >= 1e17 THEN NULL
             |    ELSE floor(fit.d[sti.i] * 1000000 + 0.5) / 1000000 END
             |    AS dist_from_source
             |FROM sti CROSS JOIN fit
             |ORDER BY brand""".stripMargin))
  )
}
