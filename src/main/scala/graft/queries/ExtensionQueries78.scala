package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.Rounding
import graft.io.Tables
import DriverSide._

/** Round-9 thirty-sixth wave: exact min-cut/max-flow (q450),
  * Mahalanobis multivariate outliers (q451), a ridge regularization
  * path (q452), and Cronbach's alpha reliability (q453).
  */
object ExtensionQueries78 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q450: min-cut = max-flow, EXACTLY — how many orders can actually
    // route through the segment → priority network when supply and
    // demand sides are capped at 70% of their observed volume (the
    // caps make middle edges compete; uncapped, the flow trivially
    // saturates)? Strong duality turns max-flow into a MIN over all
    // 2¹⁰ source/sink-side partitions of the ten interior nodes — an
    // exact enumeration both engines replay bit-for-bit (driver-side
    // scan vs a range(1024) bitmask join), tie-broken to the smallest
    // mask. Capacities are exact integers; no fp is involved at all.
    Q(
      "q450_mincut_maxflow",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
          .join(Tables.load(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment").as("seg"),
            col("o_orderpriority").as("pri"))
          .agg(count(lit(1)).as("n"))
          .collectBounded("segment-priority cells")
          .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
          .toMap
        val segs = o.keys.map(_._1).toSeq.distinct.sorted
        val pris = o.keys.map(_._2).toSeq.distinct.sorted
        val capS = segs.map(g =>
          g -> o.filter(_._1._1 == g).values.sum * 7L / 10L).toMap
        val capT = pris.map(p =>
          p -> o.filter(_._1._2 == p).values.sum * 7L / 10L).toMap
        val nS = segs.length
        var bestMask = -1
        var bestCut = Long.MaxValue
        (0 until (1 << (nS + pris.length))).foreach { m =>
          var cut = 0L
          segs.zipWithIndex.foreach { case (g, i) =>
            if ((m & (1 << i)) == 0) cut += capS(g)
          }
          pris.zipWithIndex.foreach { case (p, j) =>
            if ((m & (1 << (nS + j))) != 0) cut += capT(p)
          }
          segs.zipWithIndex.foreach { case (g, i) =>
            pris.zipWithIndex.foreach { case (p, j) =>
              if ((m & (1 << i)) != 0 && (m & (1 << (nS + j))) == 0)
                cut += o.getOrElse((g, p), 0L)
            }
          }
          if (cut < bestCut) { bestCut = cut; bestMask = m }
        }
        import s.implicits._
        val rows =
          segs.zipWithIndex.map { case (g, i) =>
            (g, "segment", (bestMask & (1 << i)) != 0, capS(g))
          } ++ pris.zipWithIndex.map { case (p, j) =>
            (p, "priority", (bestMask & (1 << (nS + j))) != 0, capT(p))
          }
        rows.toDF("node", "node_type", "source_side", "capacity")
          .withColumn("max_flow", lit(bestCut))
          .withColumn("cut_mask", lit(bestMask.toLong))
          .orderBy("node_type", "node")
      },
      Some("""WITH o AS (
             |  SELECT c_mktsegment AS seg, o_orderpriority AS pri,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM orders JOIN customer ON c_custkey = o_custkey
             |  GROUP BY 1, 2),
             |sg AS (SELECT seg, CAST(sum(n) * 7 // 10 AS BIGINT) AS cap,
             |  row_number() OVER (ORDER BY seg) - 1 AS i
             |  FROM o GROUP BY seg),
             |pr AS (SELECT pri, CAST(sum(n) * 7 // 10 AS BIGINT) AS cap,
             |  row_number() OVER (ORDER BY pri) - 1 AS j
             |  FROM o GROUP BY pri),
             |ns AS (SELECT CAST(count(*) AS BIGINT) AS k FROM sg),
             |masks AS (SELECT CAST(unnest(range(1 << (
             |  (SELECT count(*) FROM sg) + (SELECT count(*) FROM pr))))
             |  AS BIGINT) AS m),
             |cuts AS (
             |  SELECT m,
             |    (SELECT coalesce(sum(cap), 0) FROM sg
             |     WHERE (m >> i) & 1 = 0)
             |    + (SELECT coalesce(sum(cap), 0) FROM pr CROSS JOIN ns
             |       WHERE (m >> (k + j)) & 1 = 1)
             |    + (SELECT coalesce(sum(o.n), 0)
             |       FROM o JOIN sg ON sg.seg = o.seg
             |       JOIN pr ON pr.pri = o.pri CROSS JOIN ns
             |       WHERE (m >> sg.i) & 1 = 1
             |         AND (m >> (k + pr.j)) & 1 = 0) AS cut
             |  FROM masks),
             |best AS (
             |  SELECT m, CAST(cut AS BIGINT) AS cut FROM cuts
             |  ORDER BY cut, m LIMIT 1),
             |nodes AS (
             |  SELECT seg AS node, 'segment' AS node_type,
             |    ((SELECT m FROM best) >> i) & 1 = 1 AS source_side,
             |    cap AS capacity
             |  FROM sg
             |  UNION ALL
             |  SELECT pri, 'priority',
             |    ((SELECT m FROM best) >> ((SELECT k FROM ns) + j)) & 1
             |      = 1,
             |    cap
             |  FROM pr)
             |SELECT node, node_type, source_side, capacity,
             |  (SELECT cut FROM best) AS max_flow,
             |  (SELECT m FROM best) AS cut_mask
             |FROM nodes
             |ORDER BY node_type, node""".stripMargin)),

    // ------------------------------------------------------------------
    // q451: Mahalanobis multivariate outliers — which lineitems are
    // jointly unusual across (quantity, discount, tax) even when each
    // coordinate looks normal? The 3×3 covariance comes from exact
    // LONG/decimal product sums, its inverse from the closed-form
    // adjugate (one fixed double sequence — no iterative solver), and
    // every row's d² = vᵀΣ⁻¹v is the identical arithmetic in both
    // engines, so the d² > 8 near-corner filter selects the same rows
    // bit-for-bit (bounded uniform features cap d² just below 9 — a
    // χ²₃ quantile would never fire; the audit threshold is chosen for
    // the support, and that reasoning is itself the point). One scan +
    // a broadcast statistics row.
    Q(
      "q451_mahalanobis_outliers",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity").cast("long").as("x"),
            floor(col("l_discount") * 10000 + 0.5).cast("long").as("y"),
            floor(col("l_tax") * 10000 + 0.5).cast("long").as("z"))
        val g = li.agg(count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"), sum("z").as("sz"),
          sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
          sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"),
          sum((col("z") * col("z")).cast("decimal(38,0)")).as("szz"),
          sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
          sum((col("x") * col("z")).cast("decimal(38,0)")).as("sxz"),
          sum((col("y") * col("z")).cast("decimal(38,0)")).as("syz"))
          .withColumn("nd", col("n").cast("double"))
          .withColumn("mx", col("sx").cast("double") / col("nd"))
          .withColumn("my", col("sy").cast("double") / col("nd"))
          .withColumn("mz", col("sz").cast("double") / col("nd"))
          .withColumn("a", col("sxx").cast("double") / col("nd")
            - col("mx") * col("mx"))
          .withColumn("b", col("sxy").cast("double") / col("nd")
            - col("mx") * col("my"))
          .withColumn("c", col("sxz").cast("double") / col("nd")
            - col("mx") * col("mz"))
          .withColumn("d", col("syy").cast("double") / col("nd")
            - col("my") * col("my"))
          .withColumn("e", col("syz").cast("double") / col("nd")
            - col("my") * col("mz"))
          .withColumn("f", col("szz").cast("double") / col("nd")
            - col("mz") * col("mz"))
          .withColumn("det", col("a") * (col("d") * col("f")
            - col("e") * col("e"))
            - col("b") * (col("b") * col("f") - col("e") * col("c"))
            + col("c") * (col("b") * col("e") - col("d") * col("c")))
          .withColumn("i11", (col("d") * col("f") - col("e") * col("e"))
            / col("det"))
          .withColumn("i12", (col("c") * col("e") - col("b") * col("f"))
            / col("det"))
          .withColumn("i13", (col("b") * col("e") - col("c") * col("d"))
            / col("det"))
          .withColumn("i22", (col("a") * col("f") - col("c") * col("c"))
            / col("det"))
          .withColumn("i23", (col("b") * col("c") - col("a") * col("e"))
            / col("det"))
          .withColumn("i33", (col("a") * col("d") - col("b") * col("b"))
            / col("det"))
        li.crossJoin(broadcast(g))
          .withColumn("vx", col("x").cast("double") - col("mx"))
          .withColumn("vy", col("y").cast("double") - col("my"))
          .withColumn("vz", col("z").cast("double") - col("mz"))
          .withColumn("d2",
            col("vx") * (col("i11") * col("vx") + col("i12") * col("vy")
              + col("i13") * col("vz"))
              + col("vy") * (col("i12") * col("vx")
                + col("i22") * col("vy") + col("i23") * col("vz"))
              + col("vz") * (col("i13") * col("vx")
                + col("i23") * col("vy") + col("i33") * col("vz")))
          .where(col("d2") > 8.0)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("x").as("quantity"), col("y").as("discount_bps"),
            col("z").as("tax_bps"),
            Rounding.stableRound6(col("d2")).as("mahalanobis_sq"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some(s"""WITH li AS (
             |  SELECT l_orderkey, l_linenumber,
             |    CAST(l_quantity AS BIGINT) AS x,
             |    CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS y,
             |    CAST(floor(l_tax * 10000 + 0.5) AS BIGINT) AS z
             |  FROM lineitem),
             |g AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS sx,
             |    CAST(sum(y) AS BIGINT) AS sy,
             |    CAST(sum(z) AS BIGINT) AS sz,
             |    sum(x * x) AS sxx, sum(y * y) AS syy, sum(z * z) AS szz,
             |    sum(x * y) AS sxy, sum(x * z) AS sxz, sum(y * z) AS syz
             |  FROM li),
             |mu AS (
             |  SELECT n, n::DOUBLE AS nd,
             |    sx::DOUBLE / n::DOUBLE AS mx,
             |    sy::DOUBLE / n::DOUBLE AS my,
             |    sz::DOUBLE / n::DOUBLE AS mz,
             |    sxx::DOUBLE / n::DOUBLE
             |      - (sx::DOUBLE / n::DOUBLE) * (sx::DOUBLE / n::DOUBLE)
             |      AS a,
             |    sxy::DOUBLE / n::DOUBLE
             |      - (sx::DOUBLE / n::DOUBLE) * (sy::DOUBLE / n::DOUBLE)
             |      AS b,
             |    sxz::DOUBLE / n::DOUBLE
             |      - (sx::DOUBLE / n::DOUBLE) * (sz::DOUBLE / n::DOUBLE)
             |      AS c,
             |    syy::DOUBLE / n::DOUBLE
             |      - (sy::DOUBLE / n::DOUBLE) * (sy::DOUBLE / n::DOUBLE)
             |      AS d,
             |    syz::DOUBLE / n::DOUBLE
             |      - (sy::DOUBLE / n::DOUBLE) * (sz::DOUBLE / n::DOUBLE)
             |      AS e,
             |    szz::DOUBLE / n::DOUBLE
             |      - (sz::DOUBLE / n::DOUBLE) * (sz::DOUBLE / n::DOUBLE)
             |      AS f
             |  FROM g),
             |inv AS (
             |  SELECT *,
             |    a * (d * f - e * e) - b * (b * f - e * c)
             |      + c * (b * e - d * c) AS det
             |  FROM mu),
             |iv AS (
             |  SELECT *,
             |    (d * f - e * e) / det AS i11,
             |    (c * e - b * f) / det AS i12,
             |    (b * e - c * d) / det AS i13,
             |    (a * f - c * c) / det AS i22,
             |    (b * c - a * e) / det AS i23,
             |    (a * d - b * b) / det AS i33
             |  FROM inv),
             |d2 AS (
             |  SELECT li.l_orderkey, li.l_linenumber, li.x, li.y, li.z,
             |    (li.x::DOUBLE - mx) * (i11 * (li.x::DOUBLE - mx)
             |      + i12 * (li.y::DOUBLE - my) + i13 * (li.z::DOUBLE - mz))
             |    + (li.y::DOUBLE - my) * (i12 * (li.x::DOUBLE - mx)
             |      + i22 * (li.y::DOUBLE - my) + i23 * (li.z::DOUBLE - mz))
             |    + (li.z::DOUBLE - mz) * (i13 * (li.x::DOUBLE - mx)
             |      + i23 * (li.y::DOUBLE - my) + i33 * (li.z::DOUBLE - mz))
             |      AS d2
             |  FROM li CROSS JOIN iv)
             |SELECT l_orderkey, l_linenumber, x AS quantity,
             |  y AS discount_bps, z AS tax_bps,
             |  ${Rounding.duckSql("d2")} AS mahalanobis_sq
             |FROM d2
             |WHERE d2 > 8.0
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ------------------------------------------------------------------
    // q452: ridge regularization path — the q421 lag+trend regression
    // re-solved on the STANDARDIZED scale at λ ∈ {0, 0.1, 0.5, 1, 5}:
    // β(λ) = (R + λI)⁻¹ r where R is the 2×2 regressor correlation
    // matrix and r the response correlations (all from exact power
    // sums), closed-form 2×2 inverse per λ. The shrinkage column
    // ‖β(λ)‖/‖β(0)‖ makes the regularization story a number. The λ=0
    // row must reproduce OLS — a built-in cross-check against q421's
    // standardized coefficients.
    Q(
      "q452_ridge_path",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window.orderBy("day")
        val daily = Tables.load(s, dir, "events")
          .where(col("event_type") === "purchase")
          .groupBy(to_date(col("ts")).as("day"))
          .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("y"))
          .withColumn("x1", lag("y", 1).over(w))
          .withColumn("t", row_number().over(w).cast("long"))
          .where(col("x1").isNotNull)
        val sums = daily.agg(count(lit(1)).as("n"),
          sum("y").as("sy"), sum("x1").as("s1"), sum("t").as("s2"),
          sum((col("x1") * col("x1")).cast("decimal(38,0)")).as("s11"),
          sum((col("t") * col("t")).cast("decimal(38,0)")).as("s22"),
          sum((col("x1") * col("t")).cast("decimal(38,0)")).as("s12"),
          sum((col("x1") * col("y")).cast("decimal(38,0)")).as("s1y"),
          sum((col("t") * col("y")).cast("decimal(38,0)")).as("s2y"),
          sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"))
          .withColumn("nd", col("n").cast("double"))
        def cdev(ab: String, a: String, b: String) =
          col(ab).cast("double") - (col(a).cast("double")
            * col(b).cast("double") / col("nd"))
        val r = sums
          .withColumn("c11", cdev("s11", "s1", "s1"))
          .withColumn("c22", cdev("s22", "s2", "s2"))
          .withColumn("c12", cdev("s12", "s1", "s2"))
          .withColumn("c1y", cdev("s1y", "s1", "sy"))
          .withColumn("c2y", cdev("s2y", "s2", "sy"))
          .withColumn("cyy", cdev("syy", "sy", "sy"))
          .withColumn("r12", col("c12") / sqrt(col("c11") * col("c22")))
          .withColumn("r1y", col("c1y") / sqrt(col("c11") * col("cyy")))
          .withColumn("r2y", col("c2y") / sqrt(col("c22") * col("cyy")))
        import s.implicits._
        val lams = Seq(0.0, 0.1, 0.5, 1.0, 5.0).toDF("lambda")
        r.crossJoin(broadcast(lams))
          .withColumn("det", (lit(1.0) + col("lambda"))
            * (lit(1.0) + col("lambda")) - col("r12") * col("r12"))
          .withColumn("b1", ((lit(1.0) + col("lambda")) * col("r1y")
            - col("r12") * col("r2y")) / col("det"))
          .withColumn("b2", ((lit(1.0) + col("lambda")) * col("r2y")
            - col("r12") * col("r1y")) / col("det"))
          .withColumn("b1_0", (col("r1y") - col("r12") * col("r2y"))
            / (lit(1.0) - col("r12") * col("r12")))
          .withColumn("b2_0", (col("r2y") - col("r12") * col("r1y"))
            / (lit(1.0) - col("r12") * col("r12")))
          .select(col("lambda"),
            Rounding.stableRound6(col("b1")).as("beta_lag1_std"),
            Rounding.stableRound6(col("b2")).as("beta_trend_std"),
            Rounding.stableRound6(
              sqrt(col("b1") * col("b1") + col("b2") * col("b2"))
                / sqrt(col("b1_0") * col("b1_0")
                  + col("b2_0") * col("b2_0"))).as("shrinkage"))
          .orderBy("lambda")
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
             |c AS (
             |  SELECT n::DOUBLE AS nd,
             |    s11::DOUBLE - s1::DOUBLE * s1::DOUBLE / n::DOUBLE AS c11,
             |    s22::DOUBLE - s2::DOUBLE * s2::DOUBLE / n::DOUBLE AS c22,
             |    s12::DOUBLE - s1::DOUBLE * s2::DOUBLE / n::DOUBLE AS c12,
             |    s1y::DOUBLE - s1::DOUBLE * sy::DOUBLE / n::DOUBLE AS c1y,
             |    s2y::DOUBLE - s2::DOUBLE * sy::DOUBLE / n::DOUBLE AS c2y,
             |    syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n::DOUBLE AS cyy
             |  FROM sums),
             |r AS (
             |  SELECT c12 / sqrt(c11 * c22) AS r12,
             |    c1y / sqrt(c11 * cyy) AS r1y,
             |    c2y / sqrt(c22 * cyy) AS r2y
             |  FROM c),
             |lams AS (SELECT unnest([0.0, 0.1, 0.5, 1.0, 5.0])
             |  AS lambda),
             |p AS (
             |  SELECT lambda,
             |    (1.0 + lambda) * (1.0 + lambda) - r12 * r12 AS det,
             |    r12, r1y, r2y,
             |    (r1y - r12 * r2y) / (1.0 - r12 * r12) AS b1_0,
             |    (r2y - r12 * r1y) / (1.0 - r12 * r12) AS b2_0
             |  FROM r CROSS JOIN lams),
             |b AS (
             |  SELECT lambda,
             |    ((1.0 + lambda) * r1y - r12 * r2y) / det AS b1,
             |    ((1.0 + lambda) * r2y - r12 * r1y) / det AS b2,
             |    b1_0, b2_0
             |  FROM p)
             |SELECT lambda,
             |  ${Rounding.duckSql("b1")} AS beta_lag1_std,
             |  ${Rounding.duckSql("b2")} AS beta_trend_std,
             |  ${Rounding.duckSql(
                  "sqrt(b1 * b1 + b2 * b2) " +
                    "/ sqrt(b1_0 * b1_0 + b2_0 * b2_0)")} AS shrinkage
             |FROM b
             |ORDER BY lambda""".stripMargin)),

    // ------------------------------------------------------------------
    // q453: Cronbach's alpha — do the five per-user event-type counts
    // behave as one coherent "activity" scale?
    // α = k/(k−1)·(1 − Σᵢvar(itemᵢ)/var(total)), every variance from
    // exact LONG count sums over the user frame (items = the event-type
    // counts, total = events per user). The item-variance terms and
    // the verdict (α ≥ 0.7 is the conventional reliability bar) ship
    // per item row.
    Q(
      "q453_cronbach_alpha",
      (s, dir) => {
        val per = Tables.load(s, dir, "events")
          .groupBy("user_id")
          .pivot("event_type")
          .agg(count(lit(1)))
          .na.fill(0L)
        val items = per.columns.filterNot(_ == "user_id").sorted
        val k = items.length
        val withTot = per.withColumn("total",
          items.map(col).reduce(_ + _))
        def varStats(c: String) = struct(
          sum(col(c)).as("s"),
          sum((col(c) * col(c)).cast("decimal(38,0)")).as("q"))
        val agg = withTot.agg(count(lit(1)).as("n"),
          varStats("total").as("vt"),
          struct(items.map(i => varStats(i).as(i)): _*).as("vi"))
        val row = agg.collectBounded("global stats row").head
        val n = row.getLong(0).toDouble
        def vOf(st: org.apache.spark.sql.Row): Double = {
          val sSum = st.getLong(0).toDouble
          val q = st.getDecimal(1).doubleValue()
          q / n - (sSum / n) * (sSum / n)
        }
        val vTot = vOf(row.getStruct(1))
        val vis = items.zipWithIndex.map { case (i, ix) =>
          i -> vOf(row.getStruct(2).getStruct(ix))
        }
        val sumVi = vis.map(_._2).sum
        val alpha = k.toDouble / (k - 1) * (1.0 - sumVi / vTot)
        import s.implicits._
        vis.map { case (i, v) =>
          (i, math.floor(v * 1e6 + 0.5) / 1e6,
            math.floor(vTot * 1e6 + 0.5) / 1e6,
            math.floor(alpha * 1e6 + 0.5) / 1e6,
            alpha >= 0.7)
        }.toSeq
          .toDF("item", "item_variance", "total_variance",
            "cronbach_alpha", "reliable_07")
          .orderBy("item")
      },
      Some("""WITH per AS (
             |  SELECT user_id,
             |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
             |      END) AS BIGINT) AS c_click,
             |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0
             |      END) AS BIGINT) AS c_error,
             |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
             |      ELSE 0 END) AS BIGINT) AS c_purchase,
             |    CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0
             |      END) AS BIGINT) AS c_signup,
             |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0
             |      END) AS BIGINT) AS c_view,
             |    CAST(count(*) AS BIGINT) AS total
             |  FROM events GROUP BY user_id),
             |ag AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |    sum(c_click) AS s1, sum(c_click * c_click) AS q1,
             |    sum(c_error) AS s2, sum(c_error * c_error) AS q2,
             |    sum(c_purchase) AS s3, sum(c_purchase * c_purchase)
             |      AS q3,
             |    sum(c_signup) AS s4, sum(c_signup * c_signup) AS q4,
             |    sum(c_view) AS s5, sum(c_view * c_view) AS q5,
             |    sum(total) AS st, sum(total * total) AS qt
             |  FROM per),
             |vs AS (
             |  SELECT n,
             |    q1::DOUBLE / n::DOUBLE - (s1::DOUBLE / n::DOUBLE)
             |      * (s1::DOUBLE / n::DOUBLE) AS v1,
             |    q2::DOUBLE / n::DOUBLE - (s2::DOUBLE / n::DOUBLE)
             |      * (s2::DOUBLE / n::DOUBLE) AS v2,
             |    q3::DOUBLE / n::DOUBLE - (s3::DOUBLE / n::DOUBLE)
             |      * (s3::DOUBLE / n::DOUBLE) AS v3,
             |    q4::DOUBLE / n::DOUBLE - (s4::DOUBLE / n::DOUBLE)
             |      * (s4::DOUBLE / n::DOUBLE) AS v4,
             |    q5::DOUBLE / n::DOUBLE - (s5::DOUBLE / n::DOUBLE)
             |      * (s5::DOUBLE / n::DOUBLE) AS v5,
             |    qt::DOUBLE / n::DOUBLE - (st::DOUBLE / n::DOUBLE)
             |      * (st::DOUBLE / n::DOUBLE) AS vt
             |  FROM ag),
             |al AS (
             |  SELECT *,
             |    5.0 / 4.0 * (1.0 - (v1 + v2 + v3 + v4 + v5) / vt)
             |      AS alpha
             |  FROM vs),
             |items AS (
             |  SELECT 'click' AS item, v1 AS iv FROM al
             |  UNION ALL SELECT 'error', v2 FROM al
             |  UNION ALL SELECT 'purchase', v3 FROM al
             |  UNION ALL SELECT 'signup', v4 FROM al
             |  UNION ALL SELECT 'view', v5 FROM al)
             |SELECT item,
             |  floor(iv * 1000000 + 0.5) / 1000000 AS item_variance,
             |  floor((SELECT vt FROM al) * 1000000 + 0.5) / 1000000
             |    AS total_variance,
             |  floor((SELECT alpha FROM al) * 1000000 + 0.5) / 1000000
             |    AS cronbach_alpha,
             |  (SELECT alpha FROM al) >= 0.7 AS reliable_07
             |FROM items
             |ORDER BY item""".stripMargin))
  )
}
