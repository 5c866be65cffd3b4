package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.Rounding
import graft.io.Tables
import DriverSide._

/** Round-9 thirty-first wave: TOST equivalence testing (q430), Lloyd-Max
  * optimal scalar quantization (q431), grid-density (DBSCAN-style)
  * clustering (q432), and the stratification design effect (q433).
  */
object ExtensionQueries73 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q430: TOST equivalence test — the inverted question A/B tooling
    // usually gets wrong: not "is B different" but "is B provably NO
    // WORSE than A within margin δ". Two one-sided z tests on the
    // purchase-rate difference between the even/odd user arms with
    // δ = 0.02: equivalence holds iff BOTH (d+δ)/SE > 1.645 and
    // (d−δ)/SE < −1.645. Exact counts → one fixed double sequence; the
    // two z statistics and both one-sided verdicts are emitted so a
    // failed equivalence shows WHICH side failed.
    Q(
      "q430_tost_equivalence",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select((col("user_id") % 2 === 0).as("arm_a"),
            when(col("event_type") === "purchase", 1L).otherwise(0L)
              .as("pos"))
        val g = e.groupBy("arm_a").agg(count(lit(1)).as("n"),
          sum("pos").as("k"))
        val a = g.where(col("arm_a"))
          .select(col("n").as("n_a"), col("k").as("k_a"))
        val b = g.where(!col("arm_a"))
          .select(col("n").as("n_b"), col("k").as("k_b"))
        a.crossJoin(b)
          .withColumn("p_a", col("k_a").cast("double") / col("n_a").cast("double"))
          .withColumn("p_b", col("k_b").cast("double") / col("n_b").cast("double"))
          .withColumn("d", col("p_a") - col("p_b"))
          .withColumn("se", sqrt(
            col("p_a") * (lit(1.0) - col("p_a")) / col("n_a").cast("double")
              + col("p_b") * (lit(1.0) - col("p_b"))
                / col("n_b").cast("double")))
          .withColumn("z_lo", (col("d") + 0.02) / col("se"))
          .withColumn("z_hi", (col("d") - 0.02) / col("se"))
          .select(col("n_a"), col("n_b"),
            Rounding.stableRound6(col("p_a")).as("rate_a"),
            Rounding.stableRound6(col("p_b")).as("rate_b"),
            Rounding.stableRound6(col("d")).as("diff"),
            Rounding.stableRound6(col("se")).as("se"),
            Rounding.stableRound6(col("z_lo")).as("z_lower"),
            Rounding.stableRound6(col("z_hi")).as("z_upper"),
            (col("z_lo") > 1.6448536269514722).as("lower_ok"),
            (col("z_hi") < -1.6448536269514722).as("upper_ok"),
            (col("z_lo") > 1.6448536269514722 &&
              col("z_hi") < -1.6448536269514722).as("equivalent"))
      },
      Some(s"""WITH e AS (
             |  SELECT user_id % 2 = 0 AS arm_a,
             |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
             |      AS pos
             |  FROM events),
             |g AS (
             |  SELECT arm_a, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(pos) AS BIGINT) AS k
             |  FROM e GROUP BY arm_a),
             |j AS (
             |  SELECT a.n AS n_a, a.k AS k_a, b.n AS n_b, b.k AS k_b
             |  FROM (SELECT * FROM g WHERE arm_a) a
             |  CROSS JOIN (SELECT * FROM g WHERE NOT arm_a) b),
             |st AS (
             |  SELECT *, k_a::DOUBLE / n_a::DOUBLE AS p_a,
             |    k_b::DOUBLE / n_b::DOUBLE AS p_b
             |  FROM j),
             |z AS (
             |  SELECT *, p_a - p_b AS d,
             |    sqrt(p_a * (1.0 - p_a) / n_a::DOUBLE
             |      + p_b * (1.0 - p_b) / n_b::DOUBLE) AS se
             |  FROM st)
             |SELECT n_a, n_b,
             |  ${Rounding.duckSql("p_a")} AS rate_a,
             |  ${Rounding.duckSql("p_b")} AS rate_b,
             |  ${Rounding.duckSql("d")} AS diff,
             |  ${Rounding.duckSql("se")} AS se,
             |  ${Rounding.duckSql("(d + 0.02) / se")} AS z_lower,
             |  ${Rounding.duckSql("(d - 0.02) / se")} AS z_upper,
             |  (d + 0.02) / se > 1.6448536269514722 AS lower_ok,
             |  (d - 0.02) / se < -1.6448536269514722 AS upper_ok,
             |  (d + 0.02) / se > 1.6448536269514722
             |    AND (d - 0.02) / se < -1.6448536269514722 AS equivalent
             |FROM z""".stripMargin)),

    // ------------------------------------------------------------------
    // q431: Lloyd-Max optimal scalar quantizer — the data-adaptive
    // counterpart to q112's uniform int8 grid: an 8-level codebook
    // trained by 12 Lloyd iterations over the DOLLAR VALUE DOMAIN
    // (≤ ~561 (value, count) rows — the corpus never reaches the
    // driver), assignment = first-index-of-min distance (the exact
    // tie rule both engines replay: Scala scan vs DuckDB
    // list_indexof(.., list_min)), centroids snapped to the 1e-9 grid
    // per iteration, empty cells keep their centroid. Reports each
    // level's centroid/mass plus the quantization-MSE win over the
    // uniform 8-level grid — per-term MSE contributions snap to a
    // 1e-3 LONG grid so the sums are order-independent.
    Q(
      "q431_lloyd_max_quantizer",
      (s, dir) => {
        val dom = Tables.load(s, dir, "events")
          .groupBy(floor(col("value")).cast("long").as("d"))
          .agg(count(lit(1)).as("cnt"))
          .collectBounded("value-domain histogram")
          .map(r => (r.getLong(0), r.getLong(1)))
          .sortBy(_._1)
        val lo = dom.map(_._1).min
        val hi = dom.map(_._1).max
        def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
        val width = (hi + 1 - lo).toDouble / 8.0
        val uniform = (0 until 8)
          .map(k => snap9(lo + (k + 0.5) * width))
        var cb = uniform.toArray
        def assign(d: Long, c: Array[Double]): Int = {
          val dists = c.map(ck => math.abs(d.toDouble - ck))
          dists.indexOf(dists.min)
        }
        for (_ <- 1 to 12) {
          val sums = Array.fill(8)(0.0)
          val ns = Array.fill(8)(0L)
          dom.foreach { case (d, cnt) =>
            val k = assign(d, cb)
            sums(k) += d.toDouble * cnt
            ns(k) += cnt
          }
          cb = (0 until 8).map(k =>
            if (ns(k) > 0L) snap9(sums(k) / ns(k)) else cb(k)).toArray
        }
        def mse(c: Array[Double]): (Array[Long], Double) = {
          val ns = Array.fill(8)(0L)
          var t = 0L
          var n = 0L
          dom.foreach { case (d, cnt) =>
            val k = assign(d, c)
            ns(k) += cnt
            val e = d.toDouble - c(k)
            t += math.floor(cnt * e * e * 1000.0 + 0.5).toLong
            n += cnt
          }
          (ns, t.toDouble / 1000.0 / n)
        }
        val (nsL, mseL) = mse(cb)
        val (_, mseU) = mse(uniform.toArray)
        import s.implicits._
        (0 until 8).map { k =>
          (k.toLong, math.floor(cb(k) * 1e6 + 0.5) / 1e6, nsL(k),
            math.floor(mseL * 1e6 + 0.5) / 1e6,
            math.floor(mseU * 1e6 + 0.5) / 1e6,
            math.floor((1.0 - mseL / mseU) * 1e6 + 0.5) / 1e6)
        }.toDF("level", "centroid", "n_points", "mse_lloyd",
            "mse_uniform", "mse_reduction")
          .orderBy("level")
      },
      Some {
        // 12 Lloyd iterations UNROLLED as chained CTEs (a recursive CTE
        // may reference itself only once, and this step needs the
        // previous codebook in three places)
        def step(i: Int): String = {
          val prev = if (i == 1) "uni" else s"cb${i - 1}"
          s"""cb$i AS MATERIALIZED (
             |  SELECT list(CASE WHEN w > 0 THEN
             |      floor(sd / w * 1000000000.0 + 0.5) / 1000000000.0
             |    ELSE co END ORDER BY idx) AS cb
             |  FROM (
             |    SELECT ix.idx, (SELECT cb FROM $prev)[ix.idx] AS co,
             |      coalesce(sum(a.cnt * a.d) FILTER (WHERE a.k = ix.idx),
             |        0)::DOUBLE AS sd,
             |      coalesce(sum(a.cnt) FILTER (WHERE a.k = ix.idx),
             |        0)::DOUBLE AS w
             |    FROM (SELECT unnest(range(1, 9)) AS idx) ix
             |    CROSS JOIN (
             |      SELECT d, cnt, list_indexof(
             |        list_transform((SELECT cb FROM $prev),
             |          c -> abs(d::DOUBLE - c)),
             |        list_min(list_transform((SELECT cb FROM $prev),
             |          c -> abs(d::DOUBLE - c)))) AS k
             |      FROM dom) a
             |    GROUP BY ix.idx, co))""".stripMargin
        }
        val steps = (1 to 12).map(step).mkString(",\n")
        s"""WITH dom AS MATERIALIZED (
           |  SELECT CAST(floor(value) AS BIGINT) AS d,
           |    CAST(count(*) AS BIGINT) AS cnt
           |  FROM events GROUP BY 1),
           |bounds AS (
           |  SELECT min(d) AS lo, max(d) AS hi,
           |    CAST(sum(cnt) AS BIGINT) AS n
           |  FROM dom),
           |uni AS MATERIALIZED (
           |  SELECT (SELECT list(
           |    floor((lo + (k + 0.5) * ((hi + 1 - lo)::DOUBLE / 8.0))
           |      * 1000000000.0 + 0.5) / 1000000000.0 ORDER BY k)
           |    FROM (SELECT unnest(range(8)) AS k) ks
           |    CROSS JOIN bounds) AS cb),
           |$steps,
           |fit AS (SELECT cb FROM cb12),
           |asn AS (""".stripMargin + """
             |  SELECT d, cnt, list_indexof(
             |      list_transform(fit.cb, c -> abs(d::DOUBLE - c)),
             |      list_min(list_transform(fit.cb,
             |        c -> abs(d::DOUBLE - c)))) AS k,
             |    fit.cb[list_indexof(
             |      list_transform(fit.cb, c -> abs(d::DOUBLE - c)),
             |      list_min(list_transform(fit.cb,
             |        c -> abs(d::DOUBLE - c))))] AS c
             |  FROM dom CROSS JOIN fit),
             |asu AS (
             |  SELECT d, cnt,
             |    uni.cb[list_indexof(
             |      list_transform(uni.cb, c -> abs(d::DOUBLE - c)),
             |      list_min(list_transform(uni.cb,
             |        c -> abs(d::DOUBLE - c))))] AS c
             |  FROM dom CROSS JOIN uni),
             |ml AS (
             |  SELECT CAST(sum(CAST(floor(cnt * (d::DOUBLE - c)
             |    * (d::DOUBLE - c) * 1000.0 + 0.5) AS BIGINT)) AS BIGINT)
             |    AS t9
             |  FROM asn),
             |mu AS (
             |  SELECT CAST(sum(CAST(floor(cnt * (d::DOUBLE - c)
             |    * (d::DOUBLE - c) * 1000.0 + 0.5) AS BIGINT)) AS BIGINT)
             |    AS t9
             |  FROM asu),
             |lv AS (
             |  SELECT ix.idx - 1 AS level, fit.cb[ix.idx] AS centroid,
             |    CAST(coalesce(sum(asn.cnt) FILTER (
             |      WHERE asn.k = ix.idx), 0) AS BIGINT) AS n_points
             |  FROM (SELECT unnest(range(1, 9)) AS idx) ix
             |  CROSS JOIN fit
             |  CROSS JOIN asn
             |  GROUP BY ix.idx, fit.cb)
             |SELECT CAST(level AS BIGINT) AS level,
             |  floor(centroid * 1000000 + 0.5) / 1000000 AS centroid,
             |  n_points,
             |  floor(ml.t9::DOUBLE / 1000.0 / bounds.n::DOUBLE
             |    * 1000000 + 0.5) / 1000000 AS mse_lloyd,
             |  floor(mu.t9::DOUBLE / 1000.0 / bounds.n::DOUBLE
             |    * 1000000 + 0.5) / 1000000 AS mse_uniform,
             |  floor((1.0 - (ml.t9::DOUBLE / 1000.0 / bounds.n::DOUBLE)
             |    / (mu.t9::DOUBLE / 1000.0 / bounds.n::DOUBLE))
             |    * 1000000 + 0.5) / 1000000 AS mse_reduction
             |FROM lv CROSS JOIN ml CROSS JOIN mu CROSS JOIN bounds
             |ORDER BY level""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q432: grid-density clustering (DBSCAN on a quantized grid) over
    // the first two embedding dimensions: cells of width 0.1 with ≥ 5
    // points are CORE; core cells connect through 8-neighbor adjacency;
    // clusters are the connected components labeled by their minimum
    // packed cell key. The density grid is bounded by the value range
    // (never the corpus), so the component search runs driver-side
    // union-find over ≤ ~100 cells (q374 discipline) while the oracle
    // replays it as a recursive min-label propagation to fixpoint.
    // Non-core points count as noise — reported in a separate row with
    // cluster_id = -1.
    Q(
      "q432_grid_dbscan",
      (s, dir) => {
        val pts = Tables.load(s, dir, "embeddings")
          .select(
            floor(element_at(col("embedding"), 1).cast("double") / 0.1)
              .cast("long").as("cx"),
            floor(element_at(col("embedding"), 2).cast("double") / 0.1)
              .cast("long").as("cy"))
        val cells = pts.groupBy("cx", "cy").agg(count(lit(1)).as("n"))
        val core = cells.where(col("n") >= 5)
          .collectBounded("grid cells")
          .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
        def key(c: (Long, Long)): Long = (c._1 + 100) * 1000 + (c._2 + 100)
        // driver-side union-find over the bounded core-cell set
        val parent = scala.collection.mutable.Map[Long, Long]()
        core.foreach { case (c, _) => parent(key(c)) = key(c) }
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          r
        }
        def union(a: Long, b: Long): Unit = {
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) {
            if (ra < rb) parent(rb) = ra else parent(ra) = rb
          }
        }
        val coreSet = core.map(_._1).toSet
        core.foreach { case ((cx, cy), _) =>
          for (dx <- -1L to 1L; dy <- -1L to 1L
               if (dx, dy) != ((0L, 0L))) {
            if (coreSet.contains((cx + dx, cy + dy)))
              union(key((cx, cy)), key((cx + dx, cy + dy)))
          }
        }
        val labeled = core.map { case (c, n) => (find(key(c)), n) }
        val clusters = labeled.groupBy(_._1).view
          .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toSeq
          .map { case (cid, (nc, np)) => (cid, nc, np) }
          .sortBy(_._1)
        val noise = {
          val total = pts.count()
          total - clusters.map(_._3).sum
        }
        import s.implicits._
        (clusters :+ ((-1L, 0L, noise)))
          .toDF("cluster_id", "n_cells", "n_points")
          .orderBy("cluster_id")
      },
      Some("""WITH pts AS (
             |  SELECT CAST(floor(embedding[1]::DOUBLE / 0.1) AS BIGINT)
             |      AS cx,
             |    CAST(floor(embedding[2]::DOUBLE / 0.1) AS BIGINT) AS cy
             |  FROM embeddings),
             |cells AS (
             |  SELECT cx, cy, CAST(count(*) AS BIGINT) AS n
             |  FROM pts GROUP BY 1, 2),
             |core AS (
             |  SELECT cx, cy, n, (cx + 100) * 1000 + (cy + 100) AS k
             |  FROM cells WHERE n >= 5),
             |adj AS (
             |  SELECT a.k AS ka, b.k AS kb
             |  FROM core a JOIN core b
             |    ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1),
             |lp AS (
             |  SELECT * FROM (
             |    WITH RECURSIVE it AS (
             |      SELECT k, k AS lbl FROM core
             |      UNION
             |      SELECT adj.ka AS k, it.lbl
             |      FROM it JOIN adj ON adj.kb = it.k)
             |    SELECT k, min(lbl) AS lbl FROM it GROUP BY k)),
             |cl AS (
             |  SELECT lp.lbl AS cluster_id,
             |    CAST(count(*) AS BIGINT) AS n_cells,
             |    CAST(sum(core.n) AS BIGINT) AS n_points
             |  FROM lp JOIN core ON core.k = lp.k
             |  GROUP BY lp.lbl),
             |noise AS (
             |  SELECT CAST(-1 AS BIGINT) AS cluster_id,
             |    CAST(0 AS BIGINT) AS n_cells,
             |    (SELECT CAST(count(*) AS BIGINT) FROM pts)
             |      - (SELECT CAST(coalesce(sum(n_points), 0) AS BIGINT)
             |         FROM cl) AS n_points)
             |SELECT cluster_id, n_cells, n_points FROM cl
             |UNION ALL
             |SELECT cluster_id, n_cells, n_points FROM noise
             |ORDER BY cluster_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q433: stratification design effect — how much estimator variance
    // does stratifying by order priority actually buy? DEFF =
    // (Σ Wₕσₕ²)/σ² compares proportional-allocation stratified
    // sampling to SRS at equal n; the effective sample size n/DEFF
    // restates it as free samples. Every σ² comes from the exact
    // LONG/decimal moment sums (the q406 machinery); one tiny shuffle.
    Q(
      "q433_design_effect",
      (s, dir) => {
        val x = Tables.load(s, dir, "orders")
          .select(col("o_orderpriority").as("priority"),
            floor(col("o_totalprice") * 100 + 0.5).cast("long").as("y"))
        val g = x.groupBy("priority").agg(count(lit(1)).as("n_h"),
            sum("y").as("s_h"),
            sum((col("y") * col("y")).cast("decimal(38,0)")).as("q_h"))
          .withColumn("var_h", col("q_h").cast("double")
            / col("n_h").cast("double")
            - (col("s_h").cast("double") / col("n_h").cast("double"))
              * (col("s_h").cast("double") / col("n_h").cast("double")))
          .localCheckpoint()
        val tot = g.agg(sum("n_h").as("n"), sum("s_h").as("s"),
            sum("q_h").as("qq"),
            sum(col("n_h").cast("double") * col("var_h")).as("wv"))
          .withColumn("var_all", col("qq").cast("double")
            / col("n").cast("double")
            - (col("s").cast("double") / col("n").cast("double"))
              * (col("s").cast("double") / col("n").cast("double")))
          .withColumn("deff",
            (col("wv") / col("n").cast("double")) / col("var_all"))
        g.crossJoin(broadcast(tot))
          .select(col("priority"), col("n_h"),
            Rounding.stableRound6(col("n_h").cast("double")
              / col("n").cast("double")).as("weight"),
            Rounding.stableRound6(sqrt(col("var_h")) / 100.0)
              .as("stddev_h_dollars"),
            Rounding.stableRound6(col("deff")).as("deff"),
            Rounding.stableRound6(col("n").cast("double") / col("deff"))
              .as("effective_n"))
          .orderBy("priority")
      },
      Some(s"""WITH x AS (
             |  SELECT o_orderpriority AS priority,
             |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y
             |  FROM orders),
             |g AS (
             |  SELECT priority, CAST(count(*) AS BIGINT) AS n_h,
             |    CAST(sum(y) AS BIGINT) AS s_h, sum(y * y) AS q_h
             |  FROM x GROUP BY 1),
             |gv AS (
             |  SELECT *, q_h::DOUBLE / n_h::DOUBLE
             |    - (s_h::DOUBLE / n_h::DOUBLE) * (s_h::DOUBLE / n_h::DOUBLE)
             |      AS var_h
             |  FROM g),
             |t AS (
             |  SELECT CAST(sum(n_h) AS BIGINT) AS n,
             |    CAST(sum(s_h) AS BIGINT) AS s, sum(q_h) AS qq,
             |    sum(n_h::DOUBLE * var_h) AS wv
             |  FROM gv),
             |tv AS (
             |  SELECT *, qq::DOUBLE / n::DOUBLE
             |    - (s::DOUBLE / n::DOUBLE) * (s::DOUBLE / n::DOUBLE)
             |      AS var_all
             |  FROM t),
             |d AS (
             |  SELECT *, (wv / n::DOUBLE) / var_all AS deff FROM tv)
             |SELECT priority, n_h,
             |  ${Rounding.duckSql("n_h::DOUBLE / n::DOUBLE")} AS weight,
             |  ${Rounding.duckSql("sqrt(var_h) / 100.0")}
             |    AS stddev_h_dollars,
             |  ${Rounding.duckSql("deff")} AS deff,
             |  ${Rounding.duckSql("n::DOUBLE / deff")} AS effective_n
             |FROM gv CROSS JOIN d
             |ORDER BY priority""".stripMargin))
  )
}
