package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.Rounding
import graft.io.Tables
import DriverSide._

/** Round-9 twenty-sixth wave: forecasting and index-number analytics —
  * Holt linear-trend smoothing (q410), epoch-folding period detection
  * (q411), hierarchical bottom-up vs top-down forecast comparison
  * (q412), and Laspeyres/Paasche/Fisher price indices (q413).
  */
object ExtensionQueries68 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q410: Holt linear-trend (double exponential) smoothing over the
    // daily purchase-revenue series — level + trend state with
    // α=0.5/β=0.3, one-step-ahead forecasts, init l₁=x₁, b₁=0. A
    // sequential recurrence is driver-side over the DAY DOMAIN (30
    // rows at every SF — the q374 discipline: iterate a domain frame,
    // never data rows), with the state snapped to a 1e-3 cents grid
    // each step so both engines' trajectories stay locked despite the
    // recurrence being non-associative (the oracle replays the same
    // snapped recurrence in a recursive CTE). Scale: the corpus-sized
    // work is the one groupBy(day) aggregation; the fold is O(days).
    Q(
      "q410_holt_linear",
      (s, dir) => {
        val daily = Tables.load(s, dir, "events")
          .where(col("event_type") === "purchase")
          .groupBy(to_date(col("ts")).as("day"))
          .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("x"))
          .orderBy("day")
          .collectBounded("daily series")
          .map(r => (r.getDate(0), r.getLong(1)))
        def snap3(v: Double): Double = math.floor(v * 1000.0 + 0.5) / 1000.0
        // fold: (level, trend) state; emit (day, x, forecast, level, trend)
        val out = scala.collection.mutable.ArrayBuffer[
          (java.sql.Date, Long, Option[Double], Double, Double)]()
        var l = daily.head._2.toDouble
        var b = 0.0
        out += ((daily.head._1, daily.head._2, None, l, b))
        daily.drop(1).foreach { case (day, x) =>
          val f = snap3(l + b)
          val lNew = snap3(0.5 * x.toDouble + 0.5 * (l + b))
          val bNew = snap3(0.3 * (lNew - l) + 0.7 * b)
          l = lNew; b = bNew
          out += ((day, x, Some(f), l, b))
        }
        import s.implicits._
        out.toSeq
          .toDF("day", "revenue_cents", "forecast_cents", "level", "trend")
          .orderBy("day")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS day,
             |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
             |      AS BIGINT) AS x,
             |    row_number() OVER (ORDER BY CAST(ts AS DATE)) AS i
             |  FROM events WHERE event_type = 'purchase'
             |  GROUP BY 1),
             |h AS (
             |  SELECT * FROM (
             |    WITH RECURSIVE it AS (
             |      SELECT 1 AS i, NULL::DOUBLE AS f,
             |        (SELECT x::DOUBLE FROM daily WHERE i = 1) AS l,
             |        0.0::DOUBLE AS b
             |      UNION ALL
             |      SELECT d.i,
             |        floor((it.l + it.b) * 1000.0 + 0.5) / 1000.0,
             |        floor((0.5 * d.x::DOUBLE + 0.5 * (it.l + it.b))
             |          * 1000.0 + 0.5) / 1000.0,
             |        floor((0.3 * (floor((0.5 * d.x::DOUBLE
             |            + 0.5 * (it.l + it.b)) * 1000.0 + 0.5) / 1000.0
             |          - it.l) + 0.7 * it.b) * 1000.0 + 0.5) / 1000.0
             |      FROM it JOIN daily d ON d.i = it.i + 1)
             |    SELECT * FROM it))
             |SELECT d.day, d.x AS revenue_cents, h.f AS forecast_cents,
             |  h.l AS level, h.b AS trend
             |FROM daily d JOIN h ON h.i = d.i
             |ORDER BY d.day""".stripMargin)),

    // ------------------------------------------------------------------
    // q411: period detection by EPOCH FOLDING — the trig-free
    // periodogram: for each candidate period p, fold the daily series
    // by phase (days-since-start mod p) and score the between-phase
    // variance share SSB/SST; the true period maximizes it (a folded
    // weekly cycle aligns highs with highs). Chosen over a DFT because
    // cos/sin are libm calls with no cross-engine bit guarantee, while
    // folding is pure integer bucketing + the q406 exact-sufficient-
    // statistics ANOVA arithmetic. The candidate×phase frame is
    // O(Σp) ≤ 54 rows regardless of corpus size.
    Q(
      "q411_epoch_folding",
      (s, dir) => {
        val daily = Tables.load(s, dir, "events")
          .groupBy(to_date(col("ts")).as("day"))
          .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("x"))
        val d0 = daily.agg(min("day").as("day0"),
          count(lit(1)).as("n"), sum("x").as("sx"),
          sum((col("x") * col("x")).cast("decimal(38,0)")).as("qx"))
        val idx = daily.crossJoin(broadcast(d0))
          .withColumn("i", datediff(col("day"), col("day0")))
        val periods = (2 to 10).map(p => p.toLong)
        import s.implicits._
        val pf = periods.toDF("p")
        val ph = idx.crossJoin(broadcast(pf))
          .withColumn("phase", col("i") % col("p"))
          .groupBy("p", "phase")
          .agg(count(lit(1)).as("n_ph"), sum("x").as("s_ph"))
        val ssb = ph.groupBy("p")
          .agg(sum(col("s_ph").cast("double") * col("s_ph").cast("double")
            / col("n_ph").cast("double")).as("fold_sq"))
        ssb.crossJoin(broadcast(d0))
          .withColumn("sst", col("qx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double")
              / col("n").cast("double"))
          .withColumn("ratio_raw",
            (col("fold_sq") - col("sx").cast("double")
              * col("sx").cast("double") / col("n").cast("double"))
              / col("sst"))
          .withColumn("best", max(col("ratio_raw"))
            .over(org.apache.spark.sql.expressions.Window.partitionBy()))
          .select(col("p"),
            Rounding.stableRound6(col("ratio_raw")).as("ssb_ratio"),
            (col("ratio_raw") === col("best")).as("is_best"))
          .orderBy("p")
      },
      Some(s"""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS day,
             |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
             |      AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |d0 AS (
             |  SELECT min(day) AS day0, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS sx, sum(x * x) AS qx
             |  FROM daily),
             |idx AS (
             |  SELECT datediff('day', day0, day) AS i, x
             |  FROM daily CROSS JOIN d0),
             |pf AS (SELECT unnest(range(2, 11)) AS p),
             |ph AS (
             |  SELECT p, i % p AS phase, CAST(count(*) AS BIGINT) AS n_ph,
             |    CAST(sum(x) AS BIGINT) AS s_ph
             |  FROM idx CROSS JOIN pf GROUP BY 1, 2),
             |ssb AS (
             |  SELECT p, sum(s_ph::DOUBLE * s_ph::DOUBLE / n_ph::DOUBLE)
             |    AS fold_sq
             |  FROM ph GROUP BY p),
             |r AS (
             |  SELECT p,
             |    (fold_sq - sx::DOUBLE * sx::DOUBLE / n::DOUBLE)
             |      / (qx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n::DOUBLE)
             |      AS ratio_raw
             |  FROM ssb CROSS JOIN d0)
             |SELECT CAST(p AS BIGINT) AS p,
             |  ${Rounding.duckSql("ratio_raw")} AS ssb_ratio,
             |  ratio_raw = max(ratio_raw) OVER () AS is_best
             |FROM r
             |ORDER BY p""".stripMargin)),

    // ------------------------------------------------------------------
    // q412: hierarchical forecast comparison — bottom-up vs top-down on
    // the region ← nation revenue hierarchy, backtested on the latest
    // month. Bottom-up: each nation forecasts seasonal-naive (its own
    // revenue 12 months earlier), regions sum their nations. Top-down:
    // the TOTAL seasonal-naive forecast is split by each region's
    // historical revenue share. Per region the exact actual, both
    // forecasts, both absolute errors, and which method won — the
    // disaggregate-signal-vs-stable-share tradeoff made measurable.
    // One join tree (orders ⋈ customer, nation/region broadcast) and
    // conditional aggregation; the comparison frame is 5 rows.
    Q(
      "q412_hierarchical_forecast",
      (s, dir) => {
        val mo = Tables.load(s, dir, "orders")
          .join(Tables.load(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.load(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.load(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("r_name").as("region"),
            date_trunc("month", col("o_orderdate")).as("m"),
            floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
        val mT = mo.agg(max("m").as("m_max"))
        val tagged = mo.crossJoin(broadcast(mT))
          .withColumn("is_cur", col("m") === col("m_max"))
          .withColumn("is_sn",
            year(col("m")) === year(col("m_max")) - 1 &&
              month(col("m")) === month(col("m_max")))
          .withColumn("is_hist", col("m") < col("m_max"))
        val byR = tagged.groupBy("region").agg(
          sum(when(col("is_cur"), col("cents")).otherwise(0L)).as("actual"),
          sum(when(col("is_sn"), col("cents")).otherwise(0L)).as("bu_fc"),
          sum(when(col("is_hist"), col("cents")).otherwise(0L)).as("hist"))
          .localCheckpoint()
        val tot = byR.agg(sum("bu_fc").as("sn_total"),
          sum("hist").as("hist_total"))
        byR.crossJoin(broadcast(tot))
          .withColumn("td_fc", col("sn_total").cast("double")
            * col("hist").cast("double") / col("hist_total").cast("double"))
          .withColumn("err_bu",
            abs(col("actual") - col("bu_fc")).cast("double"))
          .withColumn("err_td",
            abs(col("actual").cast("double") - col("td_fc")))
          .select(col("region"), col("actual").as("actual_cents"),
            col("bu_fc").as("fc_bottom_up_cents"),
            Rounding.stableRound6(col("td_fc")).as("fc_top_down_cents"),
            Rounding.stableRound6(col("err_bu")).as("abs_err_bottom_up"),
            Rounding.stableRound6(col("err_td")).as("abs_err_top_down"),
            when(col("err_bu") <= col("err_td"), lit("bottom_up"))
              .otherwise(lit("top_down")).as("better_method"))
          .orderBy("region")
      },
      Some(s"""WITH mo AS (
             |  SELECT r_name AS region,
             |    date_trunc('month', o_orderdate) AS m,
             |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
             |  FROM orders
             |  JOIN customer ON c_custkey = o_custkey
             |  JOIN nation ON n_nationkey = c_nationkey
             |  JOIN region ON r_regionkey = n_regionkey),
             |mt AS (SELECT max(m) AS m_max FROM mo),
             |byr AS (
             |  SELECT region,
             |    CAST(sum(CASE WHEN m = m_max THEN cents ELSE 0 END)
             |      AS BIGINT) AS actual,
             |    CAST(sum(CASE WHEN year(m) = year(m_max) - 1
             |      AND month(m) = month(m_max) THEN cents ELSE 0 END)
             |      AS BIGINT) AS bu_fc,
             |    CAST(sum(CASE WHEN m < m_max THEN cents ELSE 0 END)
             |      AS BIGINT) AS hist
             |  FROM mo CROSS JOIN mt
             |  GROUP BY region),
             |tot AS (
             |  SELECT CAST(sum(bu_fc) AS BIGINT) AS sn_total,
             |    CAST(sum(hist) AS BIGINT) AS hist_total
             |  FROM byr),
             |f AS (
             |  SELECT byr.*, tot.*,
             |    sn_total::DOUBLE * hist::DOUBLE / hist_total::DOUBLE
             |      AS td_fc,
             |    abs(actual - bu_fc)::DOUBLE AS err_bu,
             |    abs(actual::DOUBLE - sn_total::DOUBLE * hist::DOUBLE
             |      / hist_total::DOUBLE) AS err_td
             |  FROM byr CROSS JOIN tot)
             |SELECT region, actual AS actual_cents,
             |  bu_fc AS fc_bottom_up_cents,
             |  ${Rounding.duckSql("td_fc")} AS fc_top_down_cents,
             |  ${Rounding.duckSql("err_bu")} AS abs_err_bottom_up,
             |  ${Rounding.duckSql("err_td")} AS abs_err_top_down,
             |  CASE WHEN err_bu <= err_td THEN 'bottom_up'
             |    ELSE 'top_down' END AS better_method
             |FROM f
             |ORDER BY region""".stripMargin)),

    // ------------------------------------------------------------------
    // q413: Laspeyres / Paasche / Fisher price indices between the
    // first and last shipment years, over the parts traded in BOTH
    // periods. Unit prices are per-part ratios of exact cent/quantity
    // sums; the Laspeyres denominator Σp₀q₀ and Paasche numerator
    // Σp₁q₁ are the exact LONG revenue sums (the ratios cancel), so
    // only the two cross-term sums are doubles. Index theory's
    // substitution-bias bracket (Paasche ≤ Fisher ≤ Laspeyres under
    // normal demand response) comes out of the fixture measurably.
    // One groupBy(part, year) + a self-join on the ~part-count frame.
    Q(
      "q413_price_indices",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
          .select(col("l_partkey"), year(col("l_shipdate")).as("yr"),
            floor(col("l_extendedprice") * 100 + 0.5).cast("long")
              .as("e"),
            col("l_quantity").cast("long").as("q"))
        val yrs = li.agg(min("yr").as("y0"), max("yr").as("y1"))
        val py = li.crossJoin(broadcast(yrs))
          .where(col("yr") === col("y0") || col("yr") === col("y1"))
          .withColumn("period",
            when(col("yr") === col("y0"), lit("base")).otherwise(lit("cur")))
          .groupBy("l_partkey", "period")
          .agg(sum("e").as("e"), sum("q").as("q"))
        val base = py.where(col("period") === "base")
          .select(col("l_partkey"), col("e").as("e0"), col("q").as("q0"))
        val cur = py.where(col("period") === "cur")
          .select(col("l_partkey"), col("e").as("e1"), col("q").as("q1"))
        val j = base.join(cur, "l_partkey")
        val agg = j.agg(count(lit(1)).as("n_parts"),
          sum("e0").as("sum_e0"), sum("e1").as("sum_e1"),
          sum(col("e1").cast("double") / col("q1").cast("double")
            * col("q0").cast("double")).as("l_num"),
          sum(col("e0").cast("double") / col("q0").cast("double")
            * col("q1").cast("double")).as("p_den"))
        agg.crossJoin(broadcast(yrs))
          .withColumn("laspeyres_raw",
            col("l_num") / col("sum_e0").cast("double"))
          .withColumn("paasche_raw",
            col("sum_e1").cast("double") / col("p_den"))
          .select(col("y0").cast("long").as("base_year"),
            col("y1").cast("long").as("curr_year"), col("n_parts"),
            Rounding.stableRound6(col("laspeyres_raw")).as("laspeyres"),
            Rounding.stableRound6(col("paasche_raw")).as("paasche"),
            Rounding.stableRound6(
              sqrt(col("laspeyres_raw") * col("paasche_raw"))).as("fisher"))
      },
      Some(s"""WITH li AS (
             |  SELECT l_partkey, year(l_shipdate) AS yr,
             |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS e,
             |    CAST(l_quantity AS BIGINT) AS q
             |  FROM lineitem),
             |yrs AS (SELECT min(yr) AS y0, max(yr) AS y1 FROM li),
             |py AS (
             |  SELECT l_partkey,
             |    CASE WHEN yr = y0 THEN 'base' ELSE 'cur' END AS period,
             |    CAST(sum(e) AS BIGINT) AS e, CAST(sum(q) AS BIGINT) AS q
             |  FROM li CROSS JOIN yrs
             |  WHERE yr = y0 OR yr = y1
             |  GROUP BY 1, 2),
             |j AS (
             |  SELECT b.l_partkey, b.e AS e0, b.q AS q0,
             |    c.e AS e1, c.q AS q1
             |  FROM (SELECT * FROM py WHERE period = 'base') b
             |  JOIN (SELECT * FROM py WHERE period = 'cur') c
             |    USING (l_partkey)),
             |agg AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n_parts,
             |    CAST(sum(e0) AS BIGINT) AS sum_e0,
             |    CAST(sum(e1) AS BIGINT) AS sum_e1,
             |    sum(e1::DOUBLE / q1::DOUBLE * q0::DOUBLE) AS l_num,
             |    sum(e0::DOUBLE / q0::DOUBLE * q1::DOUBLE) AS p_den
             |  FROM j)
             |SELECT CAST(y0 AS BIGINT) AS base_year,
             |  CAST(y1 AS BIGINT) AS curr_year, n_parts,
             |  ${Rounding.duckSql("l_num / sum_e0::DOUBLE")} AS laspeyres,
             |  ${Rounding.duckSql("sum_e1::DOUBLE / p_den")} AS paasche,
             |  ${Rounding.duckSql(
                  "sqrt(l_num / sum_e0::DOUBLE * (sum_e1::DOUBLE / p_den))")}
             |    AS fisher
             |FROM agg CROSS JOIN yrs""".stripMargin))
  )
}
