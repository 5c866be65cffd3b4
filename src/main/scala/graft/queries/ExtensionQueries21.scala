package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Rounding
import graft.io.Tables

/** Round-7 fifteenth wave: time-weighted averages, backlog aging, and
  * delta-encoded interval concurrency. Same contract as every other
  * module: each Spark pipeline pairs with DuckDB oracle SQL replaying
  * it.
  */
object ExtensionQueries21 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q196: time-weighted average value (TWAP) — per user, the step-
    // function average of `value` over the user's active span: each
    // event's value holds until the next event, weighted by its hold
    // duration (the fair average for irregular series — a plain AVG
    // overweights burst periods; this is the billing/exposure metric).
    // Integer-exact by construction: value is 2-decimal data → exact
    // LONG cents; durations are LONG micros; each cents·gap product is
    // ≤ maxCents · span < 2^63 and the per-user sum telescopes to the
    // same bound (gaps partition the span), so every accumulation is
    // exact integer arithmetic — the ONE division to a double happens
    // in the final projection, identically in both engines. Scale
    // shape: one (user)-keyed window for the lead, one keyed agg.
    Q(
      "q196_twap",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            round(col("value") * 100).cast("long").as("cents"),
            unix_micros(col("ts").cast("timestamp")).as("t"))
        val w = Window.partitionBy("user_id").orderBy("t", "event_id")
        val stepped = e
          .withColumn("t_next", lead("t", 1).over(w))
          .where(col("t_next").isNotNull)
        stepped.groupBy("user_id")
          .agg(count(lit(1)).as("n_steps"),
            sum(col("cents") * (col("t_next") - col("t"))).as("wsum"),
            sum(col("t_next") - col("t")).as("span_us"))
          .select(col("user_id"), col("n_steps"), col("span_us"),
            Rounding.stableRound6(col("wsum").cast("double") /
              col("span_us").cast("double") / 100.0).as("twap"))
          .orderBy("user_id")
      },
      Some(s"""WITH e AS (
             |  SELECT user_id, event_id,
             |    CAST(round(value * 100) AS BIGINT) AS cents,
             |    epoch_us(ts) AS t,
             |    lead(epoch_us(ts)) OVER (PARTITION BY user_id
             |      ORDER BY epoch_us(ts), event_id) AS t_next
             |  FROM events)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_steps,
             |  CAST(sum(t_next - t) AS BIGINT) AS span_us,
             |  ${Rounding.duckSql(
                  "sum(cents * (t_next - t))::DOUBLE " +
                    "/ sum(t_next - t)::DOUBLE / 100.0")} AS twap
             |FROM e WHERE t_next IS NOT NULL
             |GROUP BY user_id
             |ORDER BY user_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q197: backlog aging — orders OPEN at a snapshot instant (placed
    // at or before it, last line shipped strictly after it), bucketed
    // by age: the AR-aging / WIP report every operations dashboard
    // leads with, and the point-in-time interval-stabbing shape (an
    // order's open interval is DERIVED by joining its lines for the
    // close date — one keyed max agg, never an interval explode).
    // Money in exact integer cents (r7 discipline); ages in exact
    // integer days (date arithmetic). Dirty-data guard shared with
    // q198: a line shipped BEFORE its order date (present in the
    // fixture) would invert the interval — the close clamps to
    // greatest(max ship, order date). Scale shape: lineitem max-ship
    // agg (1 keyed exchange), equi-join back to orders on the order
    // key, snapshot filter, tiny bucket agg.
    Q(
      "q197_backlog_aging",
      (s, dir) => {
        val snap = "1998-01-01"
        val closes = Tables.load(s, dir, "lineitem")
          .groupBy("l_orderkey").agg(max("l_shipdate").as("ship_ts"))
        val orders = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
        val open = orders
          .join(closes, col("o_orderkey") === col("l_orderkey"))
          .withColumn("close_ts", greatest(col("ship_ts").cast("timestamp"),
            col("o_orderdate").cast("timestamp")))
          .where(col("o_orderdate") <= lit(snap).cast("timestamp") &&
            col("close_ts") > lit(snap).cast("timestamp"))
          .withColumn("age_days",
            datediff(lit(snap).cast("date"), col("o_orderdate").cast("date")))
        open
          .withColumn("bucket",
            when(col("age_days") <= 30, "0-30")
              .when(col("age_days") <= 90, "31-90")
              .otherwise("90+"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_orders"),
            (sum("cents").cast("double") / 100.0).as("open_value"),
            max("age_days").cast("long").as("oldest_days"))
          .orderBy("bucket")
      },
      Some("""WITH closes AS (
             |  SELECT l_orderkey, max(l_shipdate) AS ship_ts
             |  FROM lineitem GROUP BY 1),
             |open AS (
             |  SELECT o.o_orderkey,
             |    CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents,
             |    date_diff('day', CAST(o.o_orderdate AS DATE),
             |      DATE '1998-01-01') AS age_days
             |  FROM orders o JOIN closes c ON c.l_orderkey = o.o_orderkey
             |  WHERE o.o_orderdate <= TIMESTAMP '1998-01-01'
             |    AND greatest(c.ship_ts, o.o_orderdate)
             |      > TIMESTAMP '1998-01-01')
             |SELECT CASE WHEN age_days <= 30 THEN '0-30'
             |            WHEN age_days <= 90 THEN '31-90'
             |            ELSE '90+' END AS bucket,
             |  CAST(count(*) AS BIGINT) AS n_orders,
             |  sum(cents)::DOUBLE / 100.0 AS open_value,
             |  CAST(max(age_days) AS BIGINT) AS oldest_days
             |FROM open
             |GROUP BY 1
             |ORDER BY bucket""".stripMargin)),

    // ------------------------------------------------------------------
    // q198: peak order concurrency via delta encoding — the top-10 days
    // by simultaneously-open orders (placed, not yet fully shipped):
    // capacity planning's headline number. The scale trick is DELTA
    // ENCODING: each order contributes exactly two points (+1 at its
    // start day, −1 the day after its close) instead of one row per
    // open day — days × orders never materializes — and the running
    // sum walks the DISTINCT-day frame (value-domain-sized, ~2.4k
    // days, the q94 window discipline). Close clamps to
    // greatest(ship, order date) — q197's dirty-data guard; an
    // inverted interval would put its −1 BEFORE its +1 and silently
    // depress every count in between. Top-10 with a full
    // (count DESC, day) tiebreak.
    Q(
      "q198_peak_concurrency",
      (s, dir) => {
        val closes = Tables.load(s, dir, "lineitem")
          .groupBy("l_orderkey").agg(max("l_shipdate").as("ship_ts"))
        val oc = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate"))
          .join(closes, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_orderdate").cast("date").as("start_day"),
            greatest(col("ship_ts").cast("timestamp"),
              col("o_orderdate").cast("timestamp")).cast("date")
              .as("close_day"))
        val deltas = oc
          .select(col("start_day").as("day"), lit(1L).as("d"))
          .unionAll(oc.select(date_add(col("close_day"), 1).as("day"),
            lit(-1L).as("d")))
          .groupBy("day").agg(sum("d").as("delta"))
        val w = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, 0)
        deltas
          .withColumn("open_orders", sum("delta").over(w))
          .withColumn("rank", row_number().over(
            Window.orderBy(desc("open_orders"), col("day"))))
          .where(col("rank") <= 10)
          .select(col("rank"), col("day"), col("open_orders"))
          .orderBy("rank")
      },
      Some("""WITH closes AS (
             |  SELECT l_orderkey, max(l_shipdate) AS ship_ts
             |  FROM lineitem GROUP BY 1),
             |oc AS (
             |  SELECT CAST(o.o_orderdate AS DATE) AS start_day,
             |    CAST(greatest(c.ship_ts, o.o_orderdate) AS DATE) AS close_day
             |  FROM orders o JOIN closes c ON c.l_orderkey = o.o_orderkey),
             |deltas AS (
             |  SELECT day, sum(d) AS delta FROM (
             |    SELECT start_day AS day, 1 AS d FROM oc
             |    UNION ALL
             |    SELECT close_day + 1, -1 FROM oc)
             |  GROUP BY day),
             |walk AS (
             |  SELECT day, sum(delta) OVER (ORDER BY day
             |    ROWS UNBOUNDED PRECEDING) AS open_orders
             |  FROM deltas),
             |ranked AS (
             |  SELECT *, row_number() OVER
             |    (ORDER BY open_orders DESC, day) AS rank
             |  FROM walk)
             |SELECT rank, day, CAST(open_orders AS BIGINT) AS open_orders
             |FROM ranked WHERE rank <= 10
             |ORDER BY rank""".stripMargin))
  )
}
