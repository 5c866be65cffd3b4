package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Rounding
import graft.io.Tables
import graft.ops.AsOfJoin

/** Round-9 sixteenth wave: tolerance-bounded as-of lookup (q370), the
  * ClickHouse-style window funnel (q371), business-day SLA arithmetic
  * (q372), and a dictionary-encoding storage advisor (q373).
  */
object ExtensionQueries58 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q370: as-of lookup with a staleness tolerance — q24's
    // point-in-time join, but a match older than 3 days never fills
    // (pandas merge_asof `tolerance`; inner semantics: lefts with no
    // in-window match drop): each error event attributed to the
    // user's latest purchase WITHIN the 3-day attribution window.
    // Beyond correctness this is the as-of SCALE fix: the range join
    // now multiplies each left row by the key's distinct times inside
    // the tolerance window instead of its entire history — on an old
    // key with years of activity that is the difference between
    // bounded and unbounded fanout (and `n_prior` becomes the
    // in-window activity count, a useful signal itself). Same
    // two-stage shape (per-(key,time) pre-agg, keyed range join,
    // max_by argmax).
    Q(
      "q370_asof_tolerance",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
        val errors = e.filter(col("event_type") === "error")
        val purchases = e.filter(col("event_type") === "purchase")
        AsOfJoin.lookupLatest(
            errors, purchases,
            errors("user_id"), purchases("user_id"),
            errors("ts"), purchases("ts"),
            leftSelect = Seq(errors("event_id"), errors("user_id"),
              errors("ts")),
            payload = Seq("event_id", "value"),
            tieBreak = Some(purchases("event_id")),
            maxStaleness = Some(expr("INTERVAL 3 DAYS")))
          .orderBy("event_id")
      },
      Some("""WITH pt AS (
             |  SELECT user_id, ts, count(*) AS cnt,
             |    arg_max(event_id, event_id) AS pk,
             |    arg_max(value, event_id) AS pv
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
             |SELECT e.event_id, e.user_id, e.ts,
             |  max(pt.ts) AS asof_time,
             |  CAST(sum(cnt) AS BIGINT) AS n_prior,
             |  arg_max(pk, pt.ts) AS asof_event_id,
             |  arg_max(pv, pt.ts) AS asof_value
             |FROM events e JOIN pt
             |  ON pt.user_id = e.user_id AND pt.ts <= e.ts
             |  AND pt.ts >= e.ts - INTERVAL 3 DAY
             |WHERE e.event_type = 'error'
             |GROUP BY e.event_id, e.user_id, e.ts
             |ORDER BY e.event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q371: window funnel — the ClickHouse windowFunnel semantics:
    // per user, the deepest view → click → purchase chain whose EVERY
    // step falls within 24h of the anchoring view, steps strictly
    // increasing in time. Two keyed range joins (click after the
    // view, purchase after that click, both capped by the view's
    // horizon) — per-key fanout is bounded by activity inside one
    // horizon, the as-of discipline, never a cross of full histories.
    // Greedy per-view argmins (earliest qualifying click, then
    // earliest qualifying purchase) are the declared chain choice —
    // deterministic, and for depth-reachability equivalent to any
    // other choice of intermediate steps. Output: users by deepest
    // funnel depth reached.
    Q(
      "q371_window_funnel",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts").cast("timestamp")).as("us"))
        val H = 86400000000L // 24h in micros
        val v = e.where(col("event_type") === "view")
          .select(col("user_id"), col("us").as("vts"))
        val c = e.where(col("event_type") === "click")
          .select(col("user_id"), col("us").as("cts"))
        val p = e.where(col("event_type") === "purchase")
          .select(col("user_id"), col("us").as("pts"))
        val vc = v.join(c,
            v("user_id") === c("user_id") && col("cts") > col("vts") &&
              col("cts") <= col("vts") + H, "left")
          .groupBy(v("user_id").as("user_id"), col("vts"))
          .agg(min("cts").as("c1"))
        val vcp = vc.join(p,
            vc("user_id") === p("user_id") && col("pts") > col("c1") &&
              col("pts") <= col("vts") + H, "left")
          .groupBy(vc("user_id").as("user_id"), col("vts"), col("c1"))
          .agg(min("pts").as("p1"))
        val depth = vcp
          .select(col("user_id"),
            (lit(1) + when(col("c1").isNotNull, 1).otherwise(0)
              + when(col("p1").isNotNull, 1).otherwise(0)).as("d"))
          .groupBy("user_id").agg(max("d").as("depth"))
        depth.groupBy(col("depth").cast("long").as("depth"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy("depth")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type, epoch_us(ts::TIMESTAMP) AS us
             |  FROM events),
             |v AS (SELECT user_id, us AS vts FROM e
             |      WHERE event_type = 'view'),
             |c AS (SELECT user_id, us AS cts FROM e
             |      WHERE event_type = 'click'),
             |p AS (SELECT user_id, us AS pts FROM e
             |      WHERE event_type = 'purchase'),
             |vc AS (
             |  SELECT v.user_id, v.vts, min(c.cts) AS c1
             |  FROM v LEFT JOIN c ON c.user_id = v.user_id
             |    AND c.cts > v.vts AND c.cts <= v.vts + 86400000000
             |  GROUP BY v.user_id, v.vts),
             |vcp AS (
             |  SELECT vc.user_id, vc.vts, vc.c1, min(p.pts) AS p1
             |  FROM vc LEFT JOIN p ON p.user_id = vc.user_id
             |    AND p.pts > vc.c1 AND p.pts <= vc.vts + 86400000000
             |  GROUP BY vc.user_id, vc.vts, vc.c1),
             |d AS (
             |  SELECT user_id,
             |    max(1 + CASE WHEN c1 IS NOT NULL THEN 1 ELSE 0 END
             |      + CASE WHEN p1 IS NOT NULL THEN 1 ELSE 0 END) AS depth
             |  FROM vcp GROUP BY user_id)
             |SELECT CAST(depth AS BIGINT) AS depth,
             |  CAST(count(*) AS BIGINT) AS n_users
             |FROM d
             |GROUP BY depth
             |ORDER BY depth""".stripMargin)),

    // ------------------------------------------------------------------
    // q372: business-day shipping SLA — order→ship latency counted in
    // WEEKDAYS (the contractual clock): full weeks contribute 5 days;
    // the ≤6 remainder days are classified by weekday arithmetic over
    // a sequence(0, rem−1) lambda — a per-row bounded loop, no
    // calendar table join. Weekday index is Monday=0 in both engines
    // ((dayofweek+5) % 7 on Spark's Sunday=1; isodow−1 in DuckDB).
    // Exact integers end-to-end; per-priority means from LONG sums.
    Q(
      "q372_business_days",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_shipdate"))
        val o = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority"))
        val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
          .withColumn("days",
            datediff(col("l_shipdate").cast("date"),
              col("o_orderdate").cast("date")).cast("long"))
          .where(col("days") >= 0L)
          .withColumn("w0",
            ((dayofweek(col("o_orderdate").cast("date")) + 5) % 7)
              .cast("long"))
          .withColumn("bdays",
            (col("days") / 7).cast("long") * 5L +
              when(col("days") % 7 > 0L,
                size(expr(
                  "filter(sequence(0, cast(days % 7 as int) - 1), " +
                    "i -> (w0 + 1 + i) % 7 < 5)")).cast("long"))
                .otherwise(0L))
        j.groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_lineitems"),
            Rounding.stableRound6(sum("bdays").cast("double") /
              count(lit(1)).cast("double")).as("avg_business_days"),
            max("bdays").as("max_business_days"))
          .orderBy("o_orderpriority")
      },
      Some(s"""WITH j AS (
             |  SELECT o_orderpriority,
             |    date_diff('day', o_orderdate::DATE, l_shipdate::DATE)
             |      AS days,
             |    CAST(isodow(o_orderdate::DATE) - 1 AS BIGINT) AS w0
             |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             |  WHERE l_shipdate::DATE >= o_orderdate::DATE),
             |b AS (
             |  SELECT o_orderpriority,
             |    (days // 7) * 5 + CASE WHEN days % 7 > 0 THEN
             |      len(list_filter(range(0, days % 7),
             |        i -> (w0 + 1 + i) % 7 < 5))
             |    ELSE 0 END AS bdays
             |  FROM j)
             |SELECT o_orderpriority,
             |  CAST(count(*) AS BIGINT) AS n_lineitems,
             |  ${Rounding.duckSql(
                  "sum(bdays)::DOUBLE / count(*)::DOUBLE")}
             |    AS avg_business_days,
             |  CAST(max(bdays) AS BIGINT) AS max_business_days
             |FROM b
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // ------------------------------------------------------------------
    // q373: dictionary-encoding storage advisor — per candidate string
    // column: rows, distinct values, plain bytes (Σ lengths) vs
    // dictionary bytes (distinct Σ lengths + n·ceil(log2(d)) bits of
    // codes), and a recommend flag at ratio > 2. ceil(log2(d)) is
    // length(bin(d−1)) — pure integer/string ops, immune to the
    // log-at-power-of-two float hazard. The per-column stats are
    // two-level aggregations (value domain, then scalar); the five
    // column frames union into one advisory table — the layout
    // decision a 100 TB parquet writer makes per column chunk.
    Q(
      "q373_dictionary_audit",
      (s, dir) => {
        def audit(df: DataFrame, colName: String): DataFrame = {
          val dom = df.select(col(colName).as("v"))
            .where(col("v").isNotNull)
            .groupBy("v").agg(count(lit(1)).as("c"))
          dom.agg(sum("c").as("n"), count(lit(1)).as("d"),
              sum(length(col("v")).cast("long") * col("c")).as("plain"),
              sum(length(col("v")).cast("long")).as("dict_lit"))
            .withColumn("code_bits",
              length(bin(col("d") - 1)).cast("long"))
            .select(lit(colName).as("column"),
              col("n").cast("long").as("n_rows"),
              col("d").cast("long").as("n_distinct"),
              col("plain").cast("long").as("plain_bytes"),
              (col("dict_lit") +
                expr("(n * code_bits + 7) div 8")).cast("long")
                .as("dict_bytes"))
        }
        val part = Tables.load(s, dir, "part")
        val li = Tables.load(s, dir, "lineitem")
        Seq(audit(part, "p_brand"), audit(part, "p_type"),
            audit(part, "p_name"), audit(li, "l_returnflag"),
            audit(li, "l_linestatus"))
          .reduce(_ unionAll _)
          .withColumn("compression_ratio",
            Rounding.stableRound6(col("plain_bytes").cast("double") /
              col("dict_bytes").cast("double")))
          .withColumn("recommend", col("compression_ratio") > 2.0)
          .orderBy("column")
      },
      Some {
        def one(table: String, c: String) =
          s"""SELECT '$c' AS "column",
             |  CAST(sum(cc) AS BIGINT) AS n_rows,
             |  CAST(count(*) AS BIGINT) AS n_distinct,
             |  CAST(sum(length(v) * cc) AS BIGINT) AS plain_bytes,
             |  CAST(sum(length(v))
             |    + (sum(cc) * length(bin(count(*) - 1)) + 7) // 8
             |    AS BIGINT) AS dict_bytes
             |FROM (SELECT $c AS v, count(*) AS cc FROM $table
             |      WHERE $c IS NOT NULL GROUP BY 1)"""
        s"""WITH u AS (
           |  ${one("part", "p_brand")}
           |  UNION ALL ${one("part", "p_type")}
           |  UNION ALL ${one("part", "p_name")}
           |  UNION ALL ${one("lineitem", "l_returnflag")}
           |  UNION ALL ${one("lineitem", "l_linestatus")})
           |SELECT "column", n_rows, n_distinct, plain_bytes, dict_bytes,
           |  ${Rounding.duckSql(
                "plain_bytes::DOUBLE / dict_bytes::DOUBLE")}
           |    AS compression_ratio,
           |  ${Rounding.duckSql(
                "plain_bytes::DOUBLE / dict_bytes::DOUBLE")} > 2.0
           |    AS recommend
           |FROM u
           |ORDER BY "column"""".stripMargin
      })
  )
}
