package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{PolyHash, Rounding}
import graft.io.Tables

/** Round-9 twenty-fourth wave: consistent-hash ring balance (q402), a
  * time-series feature matrix (q403), a join-order cost advisor
  * (q404), and order-statistic median confidence intervals (q405).
  */
object ExtensionQueries66 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q402: consistent-hash ring balance — the OTHER sharding design
    // next to q216's rendezvous (HRW) hashing: 8 nodes × 64 virtual
    // nodes on a (p·1000)-position ring (PolyHash uniformization, low
    // digits packing (node, vn) for uniqueness), documents routed to
    // the first vnode clockwise of their key. The audit reports per-node
    // load share and the max/mean imbalance (the reason vnodes exist:
    // at 64 per node the expected imbalance is a few percent), plus
    // the share of keys that MOVE when node 3 leaves — consistent
    // hashing's contract is that only the departed node's keys move
    // (share ≈ its load), unlike modulo sharding's full reshuffle.
    // The routing is an as-of-style lookup: keys range-join the
    // 512-row broadcast vnode frame on the clockwise-successor
    // condition via min(position ≥ hash), wrapping to the ring's
    // first vnode — one broadcast join, exact integers.
    Q(
      "q402_hash_ring_balance",
      (s, dir) => {
        // vnode positions are made UNIQUE by packing (node, vn) into the
        // low decimal digits (upos = ringpos·1000 + node·64 + vn), so
        // min() picks a deterministic clockwise successor with no
        // arg-min tie hazard in either engine
        def vnodes(exclude: Option[Int]): org.apache.spark.sql.DataFrame = {
          val rows = for {
            n <- 0 until 8 if !exclude.contains(n)
            v <- 0 until 64
          } yield (n.toLong, v.toLong)
          import s.implicits._
          val h = PolyHash(concat(lit("ring#"),
            col("node").cast("string"), lit("#"), col("vn").cast("string")))
          rows.toDF("node", "vn")
            .withColumn("upos",
              (h * h % lit(PolyHash.Mod)) * lit(1000L)
                + col("node") * 64L + col("vn"))
        }
        val kh = PolyHash(concat(lit("key#"), col("doc_id").cast("string")))
        val keys = Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            (kh * kh % lit(PolyHash.Mod) * lit(1000L)).as("kpos"))
          .localCheckpoint()
        def route(vs: org.apache.spark.sql.DataFrame, asCol: String) = {
          val succ = keys.join(broadcast(vs),
              col("upos") >= col("kpos"), "left")
            .groupBy("doc_id", "kpos")
            .agg(min(col("upos")).as("succ_pos"))
          val first = vs.agg(min("upos").as("wrap_pos"))
          succ.crossJoin(broadcast(first))
            .select(col("doc_id"),
              expr("(coalesce(succ_pos, wrap_pos) % 1000) div 64")
                .as(asCol))
        }
        val full = route(vnodes(None), "node")
        val reduced = route(vnodes(Some(3)), "node2")
        val loads = full.groupBy("node").agg(count(lit(1)).as("n_keys"))
        val tot = keys.agg(count(lit(1)).as("n"))
        val moved = full.join(reduced, "doc_id")
          .agg(sum(when(col("node") =!= col("node2"), 1L).otherwise(0L))
            .as("n_moved"))
        loads.crossJoin(tot).crossJoin(moved)
          .select(col("node"), col("n_keys"),
            Rounding.stableRound6(col("n_keys").cast("double") /
              col("n").cast("double")).as("load_share"),
            Rounding.stableRound6(col("n_keys").cast("double") /
              (col("n").cast("double") / 8.0)).as("balance_factor"),
            Rounding.stableRound6(col("n_moved").cast("double") /
              col("n").cast("double")).as("moved_share_on_leave"))
          .orderBy("node")
      },
      Some {
        val vn = PolyHash.duckSql(
          "'ring#' || node::VARCHAR || '#' || vn::VARCHAR")
        val kh = PolyHash.duckSql("'key#' || doc_id::VARCHAR")
        s"""WITH vs0 AS (
           |  SELECT n.node, v.vn,
           |    ($vn * $vn % ${PolyHash.Mod}) * 1000 + n.node * 64 + v.vn
           |      AS upos
           |  FROM (SELECT unnest(range(8)) AS node) n
           |  CROSS JOIN (SELECT unnest(range(64)) AS vn) v),
           |keys AS (
           |  SELECT doc_id, $kh * $kh % ${PolyHash.Mod} * 1000 AS kpos
           |  FROM documents),
           |full_r AS (
           |  SELECT k.doc_id,
           |    (coalesce(min(vs0.upos) FILTER (WHERE vs0.upos >= k.kpos),
           |      (SELECT min(upos) FROM vs0)) % 1000) // 64 AS node
           |  FROM keys k CROSS JOIN vs0
           |  GROUP BY k.doc_id, k.kpos),
           |red_r AS (
           |  SELECT k.doc_id,
           |    (coalesce(min(v.upos) FILTER (WHERE v.upos >= k.kpos),
           |      (SELECT min(upos) FROM vs0 WHERE node <> 3)) % 1000)
           |      // 64 AS node2
           |  FROM keys k CROSS JOIN vs0 v
           |  WHERE v.node <> 3
           |  GROUP BY k.doc_id, k.kpos),
           |loads AS (
           |  SELECT node, CAST(count(*) AS BIGINT) AS n_keys
           |  FROM full_r GROUP BY 1),
           |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM keys),
           |mv AS (
           |  SELECT CAST(sum(CASE WHEN f.node <> r.node2 THEN 1 ELSE 0
           |    END) AS BIGINT) AS n_moved
           |  FROM full_r f JOIN red_r r ON r.doc_id = f.doc_id)
           |SELECT CAST(node AS BIGINT) AS node, n_keys,
           |  ${Rounding.duckSql("n_keys::DOUBLE / n::DOUBLE")}
           |    AS load_share,
           |  ${Rounding.duckSql(
                "n_keys::DOUBLE / (n::DOUBLE / 8.0)")}
           |    AS balance_factor,
           |  ${Rounding.duckSql("n_moved::DOUBLE / n::DOUBLE")}
           |    AS moved_share_on_leave
           |FROM loads CROSS JOIN tot CROSS JOIN mv
           |ORDER BY node""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q403: time-series feature matrix — the lag/rolling frame a
    // forecasting model trains on, materialized per day: lag-1 and
    // lag-7 revenue, the trailing-7-day mean and population std (from
    // exact LONG cent sums over a ROWS window), and day-of-week. One
    // day-domain groupBy then windows over the 30-row day frame —
    // the q113/q312 time-series discipline. Rows without a full
    // 7-day history keep NULL rolling features (a model's warmup
    // mask), exercised at every SF.
    Q(
      "q403_ts_feature_matrix",
      (s, dir) => {
        val daily = Tables.load(s, dir, "events")
          .where(col("event_type") === "purchase")
          .groupBy(to_date(col("ts")).as("day"))
          .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("x"))
        val w = Window.orderBy("day")
        val w7 = Window.orderBy("day").rowsBetween(-7, -1)
        daily
          .withColumn("lag1", lag("x", 1).over(w))
          .withColumn("lag7", lag("x", 7).over(w))
          .withColumn("n7", count(lit(1)).over(w7))
          .withColumn("s7", sum("x").over(w7))
          .withColumn("q7", sum(col("x") * col("x")).over(w7))
          .select(col("day"), col("x").as("revenue_cents"),
            col("lag1"), col("lag7"),
            when(col("n7") === 7L, Rounding.stableRound6(
              col("s7").cast("double") / 7.0 / 100.0))
              .otherwise(lit(null).cast("double")).as("roll7_mean"),
            when(col("n7") === 7L, Rounding.stableRound6(sqrt(
              col("q7").cast("double") / 7.0 -
                (col("s7").cast("double") / 7.0) *
                  (col("s7").cast("double") / 7.0)) / 100.0))
              .otherwise(lit(null).cast("double")).as("roll7_std"),
            dayofweek(col("day")).cast("long").as("dow"))
          .orderBy("day")
      },
      Some(s"""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS day,
             |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
             |      AS BIGINT) AS x
             |  FROM events WHERE event_type = 'purchase'
             |  GROUP BY 1),
             |f AS (
             |  SELECT day, x,
             |    lag(x, 1) OVER w AS lag1,
             |    lag(x, 7) OVER w AS lag7,
             |    count(*) OVER w7 AS n7,
             |    sum(x) OVER w7 AS s7,
             |    sum(x * x) OVER w7 AS q7
             |  FROM daily
             |  WINDOW w AS (ORDER BY day),
             |    w7 AS (ORDER BY day ROWS BETWEEN 7 PRECEDING
             |      AND 1 PRECEDING))
             |SELECT day, x AS revenue_cents,
             |  CAST(lag1 AS BIGINT) AS lag1, CAST(lag7 AS BIGINT) AS lag7,
             |  CASE WHEN n7 = 7 THEN
             |    ${Rounding.duckSql("s7::DOUBLE / 7.0 / 100.0")}
             |  ELSE NULL END AS roll7_mean,
             |  CASE WHEN n7 = 7 THEN
             |    ${Rounding.duckSql(
                    "sqrt(q7::DOUBLE / 7.0 - (s7::DOUBLE / 7.0)" +
                      " * (s7::DOUBLE / 7.0)) / 100.0")}
             |  ELSE NULL END AS roll7_std,
             |  CAST(CASE WHEN dayofweek(day) = 0 THEN 1
             |    ELSE dayofweek(day) + 1 END AS BIGINT) AS dow
             |FROM f
             |ORDER BY day""".stripMargin)),

    // ------------------------------------------------------------------
    // q404: join-order cost advisor — the optimizer-statistics
    // exercise on the 3-table chain customer ⋈ orders ⋈ lineitem with
    // a selective customer predicate (mktsegment = 'BUILDING'): for
    // each of the two bushy-free orders, the EXACT intermediate
    // cardinality (filtered-customer⋈orders first vs orders⋈lineitem
    // first) and a rows-touched cost model; the advisor picks the
    // smaller. All counts are exact (the point: show the asymmetry a
    // cost-based optimizer exploits — filtering early shrinks every
    // downstream exchange). Three aggregations over keyed joins.
    Q(
      "q404_join_order_advisor",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
          .where(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        val o = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        val l = Tables.load(s, dir, "lineitem").select(col("l_orderkey"))
        val co = c.join(o, col("c_custkey") === col("o_custkey"))
          .select(col("o_orderkey"))
        val nCo = co.agg(count(lit(1)).as("rows_co"))
        val nFinal = co.join(l, col("o_orderkey") === col("l_orderkey"))
          .agg(count(lit(1)).as("rows_final"))
        val nOl = o.join(l, col("o_orderkey") === col("l_orderkey"))
          .agg(count(lit(1)).as("rows_ol"))
        val sizes = Tables.load(s, dir, "customer")
          .agg(count(lit(1)).as("n_cust"))
          .crossJoin(o.agg(count(lit(1)).as("n_ord")))
          .crossJoin(l.agg(count(lit(1)).as("n_li")))
          .crossJoin(c.agg(count(lit(1)).as("n_cust_f")))
        nCo.crossJoin(nFinal).crossJoin(nOl).crossJoin(sizes)
          .selectExpr(
            "stack(2, " +
              "'customer_first', n_cust + n_ord + rows_co + n_li " +
              "+ rows_final, rows_co, " +
              "'lineitem_first', n_ord + n_li + rows_ol + n_cust " +
              "+ rows_final, rows_ol) " +
              "AS (join_order, rows_touched, intermediate_rows)",
            "rows_final")
          .withColumn("advised",
            col("rows_touched") === min("rows_touched")
              .over(Window.partitionBy()))
          .select(col("join_order"), col("intermediate_rows"),
            col("rows_final"), col("rows_touched"), col("advised"))
          .orderBy("join_order")
      },
      Some("""WITH cf AS (
             |  SELECT c_custkey FROM customer
             |  WHERE c_mktsegment = 'BUILDING'),
             |co AS (
             |  SELECT o_orderkey FROM cf
             |  JOIN orders ON o_custkey = c_custkey),
             |s AS (
             |  SELECT
             |    (SELECT count(*) FROM customer) AS n_cust,
             |    (SELECT count(*) FROM cf) AS n_cust_f,
             |    (SELECT count(*) FROM orders) AS n_ord,
             |    (SELECT count(*) FROM lineitem) AS n_li,
             |    (SELECT count(*) FROM co) AS rows_co,
             |    (SELECT count(*) FROM co
             |     JOIN lineitem ON l_orderkey = o_orderkey) AS rows_final,
             |    (SELECT count(*) FROM orders
             |     JOIN lineitem ON l_orderkey = o_orderkey) AS rows_ol),
             |u AS (
             |  SELECT 'customer_first' AS join_order,
             |    n_cust + n_ord + rows_co + n_li + rows_final
             |      AS rows_touched,
             |    rows_co AS intermediate_rows, rows_final
             |  FROM s
             |  UNION ALL
             |  SELECT 'lineitem_first',
             |    n_ord + n_li + rows_ol + n_cust + rows_final,
             |    rows_ol, rows_final
             |  FROM s)
             |SELECT join_order,
             |  CAST(intermediate_rows AS BIGINT) AS intermediate_rows,
             |  CAST(rows_final AS BIGINT) AS rows_final,
             |  CAST(rows_touched AS BIGINT) AS rows_touched,
             |  rows_touched = min(rows_touched) OVER () AS advised
             |FROM u
             |ORDER BY join_order""".stripMargin)),

    // ------------------------------------------------------------------
    // q405: median with an order-statistic confidence interval — the
    // distribution-free binomial CI: the true median lies between the
    // order statistics at ranks n/2 ± z·√n/2 with 95% confidence, no
    // normality assumed. Per event type, all three order statistics
    // (lower rank, median, upper rank) come from ONE value-domain
    // cumulative walk (the q362 frame — never a corpus sort); ranks
    // use z = 1.96 with sqrt (IEEE-exact) and integer floor/ceil.
    Q(
      "q405_median_ci",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select(col("event_type"),
            floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        val dom = e.groupBy("event_type", "cents")
          .agg(count(lit(1)).as("cnt"))
          .withColumn("cum", sum("cnt").over(
            Window.partitionBy("event_type").orderBy("cents")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val n = e.groupBy("event_type").agg(count(lit(1)).as("n"))
          .withColumn("half", sqrt(col("n").cast("double")) * 1.96 / 2.0)
          .withColumn("r_lo",
            greatest(lit(1L), floor(col("n").cast("double") / 2.0
              - col("half")).cast("long")))
          .withColumn("r_med", expr("(n + 1) div 2"))
          .withColumn("r_hi",
            least(col("n"), ceil(col("n").cast("double") / 2.0
              + col("half")).cast("long")))
        def statAt(rankCol: String, as: String) =
          dom.join(n, "event_type")
            .where(col("cum") >= col(rankCol))
            .groupBy("event_type").agg(min("cents").as(as))
        statAt("r_lo", "ci_lo_cents")
          .join(statAt("r_med", "median_cents"), "event_type")
          .join(statAt("r_hi", "ci_hi_cents"), "event_type")
          .join(n.select("event_type", "n"), "event_type")
          .select(col("event_type"), col("n"), col("ci_lo_cents"),
            col("median_cents"), col("ci_hi_cents"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (
             |  SELECT event_type,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |  FROM events),
             |n AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |    greatest(1, CAST(floor(count(*)::DOUBLE / 2.0
             |      - sqrt(count(*)::DOUBLE) * 1.96 / 2.0) AS BIGINT))
             |      AS r_lo,
             |    (count(*) + 1) // 2 AS r_med,
             |    least(count(*), CAST(ceil(count(*)::DOUBLE / 2.0
             |      + sqrt(count(*)::DOUBLE) * 1.96 / 2.0) AS BIGINT))
             |      AS r_hi
             |  FROM e GROUP BY event_type),
             |cum AS (
             |  SELECT event_type, cents, sum(cnt) OVER (
             |    PARTITION BY event_type ORDER BY cents
             |    ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM (SELECT event_type, cents, count(*) AS cnt
             |        FROM e GROUP BY 1, 2)),
             |lo AS (
             |  SELECT event_type, min(cents) AS ci_lo_cents
             |  FROM cum JOIN n USING (event_type)
             |  WHERE cum >= r_lo GROUP BY event_type),
             |md AS (
             |  SELECT event_type, min(cents) AS median_cents
             |  FROM cum JOIN n USING (event_type)
             |  WHERE cum >= r_med GROUP BY event_type),
             |hi AS (
             |  SELECT event_type, min(cents) AS ci_hi_cents
             |  FROM cum JOIN n USING (event_type)
             |  WHERE cum >= r_hi GROUP BY event_type)
             |SELECT event_type, n, ci_lo_cents, median_cents,
             |  ci_hi_cents
             |FROM n
             |JOIN lo USING (event_type)
             |JOIN md USING (event_type)
             |JOIN hi USING (event_type)
             |ORDER BY event_type""".stripMargin))
  )
}
