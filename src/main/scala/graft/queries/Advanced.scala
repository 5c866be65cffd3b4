package graft.queries

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.AsOfJoin

/** Second relational wave: the §2b rows not yet covered by a query —
  * exact count-distinct, EXCEPT, as-of join, and the typed Aggregator
  * (UDAF) surface.
  */
object Advanced {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q23: count(DISTINCT) — two-phase distinct aggregation. (The sketch
    // variant approx_count_distinct is engine-specific by construction —
    // HLL values differ across engines — so it's pinned by a ±5% property
    // test in AdvancedSpec instead of the hash gate.)
    Q(
      "q23_count_distinct",
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .groupBy("o_orderstatus")
          .agg(countDistinct(col("o_custkey")).as("n_cust"),
            count(lit(1)).as("n"))
          .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust, count(*) AS n
             |FROM orders
             |GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin)),

    // ------------------------------------------------------------------
    // q24: as-of join — for each event, the user's latest order AT or
    // before the event time (point-in-time lookup): its date, key and
    // total price, plus how many prior orders existed. The right side is
    // pre-aggregated per (custkey, orderdate) before the range join, so
    // the join fanout is bounded by distinct order DATES per user, not
    // raw orders (the scale refinement from round 1). Payload pick is
    // deterministic: max_by over o_orderkey within a date, max_by over
    // date within an event; the oracle replays both with arg_max.
    Q(
      "q24_asof_lookup",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
        val o = Tables.load(s, dir, "orders")
        AsOfJoin.lookupLatest(
            e, o,
            e("user_id"), o("o_custkey"),
            e("ts"), o("o_orderdate"),
            leftSelect = Seq(e("event_id"), e("user_id"), e("ts")),
            payload = Seq("o_orderkey", "o_totalprice"),
            tieBreak = Some(o("o_orderkey")))
          .orderBy("event_id")
      },
      Some("""WITH od AS (
             |  SELECT o_custkey, o_orderdate, count(*) AS cnt,
             |    arg_max(o_orderkey, o_orderkey) AS pk,
             |    arg_max(o_totalprice, o_orderkey) AS pv
             |  FROM orders GROUP BY 1, 2)
             |SELECT event_id, user_id, ts,
             |  max(o_orderdate) AS asof_time,
             |  CAST(sum(cnt) AS BIGINT) AS n_prior,
             |  arg_max(pk, o_orderdate) AS asof_o_orderkey,
             |  arg_max(pv, o_orderdate) AS asof_o_totalprice
             |FROM events JOIN od
             |  ON user_id = o_custkey AND o_orderdate <= ts
             |GROUP BY event_id, user_id, ts
             |ORDER BY event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q60: FORWARD as-of — for each error event, the same user's next
    // purchase at/after it (time-to-conversion). Mirror of q24: right
    // side pre-aggregated per (user, ts), argmin via min_by, DuckDB
    // replays with arg_min.
    Q(
      "q60_asof_forward",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
        val errors = e.filter(col("event_type") === "error")
        val purchases = e.filter(col("event_type") === "purchase")
        AsOfJoin.lookupEarliest(
            errors, purchases,
            errors("user_id"), purchases("user_id"),
            errors("ts"), purchases("ts"),
            leftSelect = Seq(errors("event_id"), errors("user_id"), errors("ts")),
            payload = Seq("event_id", "value"),
            tieBreak = Some(purchases("event_id")))
          .orderBy("event_id")
      },
      Some("""WITH pt AS (
             |  SELECT user_id, ts, count(*) AS cnt,
             |    arg_min(event_id, event_id) AS pk,
             |    arg_min(value, event_id) AS pv
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
             |SELECT e.event_id, e.user_id, e.ts,
             |  min(pt.ts) AS asof_time,
             |  CAST(sum(cnt) AS BIGINT) AS n_after,
             |  arg_min(pk, pt.ts) AS asof_event_id,
             |  arg_min(pv, pt.ts) AS asof_value
             |FROM events e JOIN pt ON e.user_id = pt.user_id AND pt.ts >= e.ts
             |WHERE e.event_type = 'error'
             |GROUP BY 1, 2, 3
             |ORDER BY e.event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q25: EXCEPT — customers who never fired a purchase event.
    Q(
      "q25_except_purchasers",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer").select("c_custkey")
        val p = Tables.load(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .select(col("user_id").as("c_custkey"))
        c.except(p).orderBy("c_custkey")
      },
      Some("""SELECT c_custkey FROM (
             |  SELECT c_custkey FROM customer
             |  EXCEPT
             |  SELECT user_id AS c_custkey FROM events WHERE event_type = 'purchase')
             |ORDER BY c_custkey""".stripMargin)),

    // ------------------------------------------------------------------
    // q51: the typed TopKAggregator (bounded min-heap UDAF) reproducing
    // q07's window-top-k semantics — the heap's k-row state is what the
    // shuffle carries per group instead of every row (SURVEY.md §2b
    // "top-k" upgrade path), and the oracle is the window formulation,
    // proving the two agree row-for-row.
    Q(
      "q51_topk_aggregator",
      (s, dir) => {
        import s.implicits._
        val li = Tables.load(s, dir, "lineitem")
          .select(col("l_suppkey"),
            (col("l_orderkey") * 100 + col("l_linenumber")).cast("long").as("item_id"),
            col("l_extendedprice"))
          .as[(Long, Long, Double)]
        val topk = new graft.functions.TopKAggregator(3).toColumn
        li.groupByKey(_._1)
          .mapValues(t => (t._2, t._3))
          .agg(topk)
          .flatMap { case (sk, items) =>
            items.zipWithIndex.map { case ((id, score), i) =>
              (sk, (i + 1).toLong, id, score)
            }
          }
          .toDF("l_suppkey", "rank", "item_id", "price")
          .orderBy("l_suppkey", "rank")
      },
      Some("""SELECT l_suppkey, rank, item_id, price FROM (
             |  SELECT l_suppkey,
             |    l_orderkey * 100 + l_linenumber AS item_id,
             |    l_extendedprice AS price,
             |    row_number() OVER (PARTITION BY l_suppkey
             |      ORDER BY l_extendedprice DESC, l_orderkey * 100 + l_linenumber) AS rank
             |  FROM lineitem)
             |WHERE rank <= 3
             |ORDER BY l_suppkey, rank""".stripMargin))
  )
}
