package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Rounding
import graft.io.Tables
import graft.ops.AsOfJoin

/** Round-7 eighth wave: k-anonymity generalization ladder, time-decay
  * multi-touch attribution, and a point-in-time temporal join against a
  * derived changelog dimension. Same contract as every other module:
  * each Spark pipeline pairs with DuckDB oracle SQL replaying it.
  */
object ExtensionQueries14 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q177: k-anonymity generalization ladder — for quasi-identifier
    // (lang, source) at k = 5, how many identifier groups are smaller
    // than k (re-identifiable) and how many rows they hold, at each
    // rung of the generalization ladder: full (lang, source) →
    // generalize source away (lang) → fully generalized (). This is
    // the Mondrian-style privacy audit run before releasing grouped
    // stats: pick the cheapest rung whose suppressed-row cost is
    // acceptable. Scale shape: ONE corpus scan — ROLLUP computes all
    // three rungs in a single aggregation (grouping_id labels the
    // rung), then a rung-keyed agg over the GROUP frame (cell-
    // cardinality rows). All-integer outputs.
    Q(
      "q177_k_anonymity",
      (s, dir) => {
        val k = 5L
        val groups = Tables.load(s, dir, "documents")
          .rollup("lang", "source")
          .agg(count(lit(1)).as("n"), grouping_id().as("level"))
        groups.groupBy("level")
          .agg(count(lit(1)).as("n_groups"),
            sum(when(col("n") < k, 1L).otherwise(0L)).as("n_small_groups"),
            sum(when(col("n") < k, col("n")).otherwise(0L))
              .as("suppressed_rows"))
          .orderBy("level")
      },
      Some("""WITH g AS (
             |  SELECT lang, source, count(*) AS n,
             |    GROUPING(lang, source) AS level
             |  FROM documents
             |  GROUP BY ROLLUP (lang, source))
             |SELECT CAST(level AS BIGINT) AS level,
             |  CAST(count(*) AS BIGINT) AS n_groups,
             |  CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_small_groups,
             |  CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
             |    AS suppressed_rows
             |FROM g
             |GROUP BY level
             |ORDER BY level""".stripMargin)),

    // ------------------------------------------------------------------
    // q178: time-decay multi-touch attribution — every purchase splits
    // its value across the user's views in the prior 30 minutes:
    // weight 2^-1 to the most recent view, 2^-2 to the next, ..., and
    // the tail remainder 2^-n joins the OLDEST view so weights sum to
    // exactly 1 (all dyadic rationals — exact doubles, identical in
    // both engines; q56's last-touch is the degenerate n=1 case). The
    // standard ads/analytics credit model, distribution-friendly:
    // the interval join fans out by views-per-purchase-window (bounded
    // by user activity in 30 min, not corpus size), the recency rank
    // is a window over each purchase's OWN candidate set, one shuffle
    // on the user key.
    Q(
      "q178_multitouch_attribution",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("value"), unix_micros(col("ts").cast("timestamp")).as("t"))
        val purchases = e.where(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("value"), col("t").as("pt"))
        val views = e.where(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_id"),
            col("t").as("vt"))
        val w = Window.partitionBy("purchase_id")
        val joined = purchases.join(views, Seq("user_id"))
          .where(col("vt") < col("pt") && col("pt") - col("vt") <= 1800000000L)
          .withColumn("rnk", row_number().over(
            w.orderBy(desc("vt"), desc("view_id"))))
          .withColumn("n", count(lit(1)).over(w))
        joined
          .withColumn("weight",
            pow(lit(0.5), col("rnk")) +
              when(col("rnk") === col("n"), pow(lit(0.5), col("n")))
                .otherwise(lit(0.0)))
          .select(col("purchase_id"), col("view_id"), col("rnk"),
            col("weight"),
            Rounding.stableRound6(col("value") * col("weight")).as("credit"))
          .orderBy("purchase_id", "rnk")
      },
      Some(s"""WITH p AS (
             |  SELECT user_id, event_id AS purchase_id, value,
             |    epoch_us(ts) AS pt
             |  FROM events WHERE event_type = 'purchase'),
             |v AS (
             |  SELECT user_id, event_id AS view_id, epoch_us(ts) AS vt
             |  FROM events WHERE event_type = 'view'),
             |j AS (
             |  SELECT purchase_id, view_id, value,
             |    row_number() OVER (PARTITION BY purchase_id
             |      ORDER BY vt DESC, view_id DESC) AS rnk,
             |    count(*) OVER (PARTITION BY purchase_id) AS n
             |  FROM p JOIN v USING (user_id)
             |  WHERE vt < pt AND pt - vt <= 1800000000)
             |SELECT purchase_id, view_id, rnk,
             |  power(0.5, rnk) + CASE WHEN rnk = n THEN power(0.5, n)
             |    ELSE 0.0 END AS weight,
             |  ${Rounding.duckSql(
                  "value * (power(0.5, rnk) + CASE WHEN rnk = n " +
                    "THEN power(0.5, n) ELSE 0.0 END)")} AS credit
             |FROM j
             |ORDER BY purchase_id, rnk""".stripMargin)),

    // ------------------------------------------------------------------
    // q179: point-in-time temporal join — enrich every click with the
    // user's purchase-balance AS OF the click instant, where the
    // balance dimension is DERIVED from the changelog (running sum of
    // purchase values per user — the warehouse pattern of versioning a
    // dimension from its own change stream, then joining facts with
    // point-in-time correctness; a plain latest-value join would leak
    // the future). Scale shape: the history build is a per-user
    // ordered running sum (keyed window, sequential adds — identical
    // fp both engines); the temporal lookup is AsOfJoin.lookupLatest's
    // two-stage shape — per-(key, time) pre-aggregation, then equi-
    // join + range + max_by argmax, two key shuffles, no global sort.
    Q(
      "q179_temporal_join",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("value"), unix_micros(col("ts").cast("timestamp")).as("t"))
        val history = e.where(col("event_type") === "purchase")
          .withColumn("balance", sum("value").over(
            Window.partitionBy("user_id").orderBy("t", "event_id")
              .rowsBetween(Window.unboundedPreceding, 0)))
          .select(col("user_id"), col("t"), col("event_id"), col("balance"))
        val clicks = e.where(col("event_type") === "click")
          .select(col("user_id").as("cu"), col("event_id").as("click_id"),
            col("t").as("ct"))
        AsOfJoin.lookupLatest(
            clicks, history,
            col("cu"), col("user_id"),
            col("ct"), col("t"),
            leftSelect = Seq(col("cu").as("user_id"), col("click_id")),
            payload = Seq("balance"),
            tieBreak = Some(col("event_id")))
          .select(col("user_id"), col("click_id"), col("asof_time"),
            col("n_prior"),
            Rounding.stableRound6(col("asof_balance")).as("balance"))
          .orderBy("click_id")
      },
      Some(s"""WITH hist AS (
             |  SELECT user_id, epoch_us(ts) AS t, event_id,
             |    sum(value) OVER (PARTITION BY user_id
             |      ORDER BY epoch_us(ts), event_id
             |      ROWS UNBOUNDED PRECEDING) AS balance
             |  FROM events WHERE event_type = 'purchase'),
             |clicks AS (
             |  SELECT user_id, event_id AS click_id, epoch_us(ts) AS ct
             |  FROM events WHERE event_type = 'click'),
             |m AS (
             |  SELECT c.user_id, c.click_id, max(h.t) AS asof_time,
             |    count(*) AS n_prior
             |  FROM clicks c JOIN hist h
             |    ON h.user_id = c.user_id AND h.t <= c.ct
             |  GROUP BY 1, 2)
             |SELECT m.user_id, m.click_id, m.asof_time,
             |  CAST(m.n_prior AS BIGINT) AS n_prior,
             |  ${Rounding.duckSql("max(h2.balance)")} AS balance
             |FROM m JOIN hist h2
             |  ON h2.user_id = m.user_id AND h2.t = m.asof_time
             |GROUP BY m.user_id, m.click_id, m.asof_time, m.n_prior
             |ORDER BY m.click_id""".stripMargin))
  )
}
