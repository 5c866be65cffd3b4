package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.Rounding
import graft.io.Tables

/** Round-9 fifteenth wave: Kendall's W concordance across the q356
  * leaderboards via the two-pass distributed global rank (q367), an
  * Oaxaca mix-vs-rate decomposition of a period-over-period mean shift
  * (q368), and HLL audience-overlap estimation with an exact self-audit
  * (q369).
  */
object ExtensionQueries57 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q367: Kendall's coefficient of concordance W across the three
    // supplier leaderboards q356 fuses — do revenue, breadth, and
    // volume even agree before you fuse them? Ranks are DISTINCT by
    // construction (total order: metric DESC, suppkey), so the no-ties
    // W applies: W = S / (m²(n³−n)/12) with m = 3; we carry
    // S4 = Σ(2ΣR_i − 3(n+1))² = 4·S·... entirely in exact LONGs
    // (doubling clears the (n+1)/2 half-integer), so the only float op
    // is the final division. Each rank column comes from
    // ext.Ranking.withGlobalRank — the two-pass range-partitioned rank,
    // NEVER a single-partition window over the supplier frame (the
    // q283 discipline). Three ranking passes + keyed joins on suppkey.
    Q(
      "q367_rank_concordance",
      (s, dir) => {
        // r14 note (guide §1.2 "measure first"): materializing this
        // supplier aggregate with localCheckpoint was MEASURED SLOWER
        // (2.70s → 3.0-3.7s at sf0.1) than letting the three ranking
        // passes recompute it — the parquet scans are codegen'd and
        // parallel while RDD-block rescans of the checkpoint are not,
        // and the supplier frame is small. Left recomputed on purpose.
        val f = Tables.load(s, dir, "lineitem")
          .groupBy(col("l_suppkey").as("sk"))
          .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
            .as("rev_cents"),
            countDistinct("l_partkey").as("n_parts"),
            count(lit(1)).as("n_ships"))
        def ranked(c: String, as: String) =
          graft.ext.Ranking.withGlobalRank(f.select(col("sk"), col(c)),
              Seq(col(c).desc, col("sk")))
            .select(col("sk"), col("global_rank").as(as))
        val r = ranked("rev_cents", "r1")
          .join(ranked("n_parts", "r2"), "sk")
          .join(ranked("n_ships", "r3"), "sk")
        val n1 = r.agg(count(lit(1)).as("n"))
        r.crossJoin(n1)
          .select(col("n"),
            (lit(2L) * (col("r1") + col("r2") + col("r3"))
              - lit(3L) * (col("n") + 1L)).as("d2"))
          .agg(max("n").as("n_items"),
            sum(col("d2") * col("d2")).as("s4"))
          .select(col("n_items"),
            when(col("n_items") > 1L,
              Rounding.stableRound6(col("s4").cast("double") /
                (lit(3.0) * (col("n_items") * col("n_items")
                  * col("n_items") - col("n_items")).cast("double"))))
              .otherwise(lit(null).cast("double")).as("kendall_w"))
      },
      Some(s"""WITH f AS (
             |  SELECT l_suppkey AS sk,
             |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
             |      AS BIGINT)) AS BIGINT) AS rev_cents,
             |    CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
             |    CAST(count(*) AS BIGINT) AS n_ships
             |  FROM lineitem GROUP BY 1),
             |n1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f),
             |r AS (
             |  SELECT sk,
             |    row_number() OVER (ORDER BY rev_cents DESC, sk) AS r1,
             |    row_number() OVER (ORDER BY n_parts DESC, sk) AS r2,
             |    row_number() OVER (ORDER BY n_ships DESC, sk) AS r3
             |  FROM f),
             |sm AS (
             |  SELECT CAST(max(n) AS BIGINT) AS n_items,
             |    CAST(sum((2 * (r1 + r2 + r3) - 3 * (n + 1))
             |      * (2 * (r1 + r2 + r3) - 3 * (n + 1))) AS BIGINT) AS s4
             |  FROM r CROSS JOIN n1)
             |SELECT n_items,
             |  CASE WHEN n_items > 1 THEN
             |    ${Rounding.duckSql(
                    "s4::DOUBLE / (3.0 * (n_items * n_items * n_items" +
                      " - n_items)::DOUBLE)")}
             |  ELSE NULL END AS kendall_w
             |FROM sm""".stripMargin)),

    // ------------------------------------------------------------------
    // q368: Oaxaca decomposition of the period-over-period mean shift —
    // Δmean splits EXACTLY into a MIX effect (event-type shares moved)
    // plus a RATE effect (within-type means moved):
    // Δ = Σ_t (sh₁ − sh₀)·m₀ + Σ_t sh₁·(m₁ − m₀) — the identity the
    // revenue-"why did the average drop" postmortem needs (pre-period
    // means weight the mix term, post-period shares weight the rate
    // term; the standard convention, declared). All inputs are exact
    // LONG cent/count sums; each effect is one fixed left-to-right
    // double expression identical in both engines. One (type, period)
    // groupBy — a 10-cell frame — carries the whole query.
    Q(
      "q368_mean_shift_decomposition",
      (s, dir) => {
        val pre = dayofmonth(col("ts").cast("timestamp")) < 16
        val e = Tables.load(s, dir, "events")
          .select(col("event_type"),
            when(pre, lit(1L)).otherwise(lit(0L)).as("is_pre"),
            floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        val byType = e.groupBy("event_type")
          .agg(sum(col("is_pre")).as("n_pre"),
            sum(when(col("is_pre") === 1L, col("cents")).otherwise(0L))
              .as("s_pre"),
            sum(lit(1L) - col("is_pre")).as("n_post"),
            sum(when(col("is_pre") === 0L, col("cents")).otherwise(0L))
              .as("s_post"))
        val tot = byType.agg(sum("n_pre").as("tn_pre"),
          sum("s_pre").as("ts_pre"), sum("n_post").as("tn_post"),
          sum("s_post").as("ts_post"))
        byType.crossJoin(tot)
          .withColumn("sh0",
            col("n_pre").cast("double") / col("tn_pre").cast("double"))
          .withColumn("sh1",
            col("n_post").cast("double") / col("tn_post").cast("double"))
          .withColumn("m0", col("s_pre").cast("double") /
            col("n_pre").cast("double") / 100.0)
          .withColumn("m1", col("s_post").cast("double") /
            col("n_post").cast("double") / 100.0)
          .select(col("event_type"),
            Rounding.stableRound6(col("sh0")).as("share_pre"),
            Rounding.stableRound6(col("sh1")).as("share_post"),
            Rounding.stableRound6(col("m0")).as("mean_pre"),
            Rounding.stableRound6(col("m1")).as("mean_post"),
            Rounding.stableRound6((col("sh1") - col("sh0")) * col("m0"))
              .as("mix_effect"),
            Rounding.stableRound6(col("sh1") * (col("m1") - col("m0")))
              .as("rate_effect"),
            Rounding.stableRound6(
              col("ts_post").cast("double") / col("tn_post").cast("double")
                / 100.0 -
                col("ts_pre").cast("double") / col("tn_pre").cast("double")
                  / 100.0).as("total_delta"))
          .orderBy("event_type")
      },
      Some(s"""WITH e AS (
             |  SELECT event_type,
             |    CASE WHEN EXTRACT(day FROM ts::TIMESTAMP) < 16
             |      THEN 1 ELSE 0 END AS is_pre,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |  FROM events),
             |bt AS (
             |  SELECT event_type,
             |    CAST(sum(is_pre) AS BIGINT) AS n_pre,
             |    CAST(sum(CASE WHEN is_pre = 1 THEN cents ELSE 0 END)
             |      AS BIGINT) AS s_pre,
             |    CAST(sum(1 - is_pre) AS BIGINT) AS n_post,
             |    CAST(sum(CASE WHEN is_pre = 0 THEN cents ELSE 0 END)
             |      AS BIGINT) AS s_post
             |  FROM e GROUP BY 1),
             |tot AS (
             |  SELECT CAST(sum(n_pre) AS BIGINT) AS tn_pre,
             |    CAST(sum(s_pre) AS BIGINT) AS ts_pre,
             |    CAST(sum(n_post) AS BIGINT) AS tn_post,
             |    CAST(sum(s_post) AS BIGINT) AS ts_post
             |  FROM bt),
             |x AS (
             |  SELECT event_type,
             |    n_pre::DOUBLE / tn_pre::DOUBLE AS sh0,
             |    n_post::DOUBLE / tn_post::DOUBLE AS sh1,
             |    s_pre::DOUBLE / n_pre::DOUBLE / 100.0 AS m0,
             |    s_post::DOUBLE / n_post::DOUBLE / 100.0 AS m1,
             |    ts_pre, tn_pre, ts_post, tn_post
             |  FROM bt CROSS JOIN tot)
             |SELECT event_type,
             |  ${Rounding.duckSql("sh0")} AS share_pre,
             |  ${Rounding.duckSql("sh1")} AS share_post,
             |  ${Rounding.duckSql("m0")} AS mean_pre,
             |  ${Rounding.duckSql("m1")} AS mean_post,
             |  ${Rounding.duckSql("(sh1 - sh0) * m0")} AS mix_effect,
             |  ${Rounding.duckSql("sh1 * (m1 - m0)")} AS rate_effect,
             |  ${Rounding.duckSql(
                  "ts_post::DOUBLE / tn_post::DOUBLE / 100.0" +
                    " - ts_pre::DOUBLE / tn_pre::DOUBLE / 100.0")}
             |    AS total_delta
             |FROM x
             |ORDER BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // q369: HLL audience overlap — pairwise user-set intersections
    // between event types via inclusion-exclusion over MERGEABLE
    // sketches (|A∩B| ≈ est(A) + est(B) − est(A∪B), the union from
    // hll_union on the two per-type sketches — never re-reading rows),
    // the q206 incremental-pipeline shape extended from cardinalities
    // to OVERLAPS: per-type sketches persist per ingest batch, any
    // pair's overlap is sketch algebra. Approximate by construction,
    // so the gate is the q206 self-audit: exact intersections (which
    // the oracle replays), the exact Jaccard, and a within-tolerance
    // boolean the oracle pins true (at fixture cardinalities the
    // lgK=12 sketch is in exact sparse mode; the ±(0.05·exact + 2)
    // band documents the dense-mode bound that takes over at scale).
    Q(
      "q369_hll_intersection",
      (s, dir) => {
        val u = Tables.load(s, dir, "events")
          .select(col("event_type"), col("user_id"))
        val sk = u.groupBy("event_type")
          .agg(hll_sketch_agg(col("user_id")).as("sk"),
            count_distinct(col("user_id")).as("ex"))
        val a = sk.select(col("event_type").as("type_a"),
          col("sk").as("ska"), col("ex").as("exa"))
        val b = sk.select(col("event_type").as("type_b"),
          col("sk").as("skb"), col("ex").as("exb"))
        val ud = u.distinct()
        val inter = ud.toDF("type_a", "user_id")
          .join(ud.toDF("type_b", "user_id"), "user_id")
          .where(col("type_a") < col("type_b"))
          .groupBy("type_a", "type_b")
          .agg(count(lit(1)).as("exact_inter"))
        a.crossJoin(broadcast(b))
          .where(col("type_a") < col("type_b"))
          .withColumn("est_inter",
            hll_sketch_estimate(col("ska")).cast("double") +
              hll_sketch_estimate(col("skb")).cast("double") -
              hll_sketch_estimate(hll_union(col("ska"), col("skb")))
                .cast("double"))
          .join(inter, Seq("type_a", "type_b"))
          .select(col("type_a"), col("type_b"),
            col("exa").cast("long").as("exact_a"),
            col("exb").cast("long").as("exact_b"),
            col("exact_inter"),
            Rounding.stableRound6(col("exact_inter").cast("double") /
              (col("exa") + col("exb") - col("exact_inter"))
                .cast("double")).as("jaccard"),
            (abs(col("est_inter") - col("exact_inter").cast("double")) <=
              col("exact_inter").cast("double") * 0.05 + 2.0)
              .as("within_tol"))
          .orderBy("type_a", "type_b")
      },
      Some(s"""WITH u AS (
             |  SELECT DISTINCT event_type, user_id FROM events),
             |ex AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS ex
             |  FROM u GROUP BY 1),
             |inter AS (
             |  SELECT a.event_type AS type_a, b.event_type AS type_b,
             |    CAST(count(*) AS BIGINT) AS exact_inter
             |  FROM u a JOIN u b ON b.user_id = a.user_id
             |    AND a.event_type < b.event_type
             |  GROUP BY 1, 2)
             |SELECT type_a, type_b, xa.ex AS exact_a, xb.ex AS exact_b,
             |  exact_inter,
             |  ${Rounding.duckSql(
                  "exact_inter::DOUBLE" +
                    " / (xa.ex + xb.ex - exact_inter)::DOUBLE")}
             |    AS jaccard,
             |  true AS within_tol
             |FROM inter
             |JOIN ex xa ON xa.event_type = type_a
             |JOIN ex xb ON xb.event_type = type_b
             |ORDER BY type_a, type_b""".stripMargin))
  )
}
