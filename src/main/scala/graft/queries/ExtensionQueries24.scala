package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.Ranking
import graft.functions.Rounding
import graft.io.Tables

/** Round-7 eighteenth wave: model-evaluation analytics — per-group AUC,
  * calibration / expected-calibration-error, and RFM quintile
  * segmentation. Same contract as every other module: each Spark
  * pipeline pairs with DuckDB oracle SQL replaying it.
  */
object ExtensionQueries24 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q203: per-source AUC (Mann–Whitney) — does document length
    // discriminate English from non-English per source? A label-audit
    // primitive for curation: AUC near 0.5 means the feature carries no
    // signal for that stratum. Scale shape: the naive form ranks every
    // row inside a per-source window (full-data sort per source — the
    // skewed-source hazard); instead we use the counting identity
    // U = Σ_v pc_v·(neg_below_v + nc_v/2): one hash agg collapses rows
    // to distinct (source, value) pairs, and the window runs over THAT
    // aggregated frame (bounded by distinct lengths, not rows).
    // Numerics: pc/nc/below are exact LONGs; pc·(below + nc/2) is an
    // exact multiple of 0.5 so the U sum is order-independent and
    // bit-identical across engines; the final ratio gets stableRound6.
    // Sources with no positives or no negatives have undefined AUC and
    // are excluded (0/0).
    Q(
      "q203_group_auc",
      (s, dir) => {
        val cnt = Tables.load(s, dir, "documents")
          .select(col("source"), col("n_chars").as("v"),
            when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
          .groupBy("source", "v")
          .agg(sum("pos").as("pc"), (count(lit(1)) - sum("pos")).as("nc"))
        val w = Window.partitionBy("source").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, -1)
        cnt
          .withColumn("below", coalesce(sum("nc").over(w), lit(0L)))
          .groupBy("source")
          .agg(
            sum(col("pc").cast("double") *
              (col("below").cast("double") +
                col("nc").cast("double") / 2.0)).as("u"),
            sum("pc").as("n_pos"), sum("nc").as("n_neg"))
          .filter(col("n_pos") > 0 && col("n_neg") > 0)
          .select(col("source"), col("n_pos"), col("n_neg"),
            Rounding.stableRound6(col("u") /
              (col("n_pos") * col("n_neg")).cast("double")).as("auc"))
          .orderBy("source")
      },
      Some(s"""WITH cnt AS (
             |  SELECT source, n_chars AS v,
             |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pc,
             |    sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS nc
             |  FROM documents GROUP BY source, n_chars),
             |win AS (
             |  SELECT source, pc, nc,
             |    coalesce(sum(nc) OVER (PARTITION BY source ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |      0) AS below
             |  FROM cnt),
             |agg AS (
             |  SELECT source, sum(pc) AS n_pos, sum(nc) AS n_neg,
             |    sum(pc::DOUBLE * (below::DOUBLE + nc::DOUBLE / 2.0)) AS u
             |  FROM win GROUP BY source)
             |SELECT source, CAST(n_pos AS BIGINT) AS n_pos,
             |  CAST(n_neg AS BIGINT) AS n_neg,
             |  ${Rounding.duckSql("u / (n_pos * n_neg)::DOUBLE")} AS auc
             |FROM agg WHERE n_pos > 0 AND n_neg > 0
             |ORDER BY source""".stripMargin)),

    // ------------------------------------------------------------------
    // q204: calibration bins + expected calibration error — a
    // reliability diagram for a deterministic length-based probability
    // p = n_chars/(n_chars+1000) predicting lang='en', binned into 10
    // equal-width bins. Per bin: count, mean predicted, observed rate,
    // |gap|; plus the bin-weighted ECE repeated per row. Numerics: p is
    // one exact double division (identical bits in both engines) and the
    // bin id is floor(p·10) on that exact value — but sum(p) as a
    // distributed DOUBLE sum is ORDER-DEPENDENT (r7 verdict: a value
    // near a 1e-6 rounding boundary can flip across partition counts),
    // so each p is first scaled to integer 1e-9 units with the same
    // floor(x·1e9+0.5) IEEE sequence both engines run, and the
    // accumulation is an exact LONG sum — associative, partition-count-
    // invariant (Extension24Spec pins it). Every downstream ratio/gap/
    // ECE derives from those exact longs through single-division double
    // ops, then stableRound6. Scale shape: one shuffle-free scoring
    // scan, one 10-key hash agg, window over the 10-row frame.
    Q(
      "q204_calibration_bins",
      (s, dir) => {
        val scored = Tables.load(s, dir, "documents")
          .select(
            (col("n_chars").cast("double") /
              (col("n_chars").cast("double") + 1000.0)).as("p"),
            when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
          .withColumn("bin", least(floor(col("p") * 10), lit(9L)))
          .withColumn("p9",
            floor(col("p") * lit(1000000000.0) + lit(0.5)).cast("long"))
        val g = Window.partitionBy()
        val avgP = col("sp9").cast("double") / lit(1000000000.0) /
          col("n").cast("double")
        scored.groupBy("bin")
          .agg(count(lit(1)).as("n"), sum("pos").as("n_pos"),
            sum("p9").as("sp9"))
          .withColumn("gap_u", floor(abs(
            avgP - col("n_pos").cast("double") / col("n").cast("double")) *
            lit(1000000.0) + lit(0.5)).cast("long"))
          .withColumn("ece", Rounding.stableRound6(
            sum(col("n") * col("gap_u")).over(g).cast("double") /
              (sum(col("n")).over(g).cast("double") * lit(1000000.0))))
          .select(col("bin"), col("n"), col("n_pos"),
            Rounding.stableRound6(avgP).as("avg_p"),
            Rounding.stableRound6(col("n_pos").cast("double") /
              col("n").cast("double")).as("obs_rate"),
            (col("gap_u").cast("double") / lit(1000000.0)).as("gap"),
            col("ece"))
          .orderBy("bin")
      },
      Some(s"""WITH scored AS (
             |  SELECT n_chars::DOUBLE / (n_chars::DOUBLE + 1000.0) AS p,
             |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
             |  FROM documents),
             |binned AS (
             |  SELECT CAST(least(floor(p * 10), 9) AS BIGINT) AS bin,
             |    pos,
             |    CAST(floor(p * 1000000000 + 0.5) AS BIGINT) AS p9
             |  FROM scored),
             |b AS (
             |  SELECT bin, count(*) AS n, sum(pos) AS n_pos,
             |    CAST(sum(p9) AS BIGINT) AS sp9
             |  FROM binned GROUP BY bin),
             |gapped AS (
             |  SELECT bin, n, n_pos, sp9,
             |    CAST(floor(abs(sp9::DOUBLE / 1000000000 / n::DOUBLE
             |      - n_pos::DOUBLE / n::DOUBLE) * 1000000 + 0.5)
             |      AS BIGINT) AS gap_u
             |  FROM b)
             |SELECT bin, CAST(n AS BIGINT) AS n,
             |  CAST(n_pos AS BIGINT) AS n_pos,
             |  ${Rounding.duckSql("sp9::DOUBLE / 1000000000 / n::DOUBLE")}
             |    AS avg_p,
             |  ${Rounding.duckSql("n_pos::DOUBLE / n::DOUBLE")} AS obs_rate,
             |  gap_u::DOUBLE / 1000000 AS gap,
             |  ${Rounding.duckSql("sum(n * gap_u) OVER ()::DOUBLE " +
               "/ (sum(n) OVER ()::DOUBLE * 1000000)")} AS ece
             |FROM gapped
             |ORDER BY bin""".stripMargin)),

    // ------------------------------------------------------------------
    // q205: RFM quintile segmentation — the classic
    // recency/frequency/monetary customer scoring, each dimension cut
    // into quintiles over the customer aggregate (R: days since last
    // order ascending so tile 1 = most recent; F/M: descending so tile
    // 1 = most active / highest spend; full custkey tiebreak makes every
    // tile assignment deterministic). NO window ntile anywhere: each cut
    // is Ranking.withGlobalRank (range-partition two-pass) +
    // ntileFromRank's closed form — the single-partition global window
    // this query would naively use is the engine's canonical scale
    // anti-pattern. Monetary is summed as exact integer cents. Output:
    // segment code r·100+f·10+m with customer count and total spend.
    Q(
      "q205_rfm_quintiles",
      (s, dir) => {
        val orders = Tables.load(s, dir, "orders")
        val mx = orders.agg(max(to_date(col("o_orderdate"))).as("mx"))
        val cust = orders.groupBy("o_custkey")
          .agg(max(to_date(col("o_orderdate"))).as("last_dt"),
            count(lit(1)).as("freq"),
            sum(round(col("o_totalprice") * 100).cast("long"))
              .as("mon_cents"))
          .crossJoin(broadcast(mx))
          .withColumn("rec_days", datediff(col("mx"), col("last_dt"))
            .cast("long"))
        val (r1, nCust) = Ranking.withGlobalRankAndCount(cust,
          Seq(col("rec_days").asc, col("o_custkey").asc))
        val t1 = r1.withColumn("r_tile",
          Ranking.ntileFromRank(col("global_rank"), nCust, 5))
          .drop("global_rank")
        val t2 = Ranking.withGlobalRank(t1,
          Seq(col("freq").desc, col("o_custkey").asc))
          .withColumn("f_tile",
            Ranking.ntileFromRank(col("global_rank"), nCust, 5))
          .drop("global_rank")
        val t3 = Ranking.withGlobalRank(t2,
          Seq(col("mon_cents").desc, col("o_custkey").asc))
          .withColumn("m_tile",
            Ranking.ntileFromRank(col("global_rank"), nCust, 5))
          .drop("global_rank")
        t3
          .groupBy((col("r_tile") * 100 + col("f_tile") * 10 +
            col("m_tile")).cast("long").as("segment"))
          .agg(count(lit(1)).as("n_customers"),
            (sum("mon_cents").cast("double") / 100.0).as("monetary"))
          .orderBy("segment")
      },
      Some("""WITH cust AS (
             |  SELECT o_custkey AS ck,
             |    date_diff('day', CAST(max(o_orderdate) AS DATE),
             |      (SELECT CAST(max(o_orderdate) AS DATE) FROM orders))
             |      AS rec_days,
             |    count(*) AS freq,
             |    sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |      AS mon_cents
             |  FROM orders GROUP BY o_custkey),
             |t AS (
             |  SELECT ck, mon_cents,
             |    ntile(5) OVER (ORDER BY rec_days, ck) AS r_tile,
             |    ntile(5) OVER (ORDER BY freq DESC, ck) AS f_tile,
             |    ntile(5) OVER (ORDER BY mon_cents DESC, ck) AS m_tile
             |  FROM cust)
             |SELECT CAST(r_tile * 100 + f_tile * 10 + m_tile AS BIGINT)
             |    AS segment,
             |  CAST(count(*) AS BIGINT) AS n_customers,
             |  sum(mon_cents)::DOUBLE / 100.0 AS monetary
             |FROM t GROUP BY 1
             |ORDER BY segment""".stripMargin))
  )
}
