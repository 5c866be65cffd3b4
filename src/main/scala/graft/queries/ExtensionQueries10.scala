package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.Sampling
import graft.io.Tables

/** Round-7 fourth wave: mergeable-histogram incremental quantiles (the
  * sketch-merge == full-recompute gate), CDC latest-wins compaction with
  * tombstones, and leakage-safe dedup-group-aware train/val/test splits.
  * Same contract as every other module: each Spark pipeline pairs with
  * DuckDB oracle SQL replaying it.
  */
object ExtensionQueries10 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q164: incremental quantiles by histogram merge — build the
    // fixed-width-bin histogram SEPARATELY on the base slice (events
    // before Jan 16) and the late-arriving delta slice, merge the two
    // sketch states by summing bin counts, and read per-type
    // p50/p90/p99 off the MERGED sketch. The oracle computes the same
    // quantiles from the full dataset in one pass — so the gate proves
    // the sketch's merge operator is lossless (merged == recomputed,
    // exactly — bin counts are integers and the bin walk is
    // deterministic), the property that makes per-day histogram states
    // safe to fold into monthly stats without re-reading 100 TB (q153's
    // incremental-ETL claim, extended from algebraic (count, sum) to a
    // distribution sketch). Scale shape: two bounded-state aggs (state
    // = #(type, bin), independent of row count), one merge agg on the
    // tiny bin frame, cumulative window over bins WITHIN a type
    // (dozens of rows), quantile probe via a 3-row broadcast cross.
    Q(
      "q164_histogram_merge",
      (s, dir) => {
        val binW = 10.0
        val e = Tables.load(s, dir, "events")
          .select(col("event_type"), col("value"),
            col("ts").cast("timestamp").as("t"))
        def bins(df: org.apache.spark.sql.DataFrame) = df
          .groupBy(col("event_type"), floor(col("value") / binW).as("bin"))
          .agg(count(lit(1)).as("c"))
        val cutoff = "2024-01-16"
        val merged = bins(e.where(col("t") < lit(cutoff).cast("timestamp")))
          .unionAll(bins(e.where(col("t") >= lit(cutoff).cast("timestamp"))))
          .groupBy("event_type", "bin").agg(sum("c").as("c"))
        val byBin = Window.partitionBy("event_type").orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, 0)
        val cum = merged
          .withColumn("cum", sum("c").over(byBin))
          .withColumn("total",
            sum("c").over(Window.partitionBy("event_type")))
        val spark = s
        import spark.implicits._
        broadcast(Seq(0.5, 0.9, 0.99).toDF("q"))
          .crossJoin(cum)
          .where(col("cum") >= col("q") * col("total"))
          .groupBy("event_type", "q").agg(min("bin").as("bin"))
          .select(col("event_type"), col("q"), col("bin"),
            ((col("bin") + 0.5) * binW).as("est"))
          .orderBy("event_type", "q")
      },
      Some("""WITH bins AS (
             |  SELECT event_type, CAST(floor(value / 10.0) AS BIGINT) AS bin,
             |    count(*) AS c
             |  FROM events GROUP BY 1, 2),
             |cum AS (
             |  SELECT event_type, bin, c,
             |    sum(c) OVER (PARTITION BY event_type ORDER BY bin
             |      ROWS UNBOUNDED PRECEDING) AS cum,
             |    sum(c) OVER (PARTITION BY event_type) AS total
             |  FROM bins),
             |qs AS (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE,
             |  0.99::DOUBLE]) AS q) -- DOUBLE, not DECIMAL: the cum >= q*total
             |  -- probe must run the same IEEE multiply as Spark (a DECIMAL
             |  -- 0.9*total is exact where the double product is not, and an
             |  -- integer-valued 0.9*total would then select a different bin)
             |SELECT event_type, q, min(bin) AS bin,
             |  (min(bin) + 0.5) * 10.0 AS est
             |FROM qs CROSS JOIN cum
             |WHERE cum >= q * total
             |GROUP BY event_type, q
             |ORDER BY event_type, q""".stripMargin)),

    // ------------------------------------------------------------------
    // q165: CDC latest-wins compaction — collapse a changelog to current
    // state: per user, the (ts, event_id)-latest event wins, and a
    // latest 'error' event is a tombstone (the user is absent from the
    // snapshot). This is the compaction step every incremental ingest
    // runs before serving (Hudi/Delta merge-on-read semantics, engine-
    // side). Scale shape: ONE keyed aggregation — argmax via
    // max(struct(ts, id, payload)), q118's survivor discipline. A
    // struct-typed max buffer makes Spark pick SortAggregate, but with
    // MAP-SIDE PARTIALS: each partition pre-sorts and collapses to one
    // winner per (partition, user) BEFORE the exchange, so the shuffle
    // carries winners, never the changelog — the volume property that
    // matters at 100 TB (the in-partition sort is the constant-factor
    // price of a struct ordering key). Still strictly better than
    // row_number-over-user, which must SHUFFLE every changelog row to
    // its key's partition before sorting. (ts_us, event_id) is a
    // unique total order so the argmax is deterministic; the payload
    // rides the struct unchanged (raw doubles pass through bit-exact).
    Q(
      "q165_cdc_compaction",
      (s, dir) => {
        Tables.load(s, dir, "events")
          .select(col("user_id"), struct(
            unix_micros(col("ts").cast("timestamp")).as("ts_us"),
            col("event_id"), col("event_type"), col("value")).as("ev"))
          .groupBy("user_id").agg(max("ev").as("last"))
          .where(col("last.event_type") =!= "error")
          .select(col("user_id"), col("last.event_id").as("last_event_id"),
            col("last.event_type").as("last_type"),
            col("last.value").as("last_value"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, event_id AS last_event_id,
             |  event_type AS last_type, value AS last_value
             |FROM events
             |QUALIFY row_number() OVER (PARTITION BY user_id
             |  ORDER BY epoch_us(ts) DESC, event_id DESC) = 1
             |  AND event_type <> 'error'
             |ORDER BY user_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q166: leakage-safe splits — assign train/val/test by the DOCUMENT
    // GROUP, not the document: exact duplicates (q43's normalized md5
    // fingerprint) always land in the same split, so a train copy can
    // never leak into test (the classic contamination bug in dedup-less
    // split pipelines; group-aware splitting is the fix the big-corpus
    // papers converged on). The split decision reuses q55's salted
    // square-mix PolyHash bucketing applied to the group's CANONICAL id
    // (min doc_id), so membership is reproducible on any engine and
    // independent of which duplicate you ask about. Scale shape: one fp
    // aggregation, one join back on the fp key (posting shape,
    // AQE-sized), then a shuffle-free bucket/split projection.
    Q(
      "q166_leakage_safe_split",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))))
              .as("fp"))
        val canon = d.groupBy("fp").agg(min("doc_id").as("canonical_id"))
        val withCanon = d.join(canon, "fp")
        Sampling.hashSplit(withCanon, "canonical_id", "leak42",
            Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
          .select("doc_id", "canonical_id", "split")
          .orderBy("doc_id")
      },
      Some(s"""WITH d AS (
             |  SELECT doc_id,
             |    md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
             |  FROM documents),
             |canon AS (SELECT fp, min(doc_id) AS canonical_id FROM d
             |          GROUP BY fp),
             |b AS (
             |  SELECT doc_id, canonical_id,
             |    ${Sampling.bucketDuckSql("leak42", "canonical_id")} AS bucket
             |  FROM d JOIN canon USING (fp))
             |SELECT doc_id, canonical_id,
             |  CASE WHEN bucket < 8000 THEN 'train'
             |       WHEN bucket < 9000 THEN 'val'
             |       ELSE 'test' END AS split
             |FROM b
             |ORDER BY doc_id""".stripMargin))
  )
}
