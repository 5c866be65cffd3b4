package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{PolyHash, Rounding}
import graft.io.Tables

/** Round-9 eleventh wave: session-gap parameter sweep (q352 — pick the
  * sessionization timeout from the data instead of folklore) and a
  * deterministic sampled corpus-diversity index (q353 — how much does
  * the corpus repeat itself, measured on a fixed hash-drawn pair
  * sample). Same contract as every other module: each Spark pipeline
  * pairs with DuckDB oracle SQL replaying it.
  */
object ExtensionQueries53 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q352: session-gap sweep — q29/q88 sessionize at a fixed 30-min
    // gap; this measures what {15, 30, 60} minutes actually produce:
    // session count (per user: 1 + #gaps above the threshold, summed),
    // mean events per session, and the share of gaps that SPLIT at
    // each threshold. One lag pass builds the per-user gap frame (the
    // q310 shape — seconds-granularity LONGs); each sweep point is
    // three conditional sums over it, so the sweep costs one shuffle
    // no matter how many thresholds. The elbow in n_sessions vs gap is
    // the empirical timeout choice.
    Q(
      "q352_session_gap_sweep",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select(col("user_id"),
            unix_micros(col("ts").cast("timestamp")).as("us"),
            col("event_id"))
        val wU = Window.partitionBy("user_id").orderBy("us", "event_id")
        val gaps = e
          .withColumn("prev", lag("us", 1).over(wU))
          .select(col("user_id"),
            expr("(us - prev) DIV 1000000").as("g"))
        val users = e.select(col("user_id")).distinct()
          .agg(count(lit(1)).as("n_users"))
        val nEvents = e.agg(count(lit(1)).as("n_events"))
        val base = gaps.where(col("g").isNotNull)
        Seq(15L, 30L, 60L).map { mins =>
          val thr = mins * 60L
          base.agg(count(lit(1)).as("n_gaps"),
              sum(when(col("g") > thr, 1L).otherwise(0L)).as("n_splits"))
            .crossJoin(broadcast(users))
            .crossJoin(broadcast(nEvents))
            .select(lit(mins).as("gap_minutes"),
              (col("n_users") + col("n_splits")).cast("long")
                .as("n_sessions"),
              Rounding.stableRound6(col("n_events").cast("double") /
                (col("n_users") + col("n_splits")).cast("double"))
                .as("mean_events_per_session"),
              Rounding.stableRound6(col("n_splits").cast("double") /
                col("n_gaps").cast("double")).as("split_gap_share"))
        }.reduce(_ unionAll _)
          .orderBy("gap_minutes")
      },
      Some {
        val one = (mins: Long) => {
          val thr = mins * 60L
          s"""SELECT CAST($mins AS BIGINT) AS gap_minutes,
             |  (SELECT count(DISTINCT user_id) FROM events)
             |    + sum(CASE WHEN g > $thr THEN 1 ELSE 0 END)
             |    AS n_sessions,
             |  count(*) AS n_gaps,
             |  sum(CASE WHEN g > $thr THEN 1 ELSE 0 END) AS n_splits
             |FROM gaps"""
        }
        s"""WITH e AS (
           |  SELECT user_id, epoch_us(ts::TIMESTAMP) AS us, event_id
           |  FROM events),
           |gaps AS (
           |  SELECT user_id, (us - prev) // 1000000 AS g FROM (
           |    SELECT user_id, us, lag(us) OVER (
           |      PARTITION BY user_id ORDER BY us, event_id) AS prev
           |    FROM e)
           |  WHERE prev IS NOT NULL),
           |ne AS (SELECT count(*) AS n_events FROM events),
           |u AS (
           |  ${one(15L)}
           |  UNION ALL ${one(30L)}
           |  UNION ALL ${one(60L)})
           |SELECT gap_minutes, CAST(n_sessions AS BIGINT) AS n_sessions,
           |  ${Rounding.duckSql(
                "ne.n_events::DOUBLE / n_sessions::DOUBLE")}
           |    AS mean_events_per_session,
           |  ${Rounding.duckSql("n_splits::DOUBLE / n_gaps::DOUBLE")}
           |    AS split_gap_share
           |FROM u CROSS JOIN ne
           |ORDER BY gap_minutes""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q353: sampled corpus diversity index — mean pairwise 3-gram
    // Jaccard DISTANCE over a fixed, hash-drawn pair sample: the 200
    // docs with the smallest PolyHash('div#'||doc_id) (the q91/q187
    // deterministic-pick discipline) are ranked by that hash and doc i
    // pairs with doc i+100 — 100 pairs whose identity both engines
    // derive independently, no randomness. High mean distance = the
    // corpus does not repeat itself; the dup-cluster mass q338 counts
    // shows up here as depressed distance. Exact shingle-set Jaccard
    // per pair (the q44 machinery), value-domain summary. Scale: the
    // sample is constant-size, so cost is corpus-scan + 100 pair
    // intersections regardless of corpus size.
    Q(
      "q353_corpus_diversity",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val picked = docs
          .select(col("doc_id"),
            PolyHash(concat(lit("div#"), col("doc_id").cast("string")))
              .as("h"))
          .orderBy("h", "doc_id").limit(200)
        val ranked = picked
          .withColumn("rk", row_number().over(
            Window.orderBy("h", "doc_id")))
        val pairs = ranked.where(col("rk") <= 100)
          .select(col("doc_id").as("da"), col("rk").as("i"))
          .join(ranked.where(col("rk") > 100)
            .select(col("doc_id").as("db"), (col("rk") - 100).as("i")),
            "i")
          .select("da", "db")
        val sh = docs.select(col("doc_id"),
          explode(graft.ext.Dedup.shingles(col("text"))).as("s"))
        val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
        val shared = pairs
          .join(sh.toDF("da", "s"), "da")
          .join(sh.toDF("db", "s"), Seq("db", "s"))
          .groupBy("da", "db").agg(count(lit(1)).as("i"))
        val jac = pairs
          .join(shared, Seq("da", "db"), "left").na.fill(0L, Seq("i"))
          .join(sizes.toDF("da", "na"), Seq("da"), "left")
          .na.fill(0L, Seq("na"))
          .join(sizes.toDF("db", "nb"), Seq("db"), "left")
          .na.fill(0L, Seq("nb"))
          .withColumn("d6",
            when(col("na") + col("nb") - col("i") > 0,
              lit(1000000L) - floor(col("i").cast("double") /
                (col("na") + col("nb") - col("i")).cast("double") *
                1000000.0 + 0.5).cast("long"))
              .otherwise(lit(1000000L)))
        jac.agg(count(lit(1)).cast("long").as("n_pairs"),
            Rounding.stableRound6(avg(col("d6").cast("double")) / 1000000.0)
              .as("mean_distance"),
            Rounding.stableRound6(min("d6").cast("double") / 1000000.0)
              .as("min_distance"))
          .withColumn("diverse", col("mean_distance") > 0.9)
      },
      Some(s"""WITH picked AS (
             |  SELECT doc_id,
             |    ${PolyHash.duckSql("'div#' || doc_id::VARCHAR")} AS h
             |  FROM documents
             |  ORDER BY h, doc_id LIMIT 200),
             |ranked AS (
             |  SELECT doc_id, row_number() OVER (ORDER BY h, doc_id)
             |    AS rk
             |  FROM picked),
             |pairs AS (
             |  SELECT a.doc_id AS da, b.doc_id AS db
             |  FROM ranked a JOIN ranked b ON b.rk = a.rk + 100
             |  WHERE a.rk <= 100),
             |${ExtensionQueries.ShingleCtes},
             |sizes AS (SELECT doc_id, count(*) AS n FROM sh
             |          GROUP BY doc_id),
             |shared AS (
             |  SELECT p.da, p.db, count(*) AS i
             |  FROM pairs p
             |  JOIN sh a ON a.doc_id = p.da
             |  JOIN sh b ON b.doc_id = p.db AND b.s = a.s
             |  GROUP BY p.da, p.db),
             |jac AS (
             |  SELECT p.da, p.db,
             |    coalesce(sa.n, 0) AS na, coalesce(sb.n, 0) AS nb,
             |    coalesce(sh2.i, 0) AS i
             |  FROM pairs p
             |  LEFT JOIN shared sh2 ON sh2.da = p.da AND sh2.db = p.db
             |  LEFT JOIN sizes sa ON sa.doc_id = p.da
             |  LEFT JOIN sizes sb ON sb.doc_id = p.db),
             |d AS (
             |  SELECT CASE WHEN na + nb - i > 0
             |    THEN 1000000 - CAST(floor(i::DOUBLE
             |      / (na + nb - i)::DOUBLE * 1000000 + 0.5) AS BIGINT)
             |    ELSE 1000000 END AS d6
             |  FROM jac)
             |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             |  ${Rounding.duckSql("avg(d6::DOUBLE) / 1000000.0")}
             |    AS mean_distance,
             |  ${Rounding.duckSql("min(d6)::DOUBLE / 1000000.0")}
             |    AS min_distance,
             |  ${Rounding.duckSql("avg(d6::DOUBLE) / 1000000.0")} > 0.9
             |    AS diverse
             |FROM d""".stripMargin))
  )
}
