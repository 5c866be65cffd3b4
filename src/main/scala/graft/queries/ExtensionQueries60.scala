package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.{PolyHash, Rounding}
import graft.io.Tables
import graft.ops.Text

/** Round-9 eighteenth wave: trailing-window distinct via daily sketch
  * union (q378), feature-hashing collision audit across dimensions
  * (q379), O'Brien-Fleming group-sequential A/B looks (q380), and a
  * skew-salting planner (q381).
  */
object ExtensionQueries60 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q378: trailing-7-day distinct users via DAILY SKETCH UNION —
    // q151's exact rolling distinct answers the question by
    // re-scanning the window; this is the shape that survives 100 TB:
    // one pass folds each day to a KB-sized HLL partial, and every
    // trailing window is a union of ≤7 sketches (a 30×7 day-frame
    // join, data-free). The q206 audit discipline: exact trailing
    // distinct (oracle-replayed) plus a within-5% boolean pinned
    // true — at fixture cardinality the sketch runs in its exact
    // sparse regime, and 5% documents the dense-mode 3σ bound that
    // takes over at scale.
    Q(
      "q378_rolling_sketch_union",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select(to_date(col("ts")).as("day"), col("user_id"))
        val daily = e.groupBy("day")
          .agg(hll_sketch_agg(col("user_id")).as("sk"))
        val win = daily.select(col("day").as("d"))
          .join(daily.select(col("day").as("d2"), col("sk")),
            expr("d2 <= d AND d2 >= d - INTERVAL 6 DAY"))
          .groupBy("d")
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"),
            count(lit(1)).as("n_days"))
        val exact = e.select(col("day").as("d0"), col("user_id"))
          .join(daily.select(col("day").as("d")),
            expr("d0 <= d AND d0 >= d - INTERVAL 6 DAY"))
          .groupBy("d")
          .agg(count_distinct(col("user_id")).as("exact_users"))
        win.join(exact, "d")
          .select(col("d").as("day"), col("n_days"),
            col("exact_users").cast("long").as("exact_users"),
            (abs(col("est").cast("double") /
              col("exact_users").cast("double") - 1.0) <= 0.05)
              .as("within_tol"))
          .orderBy("day")
      },
      Some("""WITH d AS (
             |  SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
             |e AS (
             |  SELECT CAST(ts AS DATE) AS day, user_id FROM events),
             |w AS (
             |  SELECT d.day, count(DISTINCT e.user_id) AS exact_users,
             |    count(DISTINCT e.day) AS n_days
             |  FROM d JOIN e ON e.day <= d.day
             |    AND e.day >= d.day - INTERVAL 6 DAY
             |  GROUP BY d.day)
             |SELECT day, CAST(n_days AS BIGINT) AS n_days,
             |  CAST(exact_users AS BIGINT) AS exact_users,
             |  true AS within_tol
             |FROM w
             |ORDER BY day""".stripMargin)),

    // ------------------------------------------------------------------
    // q379: feature-hashing collision audit — hashing_tf (q131) maps
    // words to `poly_hash % dim` buckets; this measures what that
    // costs at dim ∈ {1024, 4096, 16384}: how many buckets carry ≥2
    // distinct words, the share of VOCABULARY that collides, and the
    // share of TOKEN MASS sitting in collided buckets (the quantity
    // that actually degrades a downstream model). The sweep is three
    // vocab-frame aggregations over one shared word-count table — the
    // corpus is scanned once. Exact integers everywhere; the advisory
    // is the dim where mass-collision share first drops below 5%.
    Q(
      "q379_hash_collision_audit",
      (s, dir) => {
        val vocab = Tables.load(s, dir, "documents")
          .select(explode(Text.words(Text.clean(col("text")))).as("w"))
          .groupBy("w").agg(count(lit(1)).as("c"))
          .withColumn("h", PolyHash(concat(lit("tf#"), col("w"))))
          .localCheckpoint()
        Seq(1024, 4096, 16384).map { dim =>
          val b = vocab.withColumn("b", col("h") % dim)
            .groupBy("b")
            .agg(count(lit(1)).as("nw"), sum("c").as("mass"))
          b.agg(count(lit(1)).as("buckets_used"),
              sum("nw").as("vocab"),
              sum(when(col("nw") >= 2, col("nw")).otherwise(0L))
                .as("collided_words"),
              sum(when(col("nw") >= 2, col("mass")).otherwise(0L))
                .as("collided_mass"),
              sum("mass").as("total_mass"))
            .select(lit(dim.toLong).as("dim"),
              col("buckets_used"), col("vocab").cast("long").as("vocab"),
              Rounding.stableRound6(col("collided_words").cast("double") /
                col("vocab").cast("double")).as("vocab_collision_share"),
              Rounding.stableRound6(col("collided_mass").cast("double") /
                col("total_mass").cast("double")).as("mass_collision_share"))
        }.reduce(_ unionAll _)
          .withColumn("acceptable", col("mass_collision_share") < 0.05)
          .orderBy("dim")
      },
      Some {
        def one(dim: Int) =
          s"""SELECT CAST($dim AS BIGINT) AS dim,
             |  CAST(count(*) AS BIGINT) AS buckets_used,
             |  CAST(sum(nw) AS BIGINT) AS vocab,
             |  ${Rounding.duckSql(
                  "sum(CASE WHEN nw >= 2 THEN nw ELSE 0 END)::DOUBLE" +
                    " / sum(nw)::DOUBLE")} AS vocab_collision_share,
             |  ${Rounding.duckSql(
                  "sum(CASE WHEN nw >= 2 THEN mass ELSE 0 END)::DOUBLE" +
                    " / sum(mass)::DOUBLE")} AS mass_collision_share
             |FROM (
             |  SELECT h % $dim AS b, count(*) AS nw, sum(c) AS mass
             |  FROM vocab GROUP BY 1)"""
        s"""WITH toks AS (
           |  SELECT unnest(list_filter(string_split(
           |    regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' '),
           |    w -> w <> '')) AS w
           |  FROM documents),
           |vocab AS (
           |  SELECT w, count(*) AS c,
           |    ${PolyHash.duckSql("'tf#' || w")} AS h
           |  FROM toks GROUP BY w),
           |u AS (
           |  ${one(1024)}
           |  UNION ALL ${one(4096)}
           |  UNION ALL ${one(16384)})
           |SELECT dim, buckets_used, vocab, vocab_collision_share,
           |  mass_collision_share,
           |  mass_collision_share < 0.05 AS acceptable
           |FROM u
           |ORDER BY dim""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q380: O'Brien-Fleming group-sequential looks — the five-interim
    // A/B design that SPRT (q268) and the fixed-horizon tests don't
    // cover: peek at days 6/12/18/24/30 with the OBF two-sided
    // boundaries {4.8769, 3.3569, 2.6803, 2.2898, 2.0310} (α = 0.05,
    // K = 5 — the published Pocock/OBF table values), spending almost
    // no alpha early. Arms are the q55 hash split; the statistic is
    // Welch's z on purchase value from EXACT per-look per-arm
    // (n, Σx, Σx²) LONG sums — all five looks come from ONE pass with
    // conditional aggregates, then arithmetic on a 5-row frame.
    Q(
      "q380_obrien_fleming",
      (s, dir) => {
        val looks = Seq((1, 6), (2, 12), (3, 18), (4, 24), (5, 30))
        val bounds = Map(1 -> 4.8769, 2 -> 3.3569, 3 -> 2.6803,
          4 -> 2.2898, 5 -> 2.0310)
        val e = Tables.load(s, dir, "events")
          .where(col("event_type") === "purchase")
          .select(
            when((PolyHash(concat(lit("exp7#"), col("user_id").cast("string")))
              * PolyHash(concat(lit("exp7#"), col("user_id").cast("string")))
              % 1000000007L) % 10000L < 5000L, 1L).otherwise(0L).as("t"),
            dayofmonth(col("ts").cast("timestamp")).as("day"),
            floor(col("value") * 100 + 0.5).cast("long").as("x"))
        val aggs = looks.flatMap { case (k, d) =>
          Seq(
            sum(when(col("day") <= d && col("t") === 1L, 1L)
              .otherwise(0L)).as(s"nt$k"),
            sum(when(col("day") <= d && col("t") === 1L, col("x"))
              .otherwise(0L)).as(s"st$k"),
            sum(when(col("day") <= d && col("t") === 1L,
              col("x") * col("x")).otherwise(0L)).as(s"qt$k"),
            sum(when(col("day") <= d && col("t") === 0L, 1L)
              .otherwise(0L)).as(s"nc$k"),
            sum(when(col("day") <= d && col("t") === 0L, col("x"))
              .otherwise(0L)).as(s"sc$k"),
            sum(when(col("day") <= d && col("t") === 0L,
              col("x") * col("x")).otherwise(0L)).as(s"qc$k"))
        }
        val wide = e.agg(aggs.head, aggs.tail: _*)
        val stacked = wide.selectExpr(
          "stack(5, " + looks.map { case (k, _) =>
            s"${k}L, nt$k, st$k, qt$k, nc$k, sc$k, qc$k"
          }.mkString(", ") + ") AS (look, nt, st, qt, nc, sc, qc)")
        def meanC(sc: String, nc: String) =
          col(sc).cast("double") / col(nc).cast("double")
        def varC(q: String, sc: String, nc: String) =
          (col(q).cast("double") -
            col(sc).cast("double") * col(sc).cast("double") /
              col(nc).cast("double")) / (col(nc).cast("double") - 1.0)
        val z = (meanC("st", "nt") - meanC("sc", "nc")) /
          sqrt(varC("qt", "st", "nt") / col("nt").cast("double") +
            varC("qc", "sc", "nc") / col("nc").cast("double"))
        val boundExpr = looks.tail.foldLeft(
          when(col("look") === 1L, bounds(1))) { case (acc, (k, _)) =>
          acc.when(col("look") === k.toLong, bounds(k))
        }
        stacked
          .withColumn("z", Rounding.stableRound6(z))
          .withColumn("boundary", boundExpr)
          .select(col("look"), col("nt").as("n_treat"),
            col("nc").as("n_control"), col("z"), col("boundary"),
            (abs(col("z")) >= col("boundary")).as("reject"))
          .orderBy("look")
      },
      Some {
        val looks = Seq((1, 6), (2, 12), (3, 18), (4, 24), (5, 30))
        val bounds = Map(1 -> "4.8769", 2 -> "3.3569", 3 -> "2.6803",
          4 -> "2.2898", 5 -> "2.0310")
        val hash = PolyHash.duckSql("'exp7#' || user_id::VARCHAR")
        val rows = looks.map { case (k, d) =>
          s"""SELECT CAST($k AS BIGINT) AS look,
             |  CAST(sum(CASE WHEN day <= $d AND t = 1 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS nt,
             |  CAST(sum(CASE WHEN day <= $d AND t = 1 THEN x ELSE 0 END)
             |    AS BIGINT) AS st,
             |  CAST(sum(CASE WHEN day <= $d AND t = 1 THEN x*x ELSE 0 END)
             |    AS BIGINT) AS qt,
             |  CAST(sum(CASE WHEN day <= $d AND t = 0 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS nc,
             |  CAST(sum(CASE WHEN day <= $d AND t = 0 THEN x ELSE 0 END)
             |    AS BIGINT) AS sc,
             |  CAST(sum(CASE WHEN day <= $d AND t = 0 THEN x*x ELSE 0 END)
             |    AS BIGINT) AS qc,
             |  ${bounds(k)} AS boundary
             |FROM e"""
        }.mkString("\n  UNION ALL ")
        s"""WITH e AS (
           |  SELECT CASE WHEN (($hash * $hash % 1000000007) % 10000)
           |      < 5000 THEN 1 ELSE 0 END AS t,
           |    EXTRACT(day FROM ts::TIMESTAMP) AS day,
           |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
           |  FROM events
           |  WHERE event_type = 'purchase'),
           |u AS (
           |  $rows),
           |z AS (
           |  SELECT look, nt, nc, boundary,
           |    ${Rounding.duckSql(
                  "(st::DOUBLE / nt::DOUBLE - sc::DOUBLE / nc::DOUBLE)" +
                    " / sqrt((qt::DOUBLE - st::DOUBLE * st::DOUBLE" +
                    " / nt::DOUBLE) / (nt::DOUBLE - 1.0) / nt::DOUBLE" +
                    " + (qc::DOUBLE - sc::DOUBLE * sc::DOUBLE" +
                    " / nc::DOUBLE) / (nc::DOUBLE - 1.0) / nc::DOUBLE)")}
             |    AS z
           |  FROM u)
           |SELECT look, nt AS n_treat, nc AS n_control, z, boundary,
           |  abs(z) >= boundary AS reject
           |FROM z
           |ORDER BY look""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q381: skew-salting planner — the q375 statistics turned into the
    // plan decision, on the join key that actually skews in this
    // corpus: the posting-list word key (q58's tfidf/postings joins
    // shuffle on it, and word frequency is Zipf — stopwords are hot
    // keys). Words whose posting count exceeds the 200-rows-per-task
    // target get a salt factor of ceil(n/target) (the AQE-skew-split
    // arithmetic, computed ahead of time so a pre-salted repartition
    // can be baked into the pipeline); the advisory also reports each
    // hot key's share of all postings — the head mass a salted join
    // spreads. Top-20 by count — TakeOrderedAndProject, exact
    // integers, one token shuffle.
    Q(
      "q381_salt_planner",
      (s, dir) => {
        val target = 200L
        val u = Tables.load(s, dir, "documents")
          .select(explode(Text.words(Text.clean(col("text")))).as("w"))
          .groupBy("w").agg(count(lit(1)).as("n"))
        val tot = u.agg(sum("n").as("tot"))
        u.where(col("n") > target)
          .crossJoin(tot)
          .select(col("w").as("word"), col("n"),
            expr(s"(n + $target - 1) div $target").as("salt_factor"),
            Rounding.stableRound6(col("n").cast("double") /
              col("tot").cast("double")).as("share_of_rows"))
          .orderBy(col("n").desc, col("word"))
          .limit(20)
      },
      Some(s"""WITH toks AS (
             |  SELECT unnest(list_filter(string_split(
             |    regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' '),
             |    w -> w <> '')) AS w
             |  FROM documents),
             |u AS (
             |  SELECT w AS word, CAST(count(*) AS BIGINT) AS n
             |  FROM toks GROUP BY 1),
             |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM u)
             |SELECT word, n,
             |  CAST((n + 199) // 200 AS BIGINT) AS salt_factor,
             |  ${Rounding.duckSql("n::DOUBLE / tot::DOUBLE")}
             |    AS share_of_rows
             |FROM u CROSS JOIN tot
             |WHERE n > 200
             |ORDER BY n DESC, word
             |LIMIT 20""".stripMargin))
  )
}
