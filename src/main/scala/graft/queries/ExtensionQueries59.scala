package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{PolyHash, Rounding}
import graft.io.Tables
import DriverSide._

/** Round-9 seventeenth wave: absorbing-chain expected hitting time by
  * fixed-budget value iteration (q374), an optimizer-style join-size
  * estimate with its own audit (q375), Theil inequality decomposition
  * with the between/within identity (q376), and a KMV distinct sketch
  * whose estimate is itself exactly gated (q377).
  */
object ExtensionQueries59 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q374: expected steps to purchase — the event-type transition
    // chain as an absorbing Markov chain: h(purchase) = 0,
    // h(i) = 1 + Σ_j P(i,j)·h(j), solved by 60 fixed value-iteration
    // steps. The q299 discipline end-to-end: ONE distributed pass
    // reduces the corpus to the (type-domain)² transition counts
    // (≤25 longs), the iteration runs on the driver over those 25
    // numbers — never over data — and every iterate snaps to the 1e-9
    // grid so the Scala loop and the DuckDB recursive-CTE replay walk
    // bit-identical trajectories (both fold the row sum left-to-right
    // over lexicographically sorted states). 60 iterations is the
    // declared budget — the gate pins the fixed-budget value, and the
    // per-state n_out column sizes how much evidence each estimate
    // rests on.
    Q(
      "q374_markov_hitting_time",
      (s, dir) => {
        val wU = Window.partitionBy("user_id").orderBy("us", "event_id")
        val tr = Tables.load(s, dir, "events")
          .select(col("user_id"),
            unix_micros(col("ts").cast("timestamp")).as("us"),
            col("event_id"), col("event_type"))
          .withColumn("nxt", lead("event_type", 1).over(wU))
          .where(col("nxt").isNotNull)
          .groupBy(col("event_type").as("src"), col("nxt").as("dst"))
          .agg(count(lit(1)).as("c"))
        // type-domain²-sized collect (≤25 cells) — the q299 driver-side
        // iteration discipline, never a data-sized collect
        val cnt = tr.collectBounded("event-type transition cells")
          .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
          .toMap
        val states = cnt.keys.flatMap(k => Seq(k._1, k._2))
          .toSeq.distinct.sorted
        val nOut = states.map(si =>
          si -> states.map(sj => cnt.getOrElse((si, sj), 0L)).sum).toMap
        def p(i: String, j: String): Double =
          cnt.getOrElse((i, j), 0L).toDouble / nOut(i).toDouble
        def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
        var h = states.map(_ => 0.0)
        for (_ <- 1 to 60) {
          val prev = h
          h = states.map { si =>
            if (si == "purchase") 0.0
            else snap9(1.0 + states.zipWithIndex
              .map { case (sj, j) => p(si, sj) * prev(j) }.sum)
          }
        }
        import s.implicits._
        states.zipWithIndex
          .map { case (st, i) =>
            (st, nOut(st), math.floor(h(i) * 1e6 + 0.5) / 1e6)
          }
          .toDF("state", "n_out", "hitting_steps")
          .orderBy("state")
      },
      Some("""WITH tr AS (
             |  SELECT event_type AS src, nxt AS dst FROM (
             |    SELECT event_type, lead(event_type) OVER (
             |      PARTITION BY user_id
             |      ORDER BY epoch_us(ts::TIMESTAMP), event_id) AS nxt
             |    FROM events)
             |  WHERE nxt IS NOT NULL),
             |cnt AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS c
             |        FROM tr GROUP BY 1, 2),
             |st AS (SELECT DISTINCT src AS s FROM tr
             |       UNION SELECT DISTINCT dst FROM tr),
             |sti AS (SELECT s, row_number() OVER (ORDER BY s) AS i
             |        FROM st),
             |no AS (SELECT src, CAST(sum(c) AS BIGINT) AS n_out
             |       FROM cnt GROUP BY src),
             |dense AS (
             |  SELECT a.i AS i, b.i AS j,
             |    coalesce(c.c, 0)::DOUBLE / no.n_out::DOUBLE AS p
             |  FROM sti a CROSS JOIN sti b
             |  JOIN no ON no.src = a.s
             |  LEFT JOIN cnt c ON c.src = a.s AND c.dst = b.s),
             |pm AS (
             |  SELECT list(rowlist ORDER BY i) AS pmat,
             |    (SELECT list(s ORDER BY s) FROM st) AS names,
             |    (SELECT count(*) FROM st) AS ns
             |  FROM (SELECT i, list(p ORDER BY j) AS rowlist
             |        FROM dense GROUP BY i)),
             |hit AS (
             |  SELECT * FROM (
             |    WITH RECURSIVE it AS (
             |      SELECT 0 AS k,
             |        (SELECT list_transform(range(1, ns + 1),
             |          ii -> 0.0::DOUBLE) FROM pm) AS h
             |      UNION ALL
             |      SELECT k + 1, list_transform(range(1, ns + 1), ii ->
             |        CASE WHEN names[ii] = 'purchase' THEN 0.0::DOUBLE
             |        ELSE floor((1.0 + list_reduce(
             |          list_transform(range(1, ns + 1),
             |            jj -> pmat[ii][jj] * h[jj]),
             |          (p, q) -> p + q)) * 1000000000.0 + 0.5)
             |          / 1000000000.0 END)
             |      FROM it, pm WHERE k < 60)
             |    SELECT h FROM it WHERE k = 60))
             |SELECT sti.s AS state, no.n_out,
             |  floor(h[sti.i] * 1000000 + 0.5) / 1000000
             |    AS hitting_steps
             |FROM sti
             |JOIN no ON no.src = sti.s
             |CROSS JOIN hit
             |ORDER BY state""".stripMargin)),

    // ------------------------------------------------------------------
    // q375: join-size estimation audit — the optimizer-statistics
    // question "how big is events ⋈ events on user_id" answered the
    // way a catalog does: EXACT counts for the top-20 heavy-hitter
    // keys (TakeOrderedAndProject — the only part worth storing) plus
    // a uniform-tail assumption (Σ n² ≈ N²/K over the remaining keys),
    // audited against the exact Σ n² the engine can afford to compute
    // at fixture scale. The head/tail/total rows show exactly where
    // the uniformity assumption spends its error — the skew-awareness
    // that decides broadcast-vs-shuffle and salting at 100 TB.
    Q(
      "q375_join_size_estimate",
      (s, dir) => {
        val u = Tables.load(s, dir, "events")
          .groupBy("user_id").agg(count(lit(1)).as("n"))
        val top = u.orderBy(col("n").desc, col("user_id")).limit(20)
          .select(col("user_id"))
        val head = u.join(broadcast(top), "user_id")
          .agg(coalesce(sum(col("n") * col("n")), lit(0L)).as("head_exact"))
        val tail = u.join(broadcast(top), Seq("user_id"), "left_anti")
          .agg(count(lit(1)).as("kt"),
            coalesce(sum("n"), lit(0L)).as("nt"),
            coalesce(sum(col("n") * col("n")), lit(0L)).as("tail_exact"))
        val j = head.crossJoin(tail)
          .withColumn("tail_est",
            when(col("kt") > 0L, expr("(nt * nt) div kt")).otherwise(0L))
        def err(exact: org.apache.spark.sql.Column,
                est: org.apache.spark.sql.Column) =
          when(exact > 0L, Rounding.stableRound6(
            (est - exact).cast("double") / exact.cast("double")))
            .otherwise(lit(0.0))
        j.select(expr(
            "stack(3, " +
              "'head', head_exact, head_exact, " +
              "'tail', tail_exact, tail_est, " +
              "'total', head_exact + tail_exact, head_exact + tail_est) " +
              "AS (component, exact_pairs, est_pairs)"))
          .select(col("component"), col("exact_pairs"), col("est_pairs"),
            err(col("exact_pairs"), col("est_pairs")).as("rel_err"))
          .orderBy("component")
      },
      Some(s"""WITH u AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS n
             |  FROM events GROUP BY 1),
             |top AS (
             |  SELECT user_id FROM u ORDER BY n DESC, user_id LIMIT 20),
             |head AS (
             |  SELECT CAST(coalesce(sum(n * n), 0) AS BIGINT)
             |    AS head_exact
             |  FROM u JOIN top USING (user_id)),
             |tail AS (
             |  SELECT CAST(count(*) AS BIGINT) AS kt,
             |    CAST(coalesce(sum(n), 0) AS BIGINT) AS nt,
             |    CAST(coalesce(sum(n * n), 0) AS BIGINT) AS tail_exact
             |  FROM u ANTI JOIN top USING (user_id)),
             |j AS (
             |  SELECT head_exact, kt, nt, tail_exact,
             |    CASE WHEN kt > 0 THEN (nt * nt) // kt ELSE 0 END
             |      AS tail_est
             |  FROM head CROSS JOIN tail),
             |rows AS (
             |  SELECT 'head' AS component, head_exact AS exact_pairs,
             |    head_exact AS est_pairs FROM j
             |  UNION ALL SELECT 'tail', tail_exact, tail_est FROM j
             |  UNION ALL SELECT 'total', head_exact + tail_exact,
             |    head_exact + tail_est FROM j)
             |SELECT component, CAST(exact_pairs AS BIGINT) AS exact_pairs,
             |  CAST(est_pairs AS BIGINT) AS est_pairs,
             |  CASE WHEN exact_pairs > 0 THEN
             |    ${Rounding.duckSql(
                    "(est_pairs - exact_pairs)::DOUBLE" +
                      " / exact_pairs::DOUBLE")}
             |  ELSE 0.0 END AS rel_err
             |FROM rows
             |ORDER BY component""".stripMargin)),

    // ------------------------------------------------------------------
    // q376: Theil-T inequality decomposition of order revenue by
    // priority — unlike Gini (q244's concentration lens), Theil is
    // ADDITIVE: T_total = T_between + Σ_g w_g·T_g exactly, so "how
    // much revenue inequality lives between priorities vs within
    // them" has a well-defined answer (the spec asserts the identity
    // to grid precision). Determinism discipline: each x·ln(x) term
    // snaps to a 1e-3 LONG grid before summing (order-proof; 1e-3
    // keeps Σ under LONG range at 100× scale), group Theils are then
    // fixed-order double expressions of those exact sums, and the
    // between-group sum goes through per-group 1e-9 snaps. One
    // groupBy + arithmetic on the 5-row priority frame.
    Q(
      "q376_theil_decomposition",
      (s, dir) => {
        val g = Tables.load(s, dir, "orders")
          .select(col("o_orderpriority").as("prio"),
            floor(col("o_totalprice") * 100 + 0.5).cast("long").as("x"))
          .where(col("x") > 0L)
          .withColumn("t3",
            floor(col("x").cast("double") * log(col("x").cast("double"))
              * 1e3 + 0.5).cast("long"))
          .groupBy("prio")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"),
            sum("t3").as("s3"))
        val tot = g.agg(sum("n").as("tn"), sum("sx").as("tsx"),
          sum("s3").as("ts3"))
        val gt = g.crossJoin(tot)
          .withColumn("mu_g",
            col("sx").cast("double") / col("n").cast("double"))
          .withColumn("mu",
            col("tsx").cast("double") / col("tn").cast("double"))
          .withColumn("w",
            col("sx").cast("double") / col("tsx").cast("double"))
          .withColumn("t_g",
            col("s3").cast("double") / 1e3 / col("sx").cast("double")
              - log(col("mu_g")))
          .withColumn("b9",
            floor(col("w") * log(col("mu_g") / col("mu")) * 1e9 + 0.5)
              .cast("long"))
        val btw = gt.agg(sum("b9").as("sb9"))
        gt.crossJoin(btw)
          .select(col("prio"), col("n"),
            Rounding.stableRound6(col("mu_g") / 100.0).as("mean_price"),
            Rounding.stableRound6(col("t_g")).as("theil_within"),
            Rounding.stableRound6(col("w")).as("revenue_weight"),
            Rounding.stableRound6(col("sb9").cast("double") / 1e9)
              .as("theil_between"),
            Rounding.stableRound6(
              col("ts3").cast("double") / 1e3 / col("tsx").cast("double")
                - log(col("mu"))).as("theil_total"))
          .orderBy("prio")
      },
      Some(s"""WITH o AS (
             |  SELECT o_orderpriority AS prio,
             |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS x
             |  FROM orders
             |  WHERE floor(o_totalprice * 100 + 0.5) > 0),
             |t AS (
             |  SELECT prio, x,
             |    CAST(floor(x::DOUBLE * ln(x::DOUBLE) * 1000 + 0.5)
             |      AS BIGINT) AS t3
             |  FROM o),
             |g AS (
             |  SELECT prio, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS sx,
             |    CAST(sum(t3) AS BIGINT) AS s3
             |  FROM t GROUP BY 1),
             |tot AS (
             |  SELECT CAST(sum(n) AS BIGINT) AS tn,
             |    CAST(sum(sx) AS BIGINT) AS tsx,
             |    CAST(sum(s3) AS BIGINT) AS ts3
             |  FROM g),
             |gt AS (
             |  SELECT prio, n, sx, s3, tn, tsx, ts3,
             |    sx::DOUBLE / n::DOUBLE AS mu_g,
             |    tsx::DOUBLE / tn::DOUBLE AS mu,
             |    sx::DOUBLE / tsx::DOUBLE AS w,
             |    s3::DOUBLE / 1000.0 / sx::DOUBLE
             |      - ln(sx::DOUBLE / n::DOUBLE) AS t_g,
             |    CAST(floor((sx::DOUBLE / tsx::DOUBLE)
             |      * ln((sx::DOUBLE / n::DOUBLE)
             |        / (tsx::DOUBLE / tn::DOUBLE)) * 1000000000.0 + 0.5)
             |      AS BIGINT) AS b9
             |  FROM g CROSS JOIN tot),
             |btw AS (SELECT CAST(sum(b9) AS BIGINT) AS sb9 FROM gt)
             |SELECT prio, n,
             |  ${Rounding.duckSql("mu_g / 100.0")} AS mean_price,
             |  ${Rounding.duckSql("t_g")} AS theil_within,
             |  ${Rounding.duckSql("w")} AS revenue_weight,
             |  ${Rounding.duckSql("sb9::DOUBLE / 1000000000.0")}
             |    AS theil_between,
             |  ${Rounding.duckSql(
                  "ts3::DOUBLE / 1000.0 / tsx::DOUBLE" +
                    " - ln(tsx::DOUBLE / tn::DOUBLE)")} AS theil_total
             |FROM gt CROSS JOIN btw
             |ORDER BY prio""".stripMargin)),

    // ------------------------------------------------------------------
    // q377: KMV (k-minimum-values) distinct sketch — the third
    // mergeable-cardinality design next to q206's HLL and q320's
    // count-based families: keep the k smallest hash values per
    // group; estimate = (k−1)/u_(k). Because the hash is the
    // deterministic PolyHash uniformization (h² mod p, the q55
    // discipline), the ESTIMATE ITSELF is replayable and the gate is
    // a full hash-match on it — stronger than a tolerance audit.
    // Groups smaller than k are held exactly (the sketch contains
    // the whole set — the standard KMV exact regime, exercised at
    // sf0.001 where every type has < 32 users while sf0.01 exercises
    // the estimator branch). Per-type k-th minimum via a
    // key-partitioned row_number; one distinct + one window.
    Q(
      "q377_kmv_distinct",
      (s, dir) => {
        val K = 32L
        val ud = Tables.load(s, dir, "events")
          .select(col("event_type"), col("user_id")).distinct()
          .withColumn("h", PolyHash(
            concat(lit("kmv#"), col("user_id").cast("string"))))
          .withColumn("u", col("h") * col("h") % lit(PolyHash.Mod))
        val cnt = ud.groupBy("event_type")
          .agg(count(lit(1)).as("exact_users"))
        val kth = ud
          .withColumn("rn", row_number().over(
            Window.partitionBy("event_type").orderBy("u", "user_id")))
          .join(cnt, "event_type")
          .where(col("rn") === least(lit(K), col("exact_users")))
          .select(col("event_type"), col("exact_users"), col("u"))
        kth
          .withColumn("kmv_est",
            when(col("exact_users") <= K || col("u") === 0L,
              col("exact_users").cast("double"))
              .otherwise(lit((K - 1L).toDouble) * PolyHash.Mod.toDouble /
                col("u").cast("double")))
          .select(col("event_type"), col("exact_users"),
            Rounding.stableRound6(col("kmv_est")).as("kmv_est"),
            Rounding.stableRound6(
              (col("kmv_est") - col("exact_users").cast("double")) /
                col("exact_users").cast("double")).as("rel_err"))
          .orderBy("event_type")
      },
      Some(s"""WITH ud AS (
             |  SELECT DISTINCT event_type, user_id FROM events),
             |h AS (
             |  SELECT event_type, user_id,
             |    (${PolyHash.duckSql("'kmv#' || user_id::VARCHAR")}
             |     * ${PolyHash.duckSql("'kmv#' || user_id::VARCHAR")})
             |      % ${PolyHash.Mod} AS u
             |  FROM ud),
             |cnt AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS exact_users
             |  FROM ud GROUP BY 1),
             |rk AS (
             |  SELECT event_type, u, row_number() OVER (
             |    PARTITION BY event_type ORDER BY u, user_id) AS rn
             |  FROM h),
             |kth AS (
             |  SELECT rk.event_type, cnt.exact_users, rk.u
             |  FROM rk JOIN cnt ON cnt.event_type = rk.event_type
             |  WHERE rk.rn = least(32, cnt.exact_users)),
             |est AS (
             |  SELECT event_type, exact_users,
             |    CASE WHEN exact_users <= 32 OR u = 0
             |      THEN exact_users::DOUBLE
             |      ELSE 31.0 * ${PolyHash.Mod}.0 / u::DOUBLE END
             |      AS kmv_est
             |  FROM kth)
             |SELECT event_type, exact_users,
             |  ${Rounding.duckSql("kmv_est")} AS kmv_est,
             |  ${Rounding.duckSql(
                  "(kmv_est - exact_users::DOUBLE)" +
                    " / exact_users::DOUBLE")} AS rel_err
             |FROM est
             |ORDER BY event_type""".stripMargin))
  )
}
