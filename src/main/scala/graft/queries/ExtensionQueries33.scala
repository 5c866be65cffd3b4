package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{PolyHash, Rounding}
import graft.io.Tables

/** Round-8 eighth continuation wave: bootstrap difference CI (q293),
  * DeLong AUC standard error (q294), and doubly-robust offline policy
  * evaluation (q295). Same contract as every other module: each Spark
  * pipeline pairs with DuckDB oracle SQL replaying it.
  */
object ExtensionQueries33 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q293: Poisson-bootstrap CI for an A/B difference in means — the
    // uncertainty the SPRT decision (q264) and the Welch test (q285)
    // summarize into one number, made distribution-free: 32
    // deterministic hash-weighted replicates (the q257 one-scan
    // machinery — every event gets a Poisson(1) weight per replicate
    // from the inverse CDF on the squared-hash grid) of
    // mean(A) − mean(B) over event value in exact integer cents.
    // Replicate estimates are 1e-6-grid LONGs, so min/max CI bounds
    // are integer-deterministic and the spread runs in decimal(38,0)
    // (the q257 (Σest)² overflow lesson). One scan builds all 64
    // (replicate, variant) partial sums — map-side combined.
    Q(
      "q293_bootstrap_diff_ci",
      (s, dir) => {
        val P = PolyHash.Mod
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), (col("user_id") % 2).as("variant"),
            floor(col("value") * lit(100.0) + lit(0.5)).cast("long")
              .as("cents"))
        val d = ev.withColumn("b", explode(sequence(lit(0), lit(31))))
        val h = PolyHash(concat(lit("bdiff"), col("b").cast("string"),
          lit("#"), col("event_id").cast("string")))
        val u = h * h % P % 10000
        val wgt = when(u < 3679, 0L).when(u < 7358, 1L).when(u < 9197, 2L)
          .when(u < 9810, 3L).when(u < 9963, 4L).when(u < 9994, 5L)
          .when(u < 9999, 6L).otherwise(7L)
        val reps = d.withColumn("wgt", wgt)
          .groupBy("b", "variant")
          .agg(sum(col("wgt") * col("cents")).as("sw"), sum("wgt").as("w"))
          .withColumn("est6", floor(col("sw").cast("double") /
            col("w").cast("double") * lit(10000.0) + lit(0.5))
            .cast("long")) // cents * 1e4 = dollars * 1e6
        val diffs = reps.where(col("variant") === 0L)
          .select(col("b"), col("est6").as("ea"))
          .join(reps.where(col("variant") === 1L)
            .select(col("b"), col("est6").as("eb")), "b")
          .withColumn("d6", col("ea") - col("eb"))
        val point = ev.groupBy("variant")
          .agg(count(lit(1)).as("n"), sum("cents").as("sc"))
        val pa = point.where(col("variant") === 0L)
          .select(col("n").as("n_a"), col("sc").as("sc_a"))
        val pb = point.where(col("variant") === 1L)
          .select(col("n").as("n_b"), col("sc").as("sc_b"))
        val d6d = col("d6").cast("decimal(38,0)")
        diffs.agg(count(lit(1)).as("b_reps"),
            sum(d6d).as("s1"), sum(d6d * d6d).as("s2"),
            min("d6").as("lo6"), max("d6").as("hi6"))
          .crossJoin(broadcast(pa)).crossJoin(broadcast(pb))
          .select(col("n_a"), col("n_b"),
            Rounding.stableRound6(
              col("sc_a").cast("double") / col("n_a").cast("double") /
                lit(100.0) -
              col("sc_b").cast("double") / col("n_b").cast("double") /
                lit(100.0)).as("diff_mean"),
            col("b_reps").cast("long").as("b_reps"),
            Rounding.stableRound6(
              sqrt((col("b_reps").cast("decimal(38,0)") * col("s2") -
                col("s1") * col("s1")).cast("double") /
                (col("b_reps") * (col("b_reps") - 1)).cast("double")) /
                lit(1000000.0)).as("boot_se"),
            (col("lo6").cast("double") / lit(1000000.0)).as("ci_lo"),
            (col("hi6").cast("double") / lit(1000000.0)).as("ci_hi"))
          .orderBy("n_a")
      },
      Some {
        val h = PolyHash.duckSql(
          "'bdiff' || b::VARCHAR || '#' || event_id::VARCHAR")
        s"""WITH ev AS (
           |  SELECT event_id, user_id % 2 AS variant,
           |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
           |  FROM events),
           |d AS (
           |  SELECT event_id, variant, cents, unnest(range(32)) AS b
           |  FROM ev),
           |wv AS (
           |  SELECT variant, b, cents,
           |    CASE WHEN u < 3679 THEN 0 WHEN u < 7358 THEN 1
           |      WHEN u < 9197 THEN 2 WHEN u < 9810 THEN 3
           |      WHEN u < 9963 THEN 4 WHEN u < 9994 THEN 5
           |      WHEN u < 9999 THEN 6 ELSE 7 END AS wgt
           |  FROM (SELECT variant, b, cents,
           |          ($h) * ($h) % ${PolyHash.Mod} % 10000 AS u
           |        FROM d)),
           |reps AS (
           |  SELECT b, variant,
           |    CAST(floor(sum(wgt * cents)::DOUBLE /
           |      sum(wgt)::DOUBLE * 10000.0 + 0.5) AS BIGINT) AS est6
           |  FROM wv GROUP BY b, variant),
           |diffs AS (
           |  SELECT a.b, a.est6 - bb.est6 AS d6
           |  FROM (SELECT b, est6 FROM reps WHERE variant = 0) a
           |  JOIN (SELECT b, est6 FROM reps WHERE variant = 1) bb
           |    ON bb.b = a.b),
           |point AS (
           |  SELECT variant, count(*) AS n, sum(cents) AS sc
           |  FROM ev GROUP BY variant),
           |agg AS (
           |  SELECT count(*) AS b_reps, sum(d6) AS s1,
           |    sum(d6::HUGEINT * d6::HUGEINT) AS s2,
           |    min(d6) AS lo6, max(d6) AS hi6
           |  FROM diffs)
           |SELECT CAST(pa.n AS BIGINT) AS n_a,
           |  CAST(pb.n AS BIGINT) AS n_b,
           |  ${Rounding.duckSql(
                "pa.sc::DOUBLE / pa.n::DOUBLE / 100.0" +
                  " - pb.sc::DOUBLE / pb.n::DOUBLE / 100.0")}
           |    AS diff_mean,
           |  CAST(b_reps AS BIGINT) AS b_reps,
           |  ${Rounding.duckSql(
                "sqrt((b_reps::HUGEINT * s2 - s1::HUGEINT * s1::HUGEINT)" +
                  "::DOUBLE / (b_reps * (b_reps - 1))::DOUBLE)" +
                  " / 1000000.0")} AS boot_se,
           |  lo6::DOUBLE / 1000000.0 AS ci_lo,
           |  hi6::DOUBLE / 1000000.0 AS ci_hi
           |FROM agg
           |CROSS JOIN (SELECT n, sc FROM point WHERE variant = 0) pa
           |CROSS JOIN (SELECT n, sc FROM point WHERE variant = 1) pb
           |ORDER BY pa.n""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q294: DeLong AUC standard error — q203's AUC with the inference
    // attached: the per-positive placement values V10 = (neg_below +
    // ties/2)/n_neg and per-negative V01 live on the half-integer grid
    // (b2 = 2·below+ties), so their sums and sums of squares are exact
    // LONGs from the SAME distinct-value cumulative counts q203 uses —
    // no per-row pass. s10 = (n1·A2 − T²)/(4 n1 n0² (n1−1)) and the
    // symmetric s01 derive in one double expression each (largest
    // intermediate ~1e17 at sf0.1, inside the 2^63 integer range;
    // beyond that the sums switch to decimal — the q257 discipline),
    // SE = √(s10/n1 + s01/n0), z = (AUC − ½)/SE. Emitted per source.
    Q(
      "q294_delong_auc_se",
      (s, dir) => {
        val cnt = Tables.load(s, dir, "documents")
          .select(col("source"), col("n_chars").as("v"),
            when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
          .groupBy("source", "v")
          .agg(sum("pos").as("pc"), (count(lit(1)) - sum("pos")).as("nc"))
        val w = Window.partitionBy("source").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, -1)
        val placed = cnt
          .withColumn("below_n", coalesce(sum("nc").over(w), lit(0L)))
          .withColumn("below_p", coalesce(sum("pc").over(w), lit(0L)))
          .withColumn("b2", lit(2L) * col("below_n") + col("nc"))
          .withColumn("c2", lit(2L) * col("below_p") + col("pc"))
        val agg = placed.groupBy("source")
          .agg(sum("pc").as("n1"), sum("nc").as("n0"),
            sum(col("pc") * col("b2")).as("t"),
            sum(col("pc") * col("b2") * col("b2")).as("a2"),
            sum(col("nc") * col("c2") * col("c2")).as("b2s"))
          .filter(col("n1") > 1 && col("n0") > 1)
        val auc = col("t").cast("double") /
          (lit(2.0) * col("n1").cast("double") * col("n0").cast("double"))
        val s10 = (col("n1").cast("double") * col("a2").cast("double") -
          col("t").cast("double") * col("t").cast("double")) /
          (lit(4.0) * col("n1").cast("double") *
            col("n0").cast("double") * col("n0").cast("double") *
            (col("n1") - lit(1L)).cast("double"))
        // negative-side placements count POSITIVES above: c2 counts
        // positives below, so V01 = 1 - c2/(2 n1); variance is
        // shift-invariant -> same formula with the mirrored T' = Σnc·c2
        // (= 2 n1 n0 − T by the placement identity)
        val tNeg = lit(2L).cast("double") * col("n1").cast("double") *
          col("n0").cast("double") - col("t").cast("double")
        val s01 = (col("n0").cast("double") * col("b2s").cast("double") -
          tNeg * tNeg) /
          (lit(4.0) * col("n0").cast("double") *
            col("n1").cast("double") * col("n1").cast("double") *
            (col("n0") - lit(1L)).cast("double"))
        val se = sqrt(s10 / col("n1").cast("double") +
          s01 / col("n0").cast("double"))
        agg.filter(col("a2") > 0)
          .select(col("source"), col("n1").as("n_pos"),
            col("n0").as("n_neg"),
            Rounding.stableRound6(auc).as("auc"),
            Rounding.stableRound6(se).as("se"),
            Rounding.stableRound6((auc - lit(0.5)) / se).as("z"))
          .filter(col("se") > 0.0)
          .orderBy("source")
      },
      Some(s"""WITH cnt AS (
             |  SELECT source, n_chars AS v,
             |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pc,
             |    sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS nc
             |  FROM documents GROUP BY source, n_chars),
             |placed AS (
             |  SELECT source, pc, nc,
             |    2 * coalesce(sum(nc) OVER (PARTITION BY source ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      + nc AS b2,
             |    2 * coalesce(sum(pc) OVER (PARTITION BY source ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      + pc AS c2
             |  FROM cnt),
             |agg AS (
             |  SELECT source, sum(pc) AS n1, sum(nc) AS n0,
             |    sum(pc * b2) AS t, sum(pc * b2 * b2) AS a2,
             |    sum(nc * c2 * c2) AS b2s
             |  FROM placed GROUP BY source),
             |f AS (SELECT * FROM agg
             |      WHERE n1 > 1 AND n0 > 1 AND a2 > 0),
             |v AS (
             |  SELECT source, n1, n0,
             |    t::DOUBLE / (2.0 * n1::DOUBLE * n0::DOUBLE) AS auc,
             |    (n1::DOUBLE * a2::DOUBLE - t::DOUBLE * t::DOUBLE) /
             |      (4.0 * n1::DOUBLE * n0::DOUBLE * n0::DOUBLE *
             |        (n1 - 1)::DOUBLE) AS s10,
             |    (n0::DOUBLE * b2s::DOUBLE -
             |      (2.0::DOUBLE * n1::DOUBLE * n0::DOUBLE - t::DOUBLE) *
             |      (2.0::DOUBLE * n1::DOUBLE * n0::DOUBLE - t::DOUBLE)) /
             |      (4.0 * n0::DOUBLE * n1::DOUBLE * n1::DOUBLE *
             |        (n0 - 1)::DOUBLE) AS s01
             |  FROM f),
             |w AS (
             |  SELECT source, n1, n0, auc,
             |    sqrt(s10 / n1::DOUBLE + s01 / n0::DOUBLE) AS se
             |  FROM v)
             |SELECT source, CAST(n1 AS BIGINT) AS n_pos,
             |  CAST(n0 AS BIGINT) AS n_neg,
             |  ${Rounding.duckSql("auc")} AS auc,
             |  ${Rounding.duckSql("se")} AS se,
             |  ${Rounding.duckSql("(auc - 0.5) / se")} AS z
             |FROM w WHERE se > 0.0
             |ORDER BY source""".stripMargin)),

    // ------------------------------------------------------------------
    // q295: doubly-robust offline policy evaluation — the estimator
    // that stays consistent if EITHER the propensity model (q284's
    // IPS leg) OR the outcome model is right: DR_i = m(x_i, π(x_i)) +
    // 1{a_i = π(x_i)}/p(a_i)·(r_i − m(x_i, a_i)), with the outcome
    // model m(category, action) = the logged mean reward of that
    // (category, action) cell — two tiny agg frames broadcast back
    // over one scoring scan. Per-row DR terms are rationals with
    // varying denominators, so each is snapped ONCE to the 1e-9 LONG
    // grid (identical double expression text in both engines) and the
    // segment accumulation is an exact integer sum. Reported next to
    // the plain IPS estimate so the variance-reduction is visible.
    Q(
      "q295_doubly_robust_eval",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select((col("user_id") % 4).as("segment"),
            col("event_type").as("cat"),
            when(graft.ext.Sampling.bucket(col("event_id"), "ips1") < 3000,
              1L).otherwise(0L).as("a"),
            when(col("event_type") === "purchase" && col("value") > 20.0,
              1L).otherwise(0L).as("r"),
            when(col("value") > 50.0, 1L).otherwise(0L).as("pi"))
        val m = ev.groupBy("cat", "a")
          .agg(sum("r").as("sr"), count(lit(1)).as("nr"))
        val mPi = m.select(col("cat"), col("a").as("pi"),
          col("sr").as("sr_pi"), col("nr").as("nr_pi"))
        val mA = m.select(col("cat"), col("a"),
          col("sr").as("sr_a"), col("nr").as("nr_a"))
        val scored = ev
          .join(broadcast(mPi), Seq("cat", "pi"))
          .join(broadcast(mA), Seq("cat", "a"))
          .withColumn("mpi",
            col("sr_pi").cast("double") / col("nr_pi").cast("double"))
          .withColumn("ma",
            col("sr_a").cast("double") / col("nr_a").cast("double"))
          .withColumn("wr",
            when(col("pi") === col("a"),
              (col("r").cast("double") - col("ma")) /
                when(col("a") === 1L, lit(0.3)).otherwise(lit(0.7)))
              .otherwise(lit(0.0)))
          .withColumn("dr9",
            floor((col("mpi") + col("wr")) * lit(1000000000.0) + lit(0.5))
              .cast("long"))
          .withColumn("ips9",
            when(col("pi") === col("a"),
              floor(col("r").cast("double") /
                when(col("a") === 1L, lit(0.3)).otherwise(lit(0.7)) *
                lit(1000000000.0) + lit(0.5)).cast("long"))
              .otherwise(lit(0L)))
        scored.groupBy("segment")
          .agg(count(lit(1)).as("n"), sum("dr9").as("dr9"),
            sum("ips9").as("i9"))
          .select(col("segment").cast("long").as("segment"), col("n"),
            Rounding.stableRound6(col("dr9").cast("double") /
              col("n").cast("double") / lit(1000000000.0))
              .as("dr_estimate"),
            Rounding.stableRound6(col("i9").cast("double") /
              col("n").cast("double") / lit(1000000000.0))
              .as("ips_estimate"))
          .orderBy("segment")
      },
      Some(s"""WITH ev AS (
             |  SELECT user_id % 4 AS segment, event_type AS cat,
             |    CASE WHEN ${graft.ext.Sampling
                  .bucketDuckSql("ips1", "event_id")} < 3000
             |      THEN 1 ELSE 0 END AS a,
             |    CASE WHEN event_type = 'purchase' AND value > 20.0
             |      THEN 1 ELSE 0 END AS r,
             |    CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS pi
             |  FROM events),
             |m AS (
             |  SELECT cat, a, sum(r) AS sr, count(*) AS nr
             |  FROM ev GROUP BY cat, a),
             |scored AS (
             |  SELECT ev.segment,
             |    mpi.sr::DOUBLE / mpi.nr::DOUBLE AS mpi,
             |    ma.sr::DOUBLE / ma.nr::DOUBLE AS ma,
             |    ev.a, ev.pi, ev.r
             |  FROM ev
             |  JOIN m mpi ON mpi.cat = ev.cat AND mpi.a = ev.pi
             |  JOIN m ma ON ma.cat = ev.cat AND ma.a = ev.a),
             |terms AS (
             |  SELECT segment,
             |    CAST(floor((mpi + CASE WHEN pi = a THEN
             |        (r::DOUBLE - ma) /
             |          (CASE WHEN a = 1 THEN 0.3 ELSE 0.7 END)
             |      ELSE 0.0 END) * 1000000000.0 + 0.5) AS BIGINT)
             |      AS dr9,
             |    CASE WHEN pi = a THEN
             |      CAST(floor(r::DOUBLE /
             |        (CASE WHEN a = 1 THEN 0.3 ELSE 0.7 END) *
             |        1000000000.0 + 0.5) AS BIGINT)
             |    ELSE 0 END AS ips9
             |  FROM scored)
             |SELECT CAST(segment AS BIGINT) AS segment,
             |  CAST(count(*) AS BIGINT) AS n,
             |  ${Rounding.duckSql(
                  "sum(dr9)::DOUBLE / count(*)::DOUBLE / 1000000000.0")}
             |    AS dr_estimate,
             |  ${Rounding.duckSql(
                  "sum(ips9)::DOUBLE / count(*)::DOUBLE / 1000000000.0")}
             |    AS ips_estimate
             |FROM terms GROUP BY segment
             |ORDER BY segment""".stripMargin))
  )
}
