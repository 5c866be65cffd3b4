package graft.queries

import org.apache.spark.sql.functions._

import graft.ext.TextAnalysis
import graft.functions.Rounding
import graft.io.Tables

/** Round-9 fifth wave: experimentation-health and classifier-audit
  * operators — Cochran-Mantel-Haenszel stratified test (q334, the
  * antidote to q297's Simpson flips), minimum-detectable-effect power
  * analysis (q335), sample-ratio-mismatch check (q336, the first thing
  * every A/B platform validates), and per-class precision/recall/F1 for
  * the langid heuristic (q337, the class-level drill-down under q188's
  * kappa). Same contract as every other module: each Spark pipeline
  * pairs with DuckDB oracle SQL replaying it.
  */
object ExtensionQueries47 {

  private def inList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("(", ", ", ")")

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q334: Cochran-Mantel-Haenszel — does the arm (user_id % 2) shift
    // the high-value-event rate (cents > 10000) AFTER stratifying by
    // event type? q297 shows how a pooled 2×2 flips under confounding;
    // CMH is the standard stratified answer: per stratum k the 2×2
    // (a,b,c,d), χ²_CMH = (Σa − Σ(r1·c1/n))² / Σ(r1·r0·c1·c0/(n²(n−1))),
    // plus the Mantel-Haenszel pooled odds ratio Σ(a·d/n)/Σ(b·c/n).
    // Every cell is an exact LONG from one scan; the stratum frame is
    // the 5-type value domain.
    Q(
      "q334_cmh_stratified",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select(col("event_type"),
            (col("user_id") % 2 === 0).as("exposed"),
            (round(col("value") * 100).cast("long") > 10000L).as("hi"))
        val cells = ev.groupBy("event_type")
          .agg(sum(when(col("exposed") && col("hi"), 1L).otherwise(0L))
            .as("a"),
            sum(when(col("exposed") && !col("hi"), 1L).otherwise(0L))
              .as("b"),
            sum(when(!col("exposed") && col("hi"), 1L).otherwise(0L))
              .as("c"),
            sum(when(!col("exposed") && !col("hi"), 1L).otherwise(0L))
              .as("d"))
          .withColumn("n", col("a") + col("b") + col("c") + col("d"))
        val e1 = (col("a") + col("b")).cast("double") *
          (col("a") + col("c")).cast("double") / col("n").cast("double")
        val vk = (col("a") + col("b")).cast("double") *
          (col("c") + col("d")).cast("double") *
          (col("a") + col("c")).cast("double") *
          (col("b") + col("d")).cast("double") /
          (col("n").cast("double") * col("n").cast("double") *
            (col("n") - 1).cast("double"))
        cells.agg(
            sum("a").cast("long").as("sum_a"),
            sum(e1).as("sum_e"),
            sum(vk).as("sum_v"),
            sum(col("a").cast("double") * col("d").cast("double") /
              col("n").cast("double")).as("orn"),
            sum(col("b").cast("double") * col("c").cast("double") /
              col("n").cast("double")).as("ord"))
          .select(col("sum_a"),
            Rounding.stableRound6(col("sum_e")).as("expected_a"),
            Rounding.stableRound6(
              (col("sum_a").cast("double") - col("sum_e")) *
                (col("sum_a").cast("double") - col("sum_e")) /
                col("sum_v")).as("cmh_chi2"),
            Rounding.stableRound6(col("orn") / col("ord"))
              .as("or_mh"))
          .withColumn("significant", col("cmh_chi2") > 3.841)
      },
      Some("""WITH ev AS (
             |  SELECT event_type, user_id % 2 = 0 AS exposed,
             |    CAST(round(value * 100) AS BIGINT) > 10000 AS hi
             |  FROM events),
             |cells AS (
             |  SELECT event_type,
             |    sum(CASE WHEN exposed AND hi THEN 1 ELSE 0 END) AS a,
             |    sum(CASE WHEN exposed AND NOT hi THEN 1 ELSE 0 END) AS b,
             |    sum(CASE WHEN NOT exposed AND hi THEN 1 ELSE 0 END) AS c,
             |    sum(CASE WHEN NOT exposed AND NOT hi THEN 1 ELSE 0 END)
             |      AS d
             |  FROM ev GROUP BY event_type),
             |cn AS (SELECT *, a + b + c + d AS n FROM cells),
             |agg AS (
             |  SELECT CAST(sum(a) AS BIGINT) AS sum_a,
             |    sum((a+b)::DOUBLE * (a+c)::DOUBLE / n::DOUBLE) AS sum_e,
             |    sum((a+b)::DOUBLE * (c+d)::DOUBLE * (a+c)::DOUBLE *
             |      (b+d)::DOUBLE / (n::DOUBLE * n::DOUBLE *
             |      (n-1)::DOUBLE)) AS sum_v,
             |    sum(a::DOUBLE * d::DOUBLE / n::DOUBLE) AS orn,
             |    sum(b::DOUBLE * c::DOUBLE / n::DOUBLE) AS ord
             |  FROM cn),
             |st AS (
             |  SELECT sum_a,
             |    floor(sum_e * 1000000 + 0.5) / 1000000 AS expected_a,
             |    floor((sum_a::DOUBLE - sum_e) * (sum_a::DOUBLE - sum_e)
             |      / sum_v * 1000000 + 0.5) / 1000000 AS cmh_chi2,
             |    floor(orn / ord * 1000000 + 0.5) / 1000000 AS or_mh
             |  FROM agg)
             |SELECT sum_a, expected_a, cmh_chi2, or_mh,
             |  cmh_chi2 > 3.841 AS significant
             |FROM st""".stripMargin)),

    // ------------------------------------------------------------------
    // q335: minimum detectable effect — per event type, the smallest
    // true mean shift the CURRENT sample sizes could detect at
    // α = 0.05 (two-sided) with 80% power:
    // MDE = (z_{α/2} + z_{power})·sqrt(s²·(1/n₀ + 1/n₁)), pooled
    // sample variance from exact LONG-cents moments, the two normal
    // quantiles burned in as literals (1.959964, 0.841621 — q330's
    // discipline). The relative MDE divides by the pooled mean. This
    // is the "is this experiment even big enough" pre-check that pairs
    // with q330's post-hoc correction.
    Q(
      "q335_mde_power",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select(col("event_type"), (col("user_id") % 2).as("arm"),
            round(col("value") * 100).cast("long").as("cents"))
        val arms = ev.groupBy("event_type", "arm")
          .agg(count(lit(1)).as("n"))
        val pooled = ev.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("cents").as("sx"),
            sum(col("cents") * col("cents")).as("sxx"))
          .withColumn("mean", col("sx").cast("double") /
            col("n").cast("double"))
          .withColumn("s2",
            (col("n") * col("sxx") - col("sx") * col("sx")).cast("double") /
              (col("n") * (col("n") - 1)).cast("double"))
        val mde = lit(1.959964 + 0.841621) *
          sqrt(col("s2") * (lit(1.0) / col("n0").cast("double") +
            lit(1.0) / col("n1").cast("double")))
        arms.where(col("arm") === 0)
          .select(col("event_type"), col("n").as("n0"))
          .join(arms.where(col("arm") === 1)
            .select(col("event_type"), col("n").as("n1")), "event_type")
          .join(pooled.select(col("event_type"), col("mean"), col("s2")),
            "event_type")
          .select(col("event_type"), col("n0").cast("long").as("n0"),
            col("n1").cast("long").as("n1"),
            Rounding.stableRound6(mde / 100.0).as("mde_abs"),
            Rounding.stableRound6(mde / col("mean")).as("mde_rel"))
          .orderBy("event_type")
      },
      Some(s"""WITH ev AS (
             |  SELECT event_type, user_id % 2 AS arm,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events),
             |arms AS (
             |  SELECT event_type, arm, count(*) AS n
             |  FROM ev GROUP BY event_type, arm),
             |pooled AS (
             |  SELECT event_type, count(*) AS n,
             |    CAST(sum(cents) AS BIGINT) AS sx,
             |    CAST(sum(cents*cents) AS BIGINT) AS sxx
             |  FROM ev GROUP BY event_type),
             |p2 AS (
             |  SELECT event_type, sx::DOUBLE / n::DOUBLE AS mean,
             |    (n*sxx - sx*sx)::DOUBLE / (n*(n-1))::DOUBLE AS s2
             |  FROM pooled),
             |j AS (
             |  SELECT a0.event_type, a0.n AS n0, a1.n AS n1, p2.mean,
             |    p2.s2,
             |    (1.959964 + 0.841621) * sqrt(p2.s2 *
             |      (1.0 / a0.n::DOUBLE + 1.0 / a1.n::DOUBLE)) AS mde
             |  FROM arms a0
             |  JOIN arms a1 ON a1.event_type = a0.event_type
             |    AND a0.arm = 0 AND a1.arm = 1
             |  JOIN p2 ON p2.event_type = a0.event_type)
             |SELECT event_type, CAST(n0 AS BIGINT) AS n0,
             |  CAST(n1 AS BIGINT) AS n1,
             |  ${Rounding.duckSql("mde / 100.0")} AS mde_abs,
             |  ${Rounding.duckSql("mde / mean")} AS mde_rel
             |FROM j
             |ORDER BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // q336: sample-ratio mismatch — the A/B platform's first health
    // check: under a 50/50 user split, does each event type's DISTINCT-
    // user exposure match? χ²₁ = (n₀−E)²/E + (n₁−E)²/E with
    // E = (n₀+n₁)/2; a significant SRM means the assignment or logging
    // is broken and every downstream readout (q264/q268/q285/q330) is
    // void. Distinct-user counts per (type, arm) are one exact agg.
    Q(
      "q336_srm_check",
      (s, dir) => {
        val u = Tables.load(s, dir, "events")
          .select(col("event_type"), col("user_id"),
            (col("user_id") % 2).as("arm"))
          .distinct()
        u.groupBy("event_type")
          .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
            sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"))
          .withColumn("e",
            (col("n0") + col("n1")).cast("double") / 2.0)
          .select(col("event_type"), col("n0"), col("n1"),
            Rounding.stableRound6(
              (col("n0").cast("double") - col("e")) *
                (col("n0").cast("double") - col("e")) / col("e") +
                (col("n1").cast("double") - col("e")) *
                  (col("n1").cast("double") - col("e")) / col("e"))
              .as("srm_chi2"))
          .withColumn("srm_alarm", col("srm_chi2") > 3.841)
          .orderBy("event_type")
      },
      Some("""WITH u AS (
             |  SELECT DISTINCT event_type, user_id, user_id % 2 AS arm
             |  FROM events),
             |g AS (
             |  SELECT event_type,
             |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n0,
             |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n1
             |  FROM u GROUP BY event_type),
             |st AS (
             |  SELECT event_type, n0, n1, (n0 + n1)::DOUBLE / 2.0 AS e
             |  FROM g)
             |SELECT event_type, n0, n1,
             |  floor(((n0::DOUBLE - e) * (n0::DOUBLE - e) / e
             |    + (n1::DOUBLE - e) * (n1::DOUBLE - e) / e) * 1000000
             |    + 0.5) / 1000000 AS srm_chi2,
             |  floor(((n0::DOUBLE - e) * (n0::DOUBLE - e) / e
             |    + (n1::DOUBLE - e) * (n1::DOUBLE - e) / e) * 1000000
             |    + 0.5) / 1000000 > 3.841 AS srm_alarm
             |FROM st
             |ORDER BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // q337: per-class precision/recall/F1 of the langid heuristic —
    // q188's kappa says HOW MUCH the classifier agrees overall; this
    // says WHERE it fails: per gold language, tp/fp/fn from the
    // confusion cells (q41's marker-argmax prediction replayed by the
    // oracle), F1 with the 0/0 → 0 guard. Cells frame is
    // langs × preds — value-domain sized.
    Q(
      "q337_langid_prf",
      (s, dir) => {
        val scored = Tables.load(s, dir, "documents")
          .select(col("lang"), TextAnalysis.langId(col("text")).as("pred"))
        val cells = scored.groupBy("lang", "pred")
          .agg(count(lit(1)).as("c"))
        val tp = cells.where(col("lang") === col("pred"))
          .select(col("lang"), col("c").as("tp"))
        val gold = cells.groupBy("lang").agg(sum("c").as("n_gold"))
        val predTot = cells.groupBy("pred").agg(sum("c").as("n_pred"))
        gold
          .join(tp, Seq("lang"), "left").na.fill(0L, Seq("tp"))
          .join(predTot.withColumnRenamed("pred", "lang"),
            Seq("lang"), "left").na.fill(0L, Seq("n_pred"))
          .select(col("lang"), col("n_gold").cast("long").as("n_gold"),
            col("tp").cast("long").as("tp"),
            Rounding.stableRound6(when(col("n_pred") > 0,
              col("tp").cast("double") / col("n_pred").cast("double"))
              .otherwise(0.0)).as("precision"),
            Rounding.stableRound6(col("tp").cast("double") /
              col("n_gold").cast("double")).as("recall"),
            Rounding.stableRound6(when(col("n_pred") + col("n_gold") > 0,
              lit(2.0) * col("tp").cast("double") /
                (col("n_pred") + col("n_gold")).cast("double"))
              .otherwise(0.0)).as("f1"))
          .orderBy("lang")
      },
      Some {
        val scoreSelects = TextAnalysis.Markers.map { case (l, ms) =>
          s"len(list_filter(toks, t -> t IN ${inList(ms)}))::BIGINT AS s_$l"
        }.mkString(",\n             |    ")
        val langs = TextAnalysis.Markers.map(_._1)
        val best = s"greatest(${langs.map("s_" + _).mkString(", ")})"
        val cases = langs.map(l => s"WHEN s_$l = $best THEN '$l'").mkString(" ")
        s"""WITH scored AS (
           |  SELECT lang,
           |    CASE WHEN $best = 0 THEN 'unknown' $cases ELSE 'unknown' END
           |      AS pred
           |  FROM (
           |    SELECT lang,
           |    $scoreSelects
           |  FROM (SELECT lang,
           |          regexp_extract_all(lower(text), '\\S+') AS toks
           |        FROM documents))),
           |cells AS (
           |  SELECT lang, pred, count(*) AS c
           |  FROM scored GROUP BY lang, pred),
           |tp AS (SELECT lang, c AS tp FROM cells WHERE lang = pred),
           |gold AS (SELECT lang, sum(c) AS n_gold FROM cells
           |         GROUP BY lang),
           |pt AS (SELECT pred AS lang, sum(c) AS n_pred FROM cells
           |       GROUP BY pred)
           |SELECT g.lang, CAST(g.n_gold AS BIGINT) AS n_gold,
           |  CAST(coalesce(tp.tp, 0) AS BIGINT) AS tp,
           |  ${Rounding.duckSql(
                "CASE WHEN coalesce(pt.n_pred, 0) > 0 THEN " +
                  "coalesce(tp.tp, 0)::DOUBLE / pt.n_pred::DOUBLE " +
                  "ELSE 0.0 END")} AS precision,
           |  ${Rounding.duckSql(
                "coalesce(tp.tp, 0)::DOUBLE / g.n_gold::DOUBLE")}
           |    AS recall,
           |  ${Rounding.duckSql(
                "CASE WHEN coalesce(pt.n_pred, 0) + g.n_gold > 0 THEN " +
                  "2.0 * coalesce(tp.tp, 0)::DOUBLE / " +
                  "(coalesce(pt.n_pred, 0) + g.n_gold)::DOUBLE " +
                  "ELSE 0.0 END")} AS f1
           |FROM gold g
           |LEFT JOIN tp ON tp.lang = g.lang
           |LEFT JOIN pt ON pt.lang = g.lang
           |ORDER BY g.lang""".stripMargin
      }))
}
