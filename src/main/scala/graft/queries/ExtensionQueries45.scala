package graft.queries

import org.apache.spark.sql.functions._

import graft.ext.TextAnalysis
import graft.functions.{Rounding, VectorFunctions}
import graft.io.Tables

/** Round-9 third wave: k-center greedy diversity selection (q326 — the
  * coverage-first subset picker for embedding curation), McNemar's
  * paired-classifier test (q327 — is heuristic A actually better than
  * heuristic B on the SAME docs), and CUPED variance reduction (q328 —
  * the pre-period-covariate adjustment every experimentation platform
  * runs). Same contract as every other module: each Spark pipeline
  * pairs with DuckDB oracle SQL replaying it.
  */
object ExtensionQueries45 {

  private def inList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("(", ", ", ")")

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q326: k-center greedy (farthest-point) diversity selection — pick
    // 8 embeddings that COVER the corpus: start from the smallest
    // vec_id, then repeatedly take the point FARTHEST from everything
    // chosen so far (max-min distance). The classic 2-approximation to
    // the k-center objective, and the standard "diverse subset"
    // primitive for curation/eval-set seeding (counterpart to q234's
    // hard negatives and q114's mixture weights, which pick by score,
    // not coverage). Determinism is the q230/q304 integer-snap
    // discipline: every pairwise L2 snaps to the 1e-6 LONG grid at
    // computation, the running min is an exact LONG min, and argmax
    // ties break on vec_id — both engines walk the identical
    // trajectory, so the oracle replays it as 8 unrolled MATERIALIZED
    // layers. Scale: k corpus scans (the running-min frame is
    // checkpointed per pick — never an all-pairs join), each pick a
    // TakeOrderedAndProject; chosen points self-distance 0 so they are
    // never re-picked.
    Q(
      "q326_kcenter_diversity",
      (s, dir) => {
        import s.implicits._
        val k = 8
        val e = Tables.load(s, dir, "embeddings")
          .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
        def d6(a: org.apache.spark.sql.Column, v: Array[Float]) =
          floor(VectorFunctions.l2Dist(a, typedlit(v)) * lit(1000000.0) +
            lit(0.5)).cast("long")
        val first = e.orderBy("vec_id").limit(1)
          .collect().head
        var picked = Seq((1L, first.getLong(0), 0L))
        var cur = e.withColumn("md",
            d6(col("embedding"), first.getSeq[Float](1).toArray))
          .localCheckpoint()
        for (i <- 2 to k) {
          val nxt = cur.orderBy(desc("md"), col("vec_id")).limit(1)
            .collect().head
          picked = picked :+ ((i.toLong, nxt.getLong(0), nxt.getLong(2)))
          if (i < k)
            cur = cur.withColumn("md", least(col("md"),
                d6(col("embedding"), nxt.getSeq[Float](1).toArray)))
              .localCheckpoint()
        }
        picked.toDF("rk", "vec_id", "d6")
          .select(col("rk"), col("vec_id"),
            Rounding.stableRound6(col("d6").cast("double") / 1000000.0)
              .as("sel_dist"))
          .orderBy("rk")
      },
      Some {
        val layers = (2 to 8).map { i =>
          val p = i - 1
          s"""c$i AS MATERIALIZED (
             |  SELECT vec_id, v, md FROM d$p
             |  ORDER BY md DESC, vec_id LIMIT 1),
             |d$i AS MATERIALIZED (
             |  SELECT d.vec_id, d.v,
             |    least(d.md, CAST(floor(list_distance(d.v, c.v) * 1000000
             |      + 0.5) AS BIGINT)) AS md
             |  FROM d$p d, c$i c)"""
        }.mkString(",\n")
        val sel = (2 to 8).map(i =>
          s"SELECT $i AS rk, vec_id, md FROM c$i").mkString("\n  UNION ALL ")
        s"""WITH e AS (
           |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |c1 AS MATERIALIZED (
           |  SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
           |d1 AS MATERIALIZED (
           |  SELECT e.vec_id, e.v,
           |    CAST(floor(list_distance(e.v, c.v) * 1000000 + 0.5)
           |      AS BIGINT) AS md
           |  FROM e, c1 c),
           |$layers,
           |sel AS (
           |  SELECT 1 AS rk, vec_id, CAST(0 AS BIGINT) AS md FROM c1
           |  UNION ALL $sel)
           |SELECT CAST(rk AS BIGINT) AS rk, vec_id,
           |  ${Rounding.duckSql("md::DOUBLE / 1000000.0")} AS sel_dist
           |FROM sel
           |ORDER BY rk""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q327: McNemar's paired test — per source, compare TWO cheap
    // is-English detectors on the SAME documents against the lang
    // label: A = marker-argmax langId (q41's heuristic), B = English
    // stopword density > 0.10 (q40's ratio). Unpaired accuracy
    // comparison wastes the pairing; McNemar uses only the DISCORDANT
    // counts b (A right, B wrong) and c (A wrong, B right):
    // χ² = (b−c)²/(b+c), plus the Edwards continuity correction
    // (|b−c|−1)²/(b+c). All integer counts from one scan; the verdict
    // column pins χ²₁ at the 5% critical value 3.841. b+c = 0 → both
    // stats 0 (no evidence either way).
    Q(
      "q327_mcnemar_langid",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .select(col("source"), col("lang"), col("text"))
          .withColumn("gold", col("lang") === "en")
          .withColumn("pa", TextAnalysis.langId(col("text")) === "en")
          .withColumn("pb", TextAnalysis.stopwordRatio(col("text")) > 0.10)
        val counted = d.groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(when(col("pa") === col("gold") &&
              col("pb") =!= col("gold"), 1L).otherwise(0L)).as("b"),
            sum(when(col("pa") =!= col("gold") &&
              col("pb") === col("gold"), 1L).otherwise(0L)).as("c"))
        counted.select(col("source"), col("n_docs"), col("b"), col("c"),
            Rounding.stableRound6(when(col("b") + col("c") > 0,
              (col("b") - col("c")).cast("double") *
                (col("b") - col("c")).cast("double") /
                (col("b") + col("c")).cast("double")).otherwise(0.0))
              .as("mcnemar"),
            Rounding.stableRound6(when(col("b") + col("c") > 0,
              (abs(col("b") - col("c")).cast("double") - 1.0) *
                (abs(col("b") - col("c")).cast("double") - 1.0) /
                (col("b") + col("c")).cast("double")).otherwise(0.0))
              .as("mcnemar_cc"))
          .withColumn("significant", col("mcnemar") > 3.841)
          .orderBy("source")
      },
      Some {
        val scoreSelects = TextAnalysis.Markers.map { case (l, ms) =>
          s"len(list_filter(toks, t -> t IN ${inList(ms)}))::BIGINT AS s_$l"
        }.mkString(",\n             |    ")
        val langs = TextAnalysis.Markers.map(_._1)
        val best = s"greatest(${langs.map("s_" + _).mkString(", ")})"
        val cases = langs.map(l => s"WHEN s_$l = $best THEN '$l'").mkString(" ")
        s"""WITH scored AS (
           |  SELECT source, lang = 'en' AS gold,
           |    (CASE WHEN $best = 0 THEN 'unknown' $cases
           |      ELSE 'unknown' END) = 'en' AS pa,
           |    (floor(len(list_filter(toks,
           |        t -> t IN ${inList(TextAnalysis.Markers.head._2)}))::DOUBLE
           |      / greatest(len(toks), 1) * 1000000 + 0.5) / 1000000) > 0.10
           |      AS pb
           |  FROM (
           |    SELECT source, lang, toks,
           |    $scoreSelects
           |  FROM (SELECT source, lang,
           |          regexp_extract_all(lower(text), '\\S+') AS toks
           |        FROM documents))),
           |counted AS (
           |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |    CAST(sum(CASE WHEN pa = gold AND pb <> gold THEN 1 ELSE 0 END)
           |      AS BIGINT) AS b,
           |    CAST(sum(CASE WHEN pa <> gold AND pb = gold THEN 1 ELSE 0 END)
           |      AS BIGINT) AS c
           |  FROM scored GROUP BY source),
           |stats AS (
           |  SELECT source, n_docs, b, c,
           |    ${Rounding.duckSql(
                  "CASE WHEN b + c > 0 THEN (b - c)::DOUBLE * (b - c)::DOUBLE" +
                    " / (b + c)::DOUBLE ELSE 0.0 END")} AS mcnemar,
           |    ${Rounding.duckSql(
                  "CASE WHEN b + c > 0 THEN (abs(b - c)::DOUBLE - 1.0) * " +
                    "(abs(b - c)::DOUBLE - 1.0) / (b + c)::DOUBLE " +
                    "ELSE 0.0 END")} AS mcnemar_cc
           |  FROM counted)
           |SELECT source, n_docs, b, c, mcnemar, mcnemar_cc,
           |  mcnemar > 3.841 AS significant
           |FROM stats
           |ORDER BY source""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q328: CUPED variance reduction — the experimentation-platform
    // adjustment: per user, Y = spend (cents) in the SECOND half of the
    // fixture month, X = spend in the FIRST half (the pre-period
    // covariate); θ = cov(X,Y)/var(X) pooled across arms; each arm
    // (user_id % 2) reports its raw mean and the CUPED-adjusted mean
    // Ȳ_v − θ·(X̄_v − X̄). Moment sums are exact LONG cents (the q100
    // discipline: n·Σxy − ΣxΣy integer identities, zero fp drift), so θ
    // and the adjusted means are single double expressions over exact
    // integers — bit-identical cross-engine before the snap. The
    // variance-reduction factor ρ² = cov²/(varX·varY) is emitted once
    // per arm (pooled value). One events scan → per-user frame → one
    // 1-row moment agg broadcast onto the 2-row arm agg.
    Q(
      "q328_cuped_adjustment",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select(col("user_id"),
            (col("ts") < lit("2024-01-16").cast("timestamp_ntz"))
              .as("pre"),
            round(col("value") * 100).cast("long").as("cents"))
        val users = ev.groupBy("user_id")
          .agg(sum(when(col("pre"), col("cents")).otherwise(0L)).as("x"),
            sum(when(!col("pre"), col("cents")).otherwise(0L)).as("y"))
          .withColumn("variant", col("user_id") % 2)
        val pooled = users.agg(
          count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("y") * col("y")).as("syy"))
        val arms = users.groupBy("variant")
          .agg(count(lit(1)).as("nv"), sum("x").as("sxv"),
            sum("y").as("syv"))
        val theta = (col("n") * col("sxy") - col("sx") * col("sy"))
          .cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
        val rho2 = ((col("n") * col("sxy") - col("sx") * col("sy"))
          .cast("double") *
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")) /
          ((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
            (col("n") * col("syy") - col("sy") * col("sy")).cast("double"))
        arms.crossJoin(broadcast(pooled))
          .select(col("variant").cast("long").as("variant"),
            col("nv").cast("long").as("n_users"),
            Rounding.stableRound6(col("syv").cast("double") /
              col("nv").cast("double") / 100.0).as("mean_y"),
            Rounding.stableRound6((col("syv").cast("double") /
              col("nv").cast("double") -
              theta * (col("sxv").cast("double") / col("nv").cast("double") -
                col("sx").cast("double") / col("n").cast("double"))) / 100.0)
              .as("cuped_mean_y"),
            Rounding.stableRound6(rho2).as("rho2"))
          .orderBy("variant")
      },
      Some(s"""WITH ev AS (
             |  SELECT user_id, ts < TIMESTAMP '2024-01-16' AS pre,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events),
             |users AS (
             |  SELECT user_id,
             |    sum(CASE WHEN pre THEN cents ELSE 0 END) AS x,
             |    sum(CASE WHEN NOT pre THEN cents ELSE 0 END) AS y,
             |    user_id % 2 AS variant
             |  FROM ev GROUP BY user_id),
             |pooled AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |    CAST(sum(x*x) AS BIGINT) AS sxx,
             |    CAST(sum(x*y) AS BIGINT) AS sxy,
             |    CAST(sum(y*y) AS BIGINT) AS syy
             |  FROM users),
             |arms AS (
             |  SELECT variant, CAST(count(*) AS BIGINT) AS nv,
             |    CAST(sum(x) AS BIGINT) AS sxv, CAST(sum(y) AS BIGINT) AS syv
             |  FROM users GROUP BY variant)
             |SELECT CAST(variant AS BIGINT) AS variant, nv AS n_users,
             |  ${Rounding.duckSql("syv::DOUBLE / nv::DOUBLE / 100.0")}
             |    AS mean_y,
             |  ${Rounding.duckSql(
                  "(syv::DOUBLE / nv::DOUBLE - " +
                    "(n*sxy - sx*sy)::DOUBLE / (n*sxx - sx*sx)::DOUBLE * " +
                    "(sxv::DOUBLE / nv::DOUBLE - sx::DOUBLE / n::DOUBLE)) " +
                    "/ 100.0")} AS cuped_mean_y,
             |  ${Rounding.duckSql(
                  "(n*sxy - sx*sy)::DOUBLE * (n*sxy - sx*sy)::DOUBLE / " +
                    "((n*sxx - sx*sx)::DOUBLE * (n*syy - sy*sy)::DOUBLE)")}
             |    AS rho2
             |FROM arms CROSS JOIN pooled
             |ORDER BY variant""".stripMargin))
  )
}
