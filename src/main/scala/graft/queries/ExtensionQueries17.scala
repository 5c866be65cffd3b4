package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{Sampling, TextAnalysis}
import graft.functions.Rounding
import graft.io.Tables

/** Round-7 eleventh wave: balanced eval-set construction and
  * chance-corrected label agreement (Cohen's kappa). Same contract as
  * every other module: each Spark pipeline pairs with DuckDB oracle SQL
  * replaying it.
  */
object ExtensionQueries17 {

  private def inList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("(", ", ", ")")

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q187: balanced eval-set construction — EXACTLY k documents per
    // language stratum, membership decided by the salted square-mix
    // bucket (q55's machinery) so the draw is reproducible on any
    // engine and any run: the held-out eval set a training pipeline
    // freezes once and re-derives forever (rate-based sampling, q57,
    // cannot promise exact counts; eval sets need them for comparable
    // per-stratum metrics). Scale shape: one scan, per-stratum rank via
    // a window whose partitions are the strata — Spark pushes the
    // rank <= k cut below the full sort as WindowGroupLimit, so each
    // partition retains k rows before the exchange.
    Q(
      "q187_eval_set",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            Sampling.bucket(col("doc_id"), "eval7").as("b"))
        val w = Window.partitionBy("lang").orderBy("b", "doc_id")
        d.withColumn("rank", row_number().over(w))
          .where(col("rank") <= 20)
          .select(col("lang"), col("rank"), col("doc_id"))
          .orderBy("lang", "rank")
      },
      Some(s"""WITH d AS (
             |  SELECT doc_id, lang,
             |    ${Sampling.bucketDuckSql("eval7", "doc_id")} AS b
             |  FROM documents),
             |r AS (
             |  SELECT lang, doc_id,
             |    row_number() OVER (PARTITION BY lang ORDER BY b, doc_id)
             |      AS rank
             |  FROM d)
             |SELECT lang, rank, doc_id
             |FROM r WHERE rank <= 20
             |ORDER BY lang, rank""".stripMargin)),

    // ------------------------------------------------------------------
    // q188: Cohen's kappa — chance-corrected agreement between the
    // recorded `lang` label and q41's language-ID prediction, per
    // source: q157 reports RAW agreement, but a source whose docs are
    // 90% English gets ~81% agreement from chance alone — kappa
    // subtracts exactly that (po − pe)/(1 − pe), the metric label-
    // quality decisions should actually use. All inputs are integer
    // contingency counts from ONE scan + one (source, lang, pred) agg;
    // pe's marginal products run as exact LONGs, the two divisions are
    // identical long→double ops both engines, stableRound6'd.
    Q(
      "q188_label_kappa",
      (s, dir) => {
        val scored = Tables.load(s, dir, "documents")
          .select(col("source"), col("lang"),
            TextAnalysis.langId(col("text")).as("pred"))
        val cells = scored.groupBy("source", "lang", "pred")
          .agg(count(lit(1)).as("c"))
        val w = Window.partitionBy("source")
        val marg = cells
          .withColumn("n", sum("c").over(w))
          .withColumn("po_num", sum(when(col("lang") === col("pred"),
            col("c")).otherwise(0L)).over(w))
        // pe numerator: Σ_label rowMarginal·colMarginal — join the two
        // marginal frames (cell-frame-sized) on (source, label)
        val rowM = cells.groupBy("source", "lang")
          .agg(sum("c").as("na")).withColumnRenamed("lang", "lab")
        val colM = cells.groupBy("source", "pred")
          .agg(sum("c").as("nb")).withColumnRenamed("pred", "lab")
        val pe = rowM.join(colM, Seq("source", "lab"))
          .groupBy("source").agg(sum(col("na") * col("nb")).as("pe_num"))
        marg.select(col("source"), col("n"), col("po_num")).distinct()
          .join(pe, "source")
          .select(col("source"), col("n").as("n_docs"),
            col("po_num").as("n_agree"),
            Rounding.stableRound6(
              (col("po_num").cast("double") / col("n") -
                col("pe_num").cast("double") / (col("n") * col("n"))) /
                (lit(1.0) - col("pe_num").cast("double") /
                  (col("n") * col("n")))).as("kappa"))
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
           |  SELECT source, lang,
           |    CASE WHEN $best = 0 THEN 'unknown' $cases ELSE 'unknown' END
           |      AS pred
           |  FROM (
           |    SELECT source, lang,
           |    $scoreSelects
           |  FROM (SELECT source, lang,
           |          regexp_extract_all(lower(text), '\\S+') AS toks
           |        FROM documents))),
           |cells AS (SELECT source, lang, pred, count(*) AS c
           |          FROM scored GROUP BY 1, 2, 3),
           |tot AS (SELECT source, sum(c) AS n,
           |          sum(CASE WHEN lang = pred THEN c ELSE 0 END) AS po_num
           |        FROM cells GROUP BY 1),
           |rm AS (SELECT source, lang AS lab, sum(c) AS na FROM cells
           |       GROUP BY 1, 2),
           |cm AS (SELECT source, pred AS lab, sum(c) AS nb FROM cells
           |       GROUP BY 1, 2),
           |pe AS (SELECT rm.source, sum(na * nb) AS pe_num
           |       FROM rm JOIN cm ON cm.source = rm.source
           |         AND cm.lab = rm.lab
           |       GROUP BY 1)
           |SELECT t.source, CAST(t.n AS BIGINT) AS n_docs,
           |  CAST(t.po_num AS BIGINT) AS n_agree,
           |  ${Rounding.duckSql(
              "(t.po_num::DOUBLE / t.n - pe.pe_num::DOUBLE / (t.n * t.n)) " +
                "/ (1.0 - pe.pe_num::DOUBLE / (t.n * t.n))")} AS kappa
           |FROM tot t JOIN pe ON pe.source = t.source
           |ORDER BY t.source""".stripMargin
      })
  )
}
