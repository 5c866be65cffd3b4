package graft.queries

import org.apache.spark.sql.functions._

import graft.ext.TextAnalysis
import graft.functions.{Rounding, VectorFunctions}
import graft.io.Tables

/** Round-7 wave: cluster-bounded semantic dedup (the SemDeDup prune
  * stage), benchmark n-gram contamination scoring, and a label-quality
  * audit (recorded language vs predicted). Same contract as every other
  * module: each Spark pipeline pairs with DuckDB oracle SQL replaying it.
  */
object ExtensionQueries7 {

  private def inList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("(", ", ", ")")

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q155: cluster-bounded semantic dedup — the SemDeDup prune rule
    // (Abbas et al. 2023): within an embedding cluster, drop every
    // vector that has a LOWER-id cluster-mate at cosine ≥ τ (keep-first
    // is the deterministic survivor rule; the paper keeps one arbitrary
    // member per semantic-dup set). The clustering stage is the engine's
    // own q95/q123 k-means; this gate runs the prune against the given
    // cluster column. THE scale property is the clustering bound: pairs
    // are enumerated within a cluster only — corpus² becomes
    // Σ cluster_size², the same band-then-verify discipline as every
    // dedup op here (a corpus-wide pairwise cosine is never formed; a
    // pathological giant cluster is the k-means tuning knob, and q47's
    // LSH near-dup is the in-cluster fallback at that point). Cosine +
    // stableRound6 is the q47-pinned bit-identical pairing, so the τ
    // comparison is engine-exact.
    Q(
      "q155_semdedup",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val a = e.select(col("label").as("la"), col("vec_id").as("da"),
          col("embedding").as("va"))
        val b = e.select(col("label").as("lb"), col("vec_id").as("db"),
          col("embedding").as("vb"))
        val dropped = a
          .join(b, col("la") === col("lb") && col("db") < col("da"))
          .where(Rounding.stableRound6(
            VectorFunctions.cosineSim(col("va"), col("vb"))) >= 0.3)
          .select(col("da").as("vec_id")).distinct()
        e.join(dropped, Seq("vec_id"), "left_anti")
          .select(col("vec_id"), col("label").cast("long").as("cluster"))
          .orderBy("vec_id")
      },
      Some("""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
             |           FROM embeddings),
             |drp AS (
             |  SELECT DISTINCT a.vec_id
             |  FROM e a JOIN e b ON a.label = b.label AND b.vec_id < a.vec_id
             |  WHERE floor(list_cosine_similarity(a.v, b.v) * 1000000 + 0.5)
             |          / 1000000 >= 0.3)
             |SELECT vec_id, CAST(label AS BIGINT) AS cluster FROM e
             |WHERE vec_id NOT IN (SELECT vec_id FROM drp)
             |ORDER BY vec_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q156: benchmark n-gram contamination scoring — for every corpus
    // document, the fraction of its distinct word 5-grams that appear in
    // a benchmark set (docs with doc_id % 25 = 0 stand in for the eval
    // suite). This is the PARTIAL-overlap complement of q78/q92's exact
    // decontamination: exact match catches verbatim copies, the overlap
    // ratio catches paraphrased/embedded benchmark text (the GPT-3
    // 13-gram and PaLM n-gram-fraction protocols). Scale shape: grams
    // explode ×L per doc but are per-doc DISTINCT before any join; the
    // probe is one equi-join keyed on the gram string (shuffle scales
    // with corpus grams, never pairwise); the benchmark side is
    // eval-suite-sized — small, but NOT force-broadcast (AQE decides,
    // q126's lesson). Docs with <5 tokens have no grams and are absent
    // by construction in both engines (Spark's sequence() would count
    // DOWN from 1 to size-4<1 — the size filter is a correctness guard,
    // not an optimization).
    Q(
      "q156_ngram_overlap",
      (s, dir) => {
        val toks = Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            expr("filter(split(text, ' '), w -> w <> '')").as("ws"))
        val grams = toks
          .where(size(col("ws")) >= 5)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(ws) - 4), " +
              "i -> concat_ws(' ', slice(ws, i, 5)))")).as("g"))
          .distinct()
          .localCheckpoint() // 3 consumers: bench set, totals, hit counts
        val bench = grams.where(col("doc_id") % 25 === 0)
          .select("g").distinct()
        val corpus = grams.where(col("doc_id") % 25 =!= 0)
        val tot = corpus.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
        val hits = corpus.join(bench, Seq("g"), "left_semi")
          .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
        tot.join(hits, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_grams"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"))
          .select(col("doc_id"), col("n_grams"), col("n_hits"),
            Rounding.stableRound6(
              col("n_hits").cast("double") / col("n_grams")).as("overlap"))
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (
             |  SELECT doc_id, list_filter(string_split(text, ' '),
             |    w -> w <> '') AS ws FROM documents),
             |grams AS (
             |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+4], ' ') AS g
             |  FROM toks, UNNEST(generate_series(1, greatest(len(ws) - 4, 0)))
             |    AS t(i)),
             |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 25 = 0),
             |corpus AS (SELECT * FROM grams WHERE doc_id % 25 <> 0),
             |tot AS (SELECT doc_id, count(*) AS n_grams FROM corpus GROUP BY 1),
             |hits AS (SELECT doc_id, count(*) AS n_hits FROM corpus
             |         WHERE g IN (SELECT g FROM bench) GROUP BY 1)
             |SELECT t.doc_id, CAST(t.n_grams AS BIGINT) AS n_grams,
             |  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
             |  ${Rounding.duckSql("coalesce(h.n_hits, 0)::DOUBLE / t.n_grams")}
             |    AS overlap
             |FROM tot t LEFT JOIN hits h ON h.doc_id = t.doc_id
             |ORDER BY t.doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q157: label-quality audit — recorded `lang` column vs the q41
    // language-ID prediction, agreement rate per source (the standard
    // "is this metadata trustworthy per provenance" check that gates
    // whether a pipeline can filter on a recorded label at all; zh has
    // no marker set, so zh-heavy sources floor the rate — exactly the
    // kind of systematic label/predictor mismatch the audit exists to
    // surface). One corpus scan: the langId expression is a codegen'd
    // shuffle-free projection (q41's machinery), then one keyed count
    // per source. n_agree/n_docs is an exact-integer ratio — identical
    // division both engines, stableRound6 belt-and-braces.
    Q(
      "q157_lang_agreement",
      (s, dir) => {
        Tables.load(s, dir, "documents")
          .select(col("source"), col("lang"),
            TextAnalysis.langId(col("text")).as("pred"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("pred") === col("lang"), 1L).otherwise(0L))
              .as("n_agree"))
          .select(col("source"), col("n_docs"), col("n_agree"),
            Rounding.stableRound6(
              col("n_agree").cast("double") / col("n_docs")).as("agree_rate"))
          .orderBy("source")
      },
      Some {
        val scoreSelects = TextAnalysis.Markers.map { case (l, ms) =>
          s"len(list_filter(toks, t -> t IN ${inList(ms)}))::BIGINT AS s_$l"
        }.mkString(",\n             |    ")
        val langs = TextAnalysis.Markers.map(_._1)
        val best = s"greatest(${langs.map("s_" + _).mkString(", ")})"
        val cases = langs.map(l => s"WHEN s_$l = $best THEN '$l'").mkString(" ")
        s"""WITH pred AS (
           |  SELECT source, lang,
           |    CASE WHEN $best = 0 THEN 'unknown' $cases ELSE 'unknown' END
           |      AS pred
           |  FROM (
           |    SELECT source, lang,
           |    $scoreSelects
           |  FROM (SELECT source, lang,
           |          regexp_extract_all(lower(text), '\\S+') AS toks
           |        FROM documents)))
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(CASE WHEN pred = lang THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_agree,
           |  ${Rounding.duckSql(
                "sum(CASE WHEN pred = lang THEN 1 ELSE 0 END)::DOUBLE / count(*)")}
           |    AS agree_rate
           |FROM pred
           |GROUP BY source
           |ORDER BY source""".stripMargin
      })
  )
}
