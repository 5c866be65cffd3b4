package graft.queries

import org.apache.spark.sql.functions._

import graft.ext.Sampling
import graft.functions.Rounding
import graft.io.Tables
import graft.ops.Text

/** Round-7 sixteenth wave: referential-integrity audit and the
  * end-to-end training-data manifest (the capstone composition). Same
  * contract as every other module: each Spark pipeline pairs with
  * DuckDB oracle SQL replaying it.
  */
object ExtensionQueries22 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q199: referential-integrity audit — for each foreign-key edge of
    // the star (orders→customer, lineitem→orders), how many child rows
    // are ORPHANS (no parent): the ingest-time DQ gate that catches a
    // partial parent load before every downstream join silently drops
    // rows (inner joins don't warn — q182's deletion sweep is this
    // audit's mirror image). One LEFT ANTI join per edge (carries no
    // payload), counts unioned; exact-integer rates against the child
    // row counts.
    Q(
      "q199_referential_audit",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val cust = Tables.load(s, dir, "customer").select("c_custkey")
        val orders = Tables.load(s, dir, "orders")
        val line = Tables.load(s, dir, "lineitem")
        def audit(edge: String, child: org.apache.spark.sql.DataFrame,
                  childTotal: org.apache.spark.sql.DataFrame) =
          child.agg(count(lit(1)).as("n_orphans"))
            .crossJoin(childTotal.agg(count(lit(1)).as("n_child")))
            .select(lit(edge).as("edge"), col("n_child"), col("n_orphans"),
              Rounding.stableRound6(col("n_orphans").cast("double") /
                col("n_child")).as("orphan_rate"))
        audit("lineitem->orders",
            line.join(orders.select("o_orderkey"),
              col("l_orderkey") === col("o_orderkey"), "left_anti"), line)
          .unionAll(audit("orders->customer",
            orders.join(cust, col("o_custkey") === col("c_custkey"),
              "left_anti"), orders))
          .orderBy("edge")
      },
      Some(s"""WITH lo AS (
             |  SELECT count(*) AS n FROM lineitem
             |  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
             |oc AS (
             |  SELECT count(*) AS n FROM orders
             |  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
             |lt AS (SELECT count(*) AS n FROM lineitem),
             |ot AS (SELECT count(*) AS n FROM orders)
             |SELECT 'lineitem->orders' AS edge,
             |  CAST(lt.n AS BIGINT) AS n_child,
             |  CAST(lo.n AS BIGINT) AS n_orphans,
             |  ${Rounding.duckSql("lo.n::DOUBLE / lt.n")} AS orphan_rate
             |FROM lo CROSS JOIN lt
             |UNION ALL
             |SELECT 'orders->customer', CAST(ot.n AS BIGINT),
             |  CAST(oc.n AS BIGINT),
             |  ${Rounding.duckSql("oc.n::DOUBLE / ot.n")}
             |FROM oc CROSS JOIN ot
             |ORDER BY edge""".stripMargin)),

    // ------------------------------------------------------------------
    // q200: the training-data manifest — every curation signal this
    // engine computes, composed into the per-document decision table a
    // training run actually consumes: leakage-safe split (q166's
    // canonical-id bucketing), exact-dup flag (q43's rule, keep the
    // min-id copy), benchmark contamination (q156's gram overlap ≥ 0.2
    // in exact integers), quality score (q170's distinct-token ratio),
    // and the final KEEP decision (in-split ∧ not dup ∧ not
    // contaminated ∧ quality ≥ 0.5). This is the capstone claim: the
    // signals aren't demos, they compose into one materialized
    // manifest with every rule engine-exact. Scale shape: each signal
    // keeps its own documented shape (fp agg + join back; per-doc
    // DISTINCT grams + gram-keyed semi join; shuffle-free scoring);
    // they meet on the doc_id key — joins a 100-TB corpus shards by
    // id with no new shuffle class.
    Q(
      "q200_training_manifest",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .where(col("doc_id") % 25 =!= 0)
          .select(col("doc_id"), col("source"),
            md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))))
              .as("fp"),
            size(Text.words(Text.clean(col("text")))).cast("long").as("n_tok"),
            Rounding.stableRound6(
              size(array_distinct(Text.words(Text.clean(col("text")))))
                .cast("double") /
                size(Text.words(Text.clean(col("text"))))).as("quality"))
        val canon = d.groupBy("fp").agg(min("doc_id").as("canonical_id"))
        val withSplit = Sampling.hashSplit(d.join(canon, "fp"),
          "canonical_id", "leak42",
          Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
          .withColumn("is_dup", col("doc_id") =!= col("canonical_id"))
        val toks = Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            expr("filter(split(text, ' '), w -> w <> '')").as("ws"))
        val grams = toks.where(size(col("ws")) >= 5)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(ws) - 4), " +
              "i -> concat_ws(' ', slice(ws, i, 5)))")).as("g"))
          .distinct()
          .localCheckpoint()
        val bench = grams.where(col("doc_id") % 25 === 0)
          .select("g").distinct()
        val corpus = grams.where(col("doc_id") % 25 =!= 0)
        val contam = corpus.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
          .join(corpus.join(bench, Seq("g"), "left_semi")
            .groupBy("doc_id").agg(count(lit(1)).as("n_hits")),
            Seq("doc_id"), "left")
          .select(col("doc_id"),
            (coalesce(col("n_hits"), lit(0L)) * 5L >= col("n_grams"))
              .as("is_contam"))
        withSplit.join(contam, Seq("doc_id"), "left")
          .withColumn("is_contam", coalesce(col("is_contam"), lit(false)))
          .withColumn("kept",
            col("split") === "train" && !col("is_dup") &&
              !col("is_contam") && col("quality") >= 0.5)
          .select(col("doc_id"), col("source"), col("split"),
            col("is_dup"), col("is_contam"), col("quality"),
            col("n_tok"), col("kept"))
          .orderBy("doc_id")
      },
      Some(s"""WITH d AS (
             |  SELECT doc_id, source,
             |    md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
             |    len(list_filter(string_split(
             |      regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' '),
             |      w -> w <> ''))::BIGINT AS n_tok,
             |    ${Rounding.duckSql(
                  "len(list_distinct(list_filter(string_split(regexp_replace(" +
                    "text, '[^a-zA-Z0-9 ]', '', 'g'), ' '), w -> w <> '')))" +
                    "::DOUBLE / len(list_filter(string_split(regexp_replace(" +
                    "text, '[^a-zA-Z0-9 ]', '', 'g'), ' '), w -> w <> ''))")}
             |      AS quality
             |  FROM documents WHERE doc_id % 25 <> 0),
             |canon AS (SELECT fp, min(doc_id) AS canonical_id FROM d
             |          GROUP BY fp),
             |ws AS (
             |  SELECT d.*, c.canonical_id,
             |    ${Sampling.bucketDuckSql("leak42", "c.canonical_id")} AS b
             |  FROM d JOIN canon c USING (fp)),
             |toks AS (
             |  SELECT doc_id, list_filter(string_split(text, ' '),
             |    w -> w <> '') AS ws FROM documents),
             |grams AS (
             |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+4], ' ') AS g
             |  FROM toks, UNNEST(generate_series(1, greatest(len(ws) - 4, 0)))
             |    AS t(i)),
             |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 25 = 0),
             |corpus AS (SELECT * FROM grams WHERE doc_id % 25 <> 0),
             |contam AS (
             |  SELECT t.doc_id,
             |    coalesce(h.n_hits, 0) * 5 >= t.n_grams AS is_contam
             |  FROM (SELECT doc_id, count(*) AS n_grams FROM corpus
             |        GROUP BY 1) t
             |  LEFT JOIN (SELECT doc_id, count(*) AS n_hits FROM corpus
             |             WHERE g IN (SELECT g FROM bench) GROUP BY 1) h
             |    ON h.doc_id = t.doc_id)
             |SELECT w.doc_id, w.source,
             |  CASE WHEN b < 8000 THEN 'train'
             |       WHEN b < 9000 THEN 'val' ELSE 'test' END AS split,
             |  w.doc_id <> w.canonical_id AS is_dup,
             |  coalesce(ct.is_contam, false) AS is_contam,
             |  w.quality, w.n_tok,
             |  CASE WHEN b < 8000 THEN 'train'
             |       WHEN b < 9000 THEN 'val' ELSE 'test' END = 'train'
             |    AND w.doc_id = w.canonical_id
             |    AND NOT coalesce(ct.is_contam, false)
             |    AND w.quality >= 0.5 AS kept
             |FROM ws w LEFT JOIN contam ct ON ct.doc_id = w.doc_id
             |ORDER BY w.doc_id""".stripMargin))
  )
}
