package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.Text

/** Round-7 seventh wave: output partition-layout planning (the
  * small-files report) and a curation impact report composing the
  * dedup + contamination signals. Same contract as every other module:
  * each Spark pipeline pairs with DuckDB oracle SQL replaying it.
  */
object ExtensionQueries13 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q175: partition-layout planner — before a hive-partitioned write
    // BY (lang, source), report each cell's doc count and byte volume,
    // the file count at a target file size, and a skew flag (cell > 4×
    // the mean cell): the numbers that decide whether the layout ships
    // or needs a salt/coalesce first. The small-files problem this
    // prevents is THE chronic operational failure of partitioned lakes
    // (10⁵ cells × KB-sized files kill the name node and the scan
    // planner at 100 TB). Scale shape: one keyed agg over the corpus,
    // then window stats over the CELL frame (partition-cardinality
    // rows, not data rows). File counts use exact integer ceiling
    // arithmetic — no float division anywhere.
    Q(
      "q175_partition_planner",
      (s, dir) => {
        val target = 4096L
        val cells = Tables.load(s, dir, "documents")
          .groupBy("lang", "source")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("bytes"))
        val w = Window.partitionBy()
        cells
          .withColumn("total_cells", count(lit(1)).over(w))
          .withColumn("total_bytes", sum("bytes").over(w))
          .select(col("lang"), col("source"), col("n_docs"), col("bytes"),
            ((col("bytes") + target - 1L) - pmod(col("bytes") + target - 1L,
              lit(target))).divide(target).cast("long").as("n_files"),
            (col("bytes") * col("total_cells") > col("total_bytes") * 4L)
              .as("skewed"))
          .orderBy("lang", "source")
      },
      Some("""WITH cells AS (
             |  SELECT lang, source, count(*) AS n_docs,
             |    sum(n_chars) AS bytes
             |  FROM documents GROUP BY 1, 2),
             |tot AS (SELECT count(*) AS total_cells, sum(bytes) AS total_bytes
             |        FROM cells)
             |SELECT lang, source, CAST(n_docs AS BIGINT) AS n_docs,
             |  CAST(bytes AS BIGINT) AS bytes,
             |  CAST((bytes + 4095) // 4096 AS BIGINT) AS n_files,
             |  bytes * total_cells > total_bytes * 4 AS skewed
             |FROM cells CROSS JOIN tot
             |ORDER BY lang, source""".stripMargin)),

    // ------------------------------------------------------------------
    // q176: curation impact report — what would removing (a) redundant
    // exact duplicates (q43's fingerprint rule, keep the min-id copy)
    // and (b) benchmark-contaminated documents (q156's 5-gram overlap
    // ≥ 0.2 against the doc_id % 25 = 0 benchmark set) actually cost,
    // per source, in documents and TOKENS? This is the go/no-go table
    // a curation change ships with: composed signals, counted once
    // each and as a union (a doc can be both), against the token
    // budget. Scale shape: the fp side is one agg + join back on the
    // fp key; the contamination side is q156's per-doc-distinct gram
    // pipeline; flags meet the corpus through doc_id-keyed joins; one
    // final source agg. All-integer outputs — nothing to round.
    Q(
      "q176_curation_impact",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .where(col("doc_id") % 25 =!= 0) // the benchmark set is not training data
          .select(col("doc_id"), col("source"),
            md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))))
              .as("fp"),
            size(Text.words(Text.clean(col("text")))).cast("long").as("n_tok"))
        val canon = d.groupBy("fp").agg(min("doc_id").as("keep_id"))
        val dupFlag = d.join(canon, "fp")
          .select(col("doc_id"), (col("doc_id") =!= col("keep_id")).as("is_dup"))
        val toks = Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            expr("filter(split(text, ' '), w -> w <> '')").as("ws"))
        val grams = toks.where(size(col("ws")) >= 5)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(ws) - 4), " +
              "i -> concat_ws(' ', slice(ws, i, 5)))")).as("g"))
          .distinct()
          .localCheckpoint() // consumed by the benchmark set and the probe
        val bench = grams.where(col("doc_id") % 25 === 0)
          .select("g").distinct()
        val corpus = grams.where(col("doc_id") % 25 =!= 0)
        val contam = corpus.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
          .join(corpus.join(bench, Seq("g"), "left_semi")
            .groupBy("doc_id").agg(count(lit(1)).as("n_hits")),
            Seq("doc_id"), "left")
          .select(col("doc_id"),
            (coalesce(col("n_hits"), lit(0L)) * 5L >= col("n_grams"))
              .as("is_contam")) // hits/grams >= 0.2 in exact integers
        d.join(dupFlag, "doc_id")
          .join(contam, Seq("doc_id"), "left")
          .withColumn("is_contam", coalesce(col("is_contam"), lit(false)))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tok").as("tokens_before"),
            sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup"),
            sum(when(col("is_contam"), 1L).otherwise(0L)).as("n_contam"),
            sum(when(col("is_dup") || col("is_contam"), 1L).otherwise(0L))
              .as("n_removed"),
            sum(when(!(col("is_dup") || col("is_contam")), col("n_tok"))
              .otherwise(0L)).as("tokens_after"))
          .orderBy("source")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, source,
             |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
             |    len(list_filter(string_split(
             |      regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' '),
             |      w -> w <> ''))::BIGINT AS n_tok
             |  FROM documents WHERE doc_id % 25 <> 0),
             |canon AS (SELECT fp, min(doc_id) AS keep_id FROM d GROUP BY fp),
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
             |    ON h.doc_id = t.doc_id),
             |flags AS (
             |  SELECT d.doc_id, d.source, d.n_tok,
             |    d.doc_id <> c.keep_id AS is_dup,
             |    coalesce(ct.is_contam, false) AS is_contam
             |  FROM d JOIN canon c USING (fp)
             |  LEFT JOIN contam ct ON ct.doc_id = d.doc_id)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_tok) AS BIGINT) AS tokens_before,
             |  CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_dup,
             |  CAST(sum(CASE WHEN is_contam THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_contam,
             |  CAST(sum(CASE WHEN is_dup OR is_contam THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_removed,
             |  CAST(sum(CASE WHEN NOT (is_dup OR is_contam) THEN n_tok
             |    ELSE 0 END) AS BIGINT) AS tokens_after
             |FROM flags
             |GROUP BY source
             |ORDER BY source""".stripMargin))
  )
}
