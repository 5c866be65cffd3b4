package graft.queries

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Ranking, TextAnalysis}
import graft.functions.{PolyHash, Rounding}
import graft.io.Tables

/** Round-9 sixth wave: duplication-shape diagnostics (q338 cluster-size
  * distribution), token-density quality signal (q339), chunk-embedding
  * mean-pooling (q340 — the doc-vector construction every long-doc
  * retrieval pipeline runs before indexing), and a zone-map pruning
  * audit (q341 — quantifies what a sort layout actually buys the
  * scan). Same contract as every other module: each Spark pipeline
  * pairs with DuckDB oracle SQL replaying it.
  */
object ExtensionQueries48 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q338: near-dup cluster size distribution — q59's clusters
    // (MinHash candidates → exact-Jaccard pairs → min-label
    // components) summarized by SIZE: how many clusters of 2, of 3, …
    // and what share of the corpus sits in duplicated content. The
    // shape is what decides dedup policy (a few mega-clusters →
    // boilerplate/syndication, many pairs → true near-dups); q159's
    // per-source dup rate says WHO duplicates, this says HOW. Cluster
    // frame is doc-count bounded; the histogram is size-domain sized.
    Q(
      "q338_cluster_size_distribution",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val pairs = Dedup.nearDupPairs(docs, "text", "doc_id", 0.5)
          .select("da", "db")
        val labels = Dedup.canonicalize(pairs)
        val sizes = labels.groupBy("label")
          .agg(count(lit(1)).as("sz"))
        val nDocs = docs.select(count(lit(1)).as("n_docs"))
        sizes.groupBy("sz")
          .agg(count(lit(1)).as("n_clusters"))
          .crossJoin(broadcast(nDocs))
          .select(col("sz").cast("long").as("cluster_size"),
            col("n_clusters").cast("long").as("n_clusters"),
            (col("sz") * col("n_clusters")).cast("long").as("n_docs_in"),
            Rounding.stableRound6(
              (col("sz") * col("n_clusters")).cast("double") /
                col("n_docs").cast("double")).as("doc_share"))
          .orderBy("cluster_size")
      },
      Some(s"""WITH RECURSIVE pairs AS (
             |${ExtensionQueries.NearDupPairsOracle}
             |),
             |edges AS (SELECT da AS s, db AS d FROM pairs
             |          UNION ALL SELECT db, da FROM pairs),
             |walk(id, lab) AS (
             |  SELECT s, s FROM edges
             |  UNION
             |  SELECT e.s, w.lab FROM edges e JOIN walk w ON w.id = e.d),
             |labels AS (SELECT id, min(lab) AS label FROM walk GROUP BY id),
             |sizes AS (SELECT label, count(*) AS sz FROM labels
             |          GROUP BY label),
             |nd AS (SELECT count(*) AS n_docs FROM documents)
             |SELECT CAST(sz AS BIGINT) AS cluster_size,
             |  CAST(count(*) AS BIGINT) AS n_clusters,
             |  CAST(sz * count(*) AS BIGINT) AS n_docs_in,
             |  ${Rounding.duckSql(
                  "(sz * count(*))::DOUBLE / any_value(nd.n_docs)::DOUBLE")}
             |    AS doc_share
             |FROM sizes CROSS JOIN nd
             |GROUP BY sz
             |ORDER BY cluster_size""".stripMargin)),

    // ------------------------------------------------------------------
    // q339: token density (BPE tokens per UTF-8 byte) per (source,
    // lang) — the cheap compression-proxy quality signal: natural
    // prose sits in a narrow density band, while boilerplate, tables,
    // and non-text junk fall outside it. Flags cells more than 25%
    // away from their LANGUAGE's mean density (languages tokenize
    // differently — compare within, not across). Everything from two
    // exact LONG sums per cell; the lang-mean join is a 5-row
    // broadcast.
    Q(
      "q339_token_density",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .select(col("source"), col("lang"),
            size(TextAnalysis.bpeTokens(col("text"))).cast("long")
              .as("toks"),
            octet_length(col("text")).cast("long").as("bytes"))
        val cells = d.groupBy("source", "lang")
          .agg(count(lit(1)).as("n_docs"), sum("toks").as("st"),
            sum("bytes").as("sb"))
        val langMean = cells.groupBy("lang")
          .agg(sum("st").as("lt"), sum("sb").as("lb"))
        cells.join(broadcast(langMean), "lang")
          .select(col("source"), col("lang"),
            col("n_docs").cast("long").as("n_docs"),
            Rounding.stableRound6(col("st").cast("double") /
              col("sb").cast("double")).as("density"),
            Rounding.stableRound6((col("st").cast("double") /
              col("sb").cast("double")) /
              (col("lt").cast("double") / col("lb").cast("double")))
              .as("vs_lang"),
            (abs(col("st").cast("double") / col("sb").cast("double") /
              (col("lt").cast("double") / col("lb").cast("double")) -
              1.0) > 0.25).as("outlier"))
          .orderBy("source", "lang")
      },
      Some(s"""WITH d AS (
             |  SELECT source, lang,
             |    len(regexp_extract_all(text,
             |      '${TextAnalysis.BpePattern}'))::BIGINT AS toks,
             |    octet_length(encode(text))::BIGINT AS bytes
             |  FROM documents),
             |cells AS (
             |  SELECT source, lang, count(*) AS n_docs,
             |    CAST(sum(toks) AS BIGINT) AS st,
             |    CAST(sum(bytes) AS BIGINT) AS sb
             |  FROM d GROUP BY source, lang),
             |lm AS (
             |  SELECT lang, CAST(sum(st) AS BIGINT) AS lt,
             |    CAST(sum(sb) AS BIGINT) AS lb
             |  FROM cells GROUP BY lang)
             |SELECT c.source, c.lang, CAST(c.n_docs AS BIGINT) AS n_docs,
             |  ${Rounding.duckSql("c.st::DOUBLE / c.sb::DOUBLE")}
             |    AS density,
             |  ${Rounding.duckSql(
                  "(c.st::DOUBLE / c.sb::DOUBLE) / " +
                    "(lm.lt::DOUBLE / lm.lb::DOUBLE)")} AS vs_lang,
             |  abs(c.st::DOUBLE / c.sb::DOUBLE /
             |    (lm.lt::DOUBLE / lm.lb::DOUBLE) - 1.0) > 0.25 AS outlier
             |FROM cells c JOIN lm ON lm.lang = c.lang
             |ORDER BY c.source, c.lang""".stripMargin)),

    // ------------------------------------------------------------------
    // q340: chunk-embedding mean pooling — the long-document vector
    // construction: q83's sliding chunks each get an embedding (here a
    // deterministic 8-dim hash projection standing in for the model
    // call — components are PolyHash(chunk#dim) mapped to
    // [-1000, 1000] INTEGERS, so per-dim pooling sums are EXACT LONGs
    // and the mean is one double division), mean-pooled per doc. Dims
    // emit as 8 scalar columns (array cells are unsortable in the
    // gate's pandas canonicalization — the q112 rule). Scale:
    // explode-to-chunks → shuffle-free projection → one doc-keyed agg;
    // the pooled table is exactly what q47/q207 would index.
    Q(
      "q340_chunk_mean_pooling",
      (s, dir) => {
        val chunks = TextAnalysis.chunkTokens(
          Tables.load(s, dir, "documents"), "text", "doc_id",
          chunkSize = 50, stride = 25)
        val comps = (0 until 8).map(j =>
          (pmod(PolyHash(concat_ws("#", col("chunk_text"), lit(j))),
            lit(2001L)) - lit(1000L)).as(s"c$j"))
        val projected = chunks.select(
          (col("doc_id") +: comps): _*)
        val aggs = (0 until 8).map(j => sum(s"c$j").as(s"s$j"))
        val pooled = projected.groupBy("doc_id")
          .agg(count(lit(1)).as("n_chunks"), aggs: _*)
        val dims = (0 until 8).map(j =>
          Rounding.stableRound6(col(s"s$j").cast("double") /
            col("n_chunks").cast("double") / 1000.0).as(s"d$j"))
        pooled.select(
            (col("doc_id") +: col("n_chunks").cast("long").as("n_chunks")
              +: dims): _*)
          .orderBy("doc_id")
      },
      Some {
        val comps = (0 until 8).map(j =>
          s"(${PolyHash.duckSql(s"chunk_text || '#' || '$j'")}) % 2001" +
            s" - 1000 AS c$j").mkString(",\n             |    ")
        val sums = (0 until 8).map(j =>
          s"CAST(sum(c$j) AS BIGINT) AS s$j")
          .mkString(",\n             |    ")
        val dims = (0 until 8).map(j =>
          s"${Rounding.duckSql(
            s"s$j::DOUBLE / n_chunks::DOUBLE / 1000.0")} AS d$j")
          .mkString(",\n             |  ")
        s"""WITH chunks AS (
           |  SELECT doc_id,
           |    array_to_string(list_slice(arr, s + 1, least(s + 50, n)),
           |      ' ') AS chunk_text
           |  FROM (
           |    SELECT doc_id, arr, len(arr) AS n,
           |      unnest(range(0, len(arr), 25)) AS s
           |    FROM (SELECT doc_id,
           |            list_filter(string_split(text, ' '), w -> w <> '')
           |              AS arr
           |          FROM documents)
           |    WHERE len(arr) > 0)),
           |proj AS (
           |  SELECT doc_id,
           |    $comps
           |  FROM chunks),
           |pooled AS (
           |  SELECT doc_id, count(*) AS n_chunks,
           |    $sums
           |  FROM proj GROUP BY doc_id)
           |SELECT doc_id, CAST(n_chunks AS BIGINT) AS n_chunks,
           |  $dims
           |FROM pooled
           |ORDER BY doc_id""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q341: zone-map pruning audit — what does a sort layout actually
    // buy the scan? Model the table as 64 equal-row "files" in two
    // layouts (natural l_orderkey order vs l_shipdate-sorted), compute
    // each file's (min, max) l_shipdate zone map, and count how many
    // files 8 fixed probe dates would touch. Shipdate-sorted should
    // prune to ~1 file per probe; natural order touches nearly all —
    // the measured gap IS the case for sort-on-write (q101 Z-order /
    // q307 Hilbert generalize it to multi-column). File assignment
    // uses the two-pass global rank (corpus-scale shuffle discipline —
    // never a single-partition window); rows tied on the full sort
    // tuple are interchangeable, so zone stats are placement-invariant.
    Q(
      "q341_zonemap_pruning",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
            col("l_suppkey"),
            col("l_shipdate").cast("date").cast("string").as("sd"))
        val probes = Seq("1995-06-15", "1996-03-01", "1997-01-10",
          "1997-09-20", "1998-07-04", "1999-05-30", "2000-02-14",
          "2001-08-01")
        def layout(name: String,
                   sortCols: Seq[org.apache.spark.sql.Column]) = {
          val (ranked, n) = Ranking.withGlobalRankAndCount(li, sortCols)
          val zones = ranked
            .withColumn("f",
              expr(s"(global_rank - 1) * 64 DIV ${n}L"))
            .groupBy("f")
            .agg(min("sd").as("lo"), max("sd").as("hi"))
          val touched = probes.map(p =>
            sum(when(lit(p) >= col("lo") && lit(p) <= col("hi"), 1L)
              .otherwise(0L))).reduce(_ + _)
          zones.agg((touched.cast("double") / probes.size)
            .as("avg_files_touched"))
            .select(lit(name).as("layout"),
              Rounding.stableRound6(col("avg_files_touched"))
                .as("avg_files_touched"))
        }
        layout("natural", Seq(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey"), col("sd")))
          .unionAll(layout("shipdate_sorted", Seq(col("sd"),
            col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
            col("l_suppkey"))))
          .orderBy("layout")
      },
      Some {
        val probes = Seq("1995-06-15", "1996-03-01", "1997-01-10",
          "1997-09-20", "1998-07-04", "1999-05-30", "2000-02-14",
          "2001-08-01")
        val touch = probes.map(p =>
          s"sum(CASE WHEN '$p' >= lo AND '$p' <= hi THEN 1 ELSE 0 END)")
          .mkString(" + ")
        def one(name: String, order: String) =
          s"""SELECT '$name' AS layout,
             |  ${Rounding.duckSql(s"($touch)::DOUBLE / ${probes.size}")}
             |    AS avg_files_touched
             |FROM (
             |  SELECT f, min(sd) AS lo, max(sd) AS hi
             |  FROM (
             |    SELECT sd,
             |      (row_number() OVER (ORDER BY $order) - 1) * 64
             |        // (SELECT count(*) FROM li) AS f
             |    FROM li)
             |  GROUP BY f)"""
        s"""WITH li AS (
           |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           |    strftime(l_shipdate, '%Y-%m-%d') AS sd
           |  FROM lineitem)
           |${one("natural",
              "l_orderkey, l_linenumber, l_partkey, l_suppkey, sd")}
           |UNION ALL
           |${one("shipdate_sorted",
              "sd, l_orderkey, l_linenumber, l_partkey, l_suppkey")}
           |ORDER BY layout""".stripMargin
      }))
}
