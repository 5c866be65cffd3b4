package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{PolyHash, Rounding}
import graft.io.Tables
import graft.ops.Text

/** Round-7 tenth wave: share-of-parent hierarchy rollup, tokenizer
  * vocabulary coverage, and a content-addressed dataset fingerprint.
  * Same contract as every other module: each Spark pipeline pairs with
  * DuckDB oracle SQL replaying it.
  */
object ExtensionQueries16 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q184: share-of-parent hierarchy rollup — revenue by nation with
    // each nation's share of its region and each region's share of the
    // global total: the ratio-to-parent OLAP shape (q11's rollup gives
    // the LEVELS; this gives the level-to-level RATIOS a drill-down UI
    // actually renders). Money runs in the round-7 integer-cents
    // discipline end-to-end: o_totalprice is 2-decimal data, so
    // round(·100) recovers exact LONG cents per order, every sum is
    // associative integer arithmetic, and the only doubles are the two
    // display ratios (identical long→double divisions both engines,
    // stableRound6'd). Scale shape: one orders scan aggregated to the
    // customer key, then the dimension chain joins BROADCAST (nation/
    // region are catalog-sized), nation/region/global totals via two
    // tiny re-aggs — windows only over the 25-row nation frame.
    Q(
      "q184_share_of_parent",
      (s, dir) => {
        val cust = Tables.load(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))
        val nation = Tables.load(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        val region = Tables.load(s, dir, "region")
          .select(col("r_regionkey"), col("r_name"))
        val orders = Tables.load(s, dir, "orders")
          .select(col("o_custkey"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
        val byNation = orders
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(sum("cents").as("cents"))
        val w = Window.partitionBy("r_name")
        val g = Window.partitionBy()
        byNation
          .withColumn("region_cents", sum("cents").over(w))
          .withColumn("global_cents", sum("cents").over(g))
          .select(col("r_name"), col("n_name"),
            (col("cents").cast("double") / 100.0).as("revenue"),
            Rounding.stableRound6(col("cents").cast("double") /
              col("region_cents")).as("share_of_region"),
            Rounding.stableRound6(col("region_cents").cast("double") /
              col("global_cents")).as("region_share_of_global"))
          .orderBy("r_name", "n_name")
      },
      Some(s"""WITH o AS (
             |  SELECT o_custkey,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
             |  FROM orders),
             |bn AS (
             |  SELECT r_name, n_name, sum(cents) AS cents
             |  FROM o
             |  JOIN customer ON c_custkey = o_custkey
             |  JOIN nation ON n_nationkey = c_nationkey
             |  JOIN region ON r_regionkey = n_regionkey
             |  GROUP BY 1, 2),
             |x AS (
             |  SELECT r_name, n_name, cents,
             |    sum(cents) OVER (PARTITION BY r_name) AS region_cents,
             |    sum(cents) OVER () AS global_cents
             |  FROM bn)
             |SELECT r_name, n_name,
             |  cents::DOUBLE / 100.0 AS revenue,
             |  ${Rounding.duckSql("cents::DOUBLE / region_cents")}
             |    AS share_of_region,
             |  ${Rounding.duckSql("region_cents::DOUBLE / global_cents")}
             |    AS region_share_of_global
             |FROM x
             |ORDER BY r_name, n_name""".stripMargin)),

    // ------------------------------------------------------------------
    // q185: tokenizer vocabulary coverage — fix the vocabulary at the
    // corpus's top-10 words (the tokenizer-training outcome at this synthetic corpus's 31-word scale — the budget-to-vocab ratio, not the absolute count, is what the audit measures), then
    // report per source: token coverage rate and OOV type count — the
    // audit that predicts how badly a tokenizer trained on the mix
    // fragments each source (low coverage = long byte-fallback token
    // sequences = wasted context window). Scale shape: one vocab agg +
    // top-k (TakeOrderedAndProject under the limit), the vocab
    // broadcast back across the token stream (q94's discipline), one
    // source agg. The top-10 cut ties by (count DESC, word) so both
    // engines fix the identical vocabulary.
    Q(
      "q185_vocab_coverage",
      (s, dir) => {
        val toks = Tables.load(s, dir, "documents")
          .select(col("source"),
            explode(Text.words(Text.clean(col("text")))).as("w"))
        val vocab = toks.groupBy("w").agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), col("w")).limit(10)
          .select(col("w"), lit(1).as("in_vocab"))
        toks.join(broadcast(vocab), Seq("w"), "left")
          .groupBy("source")
          .agg(count(lit(1)).as("n_tokens"),
            sum(when(col("in_vocab").isNotNull, 1L).otherwise(0L))
              .as("n_covered"),
            countDistinct(when(col("in_vocab").isNull, col("w")))
              .as("oov_types"))
          .select(col("source"), col("n_tokens"), col("n_covered"),
            col("oov_types"),
            Rounding.stableRound6(col("n_covered").cast("double") /
              col("n_tokens")).as("coverage"))
          .orderBy("source")
      },
      Some(s"""WITH toks AS (
             |  SELECT source, unnest(list_filter(string_split(
             |    regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' '),
             |    w -> w <> '')) AS w
             |  FROM documents),
             |vocab AS (
             |  SELECT w FROM (SELECT w, count(*) AS n FROM toks GROUP BY w)
             |  ORDER BY n DESC, w LIMIT 10),
             |j AS (
             |  SELECT t.source, t.w, v.w IS NOT NULL AS cov
             |  FROM toks t LEFT JOIN vocab v ON v.w = t.w)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
             |  CAST(sum(CASE WHEN cov THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_covered,
             |  CAST(count(DISTINCT CASE WHEN NOT cov THEN w END) AS BIGINT)
             |    AS oov_types,
             |  ${Rounding.duckSql(
                  "sum(CASE WHEN cov THEN 1 ELSE 0 END)::DOUBLE / count(*)")}
             |    AS coverage
             |FROM j
             |GROUP BY source
             |ORDER BY source""".stripMargin)),

    // ------------------------------------------------------------------
    // q186: content-addressed dataset fingerprint — an order-
    // independent per-source content hash (sum of per-row PolyHash over
    // a canonical row serialization) plus row count: the version
    // stamp a pipeline records to prove "this run saw exactly that
    // data" without sorting or collecting anything (two snapshots
    // differ iff some row changed — modulo the astronomically unlikely
    // sum collision). Scale shape: a pure shuffle-free row projection
    // + one keyed agg; the sum is associative so partials merge
    // map-side. Row hashes are < 2^30, so a per-source LONG sum is
    // exact below ~2^33 rows per source; past that, shard the sum by a
    // second key and fingerprint the shard vector (documented bound,
    // same contract as Packing's LONG-only prefix sums).
    Q(
      "q186_dataset_fingerprint",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .select(col("source"),
            PolyHash(concat_ws("#", lit("v1"), col("doc_id").cast("string"),
              md5(col("text")), col("lang"))).as("h"))
        d.groupBy("source")
          .agg(count(lit(1)).as("n_rows"), sum("h").as("content_hash"))
          .orderBy("source")
      },
      Some(s"""SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(${PolyHash.duckSql(
                  "'v1' || '#' || doc_id::VARCHAR || '#' || md5(text) " +
                    "|| '#' || lang")}) AS BIGINT) AS content_hash
             |FROM documents
             |GROUP BY source
             |ORDER BY source""".stripMargin))
  )
}
