package graft.queries

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, SimilaritySearch}
import graft.functions.Rounding
import graft.io.Tables
import DriverSide._

/** Round-9 eighth wave: dedup-signal agreement audit (q346 — do the
  * MinHash and winnowing detectors flag the SAME pairs?) and embedding
  * temporal drift (q347 — did the representation move between corpus
  * halves?). Same contract as every other module: each Spark pipeline
  * pairs with DuckDB oracle SQL replaying it.
  */
object ExtensionQueries50 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q346: dedup-signal agreement — the engine ships two independent
    // near-dup detectors (MinHash-banded exact-Jaccard ≥ 0.5, q53's
    // production path; winnowed-fingerprint sharing ≥ 2, q208's MOSS
    // selection). Before trusting either alone, measure their PAIR-SET
    // agreement: |A|, |B|, |A∩B|, and the pair-set Jaccard. Divergence
    // localizes each signal's blind spot (MinHash misses short shared
    // spans below the shingle floor; winnowing fires on any shared
    // ≥ w+k−1 = 8-word run even in long distinct docs). Both pair
    // frames come from banded/posting joins — never all-pairs; the
    // comparison itself is two tiny set ops.
    Q(
      "q346_dedup_signal_agreement",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val mh = Dedup.nearDupPairs(docs, "text", "doc_id", 0.5)
          .select("da", "db")
        val fps = Dedup.winnowedFingerprints(docs, "text", "doc_id",
            k = 5, w = 4)
          .select("doc_id", "h").distinct()
        val wn = fps.toDF("da", "h")
          .join(fps.toDF("db", "h"), "h")
          .where(col("da") < col("db"))
          .groupBy("da", "db")
          .agg(count(lit(1)).as("shared"))
          .where(col("shared") >= 2)
          .select("da", "db")
        val both = mh.join(wn, Seq("da", "db")).select("da", "db")
        val nA = mh.agg(count(lit(1)).as("n_minhash"))
        val nB = wn.agg(count(lit(1)).as("n_winnow"))
        val nI = both.agg(count(lit(1)).as("n_both"))
        nA.crossJoin(nB).crossJoin(nI)
          .select(col("n_minhash").cast("long").as("n_minhash"),
            col("n_winnow").cast("long").as("n_winnow"),
            col("n_both").cast("long").as("n_both"),
            Rounding.stableRound6(when(
              col("n_minhash") + col("n_winnow") - col("n_both") > 0,
              col("n_both").cast("double") /
                (col("n_minhash") + col("n_winnow") - col("n_both"))
                  .cast("double")).otherwise(0.0)).as("pair_jaccard"))
      },
      Some {
        val gram5 = (1 to 5).map(j => s"arr[i+$j]").mkString(" || ' ' || ")
        val C = 1L << 20
        s"""WITH mh AS MATERIALIZED (
           |${ExtensionQueries.nearDupPairsOracleAt(0.5)}
           |),
           |wtoks AS (
           |  SELECT doc_id,
           |    list_filter(string_split(text, ' '), t -> t <> '') AS arr
           |  FROM documents),
           |grams AS (
           |  SELECT doc_id, i AS pos,
           |    ${graft.functions.PolyHash.duckSql(gram5)} AS h
           |  FROM (SELECT doc_id, arr, unnest(range(len(arr) - 4)) AS i
           |        FROM wtoks WHERE len(arr) >= 5)),
           |keys AS (
           |  SELECT doc_id, pos, h * $C + (${C - 1} - pos) AS key,
           |    count(*) OVER (PARTITION BY doc_id) AS n
           |  FROM grams),
           |sel AS (
           |  SELECT DISTINCT doc_id, sel // $C AS h
           |  FROM (
           |    SELECT doc_id, pos, n,
           |      min(key) OVER (PARTITION BY doc_id ORDER BY pos
           |        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel
           |    FROM keys)
           |  WHERE pos <= n - 4),
           |wn AS MATERIALIZED (
           |  SELECT a.doc_id AS da, b.doc_id AS db
           |  FROM sel a JOIN sel b ON b.h = a.h AND a.doc_id < b.doc_id
           |  GROUP BY a.doc_id, b.doc_id
           |  HAVING count(*) >= 2),
           |mhp AS (SELECT da, db FROM mh),
           |bothp AS (SELECT da, db FROM mhp INTERSECT
           |          SELECT da, db FROM wn),
           |c AS (
           |  SELECT (SELECT count(*) FROM mhp) AS na,
           |    (SELECT count(*) FROM wn) AS nb,
           |    (SELECT count(*) FROM bothp) AS ni)
           |SELECT CAST(na AS BIGINT) AS n_minhash,
           |  CAST(nb AS BIGINT) AS n_winnow,
           |  CAST(ni AS BIGINT) AS n_both,
           |  ${Rounding.duckSql(
                "CASE WHEN na + nb - ni > 0 THEN " +
                  "ni::DOUBLE / (na + nb - ni)::DOUBLE ELSE 0.0 END")}
           |    AS pair_jaccard
           |FROM c""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q347: embedding temporal drift — split the corpus at the vec_id
    // midpoint ("early" vs "late" ingest) and measure, per label, how
    // far the class centroid MOVED: drift = 1 − cos(c_early, c_late).
    // The q143/q277/q278 drift family watches scalar distributions;
    // this is the embedding-space version a retraining/reindexing
    // decision needs (an IVF index built on early centroids degrades
    // exactly when this number grows — the q189/q316 recall-audit
    // story, measured at its cause). Centroid dims snap to the 1e-6
    // REAL grid before the cosine (q123/q301 discipline), so both
    // engines score byte-identical vectors; the per-era frames are one
    // 64-aggregate pass each.
    Q(
      "q347_embedding_drift",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val dim = SimilaritySearch.deriveDim(e, "embedding")
        val mm = e.agg(min("vec_id").as("mn"), max("vec_id").as("mx"))
          .head()
        val mid = (mm.getLong(0) + mm.getLong(1)) / 2
        val avgs = (0 until dim).map(i =>
          avg(element_at(col("embedding"), i + 1)).as(s"c_$i"))
        def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
        def cents(df: org.apache.spark.sql.DataFrame)
            : Map[Int, (Long, Array[Double])] =
          df.groupBy("label")
            .agg(count(lit(1)).as("n"), avgs: _*)
            .collectBounded("label centroids")
            .map { r =>
              r.getInt(0) -> ((r.getLong(1), (0 until dim)
                .map(i => r6(r.getDouble(i + 2)).toFloat.toDouble)
                .toArray))
            }.toMap
        val early = cents(e.where(col("vec_id") <= mid))
        val late = cents(e.where(col("vec_id") > mid))
        def cos(a: Array[Double], b: Array[Double]): Double = {
          var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < a.length) {
            d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
          }
          d / (math.sqrt(na) * math.sqrt(nb))
        }
        import s.implicits._
        early.keySet.intersect(late.keySet).toSeq.sorted.map { l =>
          (l, early(l)._1, late(l)._1,
            r6(1.0 - r6(cos(early(l)._2, late(l)._2))))
        }.toDF("label", "n_early", "n_late", "drift")
          .select(col("label").cast("int").as("label"),
            col("n_early"), col("n_late"), col("drift"))
          .orderBy("label")
      },
      Some {
        val meanList = (1 to Tables.EmbeddingDim)
          .map(j => "CAST(CAST(floor(avg(v[" + j + "]) * 1000000 + 0.5)" +
            " / 1000000 AS REAL) AS DOUBLE)")
          .mkString("[", ", ", "]")
        s"""WITH e AS (
           |  SELECT vec_id, label, embedding::DOUBLE[] AS v
           |  FROM embeddings),
           |mid AS (SELECT (min(vec_id) + max(vec_id)) // 2 AS m FROM e),
           |ce AS (
           |  SELECT label, count(*) AS n, $meanList AS cv
           |  FROM e, mid WHERE vec_id <= m GROUP BY label),
           |cl AS (
           |  SELECT label, count(*) AS n, $meanList AS cv
           |  FROM e, mid WHERE vec_id > m GROUP BY label)
           |SELECT ce.label, CAST(ce.n AS BIGINT) AS n_early,
           |  CAST(cl.n AS BIGINT) AS n_late,
           |  ${Rounding.duckSql(
                "1.0 - floor(list_cosine_similarity(ce.cv, cl.cv) " +
                  "* 1000000 + 0.5) / 1000000")} AS drift
           |FROM ce JOIN cl ON cl.label = ce.label
           |ORDER BY ce.label""".stripMargin
      }))
}
