package graft.queries

import org.apache.spark.sql.functions._

import graft.ext.Multimodal
import graft.functions.PolyHash
import graft.io.Tables

/** Round-8 seventh continuation wave: perceptual-hash media near-dup
  * (q291) — the multimodal member of the dedup family. Same contract
  * as every other module: the Spark pipeline pairs with DuckDB oracle
  * SQL replaying it.
  */
object ExtensionQueries32 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q291: perceptual-hash near-dup over DECODED media — the image
    // analogue of SimHash (q46): a 64-bit average hash from real
    // ImageIO-decoded pixels (Multimodal.aHash64 — integer-only block
    // means, so the generation-parameter ground truth replays it
    // exactly), bucketed by four 16-bit hamming-LSH bands and verified
    // by popcount ≤ 3 — the SAME banded-candidates + bounded-verify
    // shape the text dedup pipeline uses (q53), so the 100 TB cost is
    // band equi-joins, never pairwise image comparison. Two legs, the
    // q62 discipline: (a) the golden 36-image corpus (12 pattern
    // groups × 3 one-block-edit variants; expected hashes from the
    // generation parameters, independent of the PNG round-trip under
    // test), and (b) every sf-dir document as an undecodable binary
    // payload exercising the at-scale decode-fallback path — its
    // checksum-spread stub hash (Multimodal.stubHash64) is
    // SQL-expressible, so leg (b)'s banding is replayed too instead of
    // dropped.
    Q(
      "q291_phash_neardup",
      (s, dir) => {
        implicit val sp = s
        import s.implicits._
        val offset = 10000000L
        val golden = s.createDataset(Multimodal.syntheticPhashCorpus()
            .map { case (r, _, _) =>
              Multimodal.MediaRecord(r.doc_id + offset, r.content)
            })
          .repartition(4)
        val docs = Multimodal
          .withBinaryContent(Tables.load(s, dir, "documents"))
          .select(col("doc_id"), col("content"))
          .as[Multimodal.MediaRecord]
        val hashed = Multimodal.aHashImages(golden.union(docs)).toDF()
          .localCheckpoint() // decode once; bands + verify both read it
        val bands = hashed
          .withColumn("band",
            explode(array(lit(0), lit(1), lit(2), lit(3))))
          .withColumn("bkey",
            expr("shiftright(ahash, band * 16) & 65535"))
        val a = bands.select(col("doc_id").as("da"), col("ahash").as("ha"),
          col("band"), col("bkey"))
        val b = bands.select(col("doc_id").as("db"), col("ahash").as("hb"),
          col("band"), col("bkey"))
        a.join(b, Seq("band", "bkey")).where(col("da") < col("db"))
          .select("da", "db", "ha", "hb").distinct()
          .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
          .where(col("hamming") <= 3)
          .select(col("da"), col("db"), col("hamming"))
          .orderBy("da", "db")
      },
      Some {
        val goldenRows = Multimodal.syntheticPhashCorpus()
          .map { case (r, h, _) => s"(${r.doc_id + 10000000L}, ${h}::BIGINT)" }
          .mkString(",\n             |    ")
        s"""WITH golden AS (
           |  SELECT * FROM (VALUES
           |    $goldenRows)
           |  AS t(doc_id, ahash)),
           |docs AS (
           |  SELECT doc_id,
           |    xor(c << 32, (c * c) % 1000000007) AS ahash
           |  FROM (SELECT doc_id, ${PolyHash.duckSql("text")} AS c
           |        FROM documents)),
           |hashed AS (
           |  SELECT doc_id, ahash FROM golden
           |  UNION ALL SELECT doc_id, ahash FROM docs),
           |bands AS (
           |  SELECT doc_id, ahash, b AS band,
           |    (ahash >> (b * 16)) & 65535 AS bkey
           |  FROM hashed, (SELECT unnest(range(4)) AS b)),
           |cand AS (
           |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
           |    a.ahash AS ha, b.ahash AS hb
           |  FROM bands a JOIN bands b
           |    ON a.band = b.band AND a.bkey = b.bkey
           |   AND a.doc_id < b.doc_id)
           |SELECT da, db,
           |  CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
           |FROM cand
           |WHERE bit_count(xor(ha, hb)) <= 3
           |ORDER BY da, db""".stripMargin
      })
  )
}
