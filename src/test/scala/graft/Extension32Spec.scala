package graft

import graft.ext.Multimodal
import graft.queries.ExtensionQueries32

/** Semantics tests for q291: the PNG encode→decode→aHash round-trip
  * must reproduce the generation-parameter hashes bit-for-bit, the
  * corpus must keep its in-group/cross-group hamming separation, and
  * the stub hash must spread across all four LSH bands.
  */
class Extension32Spec extends SparkSpec {

  test("q291: decoded aHash == generation-parameter hash for all 36") {
    implicit val sp = spark
    import spark.implicits._
    val corpus = Multimodal.syntheticPhashCorpus()
    val expected = corpus.map { case (r, h, _) => r.doc_id -> h }.toMap
    val got = Multimodal
      .aHashImages(spark.createDataset(corpus.map(_._1)).repartition(3))
      .collect().map(ih => ih.doc_id -> ih.ahash).toMap
    assert(got.size == 36)
    for ((id, h) <- expected)
      assert(got(id) == h,
        s"doc $id: decoded hash ${got(id)} != expected $h")
  }

  test("q291: in-group hamming <= 2, cross-group >= 18") {
    val hs = Multimodal.syntheticPhashCorpus()
      .map { case (r, h, g) => (r.doc_id, h, g) }
    for (i <- hs.indices; j <- (i + 1) until hs.length) {
      val (_, h1, g1) = hs(i)
      val (_, h2, g2) = hs(j)
      val d = java.lang.Long.bitCount(h1 ^ h2)
      if (g1 == g2) assert(d <= 2, s"in-group hamming $d")
      else assert(d >= 18, s"cross-group hamming $d between $g1 and $g2")
    }
  }

  test("q291: stub hash spreads over all four 16-bit bands") {
    val bytes = "some plain ascii document text".getBytes("UTF-8")
    val h = Multimodal.stubHash64(bytes)
    val bands = (0 until 4).map(b => (h >> (b * 16)) & 0xffffL)
    assert(bands.count(_ != 0L) >= 3,
      s"stub hash $h leaves bands empty: $bands")
  }

  test("q291: registered query emits the 36 golden pairs at sf0.001") {
    val got = ExtensionQueries32.queries
      .find(_.name == "q291_phash_neardup").get.fn(spark, sf0001)
      .collect()
    assert(got.length == 36)
    // every pair is in-group: ids are (g*3+v)+1e7, so da/3 == db/3
    for (r <- got) {
      val da = r.getLong(0) - 10000000L
      val db = r.getLong(1) - 10000000L
      assert(da / 3 == db / 3, s"cross-group pair $da-$db reported")
      assert(r.getLong(2) <= 2)
    }
  }
}
