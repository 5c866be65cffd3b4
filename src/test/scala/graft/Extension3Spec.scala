package graft

import org.apache.spark.sql.functions._

import graft.ext.{Clustering, Packing, Sampling}
import graft.functions.ZOrder
import graft.io.Tables

/** Round-5 second-wave operators: spherical k-means, sequence spans,
  * domain capping, Z-order interleave.
  */
class Extension3Spec extends SparkSpec {

  import spark.implicits._

  // --- Clustering ---------------------------------------------------

  test("kmeans recovers well-separated planted clusters") {
    // three tight groups on orthogonal axes, ids interleaved so the
    // hash-picked init can't rely on ordering
    val vecs = (0 until 30).map { i =>
      val g = i % 3
      val base = Array.fill(8)(0f)
      base(g * 2) = 10f
      base(g * 2 + 1) = (i / 3).toFloat * 0.01f // tiny within-group spread
      (i.toLong, base.toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = Clustering.kmeans(df, "vec_id", "embedding", k = 3, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 30)
    // every planted group maps to exactly one cluster id, all distinct
    val byGroup = (0 until 3).map(g =>
      (0 until 30).filter(_ % 3 == g).map(i => got(i.toLong)).distinct)
    byGroup.foreach(ids => assert(ids.size == 1, s"split planted group: $byGroup"))
    assert(byGroup.flatten.distinct.size == 3)
  }

  test("kmeans is deterministic run-to-run and assigns every vector once") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val a = Clustering.kmeans(e, "vec_id", "embedding", k = 8, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val b = Clustering.kmeans(e, "vec_id", "embedding", k = 8, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(a.sameElements(b))
    assert(a.length == e.count())
    assert(a.map(_._1).distinct.length == a.length)
  }

  test("kmeans survives k > distinct points (empty clusters carry forward)") {
    val df = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(1f, 0.01f)), (3L, Seq(0f, 1f))
    ).toDF("vec_id", "embedding")
    val got = Clustering.kmeans(df, "vec_id", "embedding", k = 8, iters = 3)
      .collect()
    assert(got.length == 3)
    assert(got.map(_.getLong(1)).forall(c => c >= 0 && c < 8))
  }

  test("normQuant: unit norm, float-exact components, zero passthrough") {
    val q = Clustering.normQuant(Seq(3.0, 4.0))
    assert(q.forall(x => x == x.toFloat.toDouble))
    val n = math.sqrt(q.map(x => x * x).sum)
    assert(math.abs(n - 1.0) < 1e-6)
    assert(Clustering.normQuant(Seq(0.0, 0.0)) == Seq(0.0, 0.0))
  }

  // --- Sequence spans ----------------------------------------------

  test("packSequences spans tile each doc and each sequence exactly") {
    val docs = Seq((1L, 100L), (2L, 300L), (3L, 0L), (4L, 56L), (5L, 512L),
      (6L, 1L)).toDF("doc_id", "tokens")
    val spans = Packing.packSequences(docs, "doc_id", "tokens", seqLen = 256)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // zero-token doc emits nothing
    assert(!spans.exists(_._2 == 3L))
    // per doc: spans cover [0, tokens) contiguously in seq order
    val byDoc = spans.groupBy(_._2)
    Map(1L -> 100L, 2L -> 300L, 4L -> 56L, 5L -> 512L, 6L -> 1L).foreach {
      case (id, toks) =>
        val ds = byDoc(id).sortBy(_._1)
        assert(ds.head._3 == 0L && ds.last._4 == toks)
        ds.sliding(2).foreach {
          case Array(a, b) => assert(a._4 == b._3 && b._1 == a._1 + 1)
          case _ =>
        }
    }
    // per sequence: spans tile [0, 256) with no gaps (except the tail)
    val total = 100L + 300L + 0L + 56L + 512L + 1L
    val lastSeq = (total - 1) / 256
    spans.groupBy(_._1).foreach { case (seq, ss) =>
      val sorted = ss.sortBy(_._5)
      assert(sorted.head._5 == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._5 + (a._4 - a._3) == b._5)
        case _ =>
      }
      val filled = sorted.map(s => s._4 - s._3).sum
      if (seq < lastSeq) assert(filled == 256L)
      else assert(filled == total - lastSeq * 256)
    }
  }

  test("packSequences is partition-count invariant") {
    val docs = (1L to 97L).map(i => (i, i * 7 % 301)).toDF("doc_id", "tokens")
    val ref = Packing.packSequences(docs, "doc_id", "tokens", 64, partitions = 1)
      .collect().map(_.toSeq).toSet
    Seq(3, 17).foreach { p =>
      val got = Packing.packSequences(docs, "doc_id", "tokens", 64, partitions = p)
        .collect().map(_.toSeq).toSet
      assert(got == ref, s"partitions=$p diverged")
    }
  }

  // --- Domain capping ----------------------------------------------

  test("capPerGroup caps each group deterministically with a pure-hash rank") {
    val df = (1L to 200L).map(i => (i, s"src${i % 3}")).toDF("id", "src")
    val got = Sampling.capPerGroup(df, "id", "src", "t1", 20)
    val counts = got.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ == 20))
    // survivors are a pure function of (salt, id): re-run identical
    val a = got.select("id").collect().map(_.getLong(0)).sorted
    val b = Sampling.capPerGroup(df, "id", "src", "t1", 20)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
    // a different salt picks a different survivor set
    val c = Sampling.capPerGroup(df, "id", "src", "t2", 20)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(!a.sameElements(c))
    // groups smaller than the cap keep everything
    val small = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "src")
    assert(Sampling.capPerGroup(small, "id", "src", "s", 10).count() == 3)
  }

  // --- Z-order ------------------------------------------------------

  test("interleave16 matches the naive bit-interleave reference") {
    def ref(x: Long, y: Long): Long = {
      var z = 0L
      for (i <- 0 until 16)
        z |= (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      z
    }
    val rnd = new scala.util.Random(11)
    val cases = Seq((0L, 0L), (65535L, 65535L), (1L, 0L), (0L, 1L)) ++
      Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val df = cases.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.interleave16(col("x"), col("y")).as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) == ref(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("stretch16 maps a narrow domain monotonically across the 16-bit range") {
    val vals = (0L to 99L).toDF("v")
      .select(col("v"), ZOrder.stretch16(col("v"), 99L).as("s"))
      .orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1)))
    vals.foreach { case (v, s) => assert(s == v * 65536L / 100L) }
    assert(vals.head._2 == 0L && vals.last._2 == 64880L)
    assert(vals.sliding(2).forall { case Array(a, b) => a._2 < b._2; case _ => true })
  }
}
