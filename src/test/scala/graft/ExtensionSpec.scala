package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Multimodal, Sampling, SimilaritySearch}
import graft.functions.{PolyHash, VectorFunctions}
import graft.io.Tables

/** Extension-op tests on synthetic frames with *known* structure (the
  * fixture corpus has no exact dups, so the interesting dedup paths need
  * constructed inputs) plus fixture-backed property checks.
  */
class ExtensionSpec extends SparkSpec {

  import spark.implicits._

  test("exact dedup groups identical normalized texts") {
    val df = Seq(
      (1L, "Hello  World"),
      (2L, "hello world"), // same after normalize
      (3L, "different doc"),
      (4L, "HELLO   WORLD ") // same after normalize
    ).toDF("doc_id", "text")
    val got = Dedup.exact(df, "text", "doc_id")
      .select("doc_id", "canonical_id", "group_size", "is_canonical")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(got == Set((1L, 1L, 3L, true), (2L, 1L, 3L, false),
      (4L, 1L, 3L, false), (3L, 3L, 1L, true)))
  }

  test("PolyHash matches its JVM spec and is order-sensitive") {
    val got = Seq("abc", "cba", "", "a b").toDF("s")
      .select(PolyHash(col("s"))).collect().map(_.getLong(0)).toSeq
    assert(got == Seq("abc", "cba", "", "a b").map(PolyHash.hash))
    assert(PolyHash.hash("abc") == ((('a' * 31L + 'b') * 31L + 'c') % PolyHash.Mod))
    assert(PolyHash.hash("abc") != PolyHash.hash("cba"))
  }

  test("cosineSim: identity, orthogonality, zero-norm guard") {
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f), 1.0),
      (Array(1f, 0f), Array(0f, 1f), 0.0),
      (Array(0f, 0f), Array(1f, 1f), 0.0), // zero-norm → 0.0, not NaN
      (Array(3f, 4f), Array(3f, 4f), 1.0)
    ).toDF("a", "b", "want")
    val rows = df.select(VectorFunctions.cosineSim(col("a"), col("b")), col("want"))
      .collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("minhash LSH candidates find the planted near-dup pairs") {
    val base = (0 until 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (0 until 40).map(i => if (i == 7) "CHANGED" else s"tok$i").mkString(" ")
    val others = (0 until 20).map { d =>
      (10L + d, (0 until 40).map(i => s"w${d}_$i").mkString(" "))
    }
    val df = (Seq((1L, base), (2L, nearDup)) ++ others).toDF("doc_id", "text")
    val cand = Dedup.minhashCandidates(df, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 2L)), s"planted pair missing from $cand")
    // unrelated random docs share no shingles — no false candidates
    assert(cand == Set((1L, 2L)))
    val verified = Dedup.nearDupPairs(df, "text", "doc_id", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(verified.toSeq == Seq((1L, 2L)))
  }

  test("exact dedup is idempotent (SURVEY §5.3)") {
    val df = Seq(
      (1L, "same text"), (2L, "same text"), (3L, "same  TEXT"),
      (4L, "other"), (5L, "OTHER ")).toDF("doc_id", "text")
    val once = Dedup.exact(df, "text", "doc_id")
    val survivors = df.join(
      once.where(col("is_canonical")).select("doc_id"), "doc_id")
    val twice = Dedup.exact(survivors, "text", "doc_id")
      .select("doc_id", "canonical_id", "group_size", "is_canonical")
      .collect()
    // every survivor is its own canonical in a singleton group
    assert(twice.forall(r => r.getLong(0) == r.getLong(1)
      && r.getLong(2) == 1L && r.getBoolean(3)))
    assert(twice.length == 2) // {1,2,3} -> 1; {4,5} -> 4
  }

  test("simhash: near-dups land at small hamming distance") {
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val base = (0 until 60).map(i => s"tok$i").mkString(" ")
    val near = (0 until 60).map(i => if (i % 29 == 0) "CHANGED" else s"tok$i").mkString(" ")
    val far = (0 until 60).map(i => s"zzz$i").mkString(" ")
    val sh = Dedup.simhash16(Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text"),
        "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hamming(sh(1L), sh(2L)) < hamming(sh(1L), sh(3L)))
    assert(hamming(sh(1L), sh(2L)) <= 4)
  }

  test("LSH top-k results are a subset of brute-force ordering (recall property)") {
    val e = Tables.load(spark, sf0001, "embeddings")
    val q = e.filter(col("vec_id") < 10)
    val brute = SimilaritySearch.bruteTopK(q, e, 50)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = SimilaritySearch.lshTopK(q, e, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(lsh.nonEmpty)
    // every LSH hit in the top-5 must appear in the brute top-50 pool OR
    // be a true neighbor the bucket kept; weaker invariant: no duplicates,
    // ranks contiguous from 1 per query
    val byQuery = SimilaritySearch.lshTopK(q, e, 5)
      .collect().groupBy(_.getLong(0))
    byQuery.foreach { case (_, rows) =>
      val ranks = rows.map(_.getInt(1)).sorted.toSeq
      assert(ranks == (1 to ranks.size))
    }
    // sanity overlap: bucketed search should recover some true top neighbors
    assert(lsh.count(brute.contains) > 0)
  }

  test("bucketed embedding near-dup is a subset of brute, and finds planted dups") {
    val e = Tables.load(spark, sf0001, "embeddings")
    val brute = Dedup.embeddingNearDupBrute(e, "embedding", "vec_id", 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = Dedup.embeddingNearDup(e, "embedding", "vec_id", 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed.subsetOf(brute),
      s"LSH emitted pairs brute rejects: ${bucketed -- brute}")
    // identical vectors collide in every table — recall 1 on true dups
    val planted = e.filter(col("vec_id") < 3) // limit(3) has no order guarantee
      .select(col("vec_id") + 10000, col("embedding"))
      .toDF("vec_id", "embedding").union(e.select("vec_id", "embedding"))
    val got = Dedup.embeddingNearDup(planted, "embedding", "vec_id", 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((0 until 3).forall(i => got.contains((i.toLong, i + 10000L))), s"missing planted dup in $got")
  }

  test("lshTopK derives plane dimension from the corpus (non-64-dim)") {
    val dim = 16
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 200L).map(i =>
      (i, Array.fill(dim)(rnd.nextFloat() - 0.5f))).toDF("vec_id", "embedding")
    val res = SimilaritySearch.lshTopK(vecs.filter(col("vec_id") < 4), vecs, 5)
      .collect()
    assert(res.nonEmpty)
    res.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length))
    }
    // a 16-dim corpus must not bucket on a 64-dim plane prefix: buckets
    // computed at the native dim give identical results to explicit dim
    val explicitDim = SimilaritySearch.lshTopK(
      vecs.filter(col("vec_id") < 4), vecs, 5, dim = dim)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(res.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet == explicitDim)
  }

  test("multimodal: decode stub preserves batch semantics and determinism") {
    implicit val s = spark
    val docs = Tables.load(spark, sf0001, "documents").limit(50)
    val media = Multimodal.withBinaryContent(docs)
      .select(col("doc_id"), col("content"))
      .as[Multimodal.MediaRecord]
    val meta1 = Multimodal.decodeImageStub(media).collect().sortBy(_.doc_id)
    val meta2 = Multimodal.decodeImageStub(media.repartition(7)).collect().sortBy(_.doc_id)
    assert(meta1.toSeq == meta2.toSeq) // partitioning-invariant
    assert(meta1.forall(m => m.width >= 1 && m.width <= 640 && m.n_bytes > 0))
    val frames = Multimodal.sampleFramesStub(media, 4).collect()
    assert(frames.forall(f => f.frames.map(_.length).sum == meta1
      .find(_.doc_id == f.doc_id).get.n_bytes))
  }

  test("histogram quantile sketch lands within one binWidth of the exact quantile") {
    val li = Tables.load(spark, sf0001, "lineitem")
    val width = 100.0
    val got = graft.ext.Sketches
      .histogramQuantiles(spark, li, "l_extendedprice", width, Seq(0.5, 0.9, 0.99))
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    val exact = li.stat.approxQuantile("l_extendedprice",
      Array(0.5, 0.9, 0.99), 0.0) // relativeError 0 → exact
    Seq(0.5, 0.9, 0.99).zip(exact).foreach { case (q, ex) =>
      assert(math.abs(got(q) - ex) <= width,
        s"q=$q sketch ${got(q)} vs exact $ex exceeds binWidth")
    }
  }

  test("canonicalize: min-label connected components, multi-hop chains converge") {
    // chain 1-2-3-4-5-6 (diameter 5, forces several propagation rounds)
    // + separate pair {10,11} + triangle {20,21,22}
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)
    ).toDF("da", "db")
    val labels = Dedup.canonicalize(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 6L).foreach(i => assert(labels(i) == 1L, s"node $i → ${labels(i)}"))
    assert(labels(10L) == 10L && labels(11L) == 10L)
    Seq(20L, 21L, 22L).foreach(i => assert(labels(i) == 20L))
    // a 100-node chain needs 99 plain-propagation rounds — pointer
    // halving must converge it within the default maxIter (O(log d))
    val chain = (100L until 199L).map(i => (i, i + 1)).toDF("da", "db")
    val chainLabels = Dedup.canonicalize(chain, maxIter = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (100L to 199L).foreach(i => assert(chainLabels(i) == 100L, s"chain $i → ${chainLabels(i)}"))
  }

  test("canonicalizeGrouped: per-group labels identical to per-group canonicalize runs") {
    // r14 optimization coverage: the grouped loop (one iterative pass
    // for all groups, keys widened by the group columns) must label
    // each group EXACTLY as an independent canonicalize over that
    // group's edges — including a group whose edge set is a strict
    // subset of another's (the q345 threshold-sweep shape) and a
    // group key that isolates an otherwise-shared component.
    val grouped = Seq(
      // group 0.5: chain 1-2-3-4 + pair {10,11}
      (0.5, 1L, 2L), (0.5, 2L, 3L), (0.5, 3L, 4L), (0.5, 10L, 11L),
      // group 0.7: subset — only the chain's tail survives
      (0.7, 3L, 4L),
      // group 0.9: disjoint pair that shares NODE IDS with group 0.5's
      // chain — propagation must not cross the group boundary
      (0.9, 1L, 4L)
    ).toDF("threshold", "da", "db")
    val got = Dedup.canonicalizeGrouped(grouped, Seq("threshold"))
      .collect()
      .map(r => (r.getDouble(0), r.getLong(1)) -> r.getLong(2)).toMap
    Seq(0.5, 0.7, 0.9).foreach { t =>
      val expect = Dedup.canonicalize(
          grouped.where(col("threshold") === t).select("da", "db"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      expect.foreach { case (id, lab) =>
        assert(got((t, id)) == lab,
          s"group $t node $id: grouped ${got((t, id))} vs solo $lab")
      }
      // no extra nodes invented for the group
      assert(got.keys.count(_._1 == t) == expect.size, s"group $t size")
    }
    // group isolation explicitly: 1 and 4 are connected in group 0.5
    // and in group 0.9, but group 0.7 must NOT link them
    assert(got((0.5, 1L)) == got((0.5, 4L)))
    assert(got((0.9, 1L)) == got((0.9, 4L)))
    assert(got((0.7, 4L)) == 3L) // only {3,4} exists at 0.7
    assert(!got.contains((0.7, 1L)))
  }

  test("hashSplit: stable under corpus growth, fractions hold, sampling deterministic") {
    val docs = Tables.load(spark, sf0001, "documents")
    val fr = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val full = Sampling.hashSplit(docs, "doc_id", "split42", fr)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val n = full.size
    val trainN = full.values.count(_ == "train")
    assert(math.abs(trainN.toDouble / n - 0.8) < 0.06, s"train fraction ${trainN.toDouble / n}")
    // growth stability: the assignment of a doc must not depend on what
    // else is in the corpus
    val subset = Sampling.hashSplit(docs.limit(100), "doc_id", "split42", fr)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    subset.foreach { case (id, s) => assert(full(id) == s, s"doc $id moved split") }
    // independent salt → different draw; same salt → identical sample
    val s1 = Sampling.hashSample(docs, "doc_id", "eval1", 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.hashSample(docs, "doc_id", "eval1", 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2)
    assert(math.abs(s1.size.toDouble / n - 0.25) < 0.07, s"sample fraction ${s1.size.toDouble / n}")
    val other = Sampling.hashSample(docs, "doc_id", "eval2", 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(other != s1)
  }

  test("hashSampleBy keeps per-stratum fractions, drops unlisted strata") {
    val events = Tables.load(spark, sf0001, "events")
    val fr = Map("purchase" -> 1.0, "click" -> 0.5)
    val kept = Sampling.hashSampleBy(events, "event_id", "mixT", "event_type", fr)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = events.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("purchase") == totals("purchase")) // fraction 1.0 keeps all
    val clickFrac = kept("click").toDouble / totals("click")
    assert(math.abs(clickFrac - 0.5) < 0.12, s"click fraction $clickFrac")
    assert(!kept.contains("view") && !kept.contains("error")) // unlisted → dropped
  }

  test("banded range join == naive range join, including band boundaries") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val points = Seq(
      (1L, ts("2024-01-01 00:00:00")), // == w_start of A: included
      (2L, ts("2024-01-01 00:29:59")),
      (3L, ts("2024-01-01 00:30:00")), // == w_end of A: excluded
      (4L, ts("2024-01-01 01:15:00")), // inside B (spans 3 bands)
      (5L, ts("2024-01-01 02:29:59")), // last µs-ish of B
      (6L, ts("2024-01-01 02:30:00")), // == w_end of B: excluded
      (7L, ts("2023-12-31 23:59:59"))  // before everything
    ).toDF("event_id", "ts")
    val intervals = Seq(
      (100L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:30:00")), // A: one band
      (200L, ts("2024-01-01 01:00:00"), ts("2024-01-01 02:30:00"))  // B: three bands
    ).toDF("w_id", "w_start", "w_end")
    val banded = graft.ops.RangeJoin.pointInInterval(
        points, intervals, "ts", "w_start", "w_end", bandSeconds = 1800L)
      .select("w_id", "event_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.crossJoin(intervals)
      .where(col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .select("w_id", "event_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == naive)
    assert(banded == Set((100L, 1L), (100L, 2L), (200L, 4L), (200L, 5L)))
    // degenerate (end <= start) and reversed intervals match nothing —
    // and must not band-explode into a descending sequence
    val degenerate = Seq(
      (300L, ts("2024-01-01 01:00:00"), ts("2024-01-01 01:00:00")),
      (400L, ts("2024-01-01 02:00:00"), ts("2024-01-01 00:00:00"))
    ).toDF("w_id", "w_start", "w_end")
    val got = graft.ops.RangeJoin.pointInInterval(
        points, degenerate, "ts", "w_start", "w_end", bandSeconds = 1800L)
    assert(got.count() == 0)
  }

  test("banded range join == naive on random interval sets (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[T](g: Gen[T], seed: Long): T =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def tsOf(sec: Long) = new java.sql.Timestamp(base + sec * 1000)
    val secGen = Gen.choose(0L, 86400L)
    (1L to 5L).foreach { seed =>
      val pts = sample(Gen.listOfN(120, secGen), seed).zipWithIndex
        .map { case (s, i) => (i.toLong, tsOf(s)) }.toDF("event_id", "ts")
      val ints = sample(Gen.listOfN(25, Gen.zip(secGen, Gen.choose(-600L, 7200L))), seed + 100)
        .zipWithIndex
        .map { case ((s, len), i) => (i.toLong, tsOf(s), tsOf(s + len)) }
        .toDF("w_id", "w_start", "w_end") // ~8% reversed/degenerate by construction
      val banded = graft.ops.RangeJoin.pointInInterval(
          pts, ints, "ts", "w_start", "w_end", bandSeconds = 900L)
        .select("w_id", "event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val naive = pts.crossJoin(ints)
        .where(col("ts") >= col("w_start") && col("ts") < col("w_end"))
        .select("w_id", "event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(banded == naive, s"seed $seed: banded ${banded.size} vs naive ${naive.size}")
    }
  }

  test("intervalOverlap == naive overlap join on random interval sets (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[T](g: Gen[T], seed: Long): T =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def tsOf(sec: Long) = new java.sql.Timestamp(base + sec * 1000)
    val secGen = Gen.choose(0L, 86400L)
    (1L to 5L).foreach { seed =>
      // ~8% reversed/degenerate intervals on each side by construction —
      // they must match nothing and must not band-explode
      val lens = Gen.zip(secGen, Gen.choose(-600L, 7200L))
      val l = sample(Gen.listOfN(30, lens), seed).zipWithIndex
        .map { case ((s, len), i) => (i.toLong, tsOf(s), tsOf(s + len)) }
        .toDF("l_id", "l_start", "l_end")
      val r = sample(Gen.listOfN(40, lens), seed + 100).zipWithIndex
        .map { case ((s, len), i) => (i.toLong, tsOf(s), tsOf(s + len)) }
        .toDF("r_id", "r_start", "r_end")
      val banded = graft.ops.RangeJoin.intervalOverlap(
          l, r, "l_start", "l_end", "r_start", "r_end", bandSeconds = 900L)
        .select("l_id", "r_id").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      val naive = l.crossJoin(r)
        .where(col("l_start") < col("r_end") && col("r_start") < col("l_end")
          && col("l_end") > col("l_start") && col("r_end") > col("r_start"))
        .select("l_id", "r_id").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(banded == naive, s"seed $seed: banded ${banded.size} vs naive ${naive.size}")
      // per-row band dedup means each overlapping pair appears EXACTLY once
      val rows = graft.ops.RangeJoin.intervalOverlap(
          l, r, "l_start", "l_end", "r_start", "r_end", bandSeconds = 900L)
        .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1)))
      assert(rows.length == rows.toSet.size, s"seed $seed: duplicate pairs emitted")
    }
  }

  test("range joins are exact at microsecond band boundaries") {
    // r03 review find: double epoch seconds carry ~0.24µs of rounding
    // near present-day epochs, so an interval end within 1µs of a band
    // boundary could land in the wrong band and silently drop a pair.
    // Bands are now computed in exact integer µs; pin the boundary cases.
    val bandSec = 1800L
    val boundary = 1700002800L // exact multiple of 1800 near 1.7e9
    def ts(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(us / 1000)
      t.setNanos(((us % 1000000) * 1000).toInt)
      t
    }
    val bUs = boundary * 1000000L
    // left ends 1µs past the boundary: overlap region is [boundary, +1µs)
    val l = Seq((1L, ts(bUs - 100000000L), ts(bUs + 1L)))
      .toDF("l_id", "l_start", "l_end")
    val r = Seq((2L, ts(bUs), ts(bUs + 600000000L)))
      .toDF("r_id", "r_start", "r_end")
    val overlap = graft.ops.RangeJoin.intervalOverlap(
        l, r, "l_start", "l_end", "r_start", "r_end", bandSec)
      .select("l_id", "r_id").collect()
    assert(overlap.length == 1, s"µs-boundary overlap pair dropped: ${overlap.toSeq}")
    // point exactly at the boundary joins an interval ending there? No —
    // end is exclusive; but a point 1µs before must match
    val pts = Seq((10L, ts(bUs - 1L)), (11L, ts(bUs))).toDF("p_id", "p_ts")
    val ints = Seq((20L, ts(bUs - 3600000000L), ts(bUs)))
      .toDF("w_id", "w_start", "w_end")
    val got = graft.ops.RangeJoin.pointInInterval(
        pts, ints, "p_ts", "w_start", "w_end", bandSec)
      .select("p_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(10L), s"exclusive-end µs semantics broken: $got")
  }

  test("nearDupJoin finds planted cross-table dups, emits only true-Jaccard pairs") {
    val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val rnd = new scala.util.Random(7)
    def doc(): String = Array.fill(30)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val corpus = (0L until 40L).map(i => (i, doc()))
    // planted: 10 incoming docs that are exact copies of corpus docs 0-9
    // (identical MinHash signature -> certain LSH candidate -> recall 1),
    // plus 10 fresh incoming docs
    val incoming = (0L until 10L).map(i => (100L + i, corpus(i.toInt)._2)) ++
      (10L until 20L).map(i => (100L + i, doc()))
    val got = Dedup.nearDupJoin(
        incoming.toDF("doc_id", "text"), corpus.toDF("doc_id", "text"),
        "text", "doc_id", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val gotPairs = got.map(p => (p._1, p._2)).toSet
    (0L until 10L).foreach { i =>
      assert(gotPairs.contains((100L + i, i)), s"missing planted pair ${100 + i} -> $i")
    }
    // soundness: every emitted pair must pass the exact cross-table
    // Jaccard (brute) — the banded join may only shrink the pair space
    val brute = {
      val a = incoming.toDF("doc_id", "text")
        .select(col("doc_id").as("da"), Dedup.shingleHashes(col("text")).as("ha"))
      val b = corpus.toDF("doc_id", "text")
        .select(col("doc_id").as("db"), Dedup.shingleHashes(col("text")).as("hb"))
      a.crossJoin(b)
        .withColumn("inter", size(array_intersect(col("ha"), col("hb"))))
        .withColumn("j", col("inter").cast("double")
          / (size(col("ha")) + size(col("hb")) - col("inter")))
        .where(col("j") >= 0.5)
        .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(gotPairs.subsetOf(brute), s"false positives: ${gotPairs -- brute}")
  }

  test("sequence packing == single-window formulation, partition-count invariant") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(5)
    val d = (0L until 500L).map(i => (i, 1L + rnd.nextInt(400)))
      .toDF("doc_id", "toks")
    val naive = d.withColumn("start_token",
        coalesce(sum("toks").over(Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("toks").as("tokens"), col("start_token"),
        (col("start_token") / 2048L).cast("long").as("bin"))
      .collect().map(_.toSeq).toSet
    Seq(1, 5, 32).foreach { p =>
      val got = graft.ext.Packing.packBins(d, "doc_id", "toks", 2048L, partitions = p)
        .collect().map(_.toSeq).toSet
      assert(got == naive, s"partitions=$p diverges from the window formulation")
    }
    // bins are contiguous from 0 and every bin except possibly the last
    // begins before the capacity boundary of the previous one ends
    val bins = graft.ext.Packing.packBins(d, "doc_id", "toks", 2048L)
      .select("bin").distinct().collect().map(_.getLong(0)).sorted
    assert(bins.head == 0L && bins.sameElements(bins.head to bins.last))
  }

  test("multimodal: decodeImage reads real PNG/BMP bytes, falls back on junk") {
    implicit val s = spark
    def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xff8800) // non-trivial pixel so encoders emit data
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, out)
      out.toByteArray
    }
    val recs = Seq(
      Multimodal.MediaRecord(1L, imageBytes("png", 17, 9)),
      Multimodal.MediaRecord(2L, imageBytes("bmp", 5, 23)),
      Multimodal.MediaRecord(3L, "not an image".getBytes("UTF-8"))).toDS()
    val meta = Multimodal.decodeImage(recs).collect().map(m => m.doc_id -> m).toMap
    assert(meta(1L).width == 17 && meta(1L).height == 9 && meta(1L).channels == 3)
    assert(meta(2L).width == 5 && meta(2L).height == 23)
    // undecodable payload → deterministic stub fallback, job survives
    val junkLen = "not an image".getBytes("UTF-8").length
    assert(meta(3L).width == 1 + junkLen % 640 && meta(3L).n_bytes == junkLen)
  }

  test("ANN recall floor: lshTopK and ivfTopK recover >=90% of planted near-dup pairs") {
    // The subset-of-brute properties above are vacuously true for an
    // operator returning zero candidates (round-2 verdict item 5); this
    // pins recall quantitatively. 100 planted partners at cos ~ 0.9999
    // of their base vector: each query's true nearest neighbor is its
    // base, so top-5 must contain it.
    val rnd = new scala.util.Random(42)
    val dim = 64
    val base = (0L until 200L).map(i => (i, Array.fill(dim)(rnd.nextFloat() - 0.5f)))
    val planted = base.take(100).map { case (i, v) =>
      (1000L + i, v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.005f))
    }
    val corpus = (base ++ planted).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") >= 1000L)
    def recallOf(res: org.apache.spark.sql.DataFrame): Double = {
      val hits = res.collect()
        .map(r => (r.getLong(0), r.getLong(2)))
        .count { case (q, n) => n == q - 1000L }
      hits / 100.0
    }
    val lshRecall = recallOf(SimilaritySearch.lshTopK(queries, corpus, 5))
    assert(lshRecall >= 0.9, s"lshTopK planted-pair recall $lshRecall < 0.9")
    val ivfRecall = recallOf(
      SimilaritySearch.ivfTopK(queries, corpus, 5, nCentroids = 16, nProbe = 4))
    assert(ivfRecall >= 0.9, s"ivfTopK planted-pair recall $ivfRecall < 0.9")
  }

  test("ivfTopK with nProbe >= C degrades to exact brute force") {
    val e = Tables.load(spark, sf0001, "embeddings")
    val q = e.filter(col("vec_id") < 5)
    def keyOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val brute = keyOf(SimilaritySearch.bruteTopK(q, e, 5))
    val ivfAll = keyOf(SimilaritySearch.ivfTopK(q, e, 5, nCentroids = 4, nProbe = 4))
    assert(ivfAll == brute)
  }

  test("multimodal: golden corpus decode matches generation parameters (q62 gate shape)") {
    implicit val s = spark
    val golden = Multimodal.syntheticMediaCorpus()
    val meta = Multimodal.decodeImage(s.createDataset(golden.map(_._1)))
      .collect().map(m => m.doc_id -> m).toMap
    golden.foreach { case (_, exp) =>
      val got = meta(exp.doc_id)
      assert(got == exp, s"doc ${exp.doc_id}: decoded $got != expected $exp")
    }
    // corpus mixes shapes: both PNG channel counts and the junk path
    assert(golden.exists(_._2.channels == 4) && golden.count(g => g._1.doc_id % 5 == 4) >= 4)
  }

  test("multimodal: real resize produces target dims, preserves channels, deterministic") {
    implicit val s = spark
    val golden = Multimodal.syntheticMediaCorpus().map(_._1)
    def run() = Multimodal.resizeImage(s.createDataset(golden), 12, 7)
      .collect().map(m => m.doc_id -> m).toMap
    val a = run()
    val b = run()
    assert(a == b, "resize not deterministic across runs")
    val expected = Multimodal.syntheticMediaCorpus().map(_._2)
    expected.foreach { exp =>
      val got = a(exp.doc_id)
      assert(got.width == 12 && got.height == 7)
      if (exp.doc_id % 5 != 4) {
        // real images: channels preserved, bytes are the re-encoded PNG
        assert(got.channels == exp.channels)
        assert(got.checksum != exp.checksum || got.n_bytes != exp.n_bytes)
      }
    }
  }

  test("multimodal: feature-extract stub feeds similarity search") {
    implicit val s = spark
    val docs = Tables.load(spark, sf0001, "documents").limit(100)
    val media = Multimodal.withBinaryContent(docs)
      .select(col("doc_id"), col("content"))
      .as[Multimodal.MediaRecord]
    val feats = Multimodal.featureExtractStub(media).toDF()
      .withColumnRenamed("doc_id", "vec_id")
    // unit-normalized vectors
    val norms = feats.select(
      graft.functions.VectorFunctions.dotProduct(col("embedding"), col("embedding")))
      .collect().map(_.getDouble(0))
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-5))
    // pipes straight into the ANN operator
    val knn = SimilaritySearch.bruteTopK(
      feats.filter(col("vec_id") < 3), feats, 5)
    assert(knn.count() == 15)
    val resized = Multimodal.resizeStub(media, 64, 64).collect()
    assert(resized.forall(m => m.width == 64 && m.height == 64))
  }
}
