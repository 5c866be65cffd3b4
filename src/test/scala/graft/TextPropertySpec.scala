package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.jobs.WordCount
import graft.ops.Text

/** Property tests (SURVEY.md §5.3): tokenizer offset arithmetic vs the spec,
  * and partition-count invariance (the property the reference gets from
  * key-deterministic routing — results must not depend on physical layout).
  * ScalaCheck generators are driven manually (the scalatest-scalacheck
  * bridge isn't in the offline cache), with fixed seeds for determinism.
  */
class TextPropertySpec extends SparkSpec {

  import spark.implicits._

  private val lineGen: Gen[String] =
    Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar,
      3 -> Gen.const(' '),
      1 -> Gen.oneOf('!', ',', '.', '\'', '-', '_', 'é')
    )).map(_.mkString)

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  /** Spec: offset advances len+1 per non-empty token only. */
  private def specTokens(cleaned: String, base: Long): Seq[(String, Long)] = {
    var off = base
    cleaned.split(" ", -1).toSeq.flatMap { w =>
      if (w.isEmpty) None
      else { val t = (w, off); off += w.length + 1; Some(t) }
    }
  }

  test("tokensWithOffsets matches the spec on random lines") {
    (1L to 20L).foreach { seed =>
      val lines = sample(Gen.listOfN(30, lineGen), seed)
      val df = lines.zipWithIndex.toDF("raw", "id")
        .select(col("id"), Text.clean(col("raw")).as("line"), lit(7L).as("offset"))
      val got = df
        .select(col("id"),
          explode(Text.tokensWithOffsets(col("line"), col("offset"))).as("t"))
        .collect()
        .groupBy(_.getInt(0))
        .view.mapValues(_.map(r => (r.getStruct(1).getString(0), r.getStruct(1).getLong(1))).toSeq)
        .toMap
      lines.zipWithIndex.foreach { case (raw, id) =>
        val expected = specTokens(raw.replaceAll("[^a-zA-Z0-9 ]", ""), 7L)
        assert(got.getOrElse(id, Seq.empty) == expected,
          s"seed=$seed line=${raw.take(40)}")
      }
    }
  }

  test("word count is invariant to input partitioning") {
    (1L to 10L).foreach { seed =>
      val lines = sample(Gen.listOfN(50, lineGen), seed)
      val results = Seq(1, 3, 8).map { n =>
        val df = lines.toDF("raw")
          .repartition(n)
          .select(Text.clean(col("raw")).as("line"))
        WordCount(df).collect().map(r => (r.getString(0), r.getLong(1))).toMap
      }
      assert(results.distinct.size == 1, s"seed=$seed")
    }
  }

  test("sorted_intersect_count: violated sort invariant throws, never undercounts") {
    import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
    import graft.functions.SortedIntersectCount
    def arr(xs: Long*) = UnsafeArrayData.fromPrimitiveArray(xs.toArray)
    // happy path: strictly ascending, dup-free
    assert(SortedIntersectCount.compute(arr(1L, 2L, 3L), arr(2L, 3L, 4L)) == 2)
    assert(SortedIntersectCount.compute(arr(), arr(1L)) == 0)
    // out-of-order element REACHED BY THE MERGE WALK must throw (the old
    // code silently undercounted — the invariant lived only in caller
    // discipline)
    val e1 = intercept[IllegalArgumentException] {
      SortedIntersectCount.compute(arr(3L, 1L, 5L), arr(1L, 3L, 5L))
    }
    assert(e1.getMessage.contains("not strictly ascending"))
    // duplicates violate the distinct-count contract the same way
    val e2 = intercept[IllegalArgumentException] {
      SortedIntersectCount.compute(arr(1L, 2L, 3L), arr(1L, 1L, 2L))
    }
    assert(e2.getMessage.contains("not strictly ascending"))
    // and the same check fires through the SQL/codegen path
    val ex = intercept[Exception] {
      spark.range(1)
        .select(SortedIntersectCount(
          expr("array(3L, 1L, 5L)"), expr("array(1L, 3L, 5L)")).as("c"))
        .collect()
    }
    val messages = Iterator.iterate[Throwable](ex)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).toSeq
    assert(messages.exists(_.contains("not strictly ascending")), messages.mkString(" | "))
  }

  /** Brute-force winnowing reference: for every FULL window of w
    * consecutive gram hashes, select (min hash, rightmost position among
    * equal minima), dedup globally — the arithmetic-key formulation the
    * DuckDB oracle replays, independently re-implemented.
    */
  private def bruteWinnow(text: String, k: Int, w: Int): Set[(Long, Long)] = {
    val toks = text.split(" ", -1).toSeq.filter(_.nonEmpty)
    if (toks.length < k) return Set.empty
    val hs = toks.sliding(k).map(g =>
      graft.functions.PolyHash.hash(g.mkString(" "))).toArray
    if (hs.length < w) return Set.empty
    (0 to hs.length - w).map { p =>
      val win = (p until p + w).map(i => (hs(i), i))
      val mn = win.map(_._1).min
      val pos = win.filter(_._1 == mn).map(_._2).max
      (mn, pos.toLong)
    }.toSet
  }

  test("winnowed_fingerprints matches the brute-force window-min spec " +
    "on random token streams (incl. heavy hash ties)") {
    // small vocab forces repeated grams -> repeated hashes -> the tie
    // rule and the monotonic deque's >= pop get exercised hard
    val tokGen = Gen.listOfN(60, Gen.oneOf("a", "b", "c", "ab", "ba"))
      .map(_.mkString(" "))
    (1L to 40L).foreach { seed =>
      val text = sample(tokGen, seed)
      val got = graft.functions.WinnowedFingerprints
        .compute(text, 5, 4) match {
          case a: org.apache.spark.sql.catalyst.util.ArrayData =>
            (0 until a.numElements()).map { i =>
              val r = a.getStruct(i, 2)
              (r.getLong(0), r.getLong(1))
            }.toSet
        }
      assert(got == bruteWinnow(text, 5, 4),
        s"seed $seed diverged on: $text")
    }
  }
}
