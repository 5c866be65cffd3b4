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
}
