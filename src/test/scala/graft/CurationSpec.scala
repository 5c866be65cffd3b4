package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Sampling, TextAnalysis}

/** Round-4 curation operators: PII redaction, eval-set decontamination,
  * token-budget selection. Each also has an oracle-gated query
  * (q77/q78/q79); these specs pin the edge cases the fixture corpus
  * doesn't reach.
  */
class CurationSpec extends SparkSpec {

  import spark.implicits._

  test("redactPii scrubs emails, IPs, phones; leaves clean text alone") {
    val rows = Seq(
      (1L, "reach me at alice.smith+work@corp.example.com today"),
      (2L, "server 192.168.1.254 and 10.0.0.7 are up"),
      (3L, "call +1-555-0142 now"),
      (4L, "nothing sensitive here, just 3.14 and version 2.0"),
      (5L, "combo bob@x.io on 172.16.0.1 tel +44-555-9000"))
      .toDF("id", "text")
    val got = rows.select(col("id"), TextAnalysis.redactPii(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "reach me at <EMAIL> today")
    assert(got(2L) == "server <IP> and <IP> are up")
    assert(got(3L) == "call <PHONE> now")
    // version numbers / decimals survive: the IP pattern needs 4 octets
    assert(got(4L) == "nothing sensitive here, just 3.14 and version 2.0")
    assert(got(5L) == "combo <EMAIL> on <IP> tel <PHONE>")
  }

  test("contaminationReport flags n-gram collisions with the eval set only") {
    val shared8 = "one two three four five six seven eight"
    val train = Seq(
      (1L, s"prefix words then $shared8 and a tail"),   // contaminated
      (2L, "totally different content with no overlap at all present here"),
      (3L, s"$shared8"),                                 // exact 8-gram doc
      (4L, "short doc"))                                 // < n tokens: no shingles
      .toDF("doc_id", "text")
    val eval = Seq((100L, s"eval says $shared8 verbatim")).toDF("doc_id", "text")
    val got = Dedup.contaminationReport(train, eval, "text", "doc_id", n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(1L, 3L))
    // doc 3 is exactly the shared 8-gram: one shingle, one collision
    assert(got(3L) == 1L)
    assert(got(1L) >= 1L)
  }

  test("tokenBudgetSelect == window formulation, budget edge exact, partition-invariant") {
    val rnd = new scala.util.Random(7)
    val docs = (0 until 500)
      .map(i => (i.toLong, rnd.nextInt(100) / 100.0, 1L + rnd.nextInt(50)))
      .toDF("doc_id", "score", "tokens")
    val budget = 3000L

    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "score", "tokens", "cum_tokens")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
      .toSeq

    val w = Window.orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val oracle = canon(docs
      .withColumn("cum_tokens", sum("tokens").over(w))
      .where(col("cum_tokens") <= budget))

    for (parts <- Seq(1, 4, 13)) {
      val got = canon(
        Sampling.tokenBudgetSelect(docs, "doc_id", "score", "tokens", budget, parts))
      assert(got == oracle, s"mismatch at partitions=$parts")
    }

    // edge: a doc landing exactly on the budget is kept, the next is not
    val exact = Seq((1L, 0.9, 600L), (2L, 0.8, 400L), (3L, 0.7, 1L))
      .toDF("doc_id", "score", "tokens")
    val kept = Sampling.tokenBudgetSelect(exact, "doc_id", "score", "tokens", 1000L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }

  test("repetitionStats: planted boilerplate scores high, distinct text scores 0") {
    val rows = Seq(
      (1L, "buy now buy now buy now buy now"),  // grams: 7 occurrences
      (2L, "every word here is fully distinct"),
      (3L, "one"))                               // < 2 tokens: no grams
      .toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(rows, "text", "doc_id")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == Set(1L, 2L)) // doc 3 omitted
    // doc 1: 7 bigrams — "buy now"×4, "now buy"×3 → all repeated,
    // top share 4/7
    assert(got(1L)._1 == 7L)
    assert(math.abs(got(1L)._2 - 4.0 / 7.0) < 1e-6)
    assert(got(1L)._3 == 1.0)
    // doc 2: 5 distinct bigrams — top share 1/5, nothing repeated
    assert(got(2L) == ((5L, 0.2, 0.0)))
  }

  test("WordNgrams == the HOF formulation it replaced (property)") {
    // the compiled expression claims BIT-IDENTICAL output to
    // transform(sequence, i -> concat_ws over element_at) ± dedup —
    // pin it on randomized strings including empties, runs of spaces,
    // and sub-n docs
    val rnd = new scala.util.Random(23)
    val words = Seq("a", "bb", "ccc", "dd", "e")
    val texts = (0 until 200).map { i =>
      val n = rnd.nextInt(12)
      val sep = if (rnd.nextBoolean()) " " else "  " // double spaces too
      (i.toLong, Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(sep))
    } :+ (200L, "") :+ (201L, "   ") :+ (202L, "x")
    val df = texts.toDF("id", "text")

    for (n <- Seq(2, 3, 5); distinct <- Seq(true, false)) {
      val toks = graft.ops.Text.words(col("text"))
      val grams0 = transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))
      val hof = when(size(toks) >= n,
        if (distinct) array_distinct(grams0) else grams0)
        .otherwise(array().cast("array<string>"))
      val got = df.select(col("id"),
        graft.functions.WordNgrams(col("text"), n, distinct).as("g"),
        hof.as("h"))
        .collect()
      got.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"n=$n distinct=$distinct id=${r.getLong(0)}: " +
            s"${r.getSeq[String](1)} != ${r.getSeq[String](2)}")
      }
    }
  }

  test("chunkTokens: window boundaries, short tails, empty docs") {
    val rows = Seq(
      (1L, "a b c d e f g"), // 7 tokens
      (2L, "x"),             // 1 token -> one short chunk
      (3L, ""))              // 0 tokens -> no rows
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkTokens(rows, "text", "doc_id",
        chunkSize = 3, stride = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      (1L, 0, 0, 3, "a b c"),
      (1L, 1, 2, 3, "c d e"),
      (1L, 2, 4, 3, "e f g"),
      (1L, 3, 6, 1, "g"),
      (2L, 0, 0, 1, "x")))
  }
}
