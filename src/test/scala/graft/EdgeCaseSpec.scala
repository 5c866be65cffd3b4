package graft

import java.nio.file.Files

import graft.io.TextRecords
import graft.jobs.WordCount

/** Edge cases from FIXTURES.md §A's micro-corpus checklist: no trailing
  * newline, lines cleaning to empty, leading/trailing spaces, all-blank
  * files — plus the reference-shaped JSON-object sink (op 12).
  */
class EdgeCaseSpec extends SparkSpec {

  import spark.implicits._

  private def withFile(content: String)(f: String => Unit): Unit = {
    val p = Files.createTempFile("graft_edge", ".txt")
    Files.writeString(p, content)
    try f(p.toString) finally Files.delete(p)
  }

  test("file without trailing newline: last line still counted") {
    withFile("a b\nc d") { path =>
      val recs = TextRecords.read(spark, path).orderBy("line_id").collect()
      assert(recs.map(_.getString(1)).toSeq == Seq("a b", "c d"))
      assert(recs.map(_.getLong(2)).toSeq == Seq(0L, 3L))
    }
  }

  test("line cleaning to empty is kept (contributes 0, emits no words)") {
    withFile("!!!\nx\n") { path =>
      val recs = TextRecords.read(spark, path).orderBy("line_id").collect()
      // "!!!" cleans to "" — kept as a record with 0-length contribution
      assert(recs.map(r => (r.getString(1), r.getLong(2))).toSeq ==
        Seq(("", 0L), ("x", 0L)))
      val wc = WordCount(TextRecords.read(spark, path)).collect()
      assert(wc.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("x", 1L)))
    }
  }

  test("leading/trailing spaces survive cleaning and shift offsets") {
    withFile(" a \nb\n") { path =>
      val recs = TextRecords.read(spark, path).orderBy("line_id").collect()
      assert(recs.map(r => (r.getString(1), r.getLong(2))).toSeq ==
        Seq((" a ", 0L), ("b", 3L)))
    }
  }

  test("all-blank file produces no records") {
    withFile("\n\n\n") { path =>
      assert(TextRecords.read(spark, path).count() == 0L)
    }
  }

  test("writeJsonObject emits the reference's sorted single-object shape") {
    val out = Files.createTempFile("graft_sink", ".json")
    TextRecords.writeJsonObject(
      Seq(("zeta", 2L), ("alpha", 5L)).toDF("word", "cnt"), out.toString)
    assert(Files.readString(out) == """{"alpha": 5, "zeta": 2}""")
    // inverted-index shape: word -> [offsets]
    TextRecords.writeJsonObject(
      Seq(("b", Seq(3L, 7L)), ("a", Seq(1L))).toDF("word", "postings"),
      out.toString)
    assert(Files.readString(out) == """{"a": [1], "b": [3,7]}""")
    Files.delete(out)
  }

  test("writeJsonObject refuses oversized inputs with a pointer at the scale path") {
    val out = Files.createTempFile("graft_sink_guard", ".json")
    val big = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("word", "cnt")
    val e = intercept[IllegalArgumentException] {
      TextRecords.writeJsonObject(big, out.toString, maxRows = 2L)
    }
    assert(e.getMessage.contains("writeJsonLines"))
    // at/under the cap still writes
    TextRecords.writeJsonObject(big, out.toString, maxRows = 3L)
    assert(Files.readString(out) == """{"a": 1, "b": 2, "c": 3}""")
    Files.delete(out)
  }
}
