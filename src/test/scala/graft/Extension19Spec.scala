package graft

import org.apache.spark.sql.functions._

/** Round-7 thirteenth wave: trending terms, budgeted selection. */
class Extension19Spec extends SparkSpec {

  import spark.implicits._

  test("trending terms: a word planted only in odd docs tops the lift " +
    "ranking; floor kills one-off noise") {
    val dir = java.nio.file.Files.createTempDirectory("graft_trend")
    // 'spamword' x6 in odd (h1) docs only; 'noise' once in an odd doc
    // (under the c1 >= 5 floor); balanced filler everywhere
    val rows = (0 until 10).map { i =>
      val extra =
        if (i % 2 == 1 && i < 6) " spamword spamword" // docs 1,3,5: x2 each
        else if (i == 7) " noise"
        else ""
      (i.toLong, s"the common filler text$extra", "en", "s1", 1L)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q192_trending_terms")(spark, dir.toString)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.head._2 == "spamword" && out.head._3 == 0L &&
      out.head._4 == 6L, s"got ${out.toSeq}")
    assert(!out.exists(_._2 == "noise"), "sub-floor words excluded")
    assert(out.map(_._5).toSeq == out.map(_._5).toSeq.sorted.reverse)
  }

  test("budgeted selection: greedy-by-quality fills exactly to the " +
    "budget, per-source prefix sums independent") {
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q193_budgeted_selection")(spark, sf)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (src, rows) =>
      val sorted = rows.sortBy(_._2)
      // ranks dense from 1, quality non-increasing, budget respected,
      // cum_tokens is the running sum of tok
      assert(sorted.map(_._2).toSeq == (1 to sorted.length))
      assert(sorted.map(_._6).toSeq ==
        sorted.map(_._6).toSeq.sorted.reverse, s"$src quality order")
      assert(sorted.last._5 <= 400L)
      assert(sorted.map(_._4).scanLeft(0L)(_ + _).tail.toSeq ==
        sorted.map(_._5).toSeq, s"$src cum mismatch")
    }
    // greedy maximality: the next-ranked doc (if any) would overflow —
    // verified per source by recomputing scores for ALL docs
    val all = graft.io.Tables.load(spark, sf, "documents")
      .select("doc_id", "source", "text").collect().map { r =>
        val ws = r.getString(2).replaceAll("[^a-zA-Z0-9 ]", "")
          .split(" ").filter(_.nonEmpty)
        val q = math.floor(
          ws.distinct.length.toDouble / ws.length * 1e6 + 0.5) / 1e6
        (r.getString(1), r.getLong(0), ws.length.toLong, q)
      }
    all.groupBy(_._1).foreach { case (src, docs) =>
      val order = docs.sortBy(d => (-d._4, d._2))
      val kept = out.filter(_._1 == src).map(_._3).toSet
      var cum = 0L
      order.foreach { case (_, id, tok, _) =>
        cum += tok
        assert(kept(id) == (cum <= 400L), s"$src doc $id greedy mismatch")
      }
    }
  }
}
