package graft

import graft.io.Tables

/** Semantics tests for the q358–q361 wave: in-memory replays of the
  * negative-sampling grid arithmetic, draft-model acceptance, Flesch
  * scoring, and first-occurrence novelty.
  */
class Extension55Spec extends SparkSpec {

  private def words(text: String): Seq[String] =
    text.replaceAll("[^a-zA-Z0-9 ]", "").split(" ").filter(_.nonEmpty).toSeq

  private lazy val docs: Array[(Long, String, String, String)] =
    Tables.load(spark, sf0001, "documents")
      .selectExpr("doc_id", "text", "lang", "source")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))

  test("q358: p_neg replays from token counts via the sqrt(c*sqrt(c)) " +
    "grid and sums to <= 1 over the full vocabulary") {
    val cnt = docs.flatMap(d => words(d._2))
      .groupBy(identity).map { case (w, os) => w -> os.length.toLong }
    val t6 = cnt.map { case (w, c) =>
      w -> math.floor(math.sqrt(c.toDouble * math.sqrt(c.toDouble)) * 1e6
        + 0.5).toLong
    }
    val d6 = t6.values.sum
    val top = cnt.toSeq.sortBy { case (w, c) => (-c, w) }.take(30)
    val got = SparkEntry.queries("q358_negative_sampling")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length == 30)
    got.zip(top).foreach { case (g, (w, c)) =>
      assert(g._1 == w && g._2 == c, s"top-30 mismatch: $g vs ($w,$c)")
      val p = t6(w).toDouble / d6.toDouble
      assert(g._3 == math.floor(p * 1e6 + 0.5) / 1e6, s"p_neg for $w")
      assert(g._4 == math.floor(p * 10000.0 * 1e4 + 0.5) / 1e4,
        s"draws_per_10k for $w")
    }
    // the full distribution must be a (sub-)probability over the grid
    assert(t6.values.map(_.toDouble / d6.toDouble).sum <= 1.0 + 1e-9)
  }

  test("q359: acceptance rate replays from an in-memory bigram argmax") {
    val bi = docs.flatMap { d =>
      val ws = words(d._2)
      ws.zip(ws.drop(1)).map(p => (d._3, p._1, p._2))
    }
    val cnt = bi.groupBy(identity).map { case (k, os) => k -> os.length }
    val best = cnt.groupBy { case ((l, w1, _), _) => (l, w1) }
      .map { case (k, entries) =>
        k -> entries.toSeq
          .sortBy { case ((_, _, w2), c) => (-c, w2) }.head._1._3
      }
    val expected = bi.groupBy(_._1).map { case (lang, es) =>
      lang -> ((es.length.toLong,
        es.count(e => best((e._1, e._2)) == e._3).toLong))
    }
    val got = SparkEntry.queries("q359_draft_acceptance")(spark, sf0001)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (lang, e) =>
      assert(got(lang) == e, s"lang $lang: got ${got(lang)}, expected $e")
    }
  }

  test("q360: per-source Flesch replays from per-doc regex counts") {
    val f6 = docs.flatMap { d =>
      val nw = words(d._2).length.toLong
      if (nw < 1) None else {
        val ns = math.max(1L,
          "[.!?]+".r.findAllIn(d._2).length.toLong)
        val syl = "[aeiouy]+".r.findAllIn(d._2.toLowerCase).length.toLong
        val f = 206.835 - 1.015 * nw.toDouble / ns.toDouble -
          84.6 * syl.toDouble / nw.toDouble
        Some(d._4 -> math.floor(f * 1e6 + 0.5).toLong)
      }
    }
    val expected = f6.groupBy(_._1).map { case (src, vs) =>
      val n = vs.length.toLong
      val avg = math.floor(vs.map(_._2).sum.toDouble / n.toDouble / 1e6
        * 1e6 + 0.5) / 1e6
      val easy = math.floor(
        vs.count(_._2 > 60000000L).toDouble / n.toDouble * 1e6 + 0.5) / 1e6
      src -> ((n, avg, easy))
    }
    val got = SparkEntry.queries("q360_flesch_readability")(spark, sf0001)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (src, e) =>
      assert(got(src) == e, s"source $src: got ${got(src)}, expected $e")
    }
  }

  test("q361: decile novelty replays from raw-token 3-gram first " +
    "occurrences, and the first decile is the most novel") {
    val sh = docs.flatMap { d =>
      val ws = d._2.split(" ").filter(_.nonEmpty)
      ws.sliding(3).filter(_.length == 3).map(_.mkString(" "))
        .toSeq.distinct.map(g => (d._1, g))
    }
    val first = sh.groupBy(_._2).map { case (g, os) =>
      g -> os.map(_._1).min
    }
    val mx = docs.map(_._1).max + 1
    val per = sh.groupBy(_._1).map { case (id, gs) =>
      (id * 10 / mx, gs.size.toLong,
        gs.count(g => first(g._2) == id).toLong)
    }
    val expected = per.groupBy(_._1).map { case (dec, vs) =>
      dec -> ((vs.size.toLong, vs.map(_._2).sum, vs.map(_._3).sum))
    }
    val got = SparkEntry.queries("q361_novelty_decay")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSet == expected.keySet)
    got.foreach { case (dec, nDocs, nSh, pooled) =>
      val e = expected(dec)
      assert((nDocs, nSh) == ((e._1, e._2)), s"decile $dec frame mismatch")
      val ep = math.floor(e._3.toDouble / e._2.toDouble * 1e6 + 0.5) / 1e6
      assert(pooled == ep, s"decile $dec pooled share $pooled != $ep")
    }
    // ingestion-order novelty must peak in the first decile
    val byDec = got.sortBy(_._1)
    assert(byDec.head._4 >= byDec.map(_._4).max - 1e-9,
      "decile 0 is not the most novel")
  }
}
