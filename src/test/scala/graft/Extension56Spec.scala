package graft

import org.apache.spark.sql.functions._

import graft.functions.{DamerauLevenshtein, PolyHash}
import graft.io.Tables

/** Semantics tests for the q362–q365 wave plus the new true
  * Damerau-Levenshtein expression (pinned cases, properties, and
  * CODEGEN_ONLY execution).
  */
class Extension56Spec extends SparkSpec {

  test("damerau_levenshtein: pinned semantics — unrestricted " +
    "transpositions over UTF-8 bytes (the DuckDB contract)") {
    import graft.functions.{DamerauLevenshtein => DL}
    assert(DL.dist("CA", "ABC") == 2) // OSA would say 3
    assert(DL.dist("ab", "ba") == 1)
    assert(DL.dist("abc", "acb") == 1)
    assert(DL.dist("kitten", "sitting") == 3)
    assert(DL.dist("abcdef", "abcfed") == 2)
    assert(DL.dist("", "") == 0)
    assert(DL.dist("a", "") == 1)
    assert(DL.dist("", "xyz") == 3)
    assert(DL.dist("café", "cafe") == 2) // byte-level: é is 2 bytes
    // properties on a small exhaustive alphabet
    val strs = for {
      l <- 0 to 3
      s <- Seq.fill(l)(Seq("a", "b")).foldLeft(Seq(""))((acc, cs) =>
        acc.flatMap(p => cs.map(p + _)))
    } yield s
    for (a <- strs; b <- strs) {
      assert(DL.dist(a, b) == DL.dist(b, a), s"symmetry $a/$b")
      assert(DL.dist(a, b) >= math.abs(a.length - b.length))
      assert(DL.dist(a, b) <= math.max(a.length, b.length))
      if (a == b) assert(DL.dist(a, b) == 0)
    }
  }

  test("damerau_levenshtein executes under CODEGEN_ONLY and matches " +
    "the JVM helper row-for-row") {
    val prior = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val p = Tables.load(spark, sf0001, "part")
        .select(col("p_name")).limit(40).collect().map(_.getString(0))
      import spark.implicits._
      val pairs = (for (a <- p; b <- p) yield (a, b)).toSeq.toDF("a", "b")
      val got = pairs
        .withColumn("d", DamerauLevenshtein(col("a"), col("b")))
        .collect()
      got.foreach { r =>
        assert(r.getInt(2) ==
          graft.functions.DamerauLevenshtein.dist(
            r.getString(0), r.getString(1)))
      }
    } finally prior match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  private lazy val events: Array[(Long, Long, Long, String, Double)] =
    Tables.load(spark, sf0001, "events")
      .selectExpr("user_id", "unix_micros(cast(ts as timestamp))",
        "event_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))

  private def cents(v: Double): Long = math.floor(v * 100 + 0.5).toLong

  test("q362: the value-domain p99 is the exact order statistic and " +
    "tail shares sum to 1") {
    val cs = events.map(e => cents(e._5)).sorted
    val k = (99L * cs.length + 99L) / 100L
    val p99 = cs(k.toInt - 1) // smallest value with cum >= ceil(.99 n)
    val rows = SparkEntry.queries("q362_p99_exceedance")(spark, sf0001)
      .collect()
    val p99out = rows.head.getDouble(5)
    assert(p99out == math.floor(p99.toDouble / 100.0 * 1e6 + 0.5) / 1e6,
      s"p99 $p99out vs exact cents $p99")
    val above = events.count(e => cents(e._5) > p99).toLong
    assert(rows.map(_.getLong(2)).sum == above)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-5)
  }

  test("q363: DiD estimate replays from the four exact cell means") {
    def grp(uid: Long): String = {
      val h = PolyHash.hash(s"exp7#$uid")
      if ((h * h % 1000000007L) % 10000L < 5000L) "treat" else "control"
    }
    val cells = events.filter(_._4 == "purchase").groupBy { e =>
      // day-of-month from the epoch-micros (UTC, January fixture)
      val day = java.time.Instant.ofEpochSecond(e._2 / 1000000L)
        .atZone(java.time.ZoneOffset.UTC).getDayOfMonth
      (grp(e._1), if (day >= 16) "post" else "pre")
    }.map { case (k, es) =>
      k -> ((es.length.toLong, es.map(e => cents(e._5)).sum))
    }
    def mean(k: (String, String)): Double =
      cells(k)._2.toDouble / cells(k)._1.toDouble
    val did = mean(("treat", "post")) - mean(("treat", "pre")) -
      (mean(("control", "post")) - mean(("control", "pre")))
    val expect = math.floor(did / 100.0 * 1e6 + 0.5) / 1e6
    val rows = SparkEntry.queries("q363_did_estimator")(spark, sf0001)
      .collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getDouble(4) == expect, s"did ${r.getDouble(4)} != $expect")
      val c = cells((r.getString(0), r.getString(1)))
      assert(r.getLong(2) == c._1)
    }
  }

  test("q364: pair reciprocity replays from in-memory transitions and " +
    "is bounded in [0, 1]") {
    val tr = events.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val o = es.sortBy(e => (e._2, e._3)).map(_._4)
      o.zip(o.drop(1)).filter(p => p._1 != p._2)
    }
    val w = tr.groupBy(identity).map { case (k, os) => k -> os.length.toLong }
    val got = SparkEntry.queries("q364_transition_reciprocity")(
      spark, sf0001).collect()
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val fwd = w.getOrElse((a, b), 0L)
      val rev = w.getOrElse((b, a), 0L)
      assert(r.getLong(2) == fwd && r.getLong(3) == rev,
        s"weights for $a->$b: got (${r.getLong(2)},${r.getLong(3)}), " +
          s"replay ($fwd,$rev)")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
    // grand reciprocity equals recirculated mass over total mass
    val pairs = w.keys.map(k => (Seq(k._1, k._2).min, Seq(k._1, k._2).max))
      .toSeq.distinct
    val recip = pairs.map { case (a, b) =>
      2L * math.min(w.getOrElse((a, b), 0L), w.getOrElse((b, a), 0L))
    }.sum
    val total = w.values.sum
    val expect = math.floor(recip.toDouble / total.toDouble * 1e6 + 0.5) / 1e6
    assert(got.forall(_.getDouble(5) == expect))
  }
}
