package graft

import org.apache.spark.sql.functions._

import graft.functions.HilbertIndex
import graft.queries.ExtensionQueries37

/** Semantics tests for the round-8 twelfth continuation wave — the
  * mathematical invariants the DuckDB oracle can't see.
  */
class Extension37Spec extends SparkSpec {

  import spark.implicits._

  test("HilbertIndex is a bijection on the 64x64 grid whose consecutive " +
    "indices are always grid NEIGHBORS (the defining curve property " +
    "Z-order lacks)") {
    val cells = for (x <- 0L until 64L; y <- 0L until 64L)
      yield (x, y, HilbertIndex.xy2d(6, x, y))
    assert(cells.map(_._3).sorted == (0L until 4096L))
    val byD = cells.map(c => c._3 -> (c._1, c._2)).toMap
    (0L until 4095L).foreach { d =>
      val (x1, y1) = byD(d)
      val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at d=$d: ($x1,$y1)->($x2,$y2)")
    }
  }

  test("HilbertIndex codegen path matches the driver-side walk") {
    val df = (0L until 64L).flatMap(x => (0L until 64L).map(y => (x, y)))
      .toDF("x", "y")
    val viaExpr = df.select(col("x"), col("y"),
        HilbertIndex(col("x"), col("y"), 6).as("d"))
      .collect()
    viaExpr.foreach { r =>
      assert(r.getLong(2) ==
        HilbertIndex.xy2d(6, r.getLong(0), r.getLong(1)))
    }
  }

  test("q306 isotonic fit is nondecreasing and preserves the weighted " +
    "mean (the two defining PAV properties)") {
    val out = ExtensionQueries37.queries.find(_.name ==
      "q306_isotonic_calibration").get.fn(spark, sf0001)
      .orderBy("bin").collect()
    assert(out.nonEmpty)
    val iso = out.map(_.getDouble(4))
    assert(iso.zip(iso.tail).forall { case (a, b) => b >= a },
      s"not monotone: ${iso.toSeq}")
    val wSum = out.map(_.getLong(1)).sum.toDouble
    val posSum = out.map(_.getLong(2)).sum.toDouble
    val isoMean = out.map(r => r.getLong(1) * r.getDouble(4)).sum / wSum
    // round6 on each bin's iso bounds the drift by 1e-6
    assert(math.abs(isoMean - posSum / wSum) < 1e-4,
      s"weighted mean not preserved: $isoMean vs ${posSum / wSum}")
    // fitted values stay inside the observed rate envelope
    val rates = out.map(_.getDouble(3))
    assert(iso.forall(v => v >= rates.min - 1e-9 && v <= rates.max + 1e-9))
  }

  test("q305 per-bucket stats are internally consistent with the " +
    "bucket bounds") {
    val out = ExtensionQueries37.queries.find(_.name ==
      "q305_jl_distortion").get.fn(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val b = r.getLong(0)
      val mean = r.getDouble(2)
      val mn = r.getDouble(3)
      val mx = r.getDouble(4)
      assert(mn <= mean + 1e-6 && mean <= mx + 1e-6)
      assert(mn >= b / 20.0 - 1e-6 && mx < (b + 1) / 20.0 + 1e-6)
    }
    // the bulk of the mass concentrates around ratio 1 (JL lemma):
    // buckets 14..25 cover [0.7, 1.3); a healthy sign matrix puts >80%
    // of pairs there (measured 92% — the degenerate linear-hash draft
    // managed 25%, which is what this pin exists to catch)
    val total = out.map(_.getLong(1)).sum.toDouble
    val central = out.filter(r =>
      r.getLong(0) >= 14 && r.getLong(0) <= 25).map(_.getLong(1)).sum
    assert(central / total > 0.8, s"central mass ${central / total}")
  }

  test("the JL sign matrix has no collapsed rows (the mod-2 degeneracy " +
    "the first linear-hash draft shipped)") {
    val s = ExtensionQueries37.jlSignMatrix
    assert(s.length == 16 && s.forall(_.length == 64))
    // balanced-ish rows: |sum| well below the degenerate extremes
    s.foreach { row =>
      val sum = row.map(_.toDouble).sum
      assert(math.abs(sum) <= 24, s"row sum $sum")
    }
    // no pair of rows identical or negated (|dot| = 64 is collapse;
    // a healthy matrix measured max 18)
    for (i <- s.indices; j <- s.indices if i < j) {
      val dot = s(i).zip(s(j)).map { case (a, b) => a.toDouble * b }.sum
      assert(math.abs(dot) <= 32, s"rows $i,$j dot $dot")
    }
  }

  test("q307 Hilbert never needs more key runs than Z-order on the " +
    "probe rectangles") {
    val out = ExtensionQueries37.queries.find(_.name ==
      "q307_hilbert_locality").get.fn(spark, sf0001).collect()
    assert(out.length == 6)
    val byRect = out.groupBy(_.getLong(0))
    byRect.foreach { case (rect, rows) =>
      val h = rows.find(_.getString(1) == "hilbert").get.getLong(4)
      val z = rows.find(_.getString(1) == "zorder").get.getLong(4)
      assert(h <= z, s"rect $rect: hilbert $h > zorder $z runs")
      // both curves cover the identical cell set
      assert(rows.map(_.getLong(2)).distinct.length == 1)
    }
  }
}
