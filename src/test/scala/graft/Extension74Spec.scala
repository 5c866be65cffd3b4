package graft

import org.apache.spark.sql.functions._

import graft.io.Tables

/** Semantics tests for the q434–q437 wave: attribution accounting,
  * Kraft equality, estimator arithmetic, and DP optimality.
  */
class Extension74Spec extends SparkSpec {

  test("q434: attribution shares normalize, removal always hurts, and " +
    "the effects replay") {
    val rows = SparkEntry.queries("q434_markov_attribution")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-3)
    val full = rows.head.getDouble(5)
    rows.foreach { r =>
      assert(r.getDouble(5) == full)
      assert(r.getDouble(2) <= full + 1e-9, "removal cannot raise conv")
      assert(math.abs(r.getDouble(3) - (full - r.getDouble(2)) / full)
        < 1e-4)
      assert(r.getLong(1) > 0L)
      assert(r.getDouble(2) >= 0.0 && full <= 1.0)
    }
  }

  test("q435: Huffman lengths satisfy Kraft equality and the " +
    "source-coding bound H <= L < H+1") {
    val rows = SparkEntry.queries("q435_huffman_code")(spark, sf0001)
      .collect()
    val kraft = rows.map(r => math.pow(2.0, -r.getLong(2).toDouble)).sum
    assert(math.abs(kraft - 1.0) < 1e-12,
      s"Kraft sum $kraft != 1 (tree not complete)")
    val n = rows.map(_.getLong(1)).sum.toDouble
    val l = rows.map(r => r.getLong(1) * r.getLong(2)).sum / n
    val h = rows.head.getDouble(4)
    val lOut = rows.head.getDouble(3)
    assert(math.abs(lOut - l) < 1e-4)
    assert(lOut >= h - 1e-6 && lOut < h + 1.0)
    // optimality vs the trivial fixed-length 3-bit code for 5 symbols
    assert(lOut <= 3.0)
  }

  test("q436: the three estimators replay their closed forms from " +
    "(d, f1) and Chao1 dominates naive scaling here") {
    val rows = SparkEntry.queries("q436_gee_distinct")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5)))
    val byName = rows.map(r => r._1 -> r).toMap
    val (d, f1) = (rows.head._2.toDouble, rows.head._3.toDouble)
    assert(math.abs(byName("naive_scale")._4 - d * 16) < 1e-6)
    val chao = d + (if (d - f1 > 0) f1 * f1 / (2.0 * (d - f1))
      else f1 * (f1 - 1) / 2.0)
    assert(math.abs(byName("chao1")._4 - chao) < 1e-4)
    assert(math.abs(byName("gee")._4 - (d + 3.0 * f1)) < 1e-6)
    rows.foreach { r =>
      assert(math.abs(r._6
        - math.floor((r._4 - r._5) / r._5 * 1e6 + 0.5) / 1e6) < 1e-9)
    }
    // row-sampled heavy keys: naive key-scaling must overshoot Chao1
    assert(math.abs(byName("chao1")._6) < math.abs(
      byName("naive_scale")._6))
  }

  test("q437: buckets partition the domain and the DP value is optimal " +
    "(independent DP replay, beats both fixed layouts)") {
    val rows = SparkEntry.queries("q437_voptimal_histogram")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .sortBy(_._1)
    val dom = Tables.load(spark, sf0001, "events")
      .groupBy(floor(col("value")).cast("long").as("d"))
      .agg(count(lit(1)).as("c")).orderBy("d")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_._4).sum == dom.map(_._2).sum)
    assert(rows.head._2 == dom.head._1 && rows.last._3 == dom.last._1)
    rows.toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(b._2 > a._3, "buckets must be contiguous")
      case _ =>
    }
    val vopt = rows.head._5
    assert(vopt <= rows.head._6 + 1e-6 && vopt <= rows.head._7 + 1e-6,
      "v-optimal beaten by a fixed layout")
    // independent O(B V^2) DP replay
    val vN = dom.length
    val pc = dom.scanLeft(0L)(_ + _._2).tail
    val ps = dom.scanLeft(0L)((a, x) => a + x._1 * x._2).tail
    val pq = dom.scanLeft(0L)((a, x) => a + x._1 * x._1 * x._2).tail
    def sse(u: Int, v: Int): Double = {
      val n = pc(v) - (if (u < 0) 0L else pc(u))
      val sm = ps(v) - (if (u < 0) 0L else ps(u))
      val qq = pq(v) - (if (u < 0) 0L else pq(u))
      qq.toDouble - sm.toDouble * sm.toDouble / n.toDouble
    }
    var prev = (0 until vN).map(v => sse(-1, v)).toArray
    for (_ <- 2 to 8) {
      val cur = new Array[Double](vN)
      (0 until vN).foreach { v =>
        cur(v) = (0 until v).foldLeft(Double.MaxValue)((b, u) =>
          math.min(b, prev(u) + sse(u, v)))
      }
      prev = cur
    }
    assert(math.abs(vopt - prev(vN - 1)) < 1e-2,
      s"vopt $vopt vs replay ${prev(vN - 1)}")
  }
}
