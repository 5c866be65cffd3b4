package graft

import org.apache.spark.sql.functions._

import graft.functions.PolyHash
import graft.io.Tables
import graft.ops.Text

/** Semantics tests for the q418–q421 wave: sketch replay, recall
  * monotonicity, trend-test replay, and the OLS normal equations.
  */
class Extension70Spec extends SparkSpec {

  test("q418: the median-of-means estimate replays from per-estimator " +
    "tug-of-war sums and lands within a loose factor of exact F2") {
    val r = SparkEntry.queries("q418_ams_f2_sketch")(spark, sf0001)
      .collect().head
    val wc = Tables.load(spark, sf0001, "documents")
      .select(explode(Text.words(Text.clean(col("text")))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    assert(r.getLong(0) == wc.length.toLong)
    val exact = wc.map(x => x._2 * x._2).sum
    assert(r.getLong(1) == exact)
    def sign(j: Long, w: String): Long = {
      val h = PolyHash.hash(s"ams$j#$w")
      (h * h % PolyHash.Mod % 2L) * 2L - 1L
    }
    val zs = (0L until 15L).map(j => wc.map(x => sign(j, x._1) * x._2).sum)
    val groupSums = zs.grouped(3).map(g => g.map(z => z * z).sum).toSeq
    val med = groupSums.sorted.apply(2)
    assert(math.abs(r.getDouble(3) - med.toDouble / 3.0) < 1e-3,
      s"est ${r.getDouble(3)} vs replay ${med / 3.0}")
    val ratio = r.getDouble(3) / exact
    assert(ratio > 0.1 && ratio < 10.0, s"AMS estimate off by $ratio x")
  }

  test("q419: recall is monotone in prefix dim and the full dim is a " +
    "perfect self-match") {
    val rows = SparkEntry.queries("q419_matryoshka_recall")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(8L, 16L, 32L, 64L))
    rows.foreach(r => assert(r._3 >= 0.0 && r._3 <= 1.0 && r._2 <= 160L))
    assert(rows.last._3 == 1.0 && rows.last._2 == 160L)
    assert(rows.toSeq.sliding(2).forall {
      case Seq(a, b) => b._3 >= a._3 - 1e-9
      case _ => true
    })
  }

  test("q420: the trend z replays from exact score sums and chi2 = z^2") {
    val rows = SparkEntry.queries("q420_cochran_armitage")(spark, sf0001)
      .collect()
    val o = Tables.load(spark, sf0001, "orders")
      .select(substring(col("o_orderpriority"), 1, 1).cast("long"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = o.length.toDouble
    val rr = o.map(_._2).sum.toDouble
    val pbar = rr / n
    val t1 = o.filter(_._2 == 1L).map(_._1).sum.toDouble
    val t2 = o.map(_._1).sum.toDouble
    val t3 = o.map(x => x._1 * x._1).sum.toDouble
    val z = (t1 - pbar * t2) /
      math.sqrt(pbar * (1 - pbar) * (t3 - t2 * t2 / n))
    rows.foreach { r =>
      assert(math.abs(r.getDouble(5) - z) < 1e-4,
        s"z ${r.getDouble(5)} vs naive $z")
      assert(math.abs(r.getDouble(6) - r.getDouble(5) * r.getDouble(5))
        < 1e-4)
      val expected =
        if (z > 0) "increasing" else if (z < 0) "decreasing" else "flat"
      assert(r.getString(7) == expected)
    }
    assert(rows.map(_.getLong(2)).sum == o.length.toLong)
  }

  test("q421: the coefficients solve the naive normal equations and DW " +
    "sits in [0, 4]") {
    val r = SparkEntry.queries("q421_dw_ols")(spark, sf0001)
      .collect().head
    val daily = Tables.load(spark, sf0001, "events")
      .where(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("y"))
      .orderBy("day").collect().map(_.getLong(1))
    val rowsD = daily.sliding(2).zipWithIndex
      .map { case (pair, i) => (pair(1).toDouble, pair(0).toDouble,
        (i + 2).toDouble) }.toArray
    val n = rowsD.length.toDouble
    assert(r.getLong(0) == rowsD.length.toLong)
    def m(f: ((Double, Double, Double)) => Double) = rowsD.map(f).sum / n
    val (my, m1, m2) = (m(_._1), m(_._2), m(_._3))
    val a11 = rowsD.map(x => (x._2 - m1) * (x._2 - m1)).sum
    val a22 = rowsD.map(x => (x._3 - m2) * (x._3 - m2)).sum
    val a12 = rowsD.map(x => (x._2 - m1) * (x._3 - m2)).sum
    val c1 = rowsD.map(x => (x._2 - m1) * (x._1 - my)).sum
    val c2 = rowsD.map(x => (x._3 - m2) * (x._1 - my)).sum
    val det = a11 * a22 - a12 * a12
    val b1 = (c1 * a22 - c2 * a12) / det
    val b2 = (a11 * c2 - a12 * c1) / det
    val b0 = my - b1 * m1 - b2 * m2
    assert(math.abs(r.getDouble(2) - b1) < 1e-4,
      s"b1 ${r.getDouble(2)} vs $b1")
    assert(math.abs(r.getDouble(3) - b2) < 1e-3)
    assert(math.abs(r.getDouble(1) - b0) < 1.0)
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 4.0)
  }
}
