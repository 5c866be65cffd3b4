package graft

import org.apache.spark.sql.functions._

import graft.io.Tables

/** Semantics tests for the q382–q385 wave: cosine bounds and replay,
  * the Chebyshev theorem holding, RLE run replay, and entropy bounds.
  */
class Extension61Spec extends SparkSpec {

  test("q382: cosine replays from explicit supplier part-sets and is " +
    "in (0, 1]") {
    val ps = Tables.load(spark, sf0001, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val bySupp = ps.groupBy(_._2).map { case (sk, es) =>
      sk -> es.map(_._1).toSet
    }
    val rows = SparkEntry.queries("q382_bipartite_cosine")(spark, sf0001)
      .collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val shared = (bySupp(a) intersect bySupp(b)).size.toLong
      assert(r.getLong(2) == shared, s"shared for ($a,$b)")
      assert(r.getLong(3) == bySupp(a).size.toLong)
      assert(r.getLong(4) == bySupp(b).size.toLong)
      val c = shared.toDouble /
        math.sqrt(bySupp(a).size.toDouble * bySupp(b).size.toDouble)
      assert(r.getDouble(5) == math.floor(c * 1e6 + 0.5) / 1e6)
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0)
    }
  }

  test("q383: the Chebyshev bound holds on every (type, k) row — a " +
    "false would be a computation bug, not a data property") {
    val rows = SparkEntry.queries("q383_chebyshev_audit")(spark, sf0001)
      .collect()
    assert(rows.length == 15)
    rows.foreach { r =>
      assert(r.getBoolean(6), s"Chebyshev violated?! $r")
      assert(r.getDouble(4) <= r.getDouble(5) + 1e-9)
    }
    // tails shrink as k grows within each type
    rows.groupBy(_.getString(0)).values.foreach { g =>
      val s = g.sortBy(_.getLong(1)).map(_.getLong(3))
      s.sliding(2).foreach(w => assert(w(0) >= w(1)))
    }
  }

  test("q384: natural runs replay from a per-order fold and bracket " +
    "the sorted best case") {
    val li = Tables.load(spark, sf0001, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val runs = li.groupBy(_._1).values.map { g =>
      val vs = g.sortBy(e => (e._2, e._3)).map(_._3)
      1L + vs.zip(vs.drop(1)).count(p => p._1 != p._2).toLong
    }.sum
    val row = SparkEntry.queries("q384_rle_layout_audit")(spark, sf0001)
      .where(col("column") === "l_returnflag").head()
    assert(row.getLong(1) == li.length.toLong)
    assert(row.getLong(2) == runs, s"natural runs ${row.getLong(2)} != $runs")
    assert(row.getLong(3) == li.map(_._3).distinct.length.toLong)
    assert(row.getLong(3) <= row.getLong(2))
  }

  test("q385: entropies are in [0, ln ns], predictability in [0, 1], " +
    "and the overall entropy is the weighted mean of rows") {
    val rows = SparkEntry.queries("q385_transition_entropy")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val lnNs = math.log(rows.length.toDouble)
    val overall = rows.head._5
    rows.foreach { r =>
      assert(r._3 >= 0.0 && r._3 <= lnNs + 1e-9, s"entropy bounds $r")
      assert(r._4 >= -1e-9 && r._4 <= 1.0, s"predictability bounds $r")
      assert(r._5 == overall)
    }
    val tn = rows.map(_._2).sum.toDouble
    val wmean = rows.map(r => r._2.toDouble / tn * r._3).sum
    assert(math.abs(overall - wmean) < 1e-4,
      s"overall $overall vs weighted mean $wmean")
  }
}
