package graft

import org.apache.spark.sql.functions._

import graft.io.Tables

/** Semantics tests for the q430–q433 wave: TOST identities, Lloyd
  * monotonicity, component structure, and the design-effect algebra.
  */
class Extension73Spec extends SparkSpec {

  test("q430: z statistics differ by exactly 2*delta/SE and verdicts " +
    "compose") {
    val r = SparkEntry.queries("q430_tost_equivalence")(spark, sf0001)
      .collect().head
    val (se, zl, zu) = (r.getDouble(5), r.getDouble(6), r.getDouble(7))
    assert(math.abs((zl - zu) - 0.04 / se) < 1e-3)
    assert(r.getBoolean(10) == (r.getBoolean(8) && r.getBoolean(9)))
    val e = Tables.load(spark, sf0001, "events")
      .select(col("user_id"), col("event_type")).collect()
      .map(x => (x.getLong(0) % 2 == 0, x.getString(1) == "purchase"))
    val (na, ka) = (e.count(_._1), e.count(p => p._1 && p._2))
    val (nb, kb) = (e.count(!_._1), e.count(p => !p._1 && p._2))
    assert(r.getLong(0) == na.toLong && r.getLong(1) == nb.toLong)
    assert(math.abs(r.getDouble(2) - ka.toDouble / na) < 1e-5)
    assert(math.abs(r.getDouble(3) - kb.toDouble / nb) < 1e-5)
  }

  test("q431: Lloyd's codebook beats the uniform grid it started from, " +
    "stays sorted, and covers every point") {
    val rows = SparkEntry.queries("q431_lloyd_max_quantizer")(
      spark, sf0001).collect()
    assert(rows.length == 8)
    // Lloyd monotonically decreases MSE from the uniform init
    rows.foreach { r =>
      assert(r.getDouble(3) <= r.getDouble(4) + 1e-9,
        s"lloyd ${r.getDouble(3)} worse than uniform ${r.getDouble(4)}")
      assert(math.abs(r.getDouble(5)
        - math.floor((1.0 - r.getDouble(3) / r.getDouble(4)) * 1e6 + 0.5)
          / 1e6) < 2e-6)
    }
    val cents = rows.map(_.getDouble(1))
    assert(cents.sameElements(cents.sorted), "centroids out of order")
    val n = Tables.load(spark, sf0001, "events").count()
    assert(rows.map(_.getLong(2)).sum == n)
  }

  test("q432: clusters are exactly the connected components of the " +
    "dense-cell grid and the point counts partition the corpus") {
    val rows = SparkEntry.queries("q432_grid_dbscan")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pts = Tables.load(spark, sf0001, "embeddings")
      .select(element_at(col("embedding"), 1).cast("double"),
        element_at(col("embedding"), 2).cast("double"))
      .collect()
      .map(r => (math.floor(r.getDouble(0) / 0.1).toLong,
        math.floor(r.getDouble(1) / 0.1).toLong))
    assert(rows.map(_._3).sum == pts.length.toLong)
    val dense = pts.groupBy(identity).filter(_._2.length >= 5).keys.toSet
    // naive BFS component count
    var unvisited = dense
    var comps = 0
    while (unvisited.nonEmpty) {
      comps += 1
      var frontier = Set(unvisited.head)
      unvisited -= unvisited.head
      while (frontier.nonEmpty) {
        val next = frontier.flatMap { case (x, y) =>
          for {
            dx <- -1L to 1L; dy <- -1L to 1L
            c = (x + dx, y + dy) if unvisited.contains(c)
          } yield c
        }
        unvisited --= next
        frontier = next
      }
    }
    val clusterRows = rows.filter(_._1 >= 0)
    assert(clusterRows.length == comps,
      s"${clusterRows.length} clusters vs $comps naive components")
    assert(clusterRows.map(_._2).sum == dense.size.toLong)
    assert(rows.exists(_._1 == -1L))
  }

  test("q433: the design effect replays from the moment sums and the " +
    "weights sum to one") {
    val rows = SparkEntry.queries("q433_design_effect")(spark, sf0001)
      .collect()
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-4)
    val o = Tables.load(spark, sf0001, "orders")
      .select(col("o_orderpriority"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1).toDouble))
    val n = o.length.toDouble
    val mean = o.map(_._2).sum / n
    val varAll = o.map(x => (x._2 - mean) * (x._2 - mean)).sum / n
    val wv = o.groupBy(_._1).values.map { g =>
      val m = g.map(_._2).sum / g.length
      g.map(x => (x._2 - m) * (x._2 - m)).sum / g.length * g.length
    }.sum / n
    val deff = wv / varAll
    rows.foreach { r =>
      assert(math.abs(r.getDouble(4) - deff) < 1e-4,
        s"deff ${r.getDouble(4)} vs naive $deff")
      assert(math.abs(r.getDouble(5) - n / deff) < 1.0)
      // stratification can only help or match: DEFF <= 1
      assert(r.getDouble(4) <= 1.0 + 1e-9)
    }
  }
}
