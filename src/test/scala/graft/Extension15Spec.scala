package graft

import org.apache.spark.sql.functions._

/** Round-7 ninth wave: hybrid RRF, LSH quality, deletion cascade. */
class Extension15Spec extends SparkSpec {

  import spark.implicits._

  test("hybrid rrf: fused ranks reward dual-channel hits; rrf weights " +
    "are exact reciprocal sums") {
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q180_hybrid_rrf")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3)))
    val probes = out.map(_._1).distinct.sorted
    assert(probes.nonEmpty && probes.forall(_ % 100 == 0))
    // each probe emits at most 5, ranks dense from 1, rrf non-increasing
    probes.foreach { p =>
      val rows = out.filter(_._1 == p).sortBy(_._2)
      assert(rows.map(_._2).toSeq == (1 to rows.length))
      assert(rows.map(_._4).toSeq == rows.map(_._4).toSeq.sorted.reverse)
      // every rrf is a sum of at most two reciprocals from the legal
      // set (the emitted value is stableRound6'd -> 1e-6 grid tolerance)
      val legal = (1 to 10).map(r => 1.0 / (60.0 + r))
      rows.foreach { case (_, _, _, s) =>
        val ok = legal.exists(a => math.abs(a - s) <= 1e-6) ||
          legal.exists(a => legal.exists(b =>
            math.abs(a + b - s) <= 1e-6))
        assert(ok, s"rrf $s is not a legal reciprocal sum")
      }
    }
  }

  test("lsh quality: recall 1.0 on the fixture (no false negatives at " +
    "the banding operating point) and counts cross-check q44/q45") {
    val sf = "/root/testdata/sf0.001"
    val r = SparkEntry.queries("q181_lsh_quality")(spark, sf).collect().head
    val (nExact, nCand, nHit) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val exact = SparkEntry.queries("q44_jaccard_pairs")(spark, sf).count()
    val cand = SparkEntry.queries("q45_minhash_candidates")(spark, sf).count()
    assert(nExact == exact && nCand == cand)
    assert(nHit <= math.min(nExact, nCand))
    assert(r.getDouble(4) == 1.0,
      s"recall must be 1.0 on the fixture, got ${r.getDouble(4)}")
    assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
  }

  test("deletion cascade: counts match direct per-table recomputes") {
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q182_deletion_cascade")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cust = graft.io.Tables.load(spark, sf, "customer")
      .where(col("c_custkey") % 37 === 0)
    val custKeys = cust.select("c_custkey").collect().map(_.getLong(0)).toSet
    val orders = graft.io.Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_custkey").collect()
      .filter(r => custKeys(r.getLong(1)))
    val orderKeys = orders.map(_.getLong(0)).toSet
    val lines = graft.io.Tables.load(spark, sf, "lineitem")
      .select("l_orderkey").collect().count(r => orderKeys(r.getLong(0)))
    assert(out == Map("customer" -> custKeys.size.toLong,
      "orders" -> orders.length.toLong, "lineitem" -> lines.toLong))
    assert(out("customer") > 0, "fixture must request deletions")
  }

  test("pareto frontier: kept set equals a naive O(n^2) dominance " +
    "recompute on sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.io.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect().map { r =>
        val ws = r.getString(1).replaceAll("[^a-zA-Z0-9 ]", "")
          .split(" ").filter(_.nonEmpty)
        val q = math.floor(
          ws.distinct.length.toDouble / ws.length * 1e6 + 0.5) / 1e6
        (r.getLong(0), ws.length.toLong, q)
      }
    val expected = docs.filter { case (_, t, q) =>
      !docs.exists { case (_, t2, q2) => t2 > t && q2 > q }
    }.map(_._1).toSet
    val got = SparkEntry.queries("q183_pareto_frontier")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(got == expected)
    assert(got.nonEmpty && got.size < docs.length)
  }
}
