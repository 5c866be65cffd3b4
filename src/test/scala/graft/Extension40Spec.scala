package graft

import graft.queries.ExtensionQueries40

/** Semantics tests for the round-8 fifteenth continuation wave. */
class Extension40Spec extends SparkSpec {

  test("q315 engagement scores come out in exact descending order and " +
    "are nonnegative") {
    val out = ExtensionQueries40.queries.find(_.name ==
      "q315_decayed_engagement").get.fn(spark, sf0001).collect()
    assert(out.nonEmpty)
    val scores = out.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores.forall(_ >= 0.0))
  }

  test("q316 multi-probe recall dominates single-probe per query (the " +
    "candidate-superset property)") {
    val out = ExtensionQueries40.queries.find(_.name ==
      "q316_multiprobe_lsh").get.fn(spark, sf0001).collect()
    assert(out.length == 30)
    out.foreach { r =>
      val nS = r.getLong(1)
      val nM = r.getLong(2)
      // multi's candidate set is a superset ranked by the same global
      // cosine key, so it can only gain brute-top-10 members
      assert(nM >= nS, s"query ${r.getLong(0)}: multi $nM < single $nS")
      assert(nS >= 0 && nM <= 10)
    }
    // and the gain must be real somewhere, else the probe picks are dead
    assert(out.map(r => r.getLong(2) - r.getLong(1)).sum > 0,
      "multi-probe recovered nothing beyond single-probe")
  }

  test("q317 operating points are F1-sorted and internally consistent " +
    "(F1 = harmonic mean of the emitted P/R)") {
    val out = ExtensionQueries40.queries.find(_.name ==
      "q317_f1_threshold").get.fn(spark, sf0001).collect()
    assert(out.length == 5)
    val f1s = out.map(_.getDouble(6))
    assert(f1s.zip(f1s.tail).forall { case (a, b) => a >= b })
    out.foreach { r =>
      val (tp, fp, fn) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val p = r.getDouble(4)
      val rec = r.getDouble(5)
      val f1 = r.getDouble(6)
      assert(p >= 0.0 && p <= 1.0 && rec >= 0.0 && rec <= 1.0)
      assert(math.abs(p - tp.toDouble / (tp + fp)) < 1e-6)
      assert(math.abs(rec - tp.toDouble / (tp + fn)) < 1e-6)
      assert(math.abs(f1 - 2.0 * tp / (2.0 * tp + fp + fn)) < 1e-6)
      // F1 is the harmonic mean of the emitted precision/recall
      assert(math.abs(f1 - 2 * p * rec / (p + rec)) < 1e-4)
    }
  }
}
