package graft

import org.apache.spark.sql.functions._

import graft.io.Tables

/** Semantics tests for the q414–q417 wave: classifier structure, stump
  * replay, fairness identities, and the pass@k closed form.
  */
class Extension69Spec extends SparkSpec {

  test("q414: the test split scores every held-out doc exactly once and " +
    "accuracy replays from the counts") {
    val rows = SparkEntry.queries("q414_naive_bayes_langid")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      val acc = r.getLong(2).toDouble / r.getLong(1)
      assert(math.abs(r.getDouble(3)
        - math.floor(acc * 1e6 + 0.5) / 1e6) < 1e-12)
    }
    // every language present in the corpus scores some test docs
    val langs = Tables.load(spark, sf0001, "documents")
      .select("lang").distinct().collect().map(_.getString(0)).sorted
    assert(rows.map(_.getString(0)).sorted.sameElements(langs))
    // the split is ~20%, not the skewed raw-mod trap
    val nTest = rows.map(_.getLong(1)).sum
    val nDocs = Tables.load(spark, sf0001, "documents").count()
    assert(nTest > nDocs / 10 && nTest < nDocs * 3 / 10,
      s"test fraction ${nTest.toDouble / nDocs} out of band")
  }

  test("q415: stump impurities replay naively and the argmin is flagged") {
    val rows = SparkEntry.queries("q415_decision_stump")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5)))
    val li = Tables.load(spark, sf0001, "lineitem")
      .select(col("l_quantity").cast("long"),
        (col("l_returnflag") === "R").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = li.length
    def gini(pos: Long, tot: Long): Double =
      1.0 - (pos.toDouble * pos + (tot - pos).toDouble * (tot - pos)) /
        (tot.toDouble * tot)
    val p = li.map(_._2).sum
    rows.foreach { case (t, nl, nr, gw, gain, _) =>
      val left = li.filter(_._1 <= t)
      assert(left.length.toLong == nl && (n - left.length).toLong == nr)
      val posl = left.map(_._2).sum
      val naive = (nl * gini(posl, nl) + nr * gini(p - posl, nr)) / n
      assert(math.abs(gw - naive) < 1e-6, s"t=$t gw $gw vs $naive")
      assert(math.abs(gain - (gini(p, n) - naive)) < 1e-5)
    }
    val best = rows.filter(_._6)
    assert(best.nonEmpty)
    assert(best.map(_._4).distinct.length == 1)
    assert(best.head._4 == rows.map(_._4).min)
  }

  test("q416: fairness gaps are rate differences vs the pooled rate and " +
    "group counts partition the corpus") {
    val rows = SparkEntry.queries("q416_fairness_audit")(spark, sf0001)
      .collect()
    val nDocs = Tables.load(spark, sf0001, "documents").count()
    assert(rows.map(_.getLong(1)).sum == nDocs)
    // Σ n_g · (sel_g − pooled) = 0 up to rounding
    val weighted = rows.map(r => r.getLong(1) * r.getDouble(5)).sum
    assert(math.abs(weighted) < nDocs * 1e-5, s"dp gaps don't balance")
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
      if (!r.isNullAt(3)) assert(r.getDouble(3) >= 0.0
        && r.getDouble(3) <= 1.0)
      if (!r.isNullAt(4)) assert(r.getDouble(4) >= 0.0
        && r.getDouble(4) <= 1.0)
    }
  }

  test("q417: pass@k matches the exact combinatorial form and is " +
    "monotone in k") {
    val rows = SparkEntry.queries("q417_pass_at_k")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
      .sortBy(_._1)
    // monotone: larger k can only raise the pass probability
    assert(rows.toSeq.sliding(2).forall {
      case Seq(a, b) => b._3 >= a._3 - 1e-9
      case _ => true
    })
    val trials = Tables.load(spark, sf0001, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("c"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    def passAtK(n: Long, c: Long, k: Long): Double =
      if (n - c < k) 1.0
      else 1.0 - (0L until k).map(i =>
        (n - c - i).toDouble / (n - i)).product
    rows.foreach { case (k, nTasks, pk) =>
      val el = trials.filter(_._1 >= k)
      assert(el.length.toLong == nTasks)
      val snapped = el.map { case (n, c) =>
        math.floor(passAtK(n, c, k) * 1e9 + 0.5) / 1e9 }
      val mean = snapped.sum / el.length
      assert(math.abs(pk - mean) < 1e-5, s"k=$k pass $pk vs naive $mean")
    }
  }
}
