package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.ExtensionQueries33

/** Semantics tests for the q293–q295 wave: DeLong components from
  * brute per-row placements, the bootstrap replicates replayed from the
  * collected fixture, and the DR estimator recomputed row-by-row.
  */
class Extension33Spec extends SparkSpec {

  private def run(name: String) =
    ExtensionQueries33.queries.find(_.name == name).get.fn(spark, sf0001)

  test("q294: DeLong AUC/SE == brute per-row placement computation") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select("source", "lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1) == "en", r.getLong(2)))
    val got = run("q294_delong_auc_se")
      .select("source", "auc", "se").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(got.nonEmpty)
    for ((src, auc, se) <- got) {
      val pos = docs.filter(d => d._1 == src && d._2).map(_._3)
      val neg = docs.filter(d => d._1 == src && !d._2).map(_._3)
      val v10 = pos.map(p =>
        (neg.count(_ < p) + neg.count(_ == p) / 2.0) / neg.length)
      val v01 = neg.map(n =>
        (pos.count(_ > n) + pos.count(_ == n) / 2.0) / pos.length)
      val bAuc = v10.sum / v10.length
      def varOf(xs: Seq[Double]) = {
        val m = xs.sum / xs.length
        xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
      }
      val bSe = math.sqrt(varOf(v10) / pos.length + varOf(v01) / neg.length)
      assert(math.abs(auc - bAuc) < 2e-6, s"src=$src auc $auc vs $bAuc")
      assert(math.abs(se - bSe) < 2e-6, s"src=$src se $se vs $bSe")
    }
  }

  test("q293: replicate diffs replay from the collected fixture") {
    val P = graft.functions.PolyHash.Mod
    val ev = Tables.load(spark, sf0001, "events")
      .select(col("event_id"), (col("user_id") % 2).as("variant"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast("long")
          .as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def wgt(b: Int, id: Long): Long = {
      val h = graft.functions.PolyHash.hash(s"bdiff$b#$id")
      val u = h * h % P % 10000
      if (u < 3679) 0L else if (u < 7358) 1L else if (u < 9197) 2L
      else if (u < 9810) 3L else if (u < 9963) 4L else if (u < 9994) 5L
      else if (u < 9999) 6L else 7L
    }
    val diffs = (0 until 32).map { b =>
      def est6(variant: Long): Long = {
        val rows = ev.filter(_._2 == variant)
        val sw = rows.map(r => wgt(b, r._1) * r._3).sum
        val w = rows.map(r => wgt(b, r._1)).sum
        math.floor(sw.toDouble / w.toDouble * 10000.0 + 0.5).toLong
      }
      est6(0L) - est6(1L)
    }
    val got = run("q293_bootstrap_diff_ci")
      .select("ci_lo", "ci_hi", "b_reps").collect().head
    assert(got.getLong(2) == 32L)
    assert(got.getDouble(0) == diffs.min / 1e6)
    assert(got.getDouble(1) == diffs.max / 1e6)
  }

  test("q295: DR estimate == brute per-row doubly-robust replay") {
    val ev = Tables.load(spark, sf0001, "events")
      .select((col("user_id") % 4).as("segment"),
        col("event_type").as("cat"),
        when(graft.ext.Sampling.bucket(col("event_id"), "ips1") < 3000,
          1L).otherwise(0L).as("a"),
        when(col("event_type") === "purchase" && col("value") > 20.0,
          1L).otherwise(0L).as("r"),
        when(col("value") > 50.0, 1L).otherwise(0L).as("pi"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val m = ev.groupBy(e => (e._2, e._3))
      .map { case (k, rs) => k -> rs.map(_._4).sum.toDouble / rs.length }
    val got = run("q295_doubly_robust_eval")
      .select("segment", "dr_estimate").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.nonEmpty)
    for ((seg, dr) <- got) {
      val rows = ev.filter(_._1 == seg)
      val terms = rows.map { case (_, cat, a, r, pi) =>
        val mpi = m((cat, pi))
        val ma = m((cat, a))
        val w = if (a == 1L) 0.3 else 0.7
        val v = mpi + (if (pi == a) (r.toDouble - ma) / w else 0.0)
        math.floor(v * 1e9 + 0.5).toLong
      }
      val brute = terms.sum.toDouble / rows.length / 1e9
      assert(math.abs(dr - brute) < 2e-6, s"seg=$seg dr $dr vs $brute")
    }
  }
}
