package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.ExtensionQueries34

/** Semantics tests for q296/q297: the dataset card recomputed from the
  * collected fixture and the Simpson audit's reversal flag replayed
  * against brute stratified rates.
  */
class Extension34Spec extends SparkSpec {

  private def run(name: String) =
    ExtensionQueries34.queries.find(_.name == name).get.fn(spark, sf0001)

  test("q296: card signals == brute recomputation per source") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select("source", "lang", "n_chars", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getString(3)))
    val got = run("q296_dataset_card").collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val src = r.getString(0)
      val mine = docs.filter(_._1 == src)
      assert(r.getLong(1) == mine.length.toLong)
      assert(r.getLong(2) == mine.map(_._3).sum)
      assert(r.getLong(3) == mine.map(_._2).distinct.length.toLong)
      val n = mine.length.toDouble
      val ent = -mine.groupBy(_._2).values
        .map(g => g.size / n * math.log(g.size / n)).sum
      assert(math.abs(r.getDouble(4) - ent) < 2e-6,
        s"src=$src entropy ${r.getDouble(4)} vs $ent")
      val dup = (mine.length -
        mine.map(d => graft.functions.PolyHash.hash(d._4)).distinct.length) / n
      assert(math.abs(r.getDouble(5) - dup) < 2e-6)
      val en = mine.count(_._2 == "en") / n
      assert(math.abs(r.getDouble(6) - en) < 2e-6)
    }
  }

  test("q297: reversal flags match brute stratified rate differences") {
    val ev = Tables.load(spark, sf0001, "events")
      .select(col("event_type"), (col("user_id") % 2).as("cohort"),
        when(col("value") > 50.0, 1L).otherwise(0L).as("y"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def diff(rows: Seq[(String, Long, Long)]): Double = {
      val c1 = rows.filter(_._2 == 1L)
      val c0 = rows.filter(_._2 == 0L)
      c1.map(_._3).sum.toDouble / c1.length -
        c0.map(_._3).sum.toDouble / c0.length
    }
    val overall = diff(ev.toSeq)
    val got = run("q297_simpson_audit").collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getBoolean(4)))
    assert(got.exists(_._1 == "__all"))
    for ((stratum, rd, reversed) <- got if stratum != "__all") {
      val brute = diff(ev.filter(_._1 == stratum).toSeq)
      assert(math.abs(rd - brute) < 2e-6,
        s"stratum=$stratum diff $rd vs $brute")
      assert(reversed == (math.signum(brute) != math.signum(overall)),
        s"stratum=$stratum reversed flag mismatch")
    }
  }
}
