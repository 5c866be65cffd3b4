package graft

import org.apache.spark.sql.functions._

import graft.functions.PolyHash
import graft.io.Tables

/** Semantics tests for the q378–q381 wave: trailing-window ramp and
  * replay, collision-share monotonicity, the OBF Welch-z replay, and
  * the salt planner's ceiling arithmetic.
  */
class Extension60Spec extends SparkSpec {

  test("q378: the window ramps 1..7 days and trailing distincts replay") {
    val e = Tables.load(spark, sf0001, "events")
      .selectExpr("cast(ts as date)", "user_id").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val days = e.map(_._1).distinct.sorted(
      Ordering.by((d: java.time.LocalDate) => d.toEpochDay))
    val got = SparkEntry.queries("q378_rolling_sketch_union")(
      spark, sf0001).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(got.length == days.length)
    got.foreach { case (d, nDays, exact, tol) =>
      val win = e.filter(x => !x._1.isAfter(d) &&
        !x._1.isBefore(d.minusDays(6)))
      assert(nDays == win.map(_._1).distinct.length.toLong,
        s"$d window size")
      assert(exact == win.map(_._2).distinct.length.toLong,
        s"$d trailing distinct")
      assert(tol, s"$d sketch estimate out of tolerance")
    }
    // ramp: first day window = 1, steady state = 7
    val sorted = got.sortBy(_._1.toEpochDay)
    assert(sorted.head._2 == 1L && sorted.last._2 == 7L)
  }

  test("q379: mass collision share strictly decreases as the hash " +
    "dimension grows, and the 1024-dim bucket stats replay") {
    val words = Tables.load(spark, sf0001, "documents")
      .select(explode(graft.ops.Text.words(
        graft.ops.Text.clean(col("text")))).as("w"))
      .collect().map(_.getString(0))
    val vocab = words.groupBy(identity)
      .map { case (w, os) => (w, os.length.toLong, PolyHash.hash(s"tf#$w")) }
    val byBucket = vocab.groupBy(v => v._3 % 1024L)
    val collidedW = byBucket.values.filter(_.size >= 2)
      .map(_.size.toLong).sum
    val collidedM = byBucket.values.filter(_.size >= 2)
      .flatMap(_.map(_._2)).sum
    val rows = SparkEntry.queries("q379_hash_collision_audit")(
      spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.map(_._1).toSeq == Seq(1024L, 4096L, 16384L))
    val r1024 = rows.head
    assert(r1024._2 == byBucket.size.toLong)
    assert(r1024._3 == vocab.size.toLong)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r1024._4 == r6(collidedW.toDouble / vocab.size.toDouble))
    assert(r1024._5 == r6(collidedM.toDouble / words.length.toDouble))
    rows.sliding(2).foreach { w =>
      assert(w(0)._5 >= w(1)._5,
        s"mass collision share must not grow with dim: $w")
    }
  }

  test("q380: the final look's Welch z replays from exact cell sums " +
    "and boundaries are the published OBF values") {
    val rows = SparkEntry.queries("q380_obrien_fleming")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5)))
    assert(rows.map(_._5).toSeq ==
      Seq(4.8769, 3.3569, 2.6803, 2.2898, 2.0310))
    // n monotone over looks
    rows.sliding(2).foreach(w => assert(w(0)._2 <= w(1)._2 &&
      w(0)._3 <= w(1)._3))
    val cells = Tables.load(spark, sf0001, "events")
      .where(col("event_type") === "purchase")
      .selectExpr("user_id", "value").collect()
      .map { r =>
        val uid = r.getLong(0)
        val h = PolyHash.hash(s"exp7#$uid")
        val t = (h * h % 1000000007L) % 10000L < 5000L
        (t, math.floor(r.getDouble(1) * 100 + 0.5).toLong)
      }
    def stats(t: Boolean) = {
      val xs = cells.filter(_._1 == t).map(_._2)
      val n = xs.length.toDouble
      val s = xs.sum.toDouble
      val q = xs.map(x => x * x).sum.toDouble
      (n, s / n, (q - s * s / n) / (n - 1.0))
    }
    val (nt, mt, vt) = stats(true)
    val (nc, mc, vc) = stats(false)
    val z = (mt - mc) / math.sqrt(vt / nt + vc / nc)
    val last = rows.last
    assert(last._2 == nt.toLong && last._3 == nc.toLong)
    assert(math.abs(last._4 - z) < 2e-6,
      s"final-look z ${last._4} vs replay $z")
    assert(last._6 == (math.abs(last._4) >= last._5))
  }

  test("q381: every advisory row is over target with the ceiling salt " +
    "factor") {
    val rows = SparkEntry.queries("q381_salt_planner")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (w, n, f, share) =>
      assert(n > 200L, s"$w under target")
      assert(f == (n + 199L) / 200L, s"$w salt factor")
      assert(share > 0.0 && share < 1.0)
    }
    // descending count order with the word tiebreak
    rows.sliding(2).foreach(w =>
      assert(w(0)._2 > w(1)._2 ||
        (w(0)._2 == w(1)._2 && w(0)._1 < w(1)._1)))
  }
}
