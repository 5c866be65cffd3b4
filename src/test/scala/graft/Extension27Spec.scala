package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Semantics tests for the q249–q258 wave: the distributed two-pass
  * prefix-max against a brute single-partition window (q249), the
  * Count-Min overestimate invariant over EVERY key (q256, the gate only
  * audits the top 20), the Poisson-weight calibration and partition
  * invariance of the bootstrap replicates (q257), the conformal
  * threshold as a literal collect-and-sort order statistic (q250), and
  * Spearman against a from-scratch midrank computation (q255).
  */
class Extension27Spec extends SparkSpec {

  import spark.implicits._

  test("q249: block-prefix running max == brute single-partition window") {
    val e = Tables.load(spark, sf0001, "events")
      .select(col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        (col("user_id") % 4).as("shard"))
      .withColumn("arr_us", col("ts_us") + col("shard") * lit(30000000L))
      .withColumn("blk", expr("arr_us div 3600000000"))
    // the distributed shape from the query
    val wIn = Window.partitionBy("blk").orderBy("arr_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = Window.orderBy("blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prev = e.groupBy("blk").agg(max("ts_us").as("bmax"))
      .withColumn("pmax", max("bmax").over(wPrev))
      .select(col("blk"), col("pmax"))
    val twoPass = e
      .withColumn("rin", max("ts_us").over(wIn))
      .join(broadcast(prev), Seq("blk"))
      .select(col("event_id"),
        greatest(col("rin"), coalesce(col("pmax"), lit(Long.MinValue)))
          .as("runmax"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force: one global window (fine at test scale)
    val wAll = Window.orderBy("arr_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val brute = e.withColumn("runmax", max("ts_us").over(wAll))
      .select("event_id", "runmax")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(twoPass.size == brute.size && twoPass.nonEmpty)
    assert(twoPass == brute,
      "two-pass prefix max diverged from the single-partition window")
  }

  test("q256: Count-Min estimate >= exact count for EVERY word") {
    val P = graft.functions.PolyHash.Mod
    val toks = Tables.load(spark, sf0001, "documents")
      .select(explode(graft.ops.Text.words(
        graft.ops.Text.clean(col("text")))).as("w"))
      .localCheckpoint()
    def cell(w: org.apache.spark.sql.Column,
             j: org.apache.spark.sql.Column) = {
      val h = graft.functions.PolyHash(
        concat(lit("cm"), j.cast("string"), lit("#"), w))
      h * h % P % 1024
    }
    val sketch = toks
      .select(col("w"), explode(sequence(lit(0), lit(3))).as("j"))
      .select(col("j"), cell(col("w"), col("j")).as("cell"))
      .groupBy("j", "cell").agg(count(lit(1)).as("c"))
    val viol = toks.groupBy("w").agg(count(lit(1)).as("exact"))
      .select(col("w"), col("exact"),
        explode(sequence(lit(0), lit(3))).as("j"))
      .withColumn("cell", cell(col("w"), col("j")))
      .join(broadcast(sketch), Seq("j", "cell"))
      .groupBy("w").agg(first("exact").as("exact"), min("c").as("est"))
      .where(col("est") < col("exact"))
      .count()
    assert(viol == 0L,
      s"$viol words had a Count-Min estimate below their exact count")
  }

  test("q257: Poisson weights average ~1 and replicates are " +
    "partition-invariant") {
    val P = graft.functions.PolyHash.Mod
    def reps(parts: Int): Map[Long, Long] = {
      val d = Tables.load(spark, sf0001, "documents")
        .repartition(parts)
        .select(col("doc_id"), col("n_chars"),
          explode(sequence(lit(0), lit(31))).as("b"))
      val h = graft.functions.PolyHash(
        concat(lit("boot"), col("b").cast("string"), lit("#"),
          col("doc_id").cast("string")))
      val u = h * h % P % 10000
      val wgt = when(u < 3679, 0L).when(u < 7358, 1L).when(u < 9197, 2L)
        .when(u < 9810, 3L).when(u < 9963, 4L).when(u < 9994, 5L)
        .when(u < 9999, 6L).otherwise(7L)
      d.withColumn("wgt", wgt)
        .groupBy("b")
        .agg(sum(col("wgt") * col("n_chars")).as("sw"), sum("wgt").as("w"))
        .withColumn("est6", floor(col("sw").cast("double") /
          col("w").cast("double") * lit(1000000.0) + lit(0.5)).cast("long"))
        .select(col("b").cast("long"), col("est6"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val r1 = reps(1)
    val r4 = reps(4)
    assert(r1.size == 32 && r1 == r4,
      "bootstrap replicate means changed with partitioning")
    // weight calibration: mean pseudo-Poisson(1) weight within 5% of 1
    val d = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), explode(sequence(lit(0), lit(31))).as("b"))
    val h = graft.functions.PolyHash(
      concat(lit("boot"), col("b").cast("string"), lit("#"),
        col("doc_id").cast("string")))
    val u = h * h % P % 10000
    val wgt = when(u < 3679, 0L).when(u < 7358, 1L).when(u < 9197, 2L)
      .when(u < 9810, 3L).when(u < 9963, 4L).when(u < 9994, 5L)
      .when(u < 9999, 6L).otherwise(7L)
    val Seq((n, sw)) = d.select(wgt.as("wgt"))
      .agg(count(lit(1)), sum("wgt")).as[(Long, Long)].collect().toSeq
    val mean = sw.toDouble / n.toDouble
    assert(math.abs(mean - 1.0) < 0.05,
      s"mean pseudo-Poisson weight $mean is off the unit rate")
  }

  test("q250: threshold is literally the ceil((n+1)*0.9)-th smallest " +
    "calibration score") {
    val row = SparkEntry.queries("q250_conformal_coverage")(spark, sf0001)
      .collect().head
    val nCalib = row.getLong(0)
    val k = row.getLong(1)
    val threshold = row.getLong(2)
    val calScores = Tables.load(spark, sf0001, "documents")
      .where(graft.ext.Sampling.bucket(col("doc_id"), "conf27") < 2000)
      .select(col("n_chars")).as[Long].collect().sorted
    assert(calScores.length.toLong == nCalib)
    assert(k == math.ceil((nCalib + 1) * 0.9).toLong)
    assert(threshold == calScores((k - 1).toInt),
      s"threshold $threshold != ${calScores((k - 1).toInt)} " +
        s"(the $k-th smallest of $nCalib)")
  }

  test("q255: engine Spearman matches a from-scratch midrank computation") {
    val got = SparkEntry.queries("q255_spearman")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val docs = Tables.load(spark, sf0001, "documents")
      .select(col("lang"), col("n_chars"),
        size(array_distinct(graft.ops.Text.words(
          graft.ops.Text.clean(col("text"))))).cast("long").as("y"))
      .as[(String, Long, Long)].collect()
    def midranks(v: Seq[Long]): Map[Long, Double] = {
      val sorted = v.sorted
      v.distinct.map { x =>
        val lo = sorted.indexOf(x) + 1
        val hi = sorted.lastIndexOf(x) + 1
        x -> (lo + hi) / 2.0
      }.toMap
    }
    docs.groupBy(_._1).foreach { case (lang, rows) =>
      val rx = midranks(rows.map(_._2).toSeq)
      val ry = midranks(rows.map(_._3).toSeq)
      val pairs = rows.map(r => (rx(r._2), ry(r._3)))
      val n = pairs.length.toDouble
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val rho = (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      assert(math.abs(got(lang) - rho) < 1e-6,
        s"$lang: engine rho ${got(lang)} vs reference $rho")
    }
  }
}
