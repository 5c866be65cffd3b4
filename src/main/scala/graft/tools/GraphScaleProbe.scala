package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Graph

/** Dev diagnostic (r8 verdict item 7): graph-family scaling — grow a
  * co-purchase-shaped graph ~10× and measure how the q288 wedge
  * enumeration (hub-capped Adamic-Adar), q319 HITS iterations, and q273
  * k-core peel actually scale, printing the measured growth exponent
  * alpha where cost(10n) ≈ cost(n)·10^alpha.
  *
  * The synthetic graph mimics the co-purchase shape: `n` "orders" of 3
  * items drawn from a FIXED 5000-part catalog with a Zipf-ish skew
  * (item id = floor(u^2 · catalog) — heavy head, long tail), so degrees
  * are power-law-ish like a real co-purchase graph and the edge count
  * GROWS with order volume (the real 100×-more-orders story: the
  * catalog doesn't grow 100× with traffic). Edges = support>=2
  * co-pairs, exactly q288's construction. Expectations:
  *  - CAPPED wedge count grows ~linearly in edges (alpha ≈ 1): the cap
  *    bounds per-center work, so total work tracks edge count — while
  *    the UNCAPPED count grows super-linearly (the head items' deg²).
  *  - HITS / k-core are per-iteration linear in edges (alpha ≈ 1).
  * Run: sbt "runMain graft.tools.GraphScaleProbe"
  */
object GraphScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(appName = "graph-scale-probe")
    import spark.implicits._

    // n orders × 3 items each, fixed catalog, quadratic skew on the draw
    def copurchaseEdges(n: Long): DataFrame = {
      val catalog = 5000L
      val li = spark.range(n).toDF("oid")
        .withColumn("slot", explode(array(lit(1), lit(2), lit(3))))
        .withColumn("u",
          pmod(hash(col("oid") * 31 + col("slot")).cast("long"), lit(1000000L))
            .cast("double") / 1000000.0)
        .select(col("oid"),
          floor(col("u") * col("u") * catalog).cast("long").as("item"))
        .distinct()
      val l2 = li.toDF("oid", "item2")
      li.join(l2, "oid").where(col("item") < col("item2"))
        .groupBy(col("item").as("da"), col("item2").as("db"))
        .agg(count(lit(1)).as("sup"))
        .where(col("sup") >= 2).select("da", "db")
    }

    def timed(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = body
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    val results = Seq(100000L, 1000000L).map { n =>
      val edges = copurchaseEdges(n).cache()
      val m = edges.count()
      val und = edges.select(col("da").as("src"), col("db").as("dst"))
        .unionAll(edges.select(col("db").as("src"), col("da").as("dst")))
      val degRow = und.groupBy("src").agg(count(lit(1)).as("deg"))
        .agg(max("deg").as("dmax"),
          sum(col("deg") * (col("deg") - 1)).as("w2_uncapped"),
          sum(when(col("deg") <= 64,
            col("deg") * (col("deg") - 1)).otherwise(0L))
            .as("w2_cap64")).head()
      val deg = (degRow.getLong(0), degRow.getLong(1) / 2,
        degRow.getLong(2) / 2)
      val (tAA, aaRows) = timed(Graph.adamicAdar(und, hubCap = 64L).count())
      val (tHits, _) = timed(Graph.hits(edges, iters = 4).count())
      val (tTri, _) = timed(Graph.localTriangleCounts(und).count())
      println(f"n_orders=$n%-8d edges=$m%-9d deg_max=${deg._1}%-6d " +
        f"wedges_uncapped=${deg._2}%-12d wedges_cap64=${deg._3}%-12d")
      println(f"  adamic_adar(cap=64) ${tAA}%7.2fs rows=$aaRows%-10d " +
        f"hits(4 iters) ${tHits}%6.2fs  triangles ${tTri}%6.2fs")
      edges.unpersist()
      (m.toDouble, deg._2.toDouble, deg._3.toDouble,
        tAA, tHits, tTri)
    }
    val (m1, wu1, wc1, a1, h1, t1) = results(0)
    val (m2, wu2, wc2, a2, h2, t2) = results(1)
    def alpha(x1: Double, x2: Double): Double =
      math.log(x2 / x1) / math.log(m2 / m1)
    println(f"growth exponents per EDGE-count growth (alpha: y ~ m^alpha):")
    println(f"  wedges_uncapped alpha=${alpha(wu1, wu2)}%.2f  " +
      f"wedges_cap64 alpha=${alpha(wc1, wc2)}%.2f")
    println(f"  t_adamic_adar alpha=${alpha(a1, a2)}%.2f  " +
      f"t_hits alpha=${alpha(h1, h2)}%.2f  t_triangles alpha=${alpha(t1, t2)}%.2f")
    spark.stop()
  }
}
