package graft.tools

import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Dev diagnostic (round-2 verdict stretch item): does
  * [[Dedup.canonicalize]] develop a straggler on a mega-component?
  *
  * Two planted shapes, both a SINGLE connected component over n nodes:
  *  - chain 0–1–…–n: worst-case diameter — stresses the round count
  *    (pointer halving must keep it ~log₂ n, not n).
  *  - random recursive tree (each node i links to a uniform j < i):
  *    O(log n) diameter — converges in few rounds, but by round 2 most
  *    rows carry label 0, so the pointer-halving join
  *    (`merged.label == byLabel.lid`) funnels nearly every row through
  *    ONE shuffle key. That is the straggler candidate; AQE skew-join
  *    splitting is the built-in mitigation this probe measures.
  */
object CcSkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(appName = "cc-skew-probe")

    def run(label: String, pairs: org.apache.spark.sql.DataFrame, n: Long): Unit = {
      val t0 = System.nanoTime()
      val out = Dedup.canonicalize(pairs)
      val (comps, rows) = {
        val r = out.agg(countDistinct("label"), count(lit(1))).head()
        (r.getLong(0), r.getLong(1))
      }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$label%-28s $dt%7.2fs  nodes=$rows  components=$comps")
      assert(comps == 1L, s"$label: expected one component, got $comps")
    }

    val n = 100000L
    val chain = spark.range(n - 1)
      .select(col("id").as("da"), (col("id") + 1).as("db"))
    run(s"chain n=$n", chain, n)

    // xxhash64-derived parent: uniform in [0, i) — one giant low-diameter
    // component with heavy label skew after the first round
    val tree = spark.range(1, n)
      .select(col("id").as("da"),
        pmod(xxhash64(col("id")), greatest(col("id"), lit(1L))).as("db"))
    run(s"random_tree n=$n", tree, n)

    spark.stop()
  }
}
