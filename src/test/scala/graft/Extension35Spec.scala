package graft

import org.apache.spark.sql.functions._

import graft.functions.JaroWinkler
import graft.queries.ExtensionQueries35

/** Semantics tests for the round-8 tenth continuation wave: the
  * Jaro-Winkler expression's pinned DuckDB semantics (q298), the power
  * iteration's unit-vector/self-consistency invariants (q299), and the
  * ACF gate's exact-integer core (q300) — the properties the DuckDB
  * oracle can't see (it replays the same arithmetic; these check the
  * arithmetic is RIGHT).
  */
class Extension35Spec extends SparkSpec {

  import spark.implicits._

  test("jaro_winkler matches the textbook worked examples byte-for-byte") {
    // classic pairs with hand-verified values (also probed against
    // DuckDB's jaro_winkler_similarity during development)
    assert(JaroWinkler.sim("martha", "marhta") == 0.9611111111111111)
    assert(math.abs(JaroWinkler.sim("DIXON", "DICKSONX") -
      0.8133333333333332) < 1e-15)
    // either side empty -> 0.0, INCLUDING both empty (DuckDB pin)
    assert(JaroWinkler.sim("", "") == 0.0)
    assert(JaroWinkler.sim("", "abc") == 0.0)
    assert(JaroWinkler.sim("abc", "") == 0.0)
    // identical strings -> exactly 1.0
    assert(JaroWinkler.sim("same", "same") == 1.0)
    // no matching bytes -> 0.0
    assert(JaroWinkler.sim("abc", "xyz") == 0.0)
  }

  test("jaro_winkler operates on UTF-8 BYTES (DuckDB semantics), " +
    "not code points") {
    // 'café' is 5 UTF-8 bytes vs 'cafe' 4: m=3, jaro=(3/5+3/4+1)/3,
    // prefix 3 -> boosted. A code-point implementation would give
    // 0.8833...; the byte pin gives 0.8483...
    assert(math.abs(JaroWinkler.sim("café", "cafe") -
      0.8483333333333334) < 1e-15)
    // three-byte CJK: 9 bytes each, 8 match, 4-byte prefix boost
    assert(math.abs(JaroWinkler.sim("日本語", "日本誤") -
      0.9555555555555556) < 1e-15)
  }

  test("jaro_winkler boost gates at jaro > 0.7 with a 4-byte prefix cap") {
    // shared 6-byte prefix but cap at 4: jw = j + 4*0.1*(1-j)
    val j = JaroWinkler.sim("prefixab", "prefixba")
    // m=8 (all bytes match within window), t=1 -> jaro=(1+1+7/8)/3
    val jaro = (1.0 + 1.0 + 7.0 / 8.0) / 3.0
    assert(math.abs(j - (jaro + 4 * 0.1 * (1.0 - jaro))) < 1e-15)
  }

  test("codegen and interpreted paths agree on fixture prefixes") {
    val t = graft.io.Tables.load(spark, sf0001, "documents")
      .select(substring(col("text"), 1, 40).as("s"))
      .limit(50).collect().map(_.getString(0))
    val df = t.zip(t.reverse).toSeq.toDF("a", "b")
    val viaExpr = df.select(JaroWinkler(col("a"), col("b")).as("jw"))
      .collect().map(_.getDouble(0))
    val viaScala = t.zip(t.reverse).map { case (a, b) =>
      JaroWinkler.sim(a, b)
    }
    assert(viaExpr.toSeq == viaScala.toSeq)
  }

  test("q299 power iteration output is a snapped unit vector with " +
    "consistent share/residual") {
    val out = ExtensionQueries35.queries.find(_.name ==
      "q299_pca_power_sketch").get.fn(spark, sf0001).collect()
    assert(out.length == 16)
    val loadings = out.map(_.getDouble(1))
    // snapped unit vector: norm within grid distance of 1
    val norm = math.sqrt(loadings.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-3, s"norm $norm")
    val share = out.map(_.getDouble(2)).distinct
    val resid = out.map(_.getDouble(3)).distinct
    assert(share.length == 1 && resid.length == 1)
    // top-component share must be at least 1/d (mean of the spectrum)
    assert(share.head >= 1.0 / 16.0)
    // fixed-budget iteration: residual reported and small-ish
    assert(resid.head >= 0.0 && resid.head < 0.2)
  }

  test("q300 ACF lags are bounded by 1 and Ljung-Box is nondecreasing") {
    val out = ExtensionQueries35.queries.find(_.name ==
      "q300_acf_ljung_box").get.fn(spark, sf0001).collect()
    assert(out.length == 7)
    val acfs = out.map(_.getDouble(1))
    assert(acfs.forall(a => a >= -1.0 && a <= 1.0))
    val lbs = out.map(_.getDouble(2))
    assert(lbs.zip(lbs.tail).forall { case (a, b) => b >= a },
      s"LB not monotone: ${lbs.toSeq}")
  }
}
