package graft

import graft.io.Tables

/** Pins the fixture facts that oracle SQL is authored against — static
  * DuckDB strings can't derive them at runtime the way the Spark side
  * does, so a silent fixture change must fail HERE, loudly, instead of
  * diverging a hash compare downstream.
  */
class FixtureSpec extends SparkSpec {

  test("events carries exactly the five fixture event types (q330's " +
    "burned-in BH thresholds assume m = 5 hypotheses)") {
    Seq(sf0001, "/root/testdata/sf0.01").foreach { dir =>
      val types = Tables.load(spark, dir, "events")
        .select("event_type").distinct()
        .collect().map(_.getString(0)).toSet
      assert(types ==
        Set("view", "click", "purchase", "signup", "error"),
        s"$dir event types changed: $types — q330's z* literals are " +
          "quantiles for m = 5")
    }
  }

  test("embeddings dim matches Tables.EmbeddingDim (64-wide oracle " +
    "unrolls depend on it)") {
    Seq(sf0001, "/root/testdata/sf0.01").foreach { dir =>
      val e = Tables.load(spark, dir, "embeddings")
      val dim = graft.ext.SimilaritySearch.deriveDim(e, "embedding")
      assert(dim == Tables.EmbeddingDim,
        s"$dir embeddings are $dim-dim but oracles unroll " +
          s"${Tables.EmbeddingDim} components")
    }
  }
}
