package graft

/** Meta-invariants of the query registry — the mistakes that have
  * actually cost rounds (duplicate names would silently shadow a query
  * in the Map the driver consumes; a missing oracle downgrades a query
  * to the weak rows-only check; an oracle without a full ORDER BY makes
  * the hash compare row-order-dependent).
  */
class RegistrySpec extends SparkSpec {

  test("registry: unique well-formed names, an oracle for every query") {
    val all = SparkEntry.all
    assert(all.nonEmpty)
    val names = all.map(_.name)
    val dupes = names.groupBy(identity).collect { case (n, vs) if vs.size > 1 => n }
    assert(dupes.isEmpty, s"duplicate query names: $dupes")
    names.foreach(n =>
      assert(n.matches("q\\d+_[a-z0-9_]+"), s"malformed query name: $n"))
    // since round 3 every query is hash-gated: no oracle-less entries
    val missing = all.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"queries without a DuckDB oracle: $missing")
    // the driver consumes the Map form — it must cover the Seq exactly
    assert(SparkEntry.queries.size == all.size)
    assert(SparkEntry.oracleSql.size == all.size)
  }

  test("registry: every oracle ends in a deterministic ORDER BY") {
    // canonical row-sorting in the checker hides row-order drift, but the
    // engine contract (queries.Q scaladoc) is deterministic output — an
    // oracle with no ORDER BY usually means the Spark side lost its sort
    // single-row global aggregates where order is vacuous; adding a name
    // here requires the query to provably emit exactly one row
    val singleRow = Set("q06_forecast_revenue", "q14_promo_revenue",
      "q17_small_quantity_revenue", "q73_triangles", "q181_lsh_quality",
      // 1-row × 1-row cross joins of global aggregates
      "q236_zipf_slope", "q245_brier_decomposition",
      "q312_block_bootstrap",
      // round-9 single-row global test statistics
      "q331_logrank_test", "q332_jackknife_quality", "q334_cmh_stratified",
      "q346_dedup_signal_agreement", "q353_corpus_diversity",
      "q355_degree_assortativity", "q367_rank_concordance",
      "q388_bloom_fp_audit", "q392_blocking_quality",
      // continuation-wave single-row global statistics (each is a
      // cross join of 1-row aggregate frames)
      "q413_price_indices", "q421_dw_ols", "q427_interrupted_ts",
      "q430_tost_equivalence", "q438_gmm_em", "q439_gpd_tail_fit",
      "q440_deterministic_ransac", "q441_cv_paired_ttest",
      "q443_capture_recapture", "q447_partial_correlation",
      "q448_rmst", "q454_gumbel_block_maxima", "q455_price_elasticity",
      // round-11: one global aggregate row over the band/box read, with
      // the measured pruning as literals
      "q476_versioned_clustered_compact", "q483_versioned_zorder_box",
      // round-11 continuation: single-row plan-pin gates (runtime
      // pruning, limit file capping)
      "q495_runtime_partition_pruning", "q496_limit_pushdown_file_cap")
    SparkEntry.all.filterNot(q => singleRow(q.name)).foreach { q =>
      val sql = q.oracle.get.toUpperCase
      assert(sql.contains("ORDER BY"), s"${q.name}: multi-row oracle has no ORDER BY")
    }
  }
}
