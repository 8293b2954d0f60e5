package graft

/** Every SparkEntry query must run at sf0.001 and be deterministic
  * (same result on repeated execution — catches accidental RNG or
  * partition-order dependence). Oracle-value correctness is covered by
  * the driver's DuckDB gate (scripts/check.py locally). */
class QueriesSmokeSpec extends SparkSpec {

  private val mayBeEmpty = Set("join_anti", "log_anomaly_zscore")

  /** Queries where nondeterminism could plausibly creep in (ties under
    * limit, LSH bucketing, hash-derived constants) get a double-run
    * determinism check; the rest run once (the driver's hash gate
    * catches value drift there). */
  private val determinismChecked = Set(
    "q3_shipping", "log_top_users", "log_topk_per_type", "text_word_freq",
    "ann_bruteforce_topk", "ann_lsh_topk", "ann_ivf_topk", "knn_self_join",
    "ann_pq_topk",
    "dedup_minhash_lsh", "dedup_simhash", "mm_feature_extract")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs${if (mayBeEmpty(name)) "" else ", non-empty"}") {
      val r1 = fn(spark, sf0001).collect()
      if (!mayBeEmpty(name)) assert(r1.nonEmpty, s"$name returned 0 rows")
      if (determinismChecked(name)) {
        val r2 = fn(spark, sf0001).collect()
        assert(r1.map(_.toString).toSeq === r2.map(_.toString).toSeq,
          s"$name is nondeterministic")
      }
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).collect().nonEmpty)
  }

  test("every query key has either an oracle or is documented rows-only") {
    // the EXACT remaining rows-only set (round 14): the 7 engine-
    // sketch approx twins — each wraps a Spark ImperativeAggregate
    // (HLL++/approx_percentile/frequent-items) with no DuckDB
    // replay. Everything else — the whole IVF/PQ ANN family and the
    // PCA power iteration included since round 14 — carries a full
    // SQL oracle.
    val rowsOnly = Set(
      "log_percentiles_approx", "log_daily_active_approx",
      "log_top_users_approx", "log_mad_outliers_approx",
      "log_rolling_distinct_hll",
      "orders_rfm_segments_approx", "fulfilment_latency_profile_approx")
    val missing = SparkEntry.queries.keySet --
      SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without queries: $orphaned")
  }
}
