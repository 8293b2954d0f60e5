package graft

import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Count, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}

/** The suite's own round-9 rule §5 — "a 100 TB swap is CODE, never a
  * comment" — made structural (round-10 verdict ask #6): every
  * registered query whose plan carries an EXACT order statistic
  * (`percentile`) or an exact DISTINCT aggregate must either ship a
  * registered sketch sibling (`<key>_approx` / `<key>_hll`) or carry
  * an explicit justification in the allowlist below. A new
  * exact-order-statistic query without a sibling fails THIS spec in
  * the same commit that adds it, the way ContractSpec refuses §2
  * keyset drift — the `table_profile` comment-only-swap class of
  * debt (rounds 4→9) is refused by tooling, not review.
  *
  * The two classes are NOT equally dangerous, and the gate reflects
  * that: `percentile` plans as an ObjectAggregation that BUFFERS its
  * whole group at the final reducer — a true melt at unbounded group
  * size — so a percentile query can NEVER be allowlisted, only
  * twinned. Exact count-distinct plans as Spark's two-phase Expand
  * rewrite — partial dedup map-side, shuffle keyed on
  * (group, value) — so its cost is NDV-sized shuffle VOLUME, not a
  * single-task buffer; a sketch sibling is the scale OPTIMIZATION
  * where the distinct set is data-sized (daily actives, table-profile
  * NDV — both twinned), and a justified allowlist entry is
  * acceptable where the distinct is key-/dim-sized or the exact count
  * IS the registered contract.
  */
class ScaleContractSpec extends SparkSpec {

  /** count-distinct queries allowed WITHOUT a sketch sibling, each
    * with the reason (key-/dim-bounded value space, oracle-baseline
    * role, or an approx twin living on the production side). Adding
    * an entry here is a reviewed decision in the diff — the point of
    * the gate. Percentile queries are NOT eligible (see class doc). */
  private val DistinctAllowlist: Map[String, String] = Map(
    "agg_distinct" -> ("the registered contract IS exact " +
      "multi-distinct (the Expand-plan demo); two-phase (group,value) " +
      "shuffle, custkey-sized"),
    "basket_lift" -> ("1-row basket total: distinct on l_orderkey — " +
      "the key the fact shuffle is already partitioned by"),
    "bigram_lm_holdout" -> ("distinct doc_id — key-sized, the eval " +
      "denominator must be exact for the registered metric"),
    "contamination_census" -> ("distinct doc_id per benchmark doc — " +
      "fine (bench_id)-keyed groups, hit-bounded"),
    "customer_ltv_cohort" -> ("active customers per (cohort, offset) " +
      "cell — the registered exact LTV metric; (group,value) shuffle " +
      "≤ one row per customer-month with orders"),
    "dedup_span_flags" -> ("distinct doc_id per span — doc-keyed, " +
      "pair-output-bounded"),
    "dedup_substring_runs" -> ("distinct doc_id per run — doc-keyed, " +
      "pair-output-bounded"),
    "embedding_threshold_sweep" -> ("distinct doc_id per threshold — " +
      "bounded by the pair frame, itself behind the " +
      "graft.bruteforce.maxRows oracle-baseline guard"),
    "erasure_cascade_audit" -> ("distinct erase-cohort keys per " +
      "table — the audit's exact blast-radius metric; cohort is a " +
      "mod-53 key slice"),
    "log_cohort_retention" -> ("distinct users per (cohort, offset) — " +
      "(group,value) shuffle ≤ one row per user-day, the exact " +
      "retention contract"),
    "log_funnel" -> ("distinct users per 3 funnel stages — user-keyed " +
      "two-phase shuffle; the sketch form of the same measure is " +
      "log_daily_active_approx's registered pattern"),
    "log_ingest_parse" -> ("distinct uid/job_id per parsed level — " +
      "parse-audit NDV over dim-like id spaces"),
    "log_out_of_order_stats" -> ("distinct users per 4 lateness " +
      "buckets — user-keyed two-phase shuffle, 4-row result"),
    "mixture_upsample" -> ("distinct doc_id per source — doc-keyed; " +
      "exactness is the resample-accounting contract"),
    "q16_supplier_cnt" -> ("TPC-H Q16's metric: distinct suppliers " +
      "per (brand,type,size) — supplier-DIM-sized value space"),
    "referential_integrity_audit" -> ("distinct violating keys per FK " +
      "relation — the audit metric; ≤ child key NDV, zero when the " +
      "constraint holds"),
    "stream_dedup_window" -> ("batch-equivalent ORACLE of the " +
      "streaming dedup; the production streaming twin " +
      "(Pipelines.slidingDistinctStream) already runs " +
      "approx_count_distinct — the swap lives on the serving side"),
    "stream_sliding_distinct" -> ("same: exact batch oracle; the " +
      "streaming production twin runs approx_count_distinct(0.01)"),
    "text_template_shingles" -> ("distinct doc/shingle counts per " +
      "template cluster — cluster-keyed, template-bounded"))

  private def sketchSibling(key: String): Boolean =
    SparkEntry.queries.contains(key + "_approx") ||
      SparkEntry.queries.contains(key + "_hll")

  private def meltRisks(plan: LogicalPlan): Seq[String] = plan.collect {
    case a: Aggregate =>
      a.aggregateExpressions.flatMap(_.collect {
        case ae: AggregateExpression
            if ae.isDistinct &&
              ae.aggregateFunction.isInstanceOf[Count] =>
          "count_distinct"
        case ae: AggregateExpression
            if ae.aggregateFunction.isInstanceOf[Percentile] =>
          "percentile"
      })
  }.flatten.distinct

  test("every exact percentile / exact-distinct query has a sketch " +
      "sibling or a justified allowlist entry (percentile: sibling " +
      "only — a buffered group cannot be allowlisted)") {
    val flagged = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val risks =
          try meltRisks(fn(spark, sf0001).queryExecution.analyzed)
          catch { case e: Throwable =>
            fail(s"$name failed to build at sf0.001: ${e.getMessage}")
          }
        if (risks.isEmpty) None else Some(name -> risks)
    }
    // percentile = true melt: the sibling is MANDATORY
    val meltingPercentiles = flagged.collect {
      case (name, risks)
          if risks.contains("percentile") && !sketchSibling(name) =>
        name
    }
    assert(meltingPercentiles.isEmpty,
      "exact percentile without a registered sketch sibling (no " +
        "allowlist escape for buffered-group aggregates):\n  " +
        meltingPercentiles.mkString("\n  ") +
        "\nRegister a <key>_approx twin (approx_percentile — the " +
        "log_mad_outliers_approx precedent).")
    val unexcused = flagged.collect {
      case (name, risks)
          if risks.contains("count_distinct") && !sketchSibling(name) &&
            !DistinctAllowlist.contains(name) =>
        s"$name (${risks.mkString(", ")})"
    }
    assert(unexcused.isEmpty,
      "exact count-distinct without a registered sketch sibling or " +
        "allowlist justification:\n  " + unexcused.mkString("\n  ") +
        "\nRegister a <key>_approx twin (the table_profile_approx " +
        "precedent) or add a justified allowlist entry.")
    // the allowlist must not rot: every entry must still name a
    // registered query that still carries the exact aggregate
    val flaggedNames = flagged.map(_._1).toSet
    val stale = DistinctAllowlist.keySet -- flaggedNames
    assert(stale.isEmpty,
      s"allowlist entries no longer needed (query gone or aggregate " +
        s"swapped): ${stale.toSeq.sorted.mkString(", ")}")
  }
}
