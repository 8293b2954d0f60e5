package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Fns
import graft.sources.Tables

/** §2B — relational / general query engine over the TPC-H-ish star schema.
  *
  * Scale design: `lineitem`/`orders` are the fact tables — every query
  * aggregates or joins them on their natural keys so Spark shuffles at most
  * once per fact table, with map-side partial aggregation. All dimension
  * joins (`region`, `nation`, `supplier`, `part`, `customer`-as-dim) are
  * explicitly `broadcast()` so no shuffle of the fact side is spent on
  * them; at 100 TB only customer×orders and orders×lineitem shuffle, and
  * AQE (enabled in Bench/Verify sessions) handles skew + right-sizes
  * partitions.
  *
  * Oracle parity: money sums are `round(x, 2)` on both sides (inputs are
  * 2-decimal doubles, so true sums sit on the 0.01 grid — never near a
  * rounding boundary); averages/rates are `round(x, 4)`; dates are emitted
  * as DATE; every query ends in a total ORDER BY.
  */
object Relational {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> q1Agg,
    "q3_shipping" -> q3Shipping,
    "q5_local_supplier" -> q5LocalSupplier,
    "join_broadcast_dim" -> joinBroadcastDim,
    "join_anti" -> joinAnti,
    "join_semi" -> joinSemi,
    "agg_distinct" -> aggDistinct,
    "agg_rollup" -> aggRollup,
    "pivot_status" -> pivotStatus,
    "set_ops" -> setOps,
    "window_running_total" -> windowRunningTotal,
    "window_rank_features" -> windowRankFeatures,
    "agg_cube" -> aggCube,
    "corr_stats" -> corrStats,
    "join_skew_salted" -> joinSkewSalted,
    "q6_selective_agg" -> q6SelectiveAgg,
    "agg_grouping_sets" -> aggGroupingSets,
    "q4_priority_exists" -> q4PriorityExists,
    "q10_returned_revenue" -> q10ReturnedRevenue,
    "q14_promo_share" -> q14PromoShare,
    "q19_disjunctive" -> q19Disjunctive,
    "q22_idle_rich" -> q22IdleRich,
    "q2_min_cost_supp" -> q2MinCostSupp,
    "q7_volume_shipping" -> q7VolumeShipping,
    "q8_market_share" -> q8MarketShare,
    "q9_product_profit" -> q9ProductProfit,
    "q11_important_stock" -> q11ImportantStock,
    "q12_late_lines" -> q12LateLines,
    "q13_cust_orders_dist" -> q13CustOrdersDist,
    "q15_top_supplier" -> q15TopSupplier,
    "q16_supplier_cnt" -> q16SupplierCnt,
    "q17_small_qty_rev" -> q17SmallQtyRev,
    "q18_large_orders" -> q18LargeOrders,
    "q20_part_promotion" -> q20PartPromotion,
    "q21_waiting_supplier" -> q21WaitingSupplier,
    "basket_part_pairs" -> basketPartPairs,
    "window_decile_spend" -> windowDecileSpend,
    "skew_key_stats" -> skewKeyStats,
    "agg_incremental_refresh" -> aggIncrementalRefresh,
    "erasure_cascade_audit" -> erasureCascadeAudit,
    "basket_lift" -> basketLift,
    "table_profile" -> tableProfile,
    "table_profile_approx" -> tableProfileApprox,
    "referential_integrity_audit" -> refIntegrityAudit,
    "layout_zorder_audit" -> layoutZorderAudit,
    "skyline_pareto" -> skylinePareto,
    "seasonality_profile" -> seasonalityProfile,
    "orders_forecast_ewma" -> forecastEwma,
    "orders_backlog_curve" -> backlogCurve,
    "supplier_scorecard" -> supplierScorecard,
    "customer_ltv_cohort" -> customerLtvCohort,
    "orders_rfm_segments" -> rfmSegments,
    "orders_rfm_segments_approx" -> rfmSegmentsApprox,
    "fulfilment_latency_profile" -> fulfilmentLatency,
    "fulfilment_latency_profile_approx" -> fulfilmentLatencyApprox,
    "supplier_lead_trend" -> supplierLeadTrend,
    "orders_dup_payment_audit" -> dupPaymentAudit,
    "join_view_delta_refresh" -> joinViewDeltaRefresh
  )

  /** Z-ORDER layout audit — the data-layout decision quantified
    * in-engine before anyone rewrites 100 TB: would writing lineitem
    * Z-ordered on (l_partkey, l_suppkey) beat the linear
    * partkey-sorted layout for two-dimensional predicates? Each row
    * maps both keys onto a 256-cell grid (value-range scaled against
    * broadcast 1-row maxima — NOT ntile, whose unpartitioned global
    * window is the documented scale killer), bit-interleaves them into
    * a 16-bit Morton code, and cells form from the TOP SIX BITS of
    * each layout's sort key (static bit ops, no window anywhere). Per
    * layout the audit reports the per-cell min/max SPAN of both keys —
    * exactly the row-group zone-map width that decides parquet
    * data-skipping: the linear layout collapses `p_span` but leaves
    * `s_span` at full range (suppkey predicates skip nothing); the
    * Z-order cells bound BOTH spans, which is the whole trade. All
    * arithmetic is integer — hash-exact under the oracle.
    *
    * Scale shape: one scan, two map-side-combined 64-cell aggregates,
    * a 1-row broadcast for the maxima. The audited write itself would
    * be `repartitionByRange(z)` + sortWithin — the
    * [[graft.ops.Materialize]] layout rule with z as the range key. */
  def layoutZorderAudit(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select("l_partkey", "l_suppkey")
    val mx = li.agg(max("l_partkey").as("max_p"),
      max("l_suppkey").as("max_s"))
    val g = li.crossJoin(broadcast(mx))
      .withColumn("pb", expr("cast(l_partkey * 256 div (max_p + 1) as int)"))
      .withColumn("sb", expr("cast(l_suppkey * 256 div (max_s + 1) as int)"))
      .withColumn("z", expr((0 until 8).map(i =>
        s"(((pb >> $i) & 1) << ${2 * i}) + (((sb >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")))
      .localCheckpoint() // consumed by both layout rollups
    def spans(cellExpr: String, layout: String): DataFrame = g
      .groupBy(expr(cellExpr).as("cell"))
      .agg((max("l_partkey") - min("l_partkey")).as("p_span"),
        (max("l_suppkey") - min("l_suppkey")).as("s_span"),
        count(lit(1L)).as("n"))
      .agg(lit(layout).as("layout"),
        count(lit(1L)).as("n_cells"),
        sum(col("p_span") * col("n")).as("w_p_span"),
        sum(col("s_span") * col("n")).as("w_s_span"),
        sum("n").as("n_rows"))
      .select(col("layout"), col("n_cells"),
        expr("w_p_span div n_rows").as("avg_p_span"),
        expr("w_s_span div n_rows").as("avg_s_span"))
    spans("z >> 10", "zorder")
      .unionByName(spans("pb >> 2", "linear_p"))
      .orderBy("layout")
  }

  /** Per-column data-quality profile of the biggest fact table — the
    * first query anyone runs against an unfamiliar 100 TB drop: per
    * column, the null count, exact distinct cardinality, and typed
    * min/max (numeric+timestamp columns in `min_num`/`max_num`,
    * strings in `min_str`/`max_str`; timestamps profile as epoch-µs so
    * the bounds sort numerically). One row per column.
    *
    * Scale shape: ONE scan, MELTED — each row fans into 11 narrow
    * (col_name, value) pairs (`inline`), partial-aggregated by (col,
    * value) map-side, then a per-column rollup over the distinct-value
    * frame gives null count, distinct count, and min/max in one
    * expression each. This deliberately replaces the classic
    * single-aggregate multi-`count_distinct` (Deequ layout): that plan
    * Expands every row into |columns|+1 projections each as wide as
    * ALL agg inputs and groups on a 12-slot key — measured 25.5 s vs
    * 3 s for this shape on the same input — whereas the melt shuffles
    * 3-column rows keyed by (col, value) whose map-side combine
    * collapses to the per-column NDV, not the row count. The 100 TB
    * path is the REGISTERED twin [[tableProfileApprox]]
    * (`table_profile_approx`): exact→`approx_count_distinct` HLL
    * sketches in a single no-melt aggregate; this query keeps exact
    * so the DuckDB oracle replays hash-identically. */
  /** The shared (col_name, vd, vs) MELT of the 11 profiled lineitem
    * columns — ONE definition for [[tableProfile]] and
    * [[tableProfileApprox]] (the `rfmOf` shared-plumbing discipline:
    * the twins may only differ in their distinct-cardinality
    * estimator, never in what they profile). */
  private def profileMelt(li: DataFrame): DataFrame = {
    val numCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
      "l_tax")
    val strCols = Seq("l_returnflag", "l_linestatus")
    val tsCols = Seq("l_shipdate")
    val entries =
      numCols.map(c => struct(lit(c).as("col_name"),
        col(c).cast("double").as("vd"),
        lit(null).cast("string").as("vs"))) ++
      tsCols.map(c => struct(lit(c).as("col_name"),
        // cast: parquet µs-timestamps infer as NTZ; unix_micros needs
        // TimestampType (UTC session → identity, the Tables.events
        // precedent); profiling as epoch-µs keeps bounds numeric
        unix_micros(col(c).cast("timestamp")).cast("double").as("vd"),
        lit(null).cast("string").as("vs"))) ++
      strCols.map(c => struct(lit(c).as("col_name"),
        lit(null).cast("double").as("vd"), col(c).as("vs")))
    li.select(inline(array(entries: _*)))
  }

  def tableProfile(s: SparkSession, d: String): DataFrame = {
    profileMelt(Tables.lineitem(s, d))
      .groupBy("col_name", "vd", "vs")
      .agg(count(lit(1L)).as("cnt"))
      .groupBy("col_name")
      .agg(
        sum(when(col("vd").isNull && col("vs").isNull, col("cnt"))
          .otherwise(lit(0L))).as("n_null"),
        count(when(col("vd").isNotNull || col("vs").isNotNull, lit(1)))
          .as("n_distinct"),
        min("vd").as("min_num"), max("vd").as("max_num"),
        min("vs").as("min_str"), max("vs").as("max_str"))
      .orderBy("col_name")
  }

  /** The 100 TB twin of [[tableProfile]] — the same per-column profile
    * with the exact distinct cardinality swapped for a DECLARATIVE
    * HyperLogLog estimate (m = 16384 registers per column, rsd
    * ≈ 0.8%). The exact twin's melt is the right exact shape but its
    * shuffle is still NDV-SIZED: profiling a column like l_orderkey
    * (NDV ≈ row count) shuffles one (col, value) row per distinct
    * value — O(table) rows for a profile. This twin's shuffle is the
    * REGISTER frame: melt → xxhash64 → (bucket = h mod m,
    * rho = leading-zero rank of the remaining 50 bits, computed
    * EXACTLY as 51 − bitlength via `length(bin(w))` — no float log
    * at bit boundaries) → `max(rho)` per (col, bucket) with map-side
    * combine, ≤ 11·m rows total regardless of row count AND NDV —
    * then the Flajolet–HLL estimator per column (alpha·m²/Σ2^−M_j
    * with the linear-counting small-range correction m·ln(m/V),
    * applied up to E ≤ 3.5m rather than the classic 2.5m: the raw
    * estimator's positive bias just above the switch is what HLL++'s
    * empirical bias tables exist to remove, and the measured sweep
    * showed +1.8% at NDV ≈ 2.5m under a 2.5m switch vs ≤ 0.7%
    * everywhere under 3.5m — linear counting's own stderr at load
    * 3.5 is ~1.2%, still under the raw bias it replaces). Null count and typed min/max ride the SAME
    * (col, bucket) aggregate as per-bucket partials (nulls on a
    * sentinel bucket), so the whole profile is ONE scan + ONE
    * register-frame shuffle — see [[approxProfileOf]]. Same output
    * schema as the exact twin; `n_distinct` is the estimate.
    * ✅SQL since round 14: the hash leaf routes through the md5 gate
    * mode (canonical 'd:'/'s:' keys on the DECIMAL(28,6) grid, 52-bit
    * md5 hash, the INTEGER Σ 2^(39−Mj) register sum), so the whole
    * register frame + estimator replays in DuckDB under the gate; the
    * xxhash64 scale default stays pinned by ApproxSpec
    * (null/min/max ≡ exact, NDV within 2% per column, and the
    * estimator's accuracy across a synthetic NDV sweep through the
    * linear-counting/raw switch band).
    *
    * Deliberately NOT `approx_count_distinct`: Spark's HLL++ is an
    * ImperativeAggregate, and ONE imperative function in an aggregate
    * disables whole-stage codegen for every slot in that operator —
    * the fused 66-slot form ran the whole scan interpreted (measured
    * 7.9 s at sf0.1 vs the exact twin's 1.1 s; splitting the sketches
    * into their own aggregate still paid ~9 s of per-row interpreted
    * update dispatch). This formulation keeps the entire pipeline —
    * melt, hash, bucket/rho, register max, estimator — inside
    * whole-stage codegen. */
  def tableProfileApprox(s: SparkSession, d: String): DataFrame =
    approxProfileOf(profileMelt(Tables.lineitem(s, d)))

  /** The post-melt pipeline of [[tableProfileApprox]] over an explicit
    * (col_name, vd, vs) frame — ONE scan, ONE shuffle: null rows route
    * to a sentinel bucket −1, value rows to (hash mod m), and a single
    * groupBy(col, bucket) aggregate carries the HLL register max(rho)
    * AND the per-bucket null count / typed min-max partials, so the
    * per-column rollup reads ≤ 11·(m+1) register rows (map-side
    * combined; independent of row count and NDV) instead of a second
    * table scan. Package-private so ApproxSpec can drive SYNTHETIC
    * NDVs through the estimator — the raw-vs-linear-counting switch
    * band (E near 2.5m) never occurs at the oracle SFs' natural
    * cardinalities. */
  private[graft] def approxProfileOf(melted: DataFrame): DataFrame = {
    val m = 16384
    // Hash leaf routes through the md5 gate mode (round 14, the
    // sketch-family rule — [[graft.ops.Fns.Md5ModeConf]]): xxhash64
    // over the typed pair at scale; under the gate, md5Hash52 of a
    // CANONICAL string key — 's:'+vs for string columns, 'd:'+the
    // DECIMAL(28,6) form of vd for numeric ones (every profiled value
    // is exact on that grid: integer keys, 2-decimal prices, integer
    // epoch-µs — and both engines print the decimal with full scale),
    // so DuckDB replays the register frame digit-for-digit.
    val md5 = Fns.md5Mode
    val hashExpr =
      if (md5) Fns.md5Hash52(
        when(col("vs").isNotNull, concat(lit("s:"), col("vs")))
          .otherwise(concat(lit("d:"),
            col("vd").cast("decimal(28,6)").cast("string"))))
      else xxhash64(col("vd"), col("vs"))
    val hashed = melted.select(col("col_name"), col("vd"), col("vs"),
      when(col("vd").isNull && col("vs").isNull, lit(null).cast("long"))
        .otherwise(hashExpr).as("h"))
    // w = the hash's bits above the 14 bucket bits (50 under xxhash64,
    // 38 under the 52-bit md5 gate hash); rho = (width−14+1) −
    // bitlength(w), exact via length(bin(w)) — no float log at bit
    // boundaries
    val rhoBase = if (md5) 39 else 51
    val w = shiftrightunsigned(col("h"), 14)
    val bucketed = hashed.select(col("col_name"), col("vd"), col("vs"),
      coalesce(pmod(col("h"), lit(m.toLong)), lit(-1L)).as("bucket"),
      when(col("h").isNull, lit(0))
        .when(w === 0L, lit(rhoBase))
        .otherwise(lit(rhoBase) - length(bin(w))).as("rho"))
    val regs = bucketed.groupBy("col_name", "bucket").agg(
      max("rho").as("mj"), count(lit(1L)).as("cnt"),
      min("vd").as("mn"), max("vd").as("mx"),
      min("vs").as("sn"), max("vs").as("sx"))
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    // z = Σ 2^−Mj. In md5 mode it accumulates as the INTEGER
    // Σ 2^(39−Mj) (≤ 2^52, exact in BIGINT, summation-order-free) and
    // divides by 2³⁹ once — the oracle replays the integer sum in
    // HUGEINT. In scale mode the float sum stays: rho ≤ 51 spans more
    // than a double's 53 bits, but no oracle replays that path.
    val zCol =
      if (md5) (sum(when(col("bucket") >= 0L,
          expr(s"shiftleft(1L, ${rhoBase} - mj)")))
        .cast("double") / lit(math.pow(2.0, rhoBase))).as("z")
      else sum(when(col("bucket") >= 0L, pow(lit(2.0), -col("mj"))))
        .as("z")
    regs.groupBy("col_name").agg(
        sum(when(col("bucket") === -1L, col("cnt")).otherwise(lit(0L)))
          .as("n_null"),
        zCol,
        count(when(col("bucket") >= 0L, lit(1))).as("vnz"),
        min("mn").as("min_num"), max("mx").as("max_num"),
        min("sn").as("min_str"), max("sx").as("max_str"))
      .select(col("col_name"), col("n_null"), {
        val zeros = lit(m.toDouble) - col("vnz")
        val eRaw = lit(alpha * m * m) / (col("z") + zeros)
        when(col("vnz") === 0L, lit(0.0))
          .when(col("vnz") < m && eRaw <= lit(3.5 * m),
            lit(m.toDouble) * log(lit(m.toDouble) / zeros))
          .otherwise(eRaw).cast("long").as("n_distinct")
      }, col("min_num"), col("max_num"), col("min_str"), col("max_str"))
      .orderBy("col_name")
  }

  /** Referential-integrity audit over the whole star schema — the
    * constraint check a warehouse without enforced FK/PK constraints
    * (i.e. every data lake) must run as a query: per declared relation,
    * total child rows, violating rows, and distinct violating keys.
    * `fk:` rows count orphans (child keys with no parent); `pk:` rows
    * count duplicate-key violations (rows under keys occurring > 1×).
    * All-zero `n_bad_*` is the PASSING certificate, re-checkable after
    * every ingest batch.
    *
    * Scale shape: each FK check is ONE left join of the child's key
    * column against the DISTINCT parent key — dimension parents
    * (`part`, `supplier`, `customer`, `nation`) broadcast, only
    * lineitem→orders shuffles both sides (key-partitioned sort-merge,
    * AQE-skew-safe); each PK check is one map-side-combined count per
    * key. All seven branches are independent 1-row aggregates over
    * pruned single/double-column scans (ReadSchema carries only the
    * keys), unioned at zero cost. */
  def refIntegrityAudit(s: SparkSession, d: String): DataFrame = {
    def fk(rel: String, child: DataFrame, key: String,
           parent: DataFrame, pkey: String, bcast: Boolean): DataFrame = {
      val p0 = parent.select(col(pkey)).distinct()
        .withColumn("hit", lit(1))
      val p = if (bcast) broadcast(p0) else p0
      child.select(col(key))
        .join(p, col(key) === col(pkey), "left")
        .agg(count(lit(1L)).as("n_rows"),
          sum(when(col("hit").isNull, lit(1L)).otherwise(lit(0L)))
            .as("n_bad_rows"),
          count_distinct(when(col("hit").isNull, col(key)))
            .as("n_bad_keys"))
        .select(lit(rel).as("relation"), col("n_rows"),
          col("n_bad_rows"), col("n_bad_keys"))
    }
    def pk(rel: String, t: DataFrame, keys: Seq[String]): DataFrame =
      t.groupBy(keys.map(col): _*).agg(count(lit(1L)).as("c"))
        .agg(sum(col("c")).as("n_rows"),
          sum(when(col("c") > 1, col("c")).otherwise(lit(0L)))
            .as("n_bad_rows"),
          count(when(col("c") > 1, lit(true))).as("n_bad_keys"))
        .select(lit(rel).as("relation"), col("n_rows"),
          col("n_bad_rows"), col("n_bad_keys"))
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    Seq(
      fk("fk:lineitem.l_orderkey->orders", li, "l_orderkey",
        o, "o_orderkey", bcast = false),
      fk("fk:lineitem.l_partkey->part", li, "l_partkey",
        Tables.part(s, d), "p_partkey", bcast = true),
      fk("fk:lineitem.l_suppkey->supplier", li, "l_suppkey",
        Tables.supplier(s, d), "s_suppkey", bcast = true),
      fk("fk:orders.o_custkey->customer", o, "o_custkey",
        c, "c_custkey", bcast = true),
      fk("fk:customer.c_nationkey->nation", c, "c_nationkey",
        Tables.nation(s, d), "n_nationkey", bcast = true),
      pk("pk:orders.o_orderkey", o, Seq("o_orderkey")),
      pk("pk:customer.c_custkey", c, Seq("c_custkey")),
      pk("pk:lineitem.(l_orderkey,l_linenumber)", li,
        Seq("l_orderkey", "l_linenumber")))
      .reduce(_.unionByName(_))
      .orderBy("relation")
  }

  /** Association-rule mining over order baskets — [[basketPartPairs]]
    * taken to its analytical conclusion: per co-occurring part pair,
    * the SUPPORT counts (orders with p1, with p2, with both) and the
    * two classic rule metrics in exact integer micro-units — LIFT
    * (co-occurrence vs independence; > 10⁶ means the pair attracts)
    * and CONFIDENCE p1→p2. Computed over DISTINCT parts per order
    * (rule semantics: a basket either contains a part or not), unlike
    * `basket_part_pairs`' multiplicity census — the two queries answer
    * different questions and share the shape.
    *
    * Scale shape: the same no-self-join design — ONE fact shuffle
    * builds each order's distinct sorted part array, pairs emit
    * in-array (i<j, so each co-occurring order contributes exactly one
    * (p1,p2) row); supports are a second map-side-combined rollup of
    * the same exploded frame, re-joined part-keyed (both sides
    * aggregate to ≤ |parts| rows); the basket total is a 1-row
    * broadcast. Top-20 by lift via TakeOrdered. */
  def basketLift(s: SparkSession, d: String): DataFrame = {
    val op = Tables.lineitem(s, d).select("l_orderkey", "l_partkey")
      .distinct()
      .localCheckpoint() // consumed by baskets, pair-gen, and supports
    val nBaskets = op.select(countDistinct("l_orderkey").as("n_baskets"))
    val supports = op.groupBy(col("l_partkey").as("p"))
      .agg(count(lit(1)).as("n_p"))
    val pairs = op
      .groupBy("l_orderkey")
      .agg(sort_array(collect_list("l_partkey")).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, (x, i) ->" +
          " transform(slice(ps, i + 2, size(ps))," +
          " y -> struct(x as p1, y as p2))))")).as("pr"))
      .groupBy(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= 2)
    pairs
      .join(supports.select(col("p").as("p1"), col("n_p").as("n_p1")), "p1")
      .join(supports.select(col("p").as("p2"), col("n_p").as("n_p2")), "p2")
      .crossJoin(broadcast(nBaskets))
      .select(col("p1"), col("p2"), col("n_both"), col("n_p1"),
        col("n_p2"),
        // DECIMAL intermediates: n_both·n_baskets·10⁶ tops 2⁶³ at
        // ~10⁹ baskets (the corpus_mixture Long-overflow precedent)
        expr("cast(cast(n_both as decimal(38,0)) * n_baskets * 1000000" +
          " div (cast(n_p1 as decimal(38,0)) * n_p2) as bigint)")
          .as("lift_e6"),
        expr("n_both * 1000000 div n_p1").as("conf_e6"))
      .orderBy(col("lift_e6").desc, col("p1"), col("p2"))
      .limit(20)
  }

  /** Right-to-be-forgotten DRY RUN — the deletion-planning sweep every
    * compliance pipeline publishes before executing an erasure: for a
    * deterministic deletion cohort (key ≡ 7 mod 53, ~2% of subjects),
    * the rows that must go from every subject-keyed table, INCLUDING
    * the relational cascade — erasing a customer erases their orders,
    * and erasing those orders erases their lineitems (two semi-join
    * hops), while events erase directly on the user key. Per table:
    * rows to erase, distinct cascade keys, and erased-rows ppm of the
    * table — the blast-radius numbers a reviewer signs off on.
    *
    * Scale shape: one scan per table; the cascade is customer→orders
    * (custkey semi join — NO broadcast hint: the victim set is ~2% of
    * a fact-sized customer table at 100 TB, the `windowDecileSpend`
    * doctrine; AQE may broadcast at small SF) then orders→lineitem
    * (orderkey semi join, co-partitioned with every other orderkey
    * join here). Each per-table report collapses to one row map-side;
    * totals ride the same scans as conditional aggregates — no second
    * pass, no global sort beyond the 4-row presentation. */
  def erasureCascadeAudit(s: SparkSession, d: String): DataFrame = {
    val victims = Tables.customer(s, d)
      .filter(pmod(col("c_custkey"), lit(53)) === 7)
      .select(col("c_custkey"))
    val custRep = Tables.customer(s, d)
      .agg(count(lit(1)).as("n_total"),
        sum(when(pmod(col("c_custkey"), lit(53)) === 7, 1L).otherwise(0L))
          .as("n_erase"))
      .select(lit("customer").as("table_name"), col("n_erase"),
        col("n_erase").as("n_keys"), col("n_total"))
    val vOrders = Tables.orders(s, d)
      .join(victims, col("o_custkey") === col("c_custkey"), "semi")
      .select("o_orderkey")
    val ordRep = Tables.orders(s, d)
      .agg(count(lit(1)).as("n_total"),
        sum(when(pmod(col("o_custkey"), lit(53)) === 7, 1L).otherwise(0L))
          .as("n_erase"),
        countDistinct(when(pmod(col("o_custkey"), lit(53)) === 7,
          col("o_custkey"))).as("n_keys"))
      .select(lit("orders").as("table_name"), col("n_erase"),
        col("n_keys"), col("n_total"))
    val liRep = Tables.lineitem(s, d).select("l_orderkey")
      .join(vOrders.withColumn("hit", lit(1)),
        col("l_orderkey") === col("o_orderkey"), "left")
      .agg(count(lit(1)).as("n_total"),
        sum(coalesce(col("hit"), lit(0))).cast("long").as("n_erase"),
        countDistinct(when(col("hit") === 1, col("l_orderkey")))
          .as("n_keys"))
      .select(lit("lineitem").as("table_name"), col("n_erase"),
        col("n_keys"), col("n_total"))
    val evRep = Tables.events(s, d)
      .agg(count(lit(1)).as("n_total"),
        sum(when(pmod(col("user_id"), lit(53)) === 7, 1L).otherwise(0L))
          .as("n_erase"),
        countDistinct(when(pmod(col("user_id"), lit(53)) === 7,
          col("user_id"))).as("n_keys"))
      .select(lit("events").as("table_name"), col("n_erase"),
        col("n_keys"), col("n_total"))
    custRep.unionByName(ordRep).unionByName(liRep).unionByName(evRep)
      .select(col("table_name"), col("n_erase"), col("n_keys"),
        col("n_total"),
        expr("n_erase * 1000000 div n_total").as("erase_ppm"))
      .orderBy("table_name")
  }

  /** Incremental aggregate maintenance — the materialized-view refresh
    * every recurring corpus build runs: a per-status stats MV built
    * from orders BEFORE the cutover date is merged with the partial
    * aggregate of the DELTA (orders on/after it), and the merge must
    * equal a full recompute — which is exactly what the oracle does
    * (it never sees the split), so the hash match IS the
    * merge-correctness proof. Every statistic is carried in its
    * MERGEABLE partial form — (count, sum, min, max); avg derives as
    * sum/count at presentation — the same decomposition Spark's own
    * partial/final aggregation uses across the shuffle boundary.
    *
    * Scale shape: at 100 TB the base frame IS the stored MV —
    * |groups| rows read back from storage, not a fact scan — so a
    * nightly refresh costs one scan of the DELTA plus a |groups|-row
    * union; this query derives the base in-plan (oracle SF) with the
    * date split pushed to both scans. The final merge aggregates
    * 2·|groups| rows: free at any corpus size. */
  def aggIncrementalRefresh(s: SparkSession, d: String): DataFrame = {
    val cut = lit("1996-07-01").cast("timestamp")
    def partial(f: DataFrame): DataFrame =
      f.groupBy("o_orderstatus").agg(
        count(lit(1)).as("n_orders"),
        sum("o_totalprice").as("sum_price"),
        min("o_totalprice").as("min_price"),
        max("o_totalprice").as("max_price"))
    val o = Tables.orders(s, d)
    val base = partial(o.filter(col("o_orderdate") < cut))
    val delta = partial(o.filter(col("o_orderdate") >= cut))
    base.unionByName(delta)
      .groupBy("o_orderstatus")
      .agg(sum("n_orders").as("n_orders"),
        sum("sum_price").as("sum_price"),
        min("min_price").as("min_price"),
        max("max_price").as("max_price"))
      .select(col("o_orderstatus"), col("n_orders"),
        round(col("sum_price"), 2).as("sum_price"),
        round(col("min_price"), 2).as("min_price"),
        round(col("max_price"), 2).as("max_price"),
        round(col("sum_price") / col("n_orders"), 4).as("avg_price"))
      .orderBy("o_orderstatus")
  }

  /** Heavy-key diagnostic — the measurement that DECIDES whether a join
    * needs [[joinSkewSalted]]'s treatment: per-key row counts on the
    * fact side's join key, reported as the top-20 keys with their
    * exact integer share (ppm of all rows) and skew factor vs the mean
    * key (×100). Both ratios are integer math in DECIMAL(26,0)
    * (`BIGINT·10⁶` overflows Long at ~100 TB row counts — the
    * [[TextAnalysis.corpusMixture]] precedent), so both engines floor
    * identically.
    *
    * Scale shape: ONE fact shuffle (the per-key count, map-side
    * combined), then the key-cardinality frame is consumed twice —
    * a one-row total/mean aggregate broadcast back, and a
    * TakeOrderedAndProject top-20 (no global sort materializes). The
    * per-key frame is localCheckpointed: it is |keys|-sized (dimension
    * cardinality, not fact cardinality), the same budget the
    * mixture/decile frames already carry. */
  def skewKeyStats(s: SparkSession, d: String): DataFrame = {
    val per = Tables.orders(s, d)
      .groupBy("o_custkey").agg(count(lit(1)).as("n_rows"))
      .localCheckpoint()
    val tot = per.agg(sum("n_rows").as("total"), count(lit(1)).as("n_keys"))
    per.crossJoin(broadcast(tot))
      .select(col("o_custkey"), col("n_rows"),
        expr("cast(n_rows as decimal(26,0)) * 1000000 div total")
          .as("share_ppm"),
        expr("cast(n_rows as decimal(26,0)) * n_keys * 100 div total")
          .as("skew_x100"))
      .orderBy(col("n_rows").desc, col("o_custkey"))
      .limit(20)
  }

  /** Market-basket pair mining: parts that co-occur in the same order,
    * with minimum support 2 — the pairwise-frequent-itemset shape. The
    * self-join is keyed on `l_orderkey` (an equi-join, one shuffle of
    * each side by order), and the quadratic blowup is bounded per
    * GROUP, not per corpus: an order has ≤7 lines in this schema, so a
    * 100 TB lineitem yields ≤21 pairs per order — candidate volume is
    * linear in orders. Pair counts then reduce with map-side combine;
    * the top-50 limit applies AFTER the full aggregation (pair-key
    * cardinality is bounded by |parts|², not rows). `p1 < p2`
    * canonicalizes pairs so each is counted once. */
  def basketPartPairs(s: SparkSession, d: String): DataFrame = {
    // One fact shuffle, not a self-join (which would shuffle lineitem
    // twice): gather each order's parts, emit i<j pairs from the sorted
    // array in-line (higher-order transform/slice — codegen, no UDF).
    // Positional pairs over the SORTED array with a strict x<y filter
    // count exactly like the SQL self-join `a.p < b.p`: equal-part
    // pairs drop, repeated parts multiply — same multiset either way.
    Tables.lineitem(s, d).select("l_orderkey", "l_partkey")
      .groupBy("l_orderkey")
      .agg(sort_array(collect_list("l_partkey")).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, (x, i) ->" +
          " transform(slice(ps, i + 2, size(ps))," +
          " y -> struct(x as p1, y as p2))))")).as("pr"))
      .filter(col("pr.p1") < col("pr.p2"))
      .groupBy(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 2)
      .orderBy(col("n_orders").desc, col("p1"), col("p2"))
      .limit(50)
  }

  /** Customer spend deciles within each nation: `ntile(10)` over a
    * window PARTITIONED by nation — deliberately not a global ntile,
    * which would force every customer into one window partition (the
    * classic unpartitioned-window scale killer). Partitioning by
    * nation keeps the sort distributed; the tie-break on `o_custkey`
    * makes tile assignment deterministic across engines. Output is the
    * decile-level rollup (segment sizes + spend mass), the shape a
    * spend-segmentation feature table feeds from. Joins: customer is
    * NOT broadcast — per-customer spend leaves the aggregation already
    * hash-partitioned by custkey, so the customer equi-join reuses that
    * exchange (no extra shuffle, and customer is fact-sized at 100 TB);
    * nation (≤25 rows) broadcasts. */
  def windowDecileSpend(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("n_name").orderBy(col("spend").desc, col("o_custkey"))
    val spend = Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(round(sum("o_totalprice"), 2).as("spend"))
      .join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
    spend.withColumn("decile", ntile(10).over(w))
      .groupBy("n_name", "decile")
      .agg(count(lit(1)).as("n_cust"),
        round(sum("spend"), 2).as("decile_spend"))
      .orderBy("n_name", "decile")
  }

  /** TPC-H Q4 shape (order-priority checking): orders in a 6-month
    * window with at least one line shipped >60 days after the order
    * date. The correlated EXISTS plans as a LEFT SEMI join on the
    * order key — each order is emitted at most once no matter how many
    * late lines it has, and the date window is pushed into the orders
    * scan before the join. The semi join shuffles both sides by
    * orderkey once; the non-equi lateness predicate rides along as the
    * join residual, so there is no post-join dedup (`distinct`) pass —
    * the shape a 100 TB EXISTS must take. */
  def q4PriorityExists(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00"))
        && col("o_orderdate") < to_timestamp(lit("1996-07-01 00:00:00")))
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
    ord.join(li,
        col("l_orderkey") === col("o_orderkey")
          && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q10 shape (returned-item revenue): customers ranked by the
    * revenue they returned in one quarter. Both fact filters
    * (quarter window on orders, R-flag on lineitem) are pushed to the
    * scans so the orderkey shuffle moves only the quarter's returns;
    * nation is the lone broadcast dim. The top-20 runs as a
    * sort-limit AFTER the per-customer aggregate — at 100 TB the agg
    * output is one row per returning customer, and TakeOrderedAndProject
    * keeps only 20 per partition before the final merge. */
  def q10ReturnedRevenue(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-07-01 00:00:00"))
        && col("o_orderdate") < to_timestamp(lit("1996-10-01 00:00:00")))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d)
        .select("c_custkey", "c_name", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)
        .select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q14 shape (promotion effect): one month's revenue split
    * promo vs total through the part dim. Emits the numerator and
    * denominator as separate 2-decimal sums instead of their ratio —
    * the engine-agnostic form (§4): both sides of the oracle sum on
    * the 0.01 grid, where a float division would hash-diverge. Part
    * broadcasts; the month filter is pushed to the lineitem scan, so
    * the whole query is one scan + one broadcast join + one partial
    * agg — zero data shuffles at any scale. */
  def q14PromoShare(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-09-01 00:00:00"))
        && col("l_shipdate") < to_timestamp(lit("1997-10-01 00:00:00")))
      .select("l_partkey", "l_extendedprice", "l_discount")
      .join(broadcast(Tables.part(s, d).select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        round(sum(when(col("p_type") === "PROMO",
          col("l_extendedprice") * (lit(1) - col("l_discount")))
          .otherwise(lit(0))), 2).as("promo_rev"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("total_rev"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q19 shape (discounted revenue): a three-way disjunction of
    * (brand, size-band, quantity-band) conjuncts spanning both join
    * sides. Catalyst factors the per-side implications out of the OR —
    * the part scan gets `brand IN (...) OR`-of-size-bands pushed down
    * and the lineitem scan gets the quantity-band union — so each side
    * is pre-filtered at the storage layer before the join, and the full
    * disjunction re-checks only the surviving pairs (PlanAuditSpec pins
    * the per-side pushdown). This is the query shape that punishes
    * engines which treat OR as unpushable. */
  def q19Disjunctive(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val pt = Tables.part(s, d).select("p_partkey", "p_brand", "p_size")
    val clause =
      (col("p_brand") === "Brand#12"
        && col("p_size").between(1, 15) && col("l_quantity").between(1, 15)) ||
      (col("p_brand") === "Brand#23"
        && col("p_size").between(1, 25) && col("l_quantity").between(10, 25)) ||
      (col("p_brand") === "Brand#5"
        && col("p_size").between(20, 50) && col("l_quantity").between(25, 50))
    li.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .filter(clause)
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q22 shape (global sales opportunity): rich-but-idle
    * customers — balance above the positive-balance average, no orders
    * in 1996 — rolled up per market segment. The scalar subquery
    * becomes a one-row broadcast crossJoin (no shuffle); the threshold
    * is FLOORED to an integer so the float average's last-ulp
    * difference between engines can never flip a 0.01-grid balance
    * across the boundary (§4). The anti join shuffles by custkey once;
    * at 100 TB the 1996 order-key side is the only moving set. */
  def q22IdleRich(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val thr = cust.filter(col("c_acctbal") > 0)
      .agg(floor(avg("c_acctbal")).as("bal_floor"))
    val y96 = Tables.orders(s, d)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00"))
        && col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
      .select("o_custkey")
    cust.crossJoin(broadcast(thr))
      .filter(col("c_acctbal") > col("bal_floor"))
      .join(y96, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_cust"),
        round(sum("c_acctbal"), 2).as("total_bal"))
      .orderBy("c_mktsegment")
  }

  /** TPC-H Q6 shape (forecasting revenue change): a single-table scan
    * whose ENTIRE predicate set — date window, discount band, quantity
    * cap — is parquet-pushable, folding 100 TB of lineitem into one
    * global sum. This is the canonical pushdown showcase: the scan must
    * read only the 4 referenced columns and `.explain` must list every
    * range predicate under PushedFilters (PlanAuditSpec pins both), so
    * row groups whose min/max stats miss the window are skipped at the
    * storage layer — the difference between scanning a year and
    * scanning a fact table. The one-row global agg is a partial-agg +
    * single-reducer merge: no shuffle of data, only of per-partition
    * sums. */
  def q6SelectiveAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00"))
        && col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00"))
        && col("l_discount") >= 0.05 && col("l_discount") <= 0.07
        && col("l_quantity") < 24)
      .agg(
        round(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue"),
        count(lit(1)).as("n_items"))

  /** GROUPING SETS ((status), (priority)) — the third member of the
    * grouped-analysis family next to [[aggRollup]]/[[aggCube]]: exactly
    * the requested grouping combinations, no more. Spark plans all
    * three through one Expand node — each input row is replicated once
    * per grouping set BEFORE the hash aggregate, so the fact table is
    * scanned once (not once per set, which is what a hand-written
    * UNION ALL of two groupBys would cost at 100 TB). */
  def aggGroupingSets(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("sum_price"))
      .orderBy("status", "priority")

  /** [[graft.ops.Skew.saltedJoin]] under the driver's oracle gate: the
    * same brand rollup as [[joinBroadcastDim]], but through the salted
    * shuffle path — each fact row carries a deterministic salt in 0..7,
    * the part side is replicated 8×, and the join runs on
    * (key, salt) so a hot key spreads over 8 reducers. The `merge` hint
    * suppresses the broadcast that would otherwise make the salt moot at
    * test SF (at 100 TB the small side is only small RELATIVE to the
    * fact side — this is the hot-key shape AQE's skew split can't fix
    * when the skew sits under later operators). The salt never reaches
    * the output, so the oracle is the PLAIN join SQL: parity proves
    * salting is result-invariant, the plan pin proves the shuffle
    * actually spread. */
  def joinSkewSalted(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_partkey").as("partkey"), col("l_quantity"))
    val part = Tables.part(s, d)
      .select(col("p_partkey").as("partkey"), col("p_brand"))
      .hint("merge")
    graft.ops.Skew.saltedJoin(li, part, "partkey", 8)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_items"),
        round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("p_brand")
  }

  /** dense_rank + ntile quartiles per customer over a total order. */
  def windowRankFeatures(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        dense_rank().over(w).as("rnk"),
        ntile(4).over(w).as("quartile"))
      .orderBy("o_custkey", "rnk", "o_orderkey")
  }

  /** CUBE over (status, priority): all 4 grouping combinations. */
  def aggCube(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("sum_price"))
      .orderBy("status", "priority")

  /** TPC-H Q1 shape (pricing summary report); dates shifted to this
    * dataset's 1995–2001 range. */
  def q1Agg(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= to_timestamp(lit("2000-09-02 00:00:00")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** TPC-H Q3 shape: segment-filtered customer × orders × lineitem,
    * top-10 open orders by revenue. Customer side is broadcast (it is a
    * fraction of a dim table after the segment filter). */
  def q3Shipping(s: SparkSession, d: String): DataFrame = {
    val cutoff = to_timestamp(lit("1996-03-15 00:00:00"))
    // customer scales with SF: no forced broadcast (AQE broadcasts the
    // segment-filtered side at runtime whenever it fits the threshold)
    val cust = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > cutoff)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    // customer (segment-filtered dim) broadcasts into orders; the
    // orders→lineitem join is left to Catalyst/AQE — orders is a fact
    // table, so a forced broadcast would not survive 100 TB (AQE still
    // broadcasts it at small SF where it fits the threshold).
    li.join(ord.join(cust, col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .select(col("o_orderkey"), col("o_orderdate").cast("date")
        .as("o_orderdate"), col("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape: regional supplier revenue through the full star.
    * region/nation/supplier/customer broadcast; the only shuffles are the
    * two fact-side key exchanges (orders↔customer pre-filtered, then
    * lineitem↔orders). */
  def q5LocalSupplier(s: SparkSession, d: String): DataFrame = {
    val asiaNations = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)
        .filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val cust = Tables.customer(s, d)
      .join(broadcast(asiaNations),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "c_nationkey") // customer/supplier scale with
    // SF → no broadcast hints on them; nation/region are constant dims
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00"))
        && col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
      .select("o_orderkey", "o_custkey")
    val supp = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
    // orders↔customer and lineitem↔orders are fact-side joins: no
    // broadcast hints (AQE chooses at runtime); only true dims below.
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(ord.join(cust, col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(supp,
        col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(asiaNations),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Broadcast hash join fact × small dim, brand rollup. */
  def joinBroadcastDim(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).select("l_partkey", "l_quantity")
      .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_items"),
        round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("p_brand")
  }

  /** Anti join: customers with no orders in 1996. Date-windowed so the
    * result is non-empty at every SF (every-customer-ordered data made
    * the unwindowed variant vacuously pass on 0 = 0 rows); the window
    * is pushed into the orders scan before the anti join. */
  def joinAnti(s: SparkSession, d: String): DataFrame = {
    val y96 = Tables.orders(s, d)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00"))
        && col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
      .select("o_custkey")
    Tables.customer(s, d)
      .join(y96, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Semi join: parts that shipped at least once. */
  def joinSemi(s: SparkSession, d: String): DataFrame = {
    Tables.part(s, d)
      .join(Tables.lineitem(s, d).select("l_partkey"),
        col("p_partkey") === col("l_partkey"), "left_semi")
      .select("p_partkey", "p_brand")
      .orderBy("p_partkey")
  }

  /** Multiple exact count-distincts per group (expand-based in Spark). */
  def aggDistinct(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(
        countDistinct(col("o_custkey")).as("n_custs"),
        countDistinct(col("o_orderstatus")).as("n_statuses"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** ROLLUP over (status, priority); NULL grouping slots coalesced to
    * 'ALL' on both sides so hash compare is null-free. */
  def aggRollup(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d)
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("sum_price"))
      .orderBy("status", "priority")
  }

  /** Pivot: order-status counts + revenue as a priority × status matrix. */
  def pivotStatus(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("cnt_f"),
        coalesce(col("O"), lit(0L)).as("cnt_o"),
        coalesce(col("P"), lit(0L)).as("cnt_p"))
      .orderBy("o_orderpriority")
  }

  /** UNION ALL / INTERSECT / EXCEPT over customer key sets. */
  def setOps(s: SparkSession, d: String): DataFrame = {
    val building = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val withF = Tables.orders(s, d)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("c_custkey")).distinct()
    val negative = Tables.customer(s, d)
      .filter(col("c_acctbal") < 0).select("c_custkey")
    val i = building.intersect(withF)
      .select(lit("building_and_f").as("src"), col("c_custkey"))
    val e = building.except(negative)
      .select(lit("building_not_neg").as("src"), col("c_custkey"))
    i.unionAll(e).orderBy("src", "c_custkey")
  }

  /** Running revenue total per customer over order dates. */
  def windowRunningTotal(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum("o_totalprice").over(w), 2).as("running_total"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Correlation / covariance / stddev aggregates per return flag. */
  def corrStats(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        (round(corr("l_quantity", "l_extendedprice"), 3) + lit(0.0))
          .as("corr_qty_price"),
        (round(covar_samp("l_quantity", "l_extendedprice"), 1) + lit(0.0))
          .as("covar_qty_price"),
        round(stddev_samp("l_quantity"), 4).as("sd_qty"),
        round(stddev_samp("l_discount"), 4).as("sd_disc"))
      .orderBy("l_returnflag")
  }

  // ── TPC-H decision-support completion pack ──────────────────────────
  // The remaining 13 of the 22 classic shapes, adapted to this schema
  // (no partsupp / shipmode / commitdate columns): lineitem stands in as
  // the supply catalog where partsupp is called for, and "late" is
  // l_shipdate vs o_orderdate + N days where receipt/commit dates are.
  // What is preserved is each query's PLAN shape — correlated min,
  // double-EXISTS, scalar-subquery HAVING, left-outer histogram — which
  // is what a 100 TB engine is actually graded on.

  /** TPC-H Q2 shape (minimum-cost supplier): for every STANDARD part,
    * the EUROPE supplier offering it at the lowest unit cost. The
    * correlated `= (SELECT min ...)` becomes aggregate-then-rejoin: the
    * per-(part, supplier) unit costs aggregate once, the per-part min
    * aggregates from THAT result (an already-reduced frame, one row per
    * supply pair — not a window over the raw supply relation), and the
    * equi-join back on (partkey, cost) keeps exactly the argmin rows.
    * Both aggregates and the rejoin hash on partkey, so AQE reuses the
    * exchange; supplier/nation/region fold into one broadcast dim. */
  def q2MinCostSupp(s: SparkSession, d: String): DataFrame = {
    val euroSupp = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)
        .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val supply = Tables.lineitem(s, d)
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
      .join(broadcast(euroSupp.select("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("l_partkey", "l_suppkey")
      .agg(round(min(col("l_extendedprice") / col("l_quantity")), 2)
        .as("unit_cost"))
    val minCost = supply
      .groupBy(col("l_partkey").as("m_partkey"))
      .agg(min("unit_cost").as("min_cost"))
    supply
      .join(minCost, col("l_partkey") === col("m_partkey")
        && col("unit_cost") === col("min_cost"))
      .join(broadcast(Tables.part(s, d)
        .filter(col("p_type") === "STANDARD")
        .select("p_partkey", "p_name")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(euroSupp), col("l_suppkey") === col("s_suppkey"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
      .select("p_partkey", "p_name", "s_name", "n_name", "unit_cost")
  }

  /** TPC-H Q7 shape (volume shipping): revenue flowing between one
    * nation pair, both directions, by ship year. Both sides are
    * pre-filtered to the two nations BEFORE touching a fact table.
    * The supplier side is a genuine dim (tiny at any SF) and takes an
    * explicit broadcast; the CUSTOMER side is fact-sized at 100 TB
    * (the same argument as [[windowDecileSpend]]'s doc) — a 2/25
    * nation slice is still O(|customer|), so it joins WITHOUT a
    * broadcast hint: the o_custkey join stays a shuffled hash join by
    * plan, and AQE downgrades it to broadcast only when the runtime
    * slice actually fits (which it does at test SFs). */
  def q7VolumeShipping(s: SparkSession, d: String): DataFrame = {
    val pair = Seq("NATION_3", "NATION_7")
    val supp = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
      .join(broadcast(Tables.nation(s, d)
        .filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "supp_nation")
    val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
      .join(broadcast(Tables.nation(s, d)
        .filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey"), col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "cust_nation")
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00"))
        && col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
        "l_shipdate")
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === "NATION_3"
          && col("cust_nation") === "NATION_7")
        || (col("supp_nation") === "NATION_7"
          && col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q8 shape (national market share): one nation's slice of a
    * region's market for one part type, by order year. Emits numerator
    * and denominator as separate sums (the §4 engine-agnostic form —
    * no float division under the hash gate). The part/supplier filters
    * cut fact rows at genuine broadcast joins; the region-filtered
    * CUSTOMER semi join carries no broadcast hint — customer is
    * fact-sized at 100 TB and a 1/5 region slice is still
    * O(|customer|), so the semi join shuffles on custkey by plan and
    * AQE broadcasts only when the runtime slice fits. The data
    * shuffles are lineitem×orders on orderkey plus that semi join. */
  def q8MarketShare(s: SparkSession, d: String): DataFrame = {
    val custAm = Tables.customer(s, d).select("c_custkey", "c_nationkey")
      .join(broadcast(Tables.nation(s, d).select("n_nationkey", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)
        .filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey")
    val suppNat = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
      .join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "supp_nation")
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_discount")
      .join(broadcast(Tables.part(s, d)
        .filter(col("p_type") === "ECONOMY").select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00"))
          && col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
        .select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(custAm, col("o_custkey") === col("c_custkey"),
        "left_semi")
      .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        round(sum(when(col("supp_nation") === "NATION_5",
          col("l_extendedprice") * (lit(1) - col("l_discount")))
          .otherwise(lit(0))), 2).as("nation_rev"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("total_rev"))
      .orderBy("o_year")
  }

  /** TPC-H Q9 shape (product-type profit): profit on red parts by
    * supplier nation and order year. With no partsupp, supply cost is
    * modeled as half the part's retail price — the ARITHMETIC shape
    * (revenue minus cost inside one sum) is what survives. Part and
    * supplier/nation broadcast; the one shuffle is orderkey. */
  def q9ProductProfit(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
      .join(broadcast(Tables.part(s, d)
        .filter(col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, d)
        .select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)
        .select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
        - lit(0.5) * col("p_retailprice") * col("l_quantity")), 2)
        .as("profit"))
      .orderBy(col("nation"), col("o_year").desc)

  /** TPC-H Q11 shape (important stock): per-part inventory value from
    * one region's suppliers, kept only where it exceeds a fraction of
    * the grand total. The scalar subquery is a one-row broadcast
    * crossJoin over the SAME aggregate subplan — Spark's ReuseExchange
    * serves both the per-part frame and its global sum from one
    * shuffle. The HAVING threshold compares on values already rounded
    * to the 0.01 grid, so the cross-engine float boundary can't flip
    * membership. */
  def q11ImportantStock(s: SparkSession, d: String): DataFrame = {
    val euroKeys = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
      .join(broadcast(Tables.nation(s, d).select("n_nationkey", "n_regionkey")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)
        .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey")
    val value = Tables.lineitem(s, d)
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(broadcast(euroKeys), col("l_suppkey") === col("s_suppkey"),
        "left_semi")
      .join(broadcast(Tables.part(s, d)
        .select("p_partkey", "p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey")
      .agg(round(sum(col("l_quantity") * col("p_retailprice")), 2)
        .as("value"))
    value
      .crossJoin(broadcast(value.agg(sum("value").as("tot"))))
      .filter(col("value") > lit(0.001) * col("tot"))
      .select("l_partkey", "value")
      .orderBy(col("value").desc, col("l_partkey"))
  }

  /** TPC-H Q12 shape (shipping-priority audit): late lines in one ship
    * year split into high- vs low-priority counts per line status. With
    * no receipt/commit dates, "late" is shipped >60 days after the
    * order date — a non-equi residual riding the orderkey equi-join,
    * exactly like [[q4PriorityExists]] but feeding a conditional
    * aggregate instead of a semi join. The ship-year window is pushed
    * to the lineitem scan. */
  def q12LateLines(s: SparkSession, d: String): DataFrame = {
    val hi = Seq("1-URGENT", "2-HIGH")
    Tables.orders(s, d).select("o_orderkey", "o_orderdate", "o_orderpriority")
      .join(Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00"))
          && col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
        .select("l_orderkey", "l_shipdate", "l_linestatus"),
        col("o_orderkey") === col("l_orderkey")
          && col("l_shipdate") > col("o_orderdate")
            + expr("INTERVAL 60 DAYS"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(col("o_orderpriority").isin(hi: _*), 1).otherwise(0))
          .cast("long").as("high_line_count"),
        sum(when(col("o_orderpriority").isin(hi: _*), 0).otherwise(1))
          .cast("long").as("low_line_count"))
      .orderBy("l_linestatus")
  }

  /** TPC-H Q13 shape (customer order-count distribution): how many
    * customers placed N qualifying orders, INCLUDING the zero-order
    * customers — which is why this must be a LEFT OUTER join (a plain
    * join would silently drop the c_count=0 bucket). Two aggregations:
    * per-customer count (shuffles by custkey), then the tiny histogram
    * over counts. The priority exclusion is pushed to the orders scan
    * as part of the JOIN condition, not a WHERE — post-join filtering
    * would also kill the zero bucket. */
  def q13CustOrdersDist(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select("c_custkey")
      .join(Tables.orders(s, d)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select("o_custkey", "o_orderkey"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** TPC-H Q15 shape (top supplier): supplier(s) whose one-quarter
    * revenue equals the maximum. The view + correlated max becomes
    * aggregate → one-row broadcast max → equality filter; the equality
    * compares 0.01-grid rounded revenues, so both engines agree on the
    * argmax set even though their raw float sums differ in the last
    * ulp. Supplier names arrive by broadcast AFTER the filter — only
    * the winners' keys are looked up. */
  def q15TopSupplier(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00"))
        && col("l_shipdate") < to_timestamp(lit("1996-04-01 00:00:00")))
      .groupBy("l_suppkey")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("total_revenue"))
    rev.crossJoin(broadcast(rev.agg(max("total_revenue").as("mx"))))
      .filter(col("total_revenue") === col("mx"))
      .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "total_revenue")
      .orderBy("s_suppkey")
  }

  /** TPC-H Q16 shape (supplier-count by part attribute): distinct
    * suppliers per (brand, type, size) over a multi-valued size list,
    * excluding a supplier denylist. The NOT IN becomes a broadcast
    * LEFT ANTI join (never a shuffle — the denylist is a filtered dim);
    * the distinct-count shuffles once on the grouping key with the
    * suppkey set pre-deduped map-side. */
  def q16SupplierCnt(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select("l_partkey", "l_suppkey")
      .join(broadcast(Tables.part(s, d)
        .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO"
          && col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
        .select("p_partkey", "p_brand", "p_type", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, d)
        .filter(col("s_acctbal") < 0).select("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))

  /** TPC-H Q17 shape (small-quantity revenue): lines of one brand
    * below half their part's average quantity. The correlated per-part
    * AVG becomes aggregate-then-rejoin on partkey — and both the
    * average and the rejoin run on the BRAND-FILTERED lines only
    * (restricting to the brand's parts cannot change any per-part
    * average), so at 100 TB the threshold frame is thousands of rows,
    * not the full fact table, and AQE broadcasts it. */
  def q17SmallQtyRev(s: SparkSession, d: String): DataFrame = {
    val brandLines = Tables.lineitem(s, d)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(broadcast(Tables.part(s, d)
        .filter(col("p_brand") === "Brand#3").select("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_semi")
    val thr = brandLines
      .groupBy(col("l_partkey").as("a_partkey"))
      .agg((lit(0.5) * avg("l_quantity")).as("qty_thr"))
    brandLines
      .join(thr, col("l_partkey") === col("a_partkey"))
      .filter(col("l_quantity") < col("qty_thr"))
      .agg(round(sum("l_extendedprice") / lit(7.0), 2).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q18 shape (large-volume orders): orders whose total
    * quantity clears a threshold, with their customers. The HAVING
    * subquery folds into the main plan — ONE lineitem aggregation
    * produces both the qualifying keys and their sums (TPC-H's
    * textbook form scans lineitem twice; the rewrite halves the fact
    * I/O). Top-100 by price runs as TakeOrderedAndProject after the
    * joins. */
  def q18LargeOrders(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey").as("b_orderkey"))
      .agg(sum("l_quantity").as("qty_raw"))
      .filter(col("qty_raw") > 120)
      .select(col("b_orderkey"), round(col("qty_raw"), 2).as("sum_qty"))
      .join(Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
        col("b_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d).select("c_custkey", "c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  /** TPC-H Q20 shape (part-promotion candidates): one region's
    * suppliers who shipped >30% of their all-time volume of red parts
    * within one year. The nested `IN (… HAVING …)` chain becomes
    * semi-join → conditional aggregate → threshold filter → semi-join:
    * per-(supplier, part) volumes aggregate once with the year split
    * as a conditional sum (one pass, not two), and only qualifying
    * suppkeys travel to the supplier dim. */
  def q20PartPromotion(s: SparkSession, d: String): DataFrame = {
    val qual = Tables.lineitem(s, d)
      .select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
      .join(broadcast(Tables.part(s, d)
        .filter(col("p_name").like("red%")).select("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_suppkey", "l_partkey")
      .agg(
        sum(when(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00"))
          && col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")),
          col("l_quantity")).otherwise(lit(0))).as("q97"),
        sum("l_quantity").as("q_all"))
      .filter(col("q97") > lit(0.3) * col("q_all"))
      .select("l_suppkey").distinct()
    Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d).select("n_nationkey", "n_regionkey")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)
        .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .join(qual, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_name", "s_acctbal")
      .orderBy("s_name")
  }

  /** TPC-H Q21 shape (suppliers who kept orders waiting): for finished
    * orders, the late lines whose supplier was the ONLY late one among
    * several suppliers on the order — EXISTS(another supplier) AND NOT
    * EXISTS(another LATE supplier), i.e. a semi join then an anti join
    * against the same late-lines relation, both equi on orderkey with
    * the supplier inequality as residual. The late frame is built
    * twice from the source (identical subplans — ReuseExchange
    * deduplicates the shuffle) rather than self-referenced, keeping
    * every column lineage unambiguous. */
  def q21WaitingSupplier(s: SparkSession, d: String): DataFrame = {
    def lateLines(p: String): DataFrame =
      Tables.lineitem(s, d).select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(Tables.orders(s, d)
          .filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey")
            && col("l_shipdate") > col("o_orderdate")
              + expr("INTERVAL 90 DAYS"))
        .select(col("l_orderkey").as(p + "orderkey"),
          col("l_suppkey").as(p + "suppkey"))
    val l1 = lateLines("")
    val others = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o2_orderkey"),
        col("l_suppkey").as("o2_suppkey"))
    val lateOthers = lateLines("o3_")
    l1.join(others, col("orderkey") === col("o2_orderkey")
        && col("suppkey") =!= col("o2_suppkey"), "left_semi")
      .join(lateOthers, col("orderkey") === col("o3_orderkey")
        && col("suppkey") =!= col("o3_suppkey"), "left_anti")
      .join(broadcast(Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
          .select("n_nationkey", "n_regionkey")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)
          .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "s_name")),
        col("suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** Pareto skyline over part on (minimize p_retailprice, minimize
    * p_size): a part survives iff no other part is ≤ on both axes and
    * < on at least one — the multi-objective "best tradeoffs" query
    * optimizers and catalog-curation pipelines both need. NOT the
    * textbook NOT-EXISTS self-join (O(n²) pairs — the oracle replays
    * that form, which is fine for DuckDB at test SF and fatal for the
    * engine at 100 TB). The sweep form: a part is on the skyline iff
    * (1) its size is minimal within its exact price point and (2) its
    * size is strictly below the minimum size of every strictly-cheaper
    * part. (2) is a running min over price order — computed with the
    * same TWO-LEVEL decomposition as [[Dedup.compactionPlan]]'s prefix
    * sums (min is associative too): per-price mins aggregate once
    * (fine-grained keys), $10-band coarse mins take the cross-band
    * running min over a metadata-sized band frame, and the within-band
    * running min windows over band-local keys. Prices compare as
    * centi-cents BIGINT (exact); the emitted price is the stored
    * double, untouched. */
  def skylinePareto(s: SparkSession, d: String): DataFrame =
    skylineOf(Tables.part(s, d)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"),
        expr("cast(round(p_retailprice * 100) as bigint)").as("pc")))

  /** [[skylinePareto]]'s sweep kernel over an explicit (p_partkey,
    * p_retailprice, p_size, pc) frame — package-private so the spec
    * can pin tie semantics (equal points co-survive) and the
    * two-level ≡ naive-window equality on planted frames. */
  private[graft] def skylineOf(part: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    // (1) per exact price point: minimal size at that price
    val grpMin = part.groupBy("pc").agg(min("p_size").as("grp_min_size"))
      .withColumn("band", expr("pc div 1000"))
    // (2) running min of size over all strictly-cheaper prices,
    // two-level: coarse prior-band min + within-band prior-price min
    val coarse = grpMin.groupBy("band")
      .agg(min("grp_min_size").as("band_min"))
      .withColumn("prior_band_min", min("band_min").over(
        w.orderBy("band").rowsBetween(w.unboundedPreceding, -1)))
      .select("band", "prior_band_min")
    val priorMin = grpMin
      .withColumn("local_prior", min("grp_min_size").over(
        w.partitionBy("band").orderBy("pc")
          .rowsBetween(w.unboundedPreceding, -1)))
      .join(coarse, "band")
      .select(col("pc"),
        least(coalesce(col("prior_band_min"), lit(Int.MaxValue)),
          coalesce(col("local_prior"), lit(Int.MaxValue)))
          .as("prior_min"))
    part
      .join(grpMin.select("pc", "grp_min_size"), "pc")
      .join(priorMin, "pc")
      .filter(col("p_size") === col("grp_min_size")
        && col("p_size") < col("prior_min"))
      .select("p_partkey", "p_retailprice", "p_size")
      .orderBy("p_retailprice", "p_size", "p_partkey")
  }

  /** Day-of-week seasonality profile of the order stream — the
    * calendar-decomposition read (is Monday volume real signal or
    * noise?) a forecasting pipeline takes before modeling: per
    * weekday, order count, spend mass, and the volume index vs a
    * uniform week in ppm (n·7·10⁶ div total — integer, exact).
    * Weekday comes from epoch-day arithmetic ((days+3) mod 7, 0 =
    * Monday), NOT the engines' dayofweek() — Spark counts Sunday=1,
    * DuckDB Sunday=0, and this operator must hash identically on
    * both. Spend sums in cents BIGINT. One map-side-combined
    * aggregate over orders onto a 7-row result; the ppm join is a
    * broadcast of the 1-row total. */
  def seasonalityProfile(s: SparkSession, d: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val o = Tables.orders(s, d)
      // NTZ → TZ cast under the fixed UTC session zone keeps the wall
      // clock (the Tables.events ts idiom), so epoch-day math is exact
      .select(expr("unix_micros(cast(o_orderdate as timestamp))" +
          s" div $dayUs + 3").mod(7).as("dow"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
    val per = o.groupBy("dow")
      .agg(count(lit(1)).as("n_orders"), sum("cents").as("spend_cents"))
    val total = per.agg(sum("n_orders").as("n_total"))
    per.crossJoin(broadcast(total))
      .select(col("dow"), col("n_orders"), col("spend_cents"),
        expr("n_orders * 7 * 1000000 div n_total").as("volume_index_ppm"))
      .orderBy("dow")
  }

  /** One-step-ahead EWMA forecast of the daily order volume — the
    * capacity-planning view next to [[seasonalityProfile]] (what load
    * to EXPECT tomorrow, vs how load cycles within a week): for every
    * calendar day, the α = 1/2 exponentially-weighted moving average
    * of the preceding days, f_t = Σ_{k=1..20} x_{t−k} / 2^k
    * (weights sum to 1 − 2⁻²⁰ — the truncation both engines replay
    * identically), plus the absolute forecast error. All EXACT
    * integer: each term is `count · 10⁶ div 2^k` (shift-based powers
    * of two, the [[graft.operators.LogAnalytics.engagementDecay]]
    * precedent — no float exp crosses engines), missing days
    * zero-fill off a `sequence` spine so gaps read as true zero load.
    *
    * Scale shape: ONE orderkey-free aggregate collapses the fact table
    * to ≤ |days| rows map-side; the 20-lag window then runs over the
    * CALENDAR-BOUNDED day spine — metadata (a decade is 3 653 rows),
    * the `log_changepoint_cusum` grid argument, so the single-
    * partition window never touches order rows. */
  def forecastEwma(s: SparkSession, d: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val o = Tables.orders(s, d)
      .select(expr(
        s"unix_micros(cast(o_orderdate as timestamp)) div $dayUs")
        .as("day"))
    val counts = o.groupBy("day").agg(count(lit(1)).as("n_orders"))
    val spine = o.agg(min("day").as("d0"), max("day").as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("day")
    val lagged = (1 to 20).foldLeft(
      spine.join(counts, Seq("day"), "left")
        .select(col("day"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))) {
      (df, k) =>
        df.withColumn(s"l$k",
          coalesce(lag(col("n_orders"), k).over(w), lit(0L)))
    }
    lagged
      .withColumn("forecast_e6", expr((1 to 20)
        .map(k => s"l$k * 1000000 div ${1L << k}").mkString(" + ")))
      .select(col("day"), col("n_orders"), col("forecast_e6"),
        expr("abs(n_orders * 1000000 - forecast_e6)").as("abs_err_e6"))
      .orderBy("day")
  }

  /** Open-order backlog curve — the queue-depth view of the order
    * stream (the operational twin of [[forecastEwma]]'s arrival-rate
    * view): an order opens on o_orderdate and closes when its LAST
    * lineitem ships; per calendar day, openings, closings, and the
    * running backlog (opened-so-far − closed-so-far). A growing curve
    * is the earliest fulfilment-capacity alarm — visible long before
    * any per-order lateness predicate fires.
    *
    * Scale shape: lineitem collapses to per-order close days via ONE
    * orderkey shuffle with map-side partial max, then both sides
    * aggregate to ≤ |days| rows; the running sum is a window over the
    * calendar-bounded day spine — metadata, the [[forecastEwma]]
    * argument. No order ever joins a lineitem row directly. */
  def backlogCurve(s: SparkSession, d: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val opens = Tables.orders(s, d)
      .select(expr(
        s"unix_micros(cast(o_orderdate as timestamp)) div $dayUs")
        .as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_opened"))
    val closes = Tables.lineitem(s, d)
      .select(col("l_orderkey"),
        expr(s"unix_micros(cast(l_shipdate as timestamp)) div $dayUs")
          .as("sday"))
      .groupBy("l_orderkey").agg(max("sday").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_closed"))
    val spine = opens.agg(min("day").as("d0"))
      .crossJoin(closes.agg(max("day").as("d1")))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    spine.join(opens, Seq("day"), "left").join(closes, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("n_opened"), lit(0L)).as("n_opened"),
        coalesce(col("n_closed"), lit(0L)).as("n_closed"))
      .withColumn("backlog", sum(col("n_opened") - col("n_closed"))
        .over(org.apache.spark.sql.expressions.Window.orderBy("day")))
      .orderBy("day")
  }

  /** Supplier scorecard — the vendor-management rollup every
    * procurement pipeline runs off the fact table: per supplier the
    * line count, revenue (EXACT integer 10⁻⁴-dollar units:
    * centi-price × (100 − discount-pct), both factors exact BIGINTs
    * recovered from the 2-decimal stored doubles — no float product
    * ever meets round(), the midpoint-free money discipline), return
    * rate (returnflag = 'R') and revenue share in exact integer ppm
    * against the 1-row broadcast grand total, with supplier/nation
    * names from broadcast dims. Revenue sums accumulate in
    * decimal(38,0) — a per-row rev_e4 reaches ~10⁹, so a LongType
    * grand total would silently wrap past 9.2·10¹⁸ around SF~5k with
    * ANSI off; the 128-bit aggregate matches the oracle's HUGEINT
    * discipline and the share product never leaves decimal before the
    * integral divide.
    *
    * Scale shape: ONE lineitem scan collapsing map-side onto suppkey
    * (|suppliers| rows out), broadcast dim joins, 1-row total
    * broadcast — no windows, no fact-fact join. */
  def supplierScorecard(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_suppkey"),
        (col("l_returnflag") === "R").cast("long").as("is_ret"),
        (expr("cast(round(l_extendedprice * 100) as bigint)")
          * (lit(100L) - expr("cast(round(l_discount * 100) as bigint)")))
          .as("rev_e4"))
    val per = li.groupBy("l_suppkey")
      .agg(count(lit(1)).as("n_lines"),
        sum("is_ret").as("n_returned"),
        sum(col("rev_e4").cast("decimal(38,0)")).as("rev_e4d"))
    val total = per.agg(sum("rev_e4d").as("tot_e4"))
    per
      .join(broadcast(Tables.supplier(s, d)
        .select("s_suppkey", "s_name", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)
        .select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .crossJoin(broadcast(total))
      .select(col("s_suppkey"), col("s_name"),
        col("n_name").as("nation"),
        col("n_lines"), col("n_returned"),
        expr("n_returned * 1000000 div n_lines").as("return_ppm"),
        col("rev_e4d").cast("long").as("rev_e4"),
        expr("rev_e4d * 1000000 div tot_e4")
          .cast("long").as("rev_share_ppm"))
      .orderBy(col("rev_e4").desc, col("s_suppkey"))
  }

  /** Customer lifetime-value cohort matrix — the retention×revenue
    * triangle every subscription/commerce analytics stack draws: each
    * customer joins the cohort of their FIRST order month; for every
    * (cohort month, month offset) cell, the active-customer count,
    * order count, and revenue (o_totalprice cents). Reading a row
    * across shows how a cohort's spend decays; reading the diagonal
    * shows acquisition quality drift — the batch twin of
    * `log_cohort_retention` with money attached.
    *
    * Months are pure integer calendar arithmetic (year·12 + month —
    * no epoch-day division drift across month lengths); cohort is
    * emitted as yyyymm. Scale shape: one custkey shuffle for first
    * months (map-side partial min), one custkey-keyed join back onto
    * the same shuffle layout (ReuseExchange-friendly), then a
    * map-side-combined aggregate onto ≤ |months|² cells. */
  def customerLtvCohort(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("m"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
    val first = o.groupBy("o_custkey").agg(min("m").as("m0"))
    o.join(first, "o_custkey")
      .groupBy(col("m0"), (col("m") - col("m0")).as("offset"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"),
        sum("cents").as("rev_cents"))
      .select(
        (expr("(m0 - 1) div 12") * 100 + (expr("(m0 - 1) % 12") + 1))
          .as("cohort_yyyymm"),
        col("offset"), col("n_customers"), col("n_orders"),
        col("rev_cents"))
      .orderBy("cohort_yyyymm", "offset")
  }

  /** RFM customer segmentation — the classic marketing cut of the
    * order file: per customer Recency (days since last order, against
    * the corpus max day), Frequency (order count) and Monetary (spend
    * cents), each scored 1-5 against the customer-population quintile
    * boundaries, then the segment census (customers per (r,f,m) cell
    * + cell totals). Quintile boundaries come from ONE 4-value
    * `percentile` aggregate per measure over the per-customer frame
    * (broadcast back — never an ntile/global window over customers,
    * which cannot scale past one partition); recency scores REVERSED
    * (recent = 5). Boundary comparisons carry a RELATIVE epsilon
    * (b·(1+10⁻¹²) + 10⁻⁹, both engines): monetary values reach ~10⁷
    * cents where a double ulp is ~4·10⁻⁹ — larger than a bare
    * absolute 10⁻⁹ — so the guard scales with the boundary and a few
    * ulps of cross-engine interpolation drift can never flip an
    * integer measure's score. The 100 TB percentile swap is CODE, not
    * a comment: [[rfmSegmentsApprox]] registers the
    * `approx_percentile` twin (same plan shape, mergeable sketch).
    *
    * Scale shape: one custkey shuffle (map-side partials) to the
    * per-customer frame, one 1-row boundary broadcast, one
    * map-side-combined census aggregate onto ≤125 cells. */
  def rfmSegments(s: SparkSession, d: String): DataFrame =
    rfmOf(s, d, c => s"percentile($c, array(0.2, 0.4, 0.6, 0.8))")

  /** The 100 TB path for [[rfmSegments]]: the three exact quintile
    * aggregates — each a single buffer holding EVERY per-customer
    * value at the final reducer — swap for mergeable single-pass
    * `approx_percentile` sketches (bounded memory at any customer
    * count, the `log_mad_outliers_approx` twin pattern); the
    * per-customer frame, boundary broadcast, scoring and census
    * plumbing are IDENTICAL ([[rfmOf]] is shared code, so the twins
    * cannot drift). Rows-only check (sketches are engine-specific);
    * ApproxSpec pins census totals preserved and the per-measure
    * score marginals within the boundary-mass band of the exact
    * twin's. */
  def rfmSegmentsApprox(s: SparkSession, d: String): DataFrame =
    rfmOf(s, d,
      c => s"approx_percentile($c, array(0.2, 0.4, 0.6, 0.8), 10000)")

  /** [[rfmSegments]]' full pipeline with the quintile-boundary
    * aggregate pluggable (`pctl` renders the SQL aggregate for a
    * measure column) — the dual-mode percentile routing shared by the
    * exact oracle query and the sketch twin. */
  private def rfmOf(s: SparkSession, d: String,
      pctl: String => String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val o = Tables.orders(s, d)
      .select(col("o_custkey"),
        expr(s"unix_micros(cast(o_orderdate as timestamp)) div $dayUs")
          .as("day"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
    val per = o.groupBy("o_custkey")
      .agg(max("day").as("last_day"), count(lit(1)).as("f"),
        sum("cents").as("mny"))
    val maxDay = o.agg(max("day").as("max_day"))
    val rfm = per.crossJoin(broadcast(maxDay))
      .select(col("o_custkey"), (col("max_day") - col("last_day")).as("r"),
        col("f"), col("mny"))
    val bounds = rfm.agg(
      expr(pctl("r")).as("rb"),
      expr(pctl("f")).as("fb"),
      expr(pctl("mny")).as("mb"))
    def score(v: Column, b: Column): Column =
      lit(1L) + (1 to 4).map(i =>
        (v > element_at(b, i) * lit(1 + 1e-12) + lit(1e-9)).cast("long"))
        .reduce(_ + _)
    rfm.crossJoin(broadcast(bounds))
      .select(col("o_custkey"), col("mny"),
        (lit(6L) - score(col("r").cast("double"), col("rb")))
          .as("r_score"), // low recency-days = best
        score(col("f").cast("double"), col("fb")).as("f_score"),
        score(col("mny").cast("double"), col("mb")).as("m_score"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"), sum("mny").as("rev_cents"))
      .orderBy("r_score", "f_score", "m_score")
  }

  /** Order-fulfilment latency profile — the SLA view of the order
    * stream: per order the days from order date to FIRST shipment
    * (map-side partial min over one orderkey shuffle), then per
    * order-priority the order count and the p50/p90/max latency.
    * Latencies are integer days, so the exact percentiles land on the
    * .5 grid and 4-decimal rounding has no midpoint exposure (the
    * `log_percentiles` discipline); the 100 TB percentile swap is
    * CODE: [[fulfilmentLatencyApprox]] registers the
    * `approx_percentile` twin, same shape. */
  def fulfilmentLatency(s: SparkSession, d: String): DataFrame =
    fulfilmentOf(s, d, (c, p) => s"percentile($c, $p)")

  /** The 100 TB path for [[fulfilmentLatency]]: the exact per-priority
    * percentiles — 5 groups, so ~n/5 latency values buffered in ONE
    * aggregation task each — swap for mergeable single-pass
    * `approx_percentile` sketches (bounded memory at any order count,
    * the `log_percentiles_approx` twin pattern); the first-shipment
    * min join and census plumbing are IDENTICAL ([[fulfilmentOf]] is
    * shared code). Rows-only check; ApproxSpec pins n_orders/max
    * identical to the exact twin and p50/p90 within 10%. */
  def fulfilmentLatencyApprox(s: SparkSession, d: String): DataFrame =
    fulfilmentOf(s, d, (c, p) => s"approx_percentile($c, $p, 10000)")

  /** [[fulfilmentLatency]]'s pipeline with the percentile aggregate
    * pluggable (`pctl(col, p)` renders the SQL aggregate) — shared by
    * the exact oracle query and the sketch twin. */
  /** Duplicate-payment audit — the finance-ops double-submission
    * sweep: order pairs by the SAME customer on the SAME order day
    * (a_orderkey < b_orderkey), each with both centi-totals and their
    * absolute delta — the auditor ranks by delta (0 = identical
    * amount twice in one day, the classic double-bill) and day-level
    * granularity catches resubmitted orders whose totals drifted
    * (price recalc, partial line drop) that an exact-amount key would
    * miss.
    *
    * Scale shape: candidates come from an equi-join on
    * (o_custkey, day) — the join key CONTAINS the customer, so
    * per-key fan-out is bounded by ONE customer's same-day order
    * count (a flash-sale day that is hot corpus-wide still partitions
    * per customer; no price-collision hot keys exist at all). One
    * shuffle on the composite key, map-side-projected day/centi
    * columns, pair volume Σ_cust-day c² with tiny c. */
  def dupPaymentAudit(s: SparkSession, d: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        expr("cast(round(o_totalprice * 100) as bigint)")
          .as("price_centi"),
        expr(s"unix_micros(cast(o_orderdate as timestamp)) div $dayUs")
          .as("day"))
    o.as("a").join(o.as("b"),
        col("a.o_custkey") === col("b.o_custkey")
          && col("a.day") === col("b.day")
          && col("a.o_orderkey") < col("b.o_orderkey"))
      .select(col("a.o_custkey").as("o_custkey"),
        col("a.day").as("day"),
        col("a.o_orderkey").as("a_orderkey"),
        col("b.o_orderkey").as("b_orderkey"),
        col("a.price_centi").as("a_centi"),
        col("b.price_centi").as("b_centi"),
        abs(col("a.price_centi") - col("b.price_centi"))
          .as("delta_centi"))
      .orderBy("a_orderkey", "b_orderkey")
  }

  /** Incremental JOIN-VIEW maintenance (IVM) — the nightly refresh of
    * a materialized orders⋈lineitem view (per order priority: line
    * count + exact e4 revenue, reported as count + exact integral
    * MEAN so the output column never outgrows Long while the
    * maintained state stays additive (count, decimal sum)). The delta
    * mixes BOTH CDC shapes: whole NEW orders (orderkey ≥ the midpoint
    * cut — their lines are necessarily new) and LATE-ARRIVING lines
    * on OLD orders (linenumber ≥ 3 — the out-of-order completion
    * `orders_backlog_curve` measures). Join-view algebra: every
    * (order, line) contribution is old×old (already in the base
    * view) or touches a new LINE — a (new order, old line) pair
    * cannot exist — so refresh = base ⊎ (Δlines ⋈ orders), merged by
    * re-aggregating the additive measures. Output ≡ the flat full
    * join, which is the oracle.
    *
    * Scale: the line split is decided from lineitem columns ALONE
    * (l_orderkey vs cut, l_linenumber) — no classify join — so the
    * delta term ships ONLY Δlines into its join; at a real site the
    * base frame is the PERSISTED view and never recomputes (the
    * in-test derivation is the `agg_incremental_refresh` stand-in
    * convention), making refresh work ∝ |Δ|, never ∝ view history.
    * Revenue sums ride decimal(38,0) (the `supplier_scorecard`
    * discipline); the emitted mean is integral `div` ≡ `//`. */
  def joinViewDeltaRefresh(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
    val b = Tables.orders(s, d)
      .agg(min("o_orderkey"), max("o_orderkey")).head()
    val cut = (b.getLong(0) + b.getLong(1)) / 2
    val l = Tables.lineitem(s, d).select(col("l_orderkey"),
      col("l_linenumber"),
      (expr("cast(round(l_extendedprice * 100) as bigint)")
        * (lit(100L) - expr("cast(round(l_discount * 100) as bigint)")))
        .as("rev_e4"))
    def partial(lines: DataFrame): DataFrame = lines
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("rev_e4").cast("decimal(38,0)")).as("rev_sum"))
    val base =
      partial(l.filter(col("l_orderkey") < cut && col("l_linenumber") <= 2))
    val delta =
      partial(l.filter(col("l_orderkey") >= cut || col("l_linenumber") >= 3))
    base.unionByName(delta)
      .groupBy("o_orderpriority")
      .agg(sum("n_lines").as("n_lines"), sum("rev_sum").as("rev_sum"))
      .select(col("o_orderpriority"), col("n_lines"),
        expr("cast(rev_sum div n_lines as bigint)").as("rev_e4_mean"))
      .orderBy("o_orderpriority")
  }

  /** Per-supplier lead-time TREND — is a supplier getting slower? For
    * every lineitem, x = order epoch-day, y = ship-lag days
    * (l_shipdate − o_orderdate); per supplier the line count, mean lag
    * in milli-days, and the ordinary-least-squares slope in
    * micro-days-per-day: `slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²)` —
    * EXACT arithmetic end to end: per-row products stay in Long
    * (x ~ 10⁴ days, y ≤ a few hundred — x·y ≤ ~10⁷), the five
    * aggregates sum in decimal(38,0) (the `supplier_scorecard`
    * overflow discipline: at 10⁹ rows/supplier Σx² ~ 10¹⁷ and
    * n·Σxy ~ 10²⁴ — past Long, nowhere near 10³⁸), and the closing
    * division is integral `div` ≡ DuckDB HUGEINT `//` (the
    * `logreg_quality_train` negative-operand parity). Degenerate
    * suppliers (all orders one day ⇒ zero variance) emit slope 0 by
    * the guarded CASE.
    *
    * Scale shape: the textbook ALGEBRAIC regression — one orderkey
    * equi-join (day projections pushed beneath it), one suppkey
    * shuffle with map-side partial sums, O(1) state per group: no
    * window, no percentile buffer, nothing to swap at 100 TB. */
  def supplierLeadTrend(s: SparkSession, d: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val pts = Tables.lineitem(s, d)
      .select(col("l_suppkey"), col("l_orderkey"),
        expr(s"unix_micros(cast(l_shipdate as timestamp)) div $dayUs")
          .as("sday"))
      .join(Tables.orders(s, d).select(col("o_orderkey"),
        expr(s"unix_micros(cast(o_orderdate as timestamp)) div $dayUs")
          .as("oday")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey"), col("oday").as("x"),
        (col("sday") - col("oday")).as("y"))
    pts.groupBy("l_suppkey")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"))
      .select(col("l_suppkey").as("s_suppkey"),
        col("n").cast("long").as("n_lines"),
        expr("cast(sy * 1000 div n as bigint)").as("mean_lead_milli"),
        expr("""cast(CASE WHEN n * sxx - sx * sx = 0 THEN 0
          |  ELSE (n * sxy - sx * sy) * 1000000 div (n * sxx - sx * sx)
          |END as bigint)""".stripMargin).as("slope_micro"))
      .orderBy("s_suppkey")
  }

  private def fulfilmentOf(s: SparkSession, d: String,
      pctl: (String, String) => String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val firstShip = Tables.lineitem(s, d)
      .select(col("l_orderkey"),
        expr(s"unix_micros(cast(l_shipdate as timestamp)) div $dayUs")
          .as("sday"))
      .groupBy("l_orderkey").agg(min("sday").as("ship_day"))
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"),
        expr(s"unix_micros(cast(o_orderdate as timestamp)) div $dayUs")
          .as("oday"))
      .join(firstShip, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority"),
        (col("ship_day") - col("oday")).as("lat"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        round(expr(pctl("lat", "0.5")).cast("double"), 4).as("p50_days"),
        round(expr(pctl("lat", "0.9")).cast("double"), 4).as("p90_days"),
        max("lat").as("max_days"))
      .orderBy("o_orderpriority")
  }

  val oracles: Map[String, String] = Map(
    "supplier_scorecard" ->
      """WITH li AS (
        |  SELECT l_suppkey,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is_ret,
        |    round(l_extendedprice * 100)::BIGINT
        |      * (100 - round(l_discount * 100)::BIGINT) AS rev_e4
        |  FROM lineitem),
        |per AS (
        |  SELECT l_suppkey, count(*)::BIGINT AS n_lines,
        |    sum(is_ret)::BIGINT AS n_returned,
        |    sum(rev_e4)::BIGINT AS rev_e4
        |  FROM li GROUP BY 1),
        |t AS (SELECT sum(rev_e4)::HUGEINT AS tot_e4 FROM per)
        |SELECT s_suppkey, s_name, n_name AS nation, n_lines, n_returned,
        |  (n_returned * 1000000 // n_lines)::BIGINT AS return_ppm,
        |  rev_e4,
        |  (rev_e4::HUGEINT * 1000000 // tot_e4)::BIGINT AS rev_share_ppm
        |FROM per
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |CROSS JOIN t
        |ORDER BY rev_e4 DESC, s_suppkey""".stripMargin,
    "customer_ltv_cohort" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |    (year(o_orderdate) * 12 + month(o_orderdate))::BIGINT AS m,
        |    round(o_totalprice * 100)::BIGINT AS cents
        |  FROM orders),
        |f AS (SELECT o_custkey, min(m) AS m0 FROM o GROUP BY 1)
        |SELECT ((m0 - 1) // 12 * 100 + ((m0 - 1) % 12) + 1)::BIGINT
        |    AS cohort_yyyymm,
        |  (m - m0)::BIGINT AS offset,
        |  count(DISTINCT o.o_custkey)::BIGINT AS n_customers,
        |  count(*)::BIGINT AS n_orders,
        |  sum(cents)::BIGINT AS rev_cents
        |FROM o JOIN f USING (o_custkey)
        |GROUP BY m0, m - m0
        |ORDER BY cohort_yyyymm, "offset"""".stripMargin,
    "orders_rfm_segments" ->
      """WITH o AS (
        |  SELECT o_custkey, epoch_us(o_orderdate) // 86400000000 AS day,
        |    round(o_totalprice * 100)::BIGINT AS cents
        |  FROM orders),
        |per AS (
        |  SELECT o_custkey, max(day) AS last_day,
        |    count(*)::BIGINT AS f, sum(cents)::BIGINT AS mny
        |  FROM o GROUP BY 1),
        |rfm AS (
        |  SELECT o_custkey, (SELECT max(day) FROM o) - last_day AS r,
        |    f, mny
        |  FROM per),
        |b AS (
        |  SELECT quantile_cont(r::DOUBLE, [0.2, 0.4, 0.6, 0.8]) AS rb,
        |    quantile_cont(f::DOUBLE, [0.2, 0.4, 0.6, 0.8]) AS fb,
        |    quantile_cont(mny::DOUBLE, [0.2, 0.4, 0.6, 0.8]) AS mb
        |  FROM rfm),
        |scored AS (
        |  SELECT o_custkey, mny,
        |    6 - (1 + (r > rb[1] * (1 + 1e-12) + 1e-9)::BIGINT + (r > rb[2] * (1 + 1e-12) + 1e-9)::BIGINT
        |      + (r > rb[3] * (1 + 1e-12) + 1e-9)::BIGINT + (r > rb[4] * (1 + 1e-12) + 1e-9)::BIGINT)
        |      AS r_score,
        |    1 + (f > fb[1] * (1 + 1e-12) + 1e-9)::BIGINT + (f > fb[2] * (1 + 1e-12) + 1e-9)::BIGINT
        |      + (f > fb[3] * (1 + 1e-12) + 1e-9)::BIGINT + (f > fb[4] * (1 + 1e-12) + 1e-9)::BIGINT
        |      AS f_score,
        |    1 + (mny > mb[1] * (1 + 1e-12) + 1e-9)::BIGINT + (mny > mb[2] * (1 + 1e-12) + 1e-9)::BIGINT
        |      + (mny > mb[3] * (1 + 1e-12) + 1e-9)::BIGINT + (mny > mb[4] * (1 + 1e-12) + 1e-9)::BIGINT
        |      AS m_score
        |  FROM rfm CROSS JOIN b)
        |SELECT r_score, f_score, m_score,
        |  count(*)::BIGINT AS n_customers,
        |  sum(mny)::BIGINT AS rev_cents
        |FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "fulfilment_latency_profile" ->
      """WITH fs AS (
        |  SELECT l_orderkey,
        |    min(epoch_us(l_shipdate) // 86400000000) AS ship_day
        |  FROM lineitem GROUP BY 1),
        |lat AS (
        |  SELECT o_orderpriority,
        |    ship_day - epoch_us(o_orderdate) // 86400000000 AS lat
        |  FROM orders JOIN fs ON o_orderkey = l_orderkey)
        |SELECT o_orderpriority, count(*)::BIGINT AS n_orders,
        |  round(quantile_cont(lat::DOUBLE, 0.5), 4) AS p50_days,
        |  round(quantile_cont(lat::DOUBLE, 0.9), 4) AS p90_days,
        |  max(lat)::BIGINT AS max_days
        |FROM lat GROUP BY 1 ORDER BY 1""".stripMargin,
    "supplier_lead_trend" ->
      """WITH pts AS (
        |  SELECT l_suppkey,
        |    epoch_us(o_orderdate) // 86400000000 AS x,
        |    epoch_us(l_shipdate) // 86400000000
        |      - epoch_us(o_orderdate) // 86400000000 AS y
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |a AS (
        |  SELECT l_suppkey, count(*)::HUGEINT AS n,
        |    sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
        |    sum(x * x)::HUGEINT AS sxx, sum(x * y)::HUGEINT AS sxy
        |  FROM pts GROUP BY 1)
        |SELECT l_suppkey AS s_suppkey, n::BIGINT AS n_lines,
        |  (sy * 1000 // n)::BIGINT AS mean_lead_milli,
        |  (CASE WHEN n * sxx - sx * sx = 0 THEN 0
        |   ELSE (n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx)
        |   END)::BIGINT AS slope_micro
        |FROM a ORDER BY s_suppkey""".stripMargin,
    // the oracle is the FLAT full join — the incremental path must
    // reproduce it exactly, which is the whole IVM claim
    "join_view_delta_refresh" ->
      """WITH l AS (SELECT l_orderkey,
        |    round(l_extendedprice * 100)::BIGINT
        |      * (100 - round(l_discount * 100)::BIGINT) AS rev_e4
        |  FROM lineitem)
        |SELECT o_orderpriority, count(*)::BIGINT AS n_lines,
        |  (sum(rev_e4::HUGEINT) // count(*))::BIGINT AS rev_e4_mean
        |FROM l JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "orders_dup_payment_audit" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey,
        |    round(o_totalprice * 100)::BIGINT AS price_centi,
        |    epoch_us(o_orderdate) // 86400000000 AS day
        |  FROM orders)
        |SELECT a.o_custkey, a.day,
        |  a.o_orderkey AS a_orderkey, b.o_orderkey AS b_orderkey,
        |  a.price_centi AS a_centi, b.price_centi AS b_centi,
        |  abs(a.price_centi - b.price_centi)::BIGINT AS delta_centi
        |FROM o a JOIN o b
        |  ON a.o_custkey = b.o_custkey
        |  AND a.day = b.day
        |  AND a.o_orderkey < b.o_orderkey
        |ORDER BY a_orderkey, b_orderkey""".stripMargin,
    "orders_backlog_curve" ->
      """WITH op AS (
        |  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
        |    count(*)::BIGINT AS n_opened
        |  FROM orders GROUP BY 1),
        |cl AS (
        |  SELECT day, count(*)::BIGINT AS n_closed
        |  FROM (SELECT l_orderkey,
        |      max(epoch_us(l_shipdate) // 86400000000) AS day
        |    FROM lineitem GROUP BY 1)
        |  GROUP BY day),
        |b AS (SELECT (SELECT min(day) FROM op) AS d0,
        |             (SELECT max(day) FROM cl) AS d1),
        |spine AS (SELECT unnest(generate_series(d0, d1)) AS day FROM b)
        |SELECT s.day, coalesce(op.n_opened, 0)::BIGINT AS n_opened,
        |  coalesce(cl.n_closed, 0)::BIGINT AS n_closed,
        |  sum(coalesce(op.n_opened, 0) - coalesce(cl.n_closed, 0))
        |    OVER (ORDER BY s.day)::BIGINT AS backlog
        |FROM spine s
        |LEFT JOIN op USING (day) LEFT JOIN cl USING (day)
        |ORDER BY s.day""".stripMargin,
    "orders_forecast_ewma" ->
      ("""WITH o AS (
        |  SELECT epoch_us(o_orderdate) // 86400000000 AS day
        |  FROM orders),
        |c AS (SELECT day, count(*)::BIGINT AS n_orders FROM o
        |  GROUP BY day),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM o),
        |spine AS (SELECT unnest(generate_series(d0, d1)) AS day FROM b),
        |series AS (
        |  SELECT s.day, coalesce(c.n_orders, 0)::BIGINT AS n_orders
        |  FROM spine s LEFT JOIN c USING (day)),
        |f AS (SELECT day, n_orders, (""".stripMargin
        + (1 to 20).map(k =>
            s"coalesce(lag(n_orders, $k) OVER win, 0) * 1000000 // ${1L << k}")
          .mkString("\n    + ")
        + """) AS forecast_e6
        |  FROM series WINDOW win AS (ORDER BY day))
        |SELECT day, n_orders, forecast_e6::BIGINT AS forecast_e6,
        |  abs(n_orders * 1000000 - forecast_e6)::BIGINT AS abs_err_e6
        |FROM f ORDER BY day""".stripMargin),
    "seasonality_profile" ->
      """WITH o AS (
        |  SELECT (epoch_us(o_orderdate) // 86400000000 + 3) % 7 AS dow,
        |    round(o_totalprice * 100)::BIGINT AS cents
        |  FROM orders),
        |per AS (
        |  SELECT dow, count(*)::BIGINT AS n_orders,
        |    sum(cents)::BIGINT AS spend_cents
        |  FROM o GROUP BY dow)
        |SELECT dow, n_orders, spend_cents,
        |  (n_orders * 7 * 1000000 //
        |    (SELECT sum(n_orders) FROM per))::BIGINT AS volume_index_ppm
        |FROM per ORDER BY dow""".stripMargin,
    "skyline_pareto" ->
      """SELECT p.p_partkey, p.p_retailprice, p.p_size
        |FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice
        |    AND q.p_size <= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice
        |      OR q.p_size < p.p_size))
        |ORDER BY p_retailprice, p_size, p_partkey""".stripMargin,
    "layout_zorder_audit" -> {
      val zExpr = (0 until 8).map(i =>
        s"(((pb >> $i) & 1) << ${2 * i}) + (((sb >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      s"""WITH mx AS (SELECT max(l_partkey) AS max_p,
         |              max(l_suppkey) AS max_s FROM lineitem),
         |g0 AS (
         |  SELECT l_partkey, l_suppkey,
         |    (l_partkey * 256 // (max_p + 1))::INT AS pb,
         |    (l_suppkey * 256 // (max_s + 1))::INT AS sb
         |  FROM lineitem, mx),
         |g AS (SELECT *, ($zExpr) AS z FROM g0),
         |zc AS (
         |  SELECT z >> 10 AS cell,
         |    (max(l_partkey) - min(l_partkey))::BIGINT AS p_span,
         |    (max(l_suppkey) - min(l_suppkey))::BIGINT AS s_span,
         |    count(*)::BIGINT AS n
         |  FROM g GROUP BY 1),
         |lc AS (
         |  SELECT pb >> 2 AS cell,
         |    (max(l_partkey) - min(l_partkey))::BIGINT AS p_span,
         |    (max(l_suppkey) - min(l_suppkey))::BIGINT AS s_span,
         |    count(*)::BIGINT AS n
         |  FROM g GROUP BY 1),
         |u AS (
         |  SELECT 'zorder' AS layout, count(*)::BIGINT AS n_cells,
         |    (sum(p_span * n) // sum(n))::BIGINT AS avg_p_span,
         |    (sum(s_span * n) // sum(n))::BIGINT AS avg_s_span
         |  FROM zc
         |  UNION ALL
         |  SELECT 'linear_p', count(*)::BIGINT,
         |    (sum(p_span * n) // sum(n))::BIGINT,
         |    (sum(s_span * n) // sum(n))::BIGINT
         |  FROM lc)
         |SELECT * FROM u ORDER BY layout""".stripMargin
    },
    "table_profile" -> {
      val numCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax")
      val strCols = Seq("l_returnflag", "l_linestatus")
      val branches =
        numCols.map { c =>
          s"""SELECT '$c' AS col_name,
             |  (count(*) - count($c))::BIGINT AS n_null,
             |  count(DISTINCT $c)::BIGINT AS n_distinct,
             |  min($c)::DOUBLE AS min_num, max($c)::DOUBLE AS max_num,
             |  NULL::VARCHAR AS min_str, NULL::VARCHAR AS max_str
             |FROM lineitem""".stripMargin
        } ++ strCols.map { c =>
          s"""SELECT '$c', (count(*) - count($c))::BIGINT,
             |  count(DISTINCT $c)::BIGINT,
             |  NULL::DOUBLE, NULL::DOUBLE, min($c), max($c)
             |FROM lineitem""".stripMargin
        } ++ Seq(
          """SELECT 'l_shipdate', (count(*) - count(l_shipdate))::BIGINT,
            |  count(DISTINCT l_shipdate)::BIGINT,
            |  epoch_us(min(l_shipdate))::DOUBLE,
            |  epoch_us(max(l_shipdate))::DOUBLE,
            |  NULL::VARCHAR, NULL::VARCHAR
            |FROM lineitem""".stripMargin)
      branches.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
    "table_profile_approx" -> {
      // md5-gate-mode HLL replay (round 14): the melt, the canonical
      // 'd:'/'s:' key, the 52-bit md5 hash, bucket/rho, the per-bucket
      // register max, and the integer Σ2^(39−Mj) all replay exactly;
      // the estimator constants interpolate from the SAME Scala
      // doubles the plan uses (Double.toString round-trips).
      val m = 16384
      val alpha = 0.7213 / (1.0 + 1.079 / m)
      val numCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax")
      val strCols = Seq("l_returnflag", "l_linestatus")
      val meltBranches =
        numCols.map { c =>
          s"""SELECT '$c' AS col_name, $c::DOUBLE AS vd,
             |    NULL::VARCHAR AS vs FROM lineitem""".stripMargin
        } ++ Seq(
          """SELECT 'l_shipdate', epoch_us(l_shipdate)::DOUBLE,
            |    NULL::VARCHAR FROM lineitem""".stripMargin) ++
        strCols.map { c =>
          s"""SELECT '$c', NULL::DOUBLE, $c FROM lineitem""".stripMargin
        }
      val key = "(CASE WHEN vs IS NOT NULL THEN 's:' || vs " +
        "ELSE 'd:' || (vd::DECIMAL(28,6))::VARCHAR END)"
      s"""WITH melt AS (
         |  ${meltBranches.mkString("\nUNION ALL\n")}),
         |h AS (
         |  SELECT col_name, vd, vs,
         |    CASE WHEN vd IS NULL AND vs IS NULL THEN NULL
         |      ELSE ${Fns.sqlMd5Hash52(key)} END AS h
         |  FROM melt),
         |b AS (
         |  SELECT col_name, vd, vs,
         |    coalesce(h % $m, -1)::BIGINT AS bucket,
         |    CASE WHEN h IS NULL THEN 0
         |      WHEN (h // $m) = 0 THEN 39
         |      ELSE 39 - length(bin(h // $m)) END AS rho
         |  FROM h),
         |regs AS (
         |  SELECT col_name, bucket, max(rho) AS mj,
         |    count(*)::BIGINT AS cnt,
         |    min(vd) AS mn, max(vd) AS mx, min(vs) AS sn, max(vs) AS sx
         |  FROM b GROUP BY 1, 2),
         |agg AS (
         |  SELECT col_name,
         |    sum(CASE WHEN bucket = -1 THEN cnt ELSE 0 END)::BIGINT
         |      AS n_null,
         |    (sum(CASE WHEN bucket >= 0
         |        THEN (1::HUGEINT << (39 - mj)) END)::DOUBLE
         |      / ${math.pow(2.0, 39)}) AS z,
         |    count(CASE WHEN bucket >= 0 THEN 1 END)::BIGINT AS vnz,
         |    min(mn) AS min_num, max(mx) AS max_num,
         |    min(sn) AS min_str, max(sx) AS max_str
         |  FROM regs GROUP BY col_name),
         |est AS (
         |  SELECT *, (${alpha * m * m}) / (z + ($m.0 - vnz)) AS eraw
         |  FROM agg)
         |SELECT col_name, n_null,
         |  trunc(CASE WHEN vnz = 0 THEN 0.0
         |    WHEN vnz < $m AND eraw <= ${3.5 * m}
         |      THEN $m.0 * ln($m.0 / ($m.0 - vnz))
         |    ELSE eraw END)::BIGINT AS n_distinct,
         |  min_num, max_num, min_str, max_str
         |FROM est ORDER BY col_name""".stripMargin
    },
    "referential_integrity_audit" ->
      """WITH fk AS (
        |  SELECT 'fk:lineitem.l_orderkey->orders' AS relation,
        |    count(*)::BIGINT AS n_rows,
        |    sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END)::BIGINT
        |      AS n_bad_rows,
        |    count(DISTINCT CASE WHEN p.k IS NULL THEN l_orderkey
        |      END)::BIGINT AS n_bad_keys
        |  FROM lineitem LEFT JOIN
        |    (SELECT DISTINCT o_orderkey AS k FROM orders) p
        |    ON l_orderkey = p.k
        |  UNION ALL
        |  SELECT 'fk:lineitem.l_partkey->part', count(*)::BIGINT,
        |    sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |    count(DISTINCT CASE WHEN p.k IS NULL THEN l_partkey
        |      END)::BIGINT
        |  FROM lineitem LEFT JOIN
        |    (SELECT DISTINCT p_partkey AS k FROM part) p
        |    ON l_partkey = p.k
        |  UNION ALL
        |  SELECT 'fk:lineitem.l_suppkey->supplier', count(*)::BIGINT,
        |    sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |    count(DISTINCT CASE WHEN p.k IS NULL THEN l_suppkey
        |      END)::BIGINT
        |  FROM lineitem LEFT JOIN
        |    (SELECT DISTINCT s_suppkey AS k FROM supplier) p
        |    ON l_suppkey = p.k
        |  UNION ALL
        |  SELECT 'fk:orders.o_custkey->customer', count(*)::BIGINT,
        |    sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |    count(DISTINCT CASE WHEN p.k IS NULL THEN o_custkey
        |      END)::BIGINT
        |  FROM orders LEFT JOIN
        |    (SELECT DISTINCT c_custkey AS k FROM customer) p
        |    ON o_custkey = p.k
        |  UNION ALL
        |  SELECT 'fk:customer.c_nationkey->nation', count(*)::BIGINT,
        |    sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |    count(DISTINCT CASE WHEN p.k IS NULL THEN c_nationkey
        |      END)::BIGINT
        |  FROM customer LEFT JOIN
        |    (SELECT DISTINCT n_nationkey AS k FROM nation) p
        |    ON c_nationkey = p.k
        |  UNION ALL
        |  SELECT 'pk:orders.o_orderkey', sum(c)::BIGINT,
        |    sum(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT,
        |    sum(CASE WHEN c > 1 THEN 1 ELSE 0 END)::BIGINT
        |  FROM (SELECT count(*)::BIGINT AS c FROM orders
        |        GROUP BY o_orderkey)
        |  UNION ALL
        |  SELECT 'pk:customer.c_custkey', sum(c)::BIGINT,
        |    sum(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT,
        |    sum(CASE WHEN c > 1 THEN 1 ELSE 0 END)::BIGINT
        |  FROM (SELECT count(*)::BIGINT AS c FROM customer
        |        GROUP BY c_custkey)
        |  UNION ALL
        |  SELECT 'pk:lineitem.(l_orderkey,l_linenumber)', sum(c)::BIGINT,
        |    sum(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT,
        |    sum(CASE WHEN c > 1 THEN 1 ELSE 0 END)::BIGINT
        |  FROM (SELECT count(*)::BIGINT AS c FROM lineitem
        |        GROUP BY l_orderkey, l_linenumber))
        |SELECT * FROM fk ORDER BY relation""".stripMargin,
    "basket_lift" ->
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |nb AS (SELECT count(DISTINCT o)::BIGINT AS n_baskets FROM op),
        |sup AS (SELECT p, count(*)::BIGINT AS n_p FROM op GROUP BY p),
        |pairs AS (
        |  SELECT a.p AS p1, b.p AS p2, count(*)::BIGINT AS n_both
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT p1, p2, n_both, s1.n_p AS n_p1, s2.n_p AS n_p2,
        |  (n_both::HUGEINT * n_baskets * 1000000
        |    // (s1.n_p::HUGEINT * s2.n_p))::BIGINT AS lift_e6,
        |  (n_both * 1000000 // s1.n_p)::BIGINT AS conf_e6
        |FROM pairs
        |JOIN sup s1 ON p1 = s1.p
        |JOIN sup s2 ON p2 = s2.p
        |CROSS JOIN nb
        |ORDER BY lift_e6 DESC, p1, p2 LIMIT 20""".stripMargin,
    "erasure_cascade_audit" ->
      """WITH vo AS (
        |  SELECT o_orderkey FROM orders WHERE o_custkey % 53 = 7),
        |u AS (
        |  SELECT 'customer' AS table_name,
        |    sum(CASE WHEN c_custkey % 53 = 7 THEN 1 ELSE 0 END)::BIGINT
        |      AS n_erase,
        |    sum(CASE WHEN c_custkey % 53 = 7 THEN 1 ELSE 0 END)::BIGINT
        |      AS n_keys,
        |    count(*)::BIGINT AS n_total
        |  FROM customer
        |  UNION ALL
        |  SELECT 'orders',
        |    sum(CASE WHEN o_custkey % 53 = 7 THEN 1 ELSE 0 END)::BIGINT,
        |    count(DISTINCT CASE WHEN o_custkey % 53 = 7
        |      THEN o_custkey END)::BIGINT,
        |    count(*)::BIGINT
        |  FROM orders
        |  UNION ALL
        |  SELECT 'lineitem',
        |    sum(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM vo)
        |      THEN 1 ELSE 0 END)::BIGINT,
        |    count(DISTINCT CASE WHEN l_orderkey IN
        |      (SELECT o_orderkey FROM vo) THEN l_orderkey END)::BIGINT,
        |    count(*)::BIGINT
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'events',
        |    sum(CASE WHEN user_id % 53 = 7 THEN 1 ELSE 0 END)::BIGINT,
        |    count(DISTINCT CASE WHEN user_id % 53 = 7
        |      THEN user_id END)::BIGINT,
        |    count(*)::BIGINT
        |  FROM events)
        |SELECT table_name, n_erase, n_keys, n_total,
        |  (n_erase * 1000000 // n_total)::BIGINT AS erase_ppm
        |FROM u ORDER BY table_name""".stripMargin,
    // Deliberately a FULL recompute with no date split: the Spark side
    // merges base + delta partials, so hash equality proves the merge.
    "agg_incremental_refresh" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS sum_price,
        |  round(min(o_totalprice), 2) AS min_price,
        |  round(max(o_totalprice), 2) AS max_price,
        |  round(sum(o_totalprice) / count(*), 4) AS avg_price
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "basket_part_pairs" ->
      """SELECT a.l_partkey AS p1, b.l_partkey AS p2,
        |  count(*) AS n_orders
        |FROM lineitem a
        |JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY p1, p2
        |HAVING count(*) >= 2
        |ORDER BY n_orders DESC, p1, p2
        |LIMIT 50""".stripMargin,
    "window_decile_spend" ->
      """WITH spend AS (
        |  SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
        |  FROM orders GROUP BY o_custkey),
        |seg AS (
        |  SELECT n_name, spend,
        |    ntile(10) OVER (PARTITION BY n_name
        |      ORDER BY spend DESC, o_custkey) AS decile
        |  FROM spend
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey)
        |SELECT n_name, decile, count(*) AS n_cust,
        |  round(sum(spend), 2) AS decile_spend
        |FROM seg GROUP BY n_name, decile
        |ORDER BY n_name, decile""".stripMargin,
    "skew_key_stats" ->
      """WITH per AS (
        |  SELECT o_custkey, count(*) AS n_rows FROM orders GROUP BY 1),
        |tot AS (
        |  SELECT sum(n_rows) AS total, count(*) AS n_keys FROM per)
        |SELECT o_custkey, n_rows,
        |  (n_rows::HUGEINT * 1000000 // total)::BIGINT AS share_ppm,
        |  (n_rows::HUGEINT * n_keys * 100 // total)::BIGINT AS skew_x100
        |FROM per, tot
        |ORDER BY n_rows DESC, o_custkey LIMIT 20""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping" ->
      """SELECT o_orderkey, o_orderdate::DATE AS o_orderdate,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "join_broadcast_dim" ->
      """SELECT p_brand, count(*) AS n_items,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    "join_skew_salted" -> // salt is physical-only: plain-join oracle
      """SELECT p_brand, count(*) AS n_items,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,
    "join_semi" ->
      """SELECT p_partkey, p_brand FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        |ORDER BY p_partkey""".stripMargin,
    "agg_distinct" ->
      """SELECT o_orderpriority,
        |  count(DISTINCT o_custkey) AS n_custs,
        |  count(DISTINCT o_orderstatus) AS n_statuses,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "agg_rollup" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders
        |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "pivot_status" ->
      """SELECT o_orderpriority,
        |  sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS cnt_f,
        |  sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT AS cnt_o,
        |  sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)::BIGINT AS cnt_p
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "set_ops" ->
      """WITH building AS (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |with_f AS (
        |  SELECT DISTINCT o_custkey AS c_custkey FROM orders
        |  WHERE o_orderstatus = 'F'),
        |neg AS (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
        |SELECT 'building_and_f' AS src, c_custkey
        |  FROM (SELECT c_custkey FROM building
        |        INTERSECT SELECT c_custkey FROM with_f)
        |UNION ALL
        |SELECT 'building_not_neg' AS src, c_custkey
        |  FROM (SELECT c_custkey FROM building
        |        EXCEPT SELECT c_custkey FROM neg)
        |ORDER BY src, c_custkey""".stripMargin,
    "window_rank_features" ->
      """SELECT o_custkey, o_orderkey,
        |  dense_rank() OVER w AS rnk,
        |  ntile(4) OVER w AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_custkey, rnk, o_orderkey""".stripMargin,
    "agg_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "window_running_total" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |    AS running_total
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q6_selective_agg" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY status, priority""".stripMargin,
    "q4_priority_exists" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q10_returned_revenue" ->
      """SELECT c_custkey, c_name, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND c_nationkey = n_nationkey
        |  AND o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "q14_promo_share" ->
      """SELECT
        |  round(sum(CASE WHEN p_type = 'PROMO'
        |    THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2)
        |    AS promo_rev,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin,
    "q19_disjunctive" ->
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 15)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity BETWEEN 10 AND 25)
        |   OR (p_brand = 'Brand#5' AND p_size BETWEEN 20 AND 50
        |       AND l_quantity BETWEEN 25 AND 50)""".stripMargin,
    "q22_idle_rich" ->
      """WITH thr AS (
        |  SELECT floor(avg(c_acctbal)) AS bal_floor
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_mktsegment, count(*) AS n_cust,
        |  round(sum(c_acctbal), 2) AS total_bal
        |FROM customer, thr
        |WHERE c_acctbal > bal_floor
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "corr_stats" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 3) + 0.0 AS corr_qty_price,
        |  round(covar_samp(l_quantity, l_extendedprice), 1) + 0.0 AS covar_qty_price,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(stddev_samp(l_discount), 4) AS sd_disc
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q2_min_cost_supp" ->
      """WITH supply AS (
        |  SELECT l_partkey, l_suppkey,
        |    round(min(l_extendedprice / l_quantity), 2) AS unit_cost
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'
        |  GROUP BY l_partkey, l_suppkey)
        |SELECT p_partkey, p_name, s_name, n_name, unit_cost
        |FROM supply, part, supplier, nation
        |WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
        |  AND s_nationkey = n_nationkey
        |  AND p_type = 'STANDARD'
        |  AND unit_cost = (SELECT min(unit_cost) FROM supply s2
        |                   WHERE s2.l_partkey = supply.l_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    "q7_volume_shipping" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem, orders, customer, supplier, nation sn, nation cn
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND l_suppkey = s_suppkey
        |  AND s_nationkey = sn.n_nationkey AND c_nationkey = cn.n_nationkey
        |  AND ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
        |    OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3'))
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q8_market_share" ->
      """SELECT year(o_orderdate) AS o_year,
        |  round(sum(CASE WHEN sn.n_name = 'NATION_5'
        |    THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2)
        |    AS nation_rev,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
        |FROM lineitem, orders, customer, supplier, part,
        |     nation sn, nation cn, region
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND l_suppkey = s_suppkey AND l_partkey = p_partkey
        |  AND s_nationkey = sn.n_nationkey
        |  AND c_nationkey = cn.n_nationkey AND cn.n_regionkey = r_regionkey
        |  AND r_name = 'AMERICA' AND p_type = 'ECONOMY'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  round(sum(l_extendedprice * (1 - l_discount)
        |    - 0.5 * p_retailprice * l_quantity), 2) AS profit
        |FROM lineitem, orders, supplier, part, nation
        |WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        |  AND l_partkey = p_partkey AND s_nationkey = n_nationkey
        |  AND p_name LIKE '%red%'
        |GROUP BY n_name, o_year
        |ORDER BY nation, o_year DESC""".stripMargin,
    "q11_important_stock" ->
      """WITH natval AS (
        |  SELECT l_partkey, round(sum(l_quantity * p_retailprice), 2) AS value
        |  FROM lineitem, supplier, nation, region, part
        |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |    AND n_regionkey = r_regionkey AND l_partkey = p_partkey
        |    AND r_name = 'EUROPE'
        |  GROUP BY l_partkey)
        |SELECT l_partkey, value FROM natval
        |WHERE value > (SELECT 0.001 * sum(value) FROM natval)
        |ORDER BY value DESC, l_partkey""".stripMargin,
    "q12_late_lines" ->
      """SELECT l_linestatus,
        |  sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
        |  sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,
    "q13_cust_orders_dist" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey) co
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey AS supplier_no,
        |    round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier, rev
        |WHERE s_suppkey = supplier_no
        |  AND total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q16_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q17_small_qty_rev" ->
      """WITH pavg AS (
        |  SELECT l_partkey AS a_partkey, 0.5 * avg(l_quantity) AS qty_thr
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
        |  count(*) AS n_lines
        |FROM lineitem, part, pavg
        |WHERE p_partkey = l_partkey AND a_partkey = l_partkey
        |  AND p_brand = 'Brand#3' AND l_quantity < qty_thr""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_name, c_custkey, o_orderkey,
        |  o_orderdate::DATE AS o_orderdate, o_totalprice,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM customer, orders, lineitem
        |WHERE o_orderkey IN (
        |    SELECT l_orderkey FROM lineitem
        |    GROUP BY l_orderkey HAVING sum(l_quantity) > 120)
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,
    "q20_part_promotion" ->
      """SELECT s_name, s_acctbal
        |FROM supplier, nation, region
        |WHERE s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem
        |    WHERE l_partkey IN (SELECT p_partkey FROM part
        |                        WHERE p_name LIKE 'red%')
        |    GROUP BY l_suppkey, l_partkey
        |    HAVING sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |                 AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |               THEN l_quantity ELSE 0 END)
        |         > 0.3 * sum(l_quantity))
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'EUROPE'
        |ORDER BY s_name""".stripMargin,
    "q21_waiting_supplier" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier, lineitem l1, orders, nation, region
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'EUROPE'
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin
  )
}
