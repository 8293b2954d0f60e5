package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** §2A — job-log analytics over the parsed `events` table.
  *
  * The reference's core capability: per-type/user aggregation, failure-rate
  * over time, top-k consumers, duration percentiles, sessionization, JSON
  * property extraction.
  *
  * Time model: `events.ts` is parquet TIMESTAMP(NANOS); both engines are
  * driven off µs-since-epoch longs (`ts_us` here = `epoch_us(ts)` in
  * DuckDB — identical truncation, see Tables.events). All bucket math is
  * integer division on those longs, so there is no timestamp type or
  * timezone in any output.
  *
  * Scale design: every query is a single shuffle on its natural key
  * (event_type / user_id / bucket) with map-side partial aggregation;
  * sessionization shuffles once by user_id and runs window functions
  * within partitions — no driver-side collection anywhere. Window-heavy
  * queries hold one user's events per task, which is bounded (users ≪
  * events); at 100 TB the same plan holds with AQE sizing partitions.
  */
object LogAnalytics {

  private val HourUs = 3600L * 1000000L
  private val DayUs = 86400L * 1000000L
  private val MinuteUs = 60L * 1000000L
  private val GapUs = 30L * MinuteUs // session gap: 30 min

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "log_counts_by_type" -> countsByType,
    "log_error_rate_hourly" -> errorRateHourly,
    "log_daily_active" -> dailyActive,
    "log_top_users" -> topUsers,
    "log_topk_per_type" -> topkPerType,
    "log_percentiles" -> percentiles,
    "log_json_extract" -> jsonExtract,
    "log_sessionize" -> sessionize,
    "log_session_stats" -> sessionStats,
    "log_rolling_avg" -> rollingAvg,
    "log_funnel" -> funnel,
    "log_anomaly_zscore" -> anomalyZscore,
    "log_hist_value" -> histValue,
    "log_lag_sessions_delta" -> lagDelta,
    "log_asof_prev_signup" -> asofPrevSignup,
    "log_percentiles_approx" -> percentilesApprox,
    "log_daily_active_approx" -> dailyActiveApprox,
    "log_top_users_approx" -> topUsersApprox,
    "log_ingest_parse" -> ingestParse,
    "log_jobhistory_stats" -> jobHistoryStats,
    "log_cohort_retention" -> cohortRetention,
    "log_gap_fill" -> gapFill,
    "join_range_bucket" -> rangeJoinBucket,
    "log_type_transitions" -> typeTransitions,
    "event_paths_topk" -> pathsTopk,
    "user_engagement_decay" -> engagementDecay,
    "log_changepoint_cusum" -> changepointCusum,
    "log_anomaly_seasonal" -> anomalySeasonal,
    "ingest_json_audit" -> ingestJsonAudit,
    "log_rolling_distinct" -> rollingDistinct,
    "log_rolling_distinct_hll" -> rollingDistinctHll,
    "log_ab_uplift" -> abUplift,
    "log_mad_outliers" -> madOutliers,
    "log_mad_outliers_approx" -> madOutliersApprox,
    "log_out_of_order_stats" -> outOfOrderStats,
    "log_attribution" -> attribution
  )

  /** Out-of-order arrival census — the measurement that SIZES a
    * streaming watermark before anyone picks one ([[graft.streaming]]
    * ops assume a delay; this op is where the delay comes from): per
    * user, an event's lateness is how far the per-user running max
    * event-time had already advanced past it on arrival. Census
    * buckets: in order, < 1 min, < 1 h, ≥ 1 h late — plus each
    * bucket's user count and worst lateness. Read "99.9% under a
    * minute" → a 1-min watermark loses 0.1%; the ≥ 1 h row is the
    * data you must accept losing or run a batch backfill for.
    *
    * The testdata stream is perfectly ordered (event_id ≡ time
    * order), so the ARRIVAL SEQUENCE is simulated in-query with a
    * deterministic delay rule both engines replay (the
    * [[Dedup.mergeUpsert]] synthetic-derivation idiom — the census
    * SEMANTICS are what is under test, not the delays): events with
    * event_id ≡ 0 mod 17 / 29 / 97 arrive 101 / 10 007 / 1 000 003
    * sequence positions late (97 wins on overlap). Production drops
    * the simulation and orders by the real ingest sequence.
    *
    * Scale shape: ONE user-keyed shuffle for the running-max window
    * (per-user state, the sessionize discipline — never a global
    * arrival window), then a map-side-combined 4-row census. */
  /** Conversion attribution — the marketing-analytics readout every
    * event pipeline serves: each `purchase` credits its user's FIRST
    * and LAST preceding touch event (`view`/`click`; `none` when a
    * purchase has no prior touch, so per model the conversion total
    * reconciles to the purchase count — spec-pinned), rolled up per
    * (model, touch_type) with conversion counts and attributed value
    * in centi-units (`round(value·100)::BIGINT`, the established
    * parity idiom — no float sums cross the oracle).
    *
    * Scale shape: ONE user-partitioned window pass (fine keys — a
    * user's timeline, the [[sessionize]] shape; `first`/`last` with
    * ignoreNulls over rows-preceding frames, no self-join of events
    * to touches), purchases then fan out ×2 (model spine via a
    * per-row explode) and collapse into a ≤ 2·(#touch types + 1)-row
    * map-side-combined aggregate — shuffle after the window is
    * metadata-sized at any corpus. Ordering inside the window is
    * (ts_us, event_id) — total, so late/duplicate timestamps cannot
    * flip attribution between runs or engines. */
  def attribution(s: SparkSession, d: String): DataFrame =
    attributionTouches(s, d)
      .select(col("v_centi"), explode(array(
        struct(lit("first").as("model"),
          col("first_touch").as("touch_type")),
        struct(lit("last").as("model"),
          col("last_touch").as("touch_type"))))
        .as("m"))
      .groupBy(col("m.model").as("model"),
        col("m.touch_type").as("touch_type"))
      .agg(count(lit(1)).as("n_conversions"),
        sum("v_centi").as("value_centi"))
      .orderBy("model", "touch_type")

  /** Per-purchase (event_id, user_id, first_touch, last_touch,
    * v_centi) frame of [[attribution]] — exposed package-private so
    * StreamingSpec can pin the `flatMapGroupsWithState` ingest twin
    * ([[graft.streaming.Pipelines.attributionStream]]) row-identical
    * to this batch window. */
  private[graft] def attributionTouches(
      s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch =
      when(col("event_type").isin("view", "click"), col("event_type"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts_us"),
        col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("v_centi"))
      .withColumn("first_touch",
        coalesce(first(touch, ignoreNulls = true).over(w), lit("none")))
      .withColumn("last_touch",
        coalesce(last(touch, ignoreNulls = true).over(w), lit("none")))
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts_us", "first_touch",
        "last_touch", "v_centi")
  }

  def outOfOrderStats(s: SparkSession, d: String): DataFrame =
    latenessFrame(s, d)
      .withColumn("bucket",
        when(col("late_us") === 0L, "0_in_order")
          .when(col("late_us") < 60L * 1000000L, "1_lt_1m")
          .when(col("late_us") < 3600L * 1000000L, "2_lt_1h")
          .otherwise("3_ge_1h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        max("late_us").as("max_late_us"))
      .orderBy("bucket")

  /** [[outOfOrderStats]]' per-event lateness frame (user_id, event_id,
    * ts_us, arr, late_us) before the census — package-private so
    * StreamingSpec can pin the `mapGroupsWithState` twin
    * ([[graft.streaming.Pipelines.latenessStream]], one long of
    * per-user state) event-identical to this batch window. */
  private[graft] def latenessFrame(s: SparkSession, d: String)
      : DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy("arr", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts_us"))
      .withColumn("arr", col("event_id")
        + when(col("event_id") % 97 === 0, 1000003L)
          .when(col("event_id") % 29 === 0, 10007L)
          .when(col("event_id") % 17 === 0, 101L)
          .otherwise(0L))
      .withColumn("late_us", max("ts_us").over(w) - col("ts_us"))
  }

  /** The 100 TB path for [[madOutliers]]: both grouped medians swap
    * for sketch-based `approx_percentile` (mergeable, single pass,
    * bounded memory — the [[percentilesApprox]] twin pattern), the
    * deviation/flag/census plumbing is IDENTICAL. Rows-only check
    * (sketches are engine-specific); ApproxSpec pins the estimated
    * median/MAD within 10% of the exact twin's and the outlier count
    * within the band the threshold shift can move it. */
  def madOutliersApprox(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"), col("value"))
    val med = ev.groupBy("event_type")
      .agg(expr("approx_percentile(value, 0.5, 1000)").as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .select(col("event_type"), col("value"),
        abs(col("value") - col("med")).as("dev"))
    val mad = dev.groupBy("event_type")
      .agg(expr("approx_percentile(dev, 0.5, 1000)").as("mad"))
    dev.join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(max(col("mad")), 4).as("mad_r"), // constant per group
        sum(when(col("dev") > col("mad") * 3 + 0.0001, 1).otherwise(0))
          .as("n_outliers"))
      .join(broadcast(med), "event_type")
      .select(col("event_type"), col("n"),
        round(col("med"), 4).as("median"),
        col("mad_r").as("mad"),
        col("n_outliers"),
        expr("n_outliers * 1000000 div n").as("outlier_ppm"))
      .orderBy("event_type")
  }

  /** Robust (median/MAD) outlier census per event type — the
    * heavy-tail-safe twin of [[anomalyZscore]]: mean/stddev are
    * themselves dragged by the outliers they're meant to find, while
    * the median and the median-absolute-deviation have a 50%
    * breakdown point, so one stuck client logging value=10⁹ cannot
    * hide its siblings. Flags values with |v − median| > 3·MAD; per
    * type: population, median, MAD, outlier count + ppm.
    *
    * Cross-engine parity: `percentile` (Spark) and `quantile_cont`
    * (DuckDB) interpolate with formulas that can differ in the last
    * ulp, so the flag threshold carries an explicit 10⁻⁴ epsilon —
    * `value` lives on the 0.01 grid, medians on 0.005, MADs on 0.0025,
    * so any REAL margin is ≥ 1.25·10⁻³ ≫ epsilon ≫ ulp noise and the
    * count cannot flip; emitted median/MAD round at 4 decimals (grid
    * points, no midpoints). Scale shape: two grouped exact percentiles
    * (each one shuffle; the 100 TB swap is `approx_percentile`, the
    * [[percentiles]] twin pattern) + broadcast 5-row med/MAD frames
    * back onto the stream — no windows, no self-join. */
  def madOutliers(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"), col("value"))
    val med = ev.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .select(col("event_type"), col("value"),
        abs(col("value") - col("med")).as("dev"))
    val mad = dev.groupBy("event_type")
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    dev.join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(max(col("mad")), 4).as("mad_r"), // constant per group
        sum(when(col("dev") > col("mad") * 3 + 0.0001, 1).otherwise(0))
          .as("n_outliers"))
      .join(broadcast(med), "event_type")
      .select(col("event_type"), col("n"),
        round(col("med"), 4).as("median"),
        col("mad_r").as("mad"),
        col("n_outliers"),
        expr("n_outliers * 1000000 div n").as("outlier_ppm"))
      .orderBy("event_type")
  }

  /** A/B experiment readout — the analysis every product log pipeline
    * runs on its event stream: users split 50/50 into variants by
    * content hash (md5 of user_id — the [[graft.ops.Fns.md5Bucket]]
    * assignment used by `split_assign`: reproducible across runs,
    * reshards, and engines, unlike seeded RNG), conversion = the user
    * ever purchased. One row out: per-variant user and converter
    * counts, conversion rates in exact integer ppm, the uplift (B − A)
    * in ppm, and the two-proportion z statistic in milli-units (pooled
    * standard error; the single-row float math — divisions and one
    * sqrt — is IEEE-identical on both engines, floored to the 10⁻³
    * grid; degenerate pools of all-converters/none guard to 0).
    *
    * Scale shape: one scan, one user-keyed shuffle with map-side
    * partial max (converted is a boolean max), then a single
    * conditional aggregate onto ONE row — no joins, no windows. */
  def abUplift(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"))
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase", 1).otherwise(0))
        .as("converted"))
      .withColumn("variant",
        when(graft.ops.Fns.md5Bucket(col("user_id").cast("string")) <= 7, "A")
          .otherwise("B"))
      .groupBy()
      .agg(
        sum(when(col("variant") === "A", 1).otherwise(0)).as("n_a"),
        sum(when(col("variant") === "B", 1).otherwise(0)).as("n_b"),
        sum(when(col("variant") === "A", col("converted")).otherwise(0))
          .as("conv_a"),
        sum(when(col("variant") === "B", col("converted")).otherwise(0))
          .as("conv_b"))
      .select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
        expr("CASE WHEN n_a > 0 THEN conv_a * 1000000 div n_a ELSE 0 END")
          .as("conv_a_ppm"),
        expr("CASE WHEN n_b > 0 THEN conv_b * 1000000 div n_b ELSE 0 END")
          .as("conv_b_ppm"),
        expr("""CASE WHEN n_a > 0 AND n_b > 0
            THEN conv_b * 1000000 div n_b - conv_a * 1000000 div n_a
            ELSE 0 END""")
          .as("uplift_ppm"),
        expr("""CASE
            WHEN n_a > 0 AND n_b > 0
              AND conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b THEN
              floor(
                (cast(conv_b as double) / n_b - cast(conv_a as double) / n_a)
                / sqrt(
                    (cast(conv_a + conv_b as double) / (n_a + n_b))
                    * (1.0 - cast(conv_a + conv_b as double) / (n_a + n_b))
                    * (cast(1 as double) / n_a + cast(1 as double) / n_b))
                * 1000)
            ELSE 0 END""").cast("long").as("z_milli"))

  /** 7-day rolling DISTINCT active users per day — the retention/WAU
    * metric a plain window cannot express (count distinct over a
    * sliding range needs set semantics, not a running sum). Exact
    * formulation: each (user, day) pair CONTRIBUTES to the 7 target
    * days `[day, day+6]` — explode the contribution range, then one
    * distinct count per target day. Days inside the corpus range with
    * no same-day activity still report (left join, 1d count 0).
    *
    * Scale shape: the distinct (user, day) frame is one
    * map-side-combined shuffle of the event scan; the explode fans it
    * out exactly 7× (bounded, unlike a range self-join), and the final
    * per-day distinct is a second key-shuffle with partial distinct
    * merge. At 100 TB the 7× user-day fan-out is the cost —
    * [[rollingDistinctHll]] is the same plan with FIXED-SIZE HLL
    * sketches replacing user rows (7×|days| sketch binaries instead of
    * 7×|user-days| rows), the standard exact→sketch trade. */
  def rollingDistinct(s: SparkSession, d: String): DataFrame = {
    val ud = Tables.events(s, d)
      .select(expr(s"ts_us div $DayUs").as("day_num"), col("user_id"))
      .distinct()
      .localCheckpoint() // feeds bounds, 1d census, and the fan-out
    val bounds = ud.agg(max("day_num").as("hi"))
    val d1 = ud.groupBy("day_num")
      .agg(count_distinct(col("user_id")).as("n_users_1d"))
    val r = ud
      .select(col("user_id"),
        explode(sequence(col("day_num"), col("day_num") + 6))
          .as("t_day"))
      .join(broadcast(bounds), col("t_day") <= col("hi"))
      .groupBy("t_day")
      .agg(count_distinct(col("user_id")).as("n_users_7d"))
    r.join(d1, col("t_day") === col("day_num"), "left")
      .select(col("t_day").as("day_num"),
        coalesce(col("n_users_1d"), lit(0L)).as("n_users_1d"),
        col("n_users_7d"))
      .orderBy("day_num")
  }

  /** [[rollingDistinct]]'s sketch twin: per-day HLL sketches
    * (`hll_sketch_agg`), the same 7-day contribution explode over the
    * SKETCH binaries, then `hll_union_agg` + estimate per target day.
    * The shuffle volume drops from 7×|distinct user-days| rows to
    * 7×|days| fixed-size (≤ 2^12 bins) sketches — at 100 TB this is
    * the plan that survives, and sketches union associatively across
    * any partitioning. Rows-only (HLL estimates have no DuckDB
    * equivalent); ApproxSpec pins ≤ 2% error vs the exact twin per
    * day plus double-run determinism. */
  def rollingDistinctHll(s: SparkSession, d: String): DataFrame = {
    val sk = Tables.events(s, d)
      .select(expr(s"ts_us div $DayUs").as("day_num"), col("user_id"))
      .groupBy("day_num")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .localCheckpoint() // feeds bounds and the fan-out
    val bounds = sk.agg(max("day_num").as("hi"))
    sk.select(col("sk"),
        explode(sequence(col("day_num"), col("day_num") + 6))
          .as("t_day"))
      .join(broadcast(bounds), col("t_day") <= col("hi"))
      .groupBy("t_day")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
        .as("n_users_7d_est"))
      .select(col("t_day").as("day_num"), col("n_users_7d_est"))
      .orderBy("day_num")
  }

  /** End-to-end JSON-lines ingestion audit — the OTHER half of log
    * ingestion next to [[ingestParse]]'s regex path: events rendered
    * as single-line JSON (written ONCE per JVM+corpus, the
    * `materialize_survivors` round-trip precedent), with every
    * event_id ≡ 0 mod 97 line deterministically TRUNCATED (loses its
    * closing brace — always malformed), then read back through the
    * real JSON datasource in PERMISSIVE mode with an explicit schema +
    * `_corrupt_record`. The audit is the per-type row count with
    * corrupt lines folded into a `_corrupt` bucket — exactly the
    * accept/quarantine report an ingestion job publishes.
    *
    * The oracle never sees the JSON: it derives the same counts from
    * the parquet ground truth by replaying the corruption rule, so the
    * gate checks the whole write → corrupt → permissive-parse → audit
    * loop end to end (a parser that silently drops or mis-attributes
    * corrupt lines hash-fails).
    *
    * Scale shape: one columnar scan + text write (once), then a JSON
    * scan into a map-side-combined ≤ |types|+1 aggregate — ingestion
    * cost is the scan itself, the aggregate is metadata. */
  def ingestJsonAudit(s: SparkSession, d: String): DataFrame = {
    val path = graft.ops.BuildOnce.scratchPath("jsonlines", d)
    graft.ops.BuildOnce.ensure(path, d) {
      jsonLinesFixture(Tables.events(s, d))
        .write.mode("overwrite").text(path)
    }
    jsonQuarantineStage(s.read.schema(JsonIngestSchema).json(path))
      .orderBy("event_type")
  }

  /** The permissive-read schema for [[ingestJsonAudit]]'s fixture. */
  val JsonIngestSchema: String =
    "event_id BIGINT, ts_us BIGINT, user_id BIGINT, " +
      "event_type STRING, value DOUBLE, _corrupt_record STRING"

  /** Render an events frame as the single-column JSON-lines fixture,
    * truncating every event_id ≡ 0 mod 97 line (drops the closing
    * brace — always malformed). */
  def jsonLinesFixture(events: DataFrame): DataFrame =
    events
      .select(col("event_id"),
        to_json(struct(col("event_id"), col("ts_us"), col("user_id"),
          col("event_type"), col("value"))).as("j"))
      .select(
        when(pmod(col("event_id"), lit(97)) === 0,
          expr("substring(j, 1, length(j) - 5)"))
          .otherwise(col("j")).as("value"))

  /** The quarantine census over a PERMISSIVE-parsed frame — a pure
    * projection + aggregate, so the SAME stage runs batch (the query
    * above) and streaming (FileStreamSpec pins readStream-over-JSON ≡
    * batch through this literal code). */
  def jsonQuarantineStage(parsed: DataFrame): DataFrame =
    parsed
      .select(when(col("_corrupt_record").isNotNull, lit("_corrupt"))
        .otherwise(col("event_type")).as("event_type"))
      .groupBy("event_type").agg(count(lit(1)).as("n_rows"))

  /** Event-type transition matrix — the Markov-chain view of user
    * behavior (which steps follow which), the generalization of the
    * fixed-order [[funnel]]: per user, order events by time and count
    * each adjacent (from → to) event-type pair corpus-wide. One
    * shuffle by user_id for the `lead` window (ties broken by event_id
    * so the order — and therefore the oracle hash — is total), then a
    * map-side-combining count on the (from, to) pairs, whose
    * cardinality is |types|² — metadata-sized at any corpus scale. */
  def typeTransitions(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_us", "event_id")
    Tables.events(s, d)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("event_type"))
      .withColumn("to_type", lead("event_type", 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("from_type", "to_type")
  }

  /** Top session paths — the length-3 generalization of
    * [[typeTransitions]]' bigram matrix, scoped to SESSIONS (the
    * [[sessionized]] 30-min-gap boundary) so a path never spans a
    * returning visit: per session, every run of three consecutive
    * event types is one path occurrence; the corpus-wide top 20 by
    * count answers "what do users actually do, in order?". Two leads
    * over the (user, session)-keyed window — fine-grained keys, no
    * skew — then a map-side-combining count whose key space is
    * |types|³ ≤ 125: metadata-sized at any corpus scale, so the final
    * top-k is a TakeOrdered over a tiny frame, not a global sort of
    * data. Ordering (n DESC, then the three steps) is total → the
    * oracle hash is exact. */
  def pathsTopk(s: SparkSession, d: String): DataFrame = {
    val bySess = Window.partitionBy("user_id", "session_id")
      .orderBy("ts_us", "event_id")
    sessionized(s, d)
      .select(col("user_id"), col("session_id"), col("ts_us"),
        col("event_id"), col("event_type"))
      .withColumn("step2", lead("event_type", 1).over(bySess))
      .withColumn("step3", lead("event_type", 2).over(bySess))
      .filter(col("step3").isNotNull)
      .groupBy(col("event_type").as("step1"), col("step2"), col("step3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
      .limit(20)
  }

  /** Zero-filled (event_type × epoch-hour) count grid — the shared
    * first stage of [[changepointCusum]] and [[anomalySeasonal]]: the
    * raw stream collapses to per-hour counts (calendar-bounded
    * metadata at any corpus scale), then a 1-row hour-spine sequence
    * broadcast ([[gapFill]] idiom) restores the zero-activity hours
    * both detectors need (a silent hour IS the anomaly). */
  private def hourlyGrid(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_type"), expr(s"ts_us div $HourUs").as("h"))
    val spine = ev.agg(min("h").as("h0"), max("h").as("h1"))
      .select(explode(sequence(col("h0"), col("h1"))).as("h"))
    val counts = ev.groupBy("event_type", "h").agg(count(lit(1)).as("c"))
    ev.select("event_type").distinct()
      .crossJoin(broadcast(spine))
      .join(counts, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("c"), lit(0L)).as("c"))
  }

  /** CUSUM changepoint per event type — where did the rate SHIFT? The
    * level-change detector next to [[anomalyZscore]]'s point-outlier
    * view: on the zero-filled hourly grid, the classic CUSUM statistic
    * S_h = Σ_{t≤h}(c_t − mean) peaks exactly at a sustained rate
    * change. Computed fully INTEGER by scaling with the hour count
    * (S'_h = H·prefix_h − h·total = H·S_h — same argmax, no division):
    * the reported hour maximizes |S'| (tie → earliest), `direction`
    * reads `drop` when early mass ran above pro-rata (rate fell after
    * the peak) and `rise` otherwise.
    *
    * Scale shape: [[hourlyGrid]] collapses the stream first, so the
    * per-type prefix windows run over H grid rows, not events. */
  def changepointCusum(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("h")
    val grid = hourlyGrid(s, d)
    val tot = grid.groupBy("event_type")
      .agg(sum("c").as("total"), count(lit(1)).as("hh"))
    grid
      .withColumn("idx", row_number().over(w).cast("long"))
      .withColumn("pref", sum("c").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .join(tot, "event_type")
      .withColumn("sstat", col("hh") * col("pref")
        - col("idx") * col("total"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("event_type")
          .orderBy(abs(col("sstat")).desc, col("h"))))
      .filter(col("rk") === 1)
      .select(col("event_type"), (col("h") * 3600L).as("change_hour_ts"),
        abs(col("sstat")).as("cusum_scaled"),
        when(col("sstat") > 0, lit("drop")).otherwise(lit("rise"))
          .as("direction"))
      .orderBy("event_type")
  }

  /** Seasonally-adjusted anomaly per event type — the residual-spike
    * detector that closes the monitoring triad: [[anomalyZscore]]
    * flags outliers vs a GLOBAL mean (so every Monday 9am looks
    * anomalous on a weekly-cycled stream), [[changepointCusum]] finds
    * sustained LEVEL shifts, and this one scores each hour against its
    * own hour-of-week slot (Monday 9am vs the other Monday 9ams —
    * [[Relational.seasonalityProfile]]'s calendar decomposition turned
    * into a baseline). Fully INTEGER via deviation scaling: for cell
    * (type, h) in slot w, dev' = c·n_w − slot_total = n_w·(c − mean_w)
    * — same argmax as the residual, no division. Reports each type's
    * most seasonally-surprising hour (tie → earliest) with the
    * pro-rata ratio in ppm. Slot key = (h+72) mod 168, 0 = Monday
    * 00:00 (epoch hour 0 is a Thursday; the +3-day shift matches the
    * seasonality profile's dow convention).
    *
    * Scale shape: [[hourlyGrid]] collapses the stream; the slot
    * baseline is a (type × 168)-row aggregate joined back on the grid
    * — everything after the first shuffle is calendar-bounded. */
  def anomalySeasonal(s: SparkSession, d: String): DataFrame =
    hourlyGrid(s, d)
      .withColumn("how", (col("h") + 72L) % 168L)
      .withColumn("slot_total",
        sum("c").over(Window.partitionBy("event_type", "how")))
      .withColumn("n_weeks",
        count(lit(1)).over(Window.partitionBy("event_type", "how")))
      .withColumn("dev", col("c") * col("n_weeks") - col("slot_total"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("event_type")
          .orderBy(abs(col("dev")).desc, col("h"))))
      .filter(col("rk") === 1)
      .select(col("event_type"), (col("h") * 3600L).as("hour_ts"),
        col("how"), col("c").as("n_events"), col("slot_total"),
        col("n_weeks"), abs(col("dev")).as("dev_scaled"),
        when(col("slot_total") > 0,
          expr("c * n_weeks * 1000000 div slot_total"))
          .otherwise(lit(0L)).as("ratio_ppm"))
      .orderBy("event_type")

  /** Exponentially time-decayed engagement score per user — the
    * recency-weighted activity feature ranking models use instead of
    * raw counts (an event last week outweighs fifty from last year).
    * Half-life = one week, computed EXACTLY: each event contributes
    * `1000000 div 2^age_weeks` micro-points (age measured back from
    * the corpus max day; exponent capped at 19 so the weight floors at
    * 1 and the shift stays in int range) — a power-of-two decay is the
    * one exponential both engines reproduce bit-exactly with integer
    * shifts, no pow()/exp() parity risk. One 1-row max-day broadcast,
    * one map-side-combined per-user aggregate; output ordered by score
    * for the leaderboard read. */
  def engagementDecay(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), expr(s"ts_us div $DayUs").as("day"))
    val maxDay = ev.agg(max("day").as("max_day"))
    ev.crossJoin(broadcast(maxDay))
      .select(col("user_id"),
        expr("least((max_day - day) div 7, 19)").as("age_w"))
      .select(col("user_id"),
        expr("1000000 div shiftleft(1, cast(age_w as int))").as("w"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum("w").as("decay_score_micro"))
      .orderBy(col("decay_score_micro").desc, col("user_id"))
  }

  /** Time-series gap fill: the dense (user × day) grid with zero-filled
    * counts — the resample step before any per-user daily model. The
    * day spine is a single `sequence(min,max)` row exploded and
    * broadcast (a spine is always tiny: years of days ≪ one partition),
    * so the grid is a broadcast nested-loop over the distinct-user
    * frame and the only real shuffle is the (user, day) count
    * aggregation that would exist anyway. No per-user windows, no
    * driver-side date arithmetic; at 100 TB the grid's size is
    * users×days — the semantics, not an implementation artifact. */
  def gapFill(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), expr(s"ts_us div $DayUs").as("day"))
    val days = ev.agg(min("day").as("d0"), max("day").as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val counts = ev.groupBy("user_id", "day").agg(count(lit(1)).as("n"))
    ev.select("user_id").distinct()
      .crossJoin(broadcast(days))
      .join(counts, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        when(col("n").isNull, 1).otherwise(0).as("filled"))
      .orderBy("user_id", "day")
  }

  /** Bucketed range join: for every purchase, the count of error events
    * in the preceding hour across the whole stream. The naive plan for
    * a pure interval predicate is a BroadcastNestedLoopJoin — quadratic,
    * the classic 100 TB killer. The scale re-expression: errors land in
    * their hour bucket once; each probe explodes into the (exactly two)
    * buckets its window can touch; the join becomes an EQUI-join on
    * bucket with the interval as a cheap residual filter, shuffling each
    * side once by hour. Each error has one bucket, so no pair is seen
    * twice and no dedup pass is needed. */
  def rangeJoinBucket(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val errors = ev.filter(col("event_type") === "error")
      .select(expr(s"ts_us div $HourUs").as("ebucket"), col("ts_us").as("ets"))
    val probes = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts_us"),
        explode(array(expr(s"ts_us div $HourUs - 1"),
          expr(s"ts_us div $HourUs"))).as("bucket"))
    probes.join(errors,
        probes("bucket") === errors("ebucket") &&
          errors("ets") >= probes("ts_us") - HourUs &&
          errors("ets") <= probes("ts_us"), "left")
      .groupBy("event_id", "ts_us")
      .agg(count(col("ets")).as("n_errors_1h"))
      .orderBy("event_id")
  }

  /** Day-N retention per signup cohort: users bucketed by their first
    * active day, then counted at each day offset 0-7. Three shuffles,
    * all on bounded keys (user for first-day + self-join, cohort day
    * for the final rollup); the user⋈user join is co-partitioned, so
    * at 100 TB this is the standard one-pass cohort shape. */
  def cohortRetention(s: SparkSession, d: String): DataFrame = {
    val days = Tables.events(s, d)
      .select(col("user_id"), expr(s"ts_us div $DayUs").as("day"))
      .distinct()
    val first = days.groupBy("user_id").agg(min("day").as("cohort_day"))
    val sizes = first.groupBy("cohort_day")
      .agg(countDistinct("user_id").as("cohort_size"))
    days.join(first, "user_id")
      .withColumn("day_offset", col("day") - col("cohort_day"))
      .filter(col("day_offset") <= 7)
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct("user_id").as("n_active"))
      .join(sizes, "cohort_day")
      .select("cohort_day", "day_offset", "n_active", "cohort_size")
      .orderBy("cohort_day", "day_offset")
  }

  /** The second parser under the oracle: render each order as a
    * JobHistory attribute line (`Job JOBID="..." STATUS="..." ...`),
    * parse it back with [[graft.sources.LogLineParser.parseJobHistory]]
    * (single-pass pair extraction + map_from_entries), and aggregate
    * the PARSED attributes. The oracle renders identical strings and
    * regex-extracts each attribute independently, so the attrs-map
    * construction is hash-checked end-to-end. */
  def jobHistoryStats(s: SparkSession, d: String): DataFrame = {
    import graft.sources.LogLineParser
    val lines = Tables.orders(s, d).select(concat(
      lit("Job JOBID=\"job_"), col("o_orderkey").cast("string"),
      lit("\" STATUS=\""), col("o_orderstatus"),
      lit("\" PRIORITY=\""), col("o_orderpriority"),
      lit("\" TOTAL_CENTS=\""),
      round(col("o_totalprice") * 100, 0).cast("long").cast("string"),
      lit("\"")
    ).as("value"))
    LogLineParser.parseJobHistory(lines)
      .select(col("event"),
        LogLineParser.attr("STATUS").as("status"),
        LogLineParser.attr("PRIORITY").as("priority"),
        LogLineParser.attr("TOTAL_CENTS").cast("long").as("cents"))
      .groupBy("event", "status", "priority")
      .agg(count(lit(1)).as("n_jobs"), sum("cents").as("sum_cents"))
      .orderBy("status", "priority")
  }

  /** End-to-end raw-log ingest under the oracle: render each event as a
    * log4j daemon line (deterministic round-trip of ts/level/user/value/
    * job id into text), parse it back with the production parser
    * ([[graft.sources.LogLineParser.parseLog4j]] — the exact code a
    * `spark.read.text` directory goes through), then aggregate the
    * PARSED fields. The DuckDB oracle renders the identical strings and
    * regex-parses them independently, so a parser regression (wrong
    * group, wrong timestamp format, lost job id) breaks the hash match.
    * Money rides as integer cents (float→string rendering differs
    * between engines; `round(value*100)` is exact on the 0.01 grid). */
  def ingestParse(s: SparkSession, d: String): DataFrame = {
    val lines = Tables.events(s, d).select(concat(
      date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd HH:mm:ss"),
      lit(","),
      expr("lpad(cast((ts_us % 1000000) div 1000 as string), 3, '0')"),
      lit(" "),
      when(col("event_type") === "error", lit("ERROR")).otherwise(lit("INFO")),
      lit(" [main] graft.Events: user="), col("user_id").cast("string"),
      lit(" type="), col("event_type"),
      lit(" cents="), round(col("value") * 100, 0).cast("long").cast("string"),
      lit(" job job_"), expr(s"cast(ts_us div $DayUs as string)"),
      lit("_"), col("user_id").cast("string")
    ).as("value"))
    graft.sources.LogLineParser.parseLog4j(lines)
      .withColumn("uid",
        regexp_extract(col("message"), "user=(\\d+)", 1).cast("long"))
      .withColumn("cents",
        regexp_extract(col("message"), "cents=(\\d+)", 1).cast("long"))
      .groupBy(col("level"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_ts"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("uid")).as("n_users"),
        sum("cents").as("sum_cents"),
        countDistinct(col("job_id")).as("n_jobs"))
      .orderBy("level", "hour_ts")
  }

  /** The 100 TB path for [[percentiles]]: sketch-based
    * `approx_percentile` (mergeable, single pass, bounded memory) —
    * rows-only check (sketches are engine-specific). */
  def percentilesApprox(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        round(expr("approx_percentile(value, 0.5, 1000)"), 2).as("p50"),
        round(expr("approx_percentile(value, 0.9, 1000)"), 2).as("p90"),
        round(expr("approx_percentile(value, 0.99, 1000)"), 2).as("p99"))
      .orderBy("event_type")

  /** The 100 TB path for [[dailyActive]]: HLL++ `approx_count_distinct`
    * (order-invariant register merge). Rows-only check. */
  def dailyActiveApprox(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(expr(s"ts_us div $DayUs").as("day_num"))
      .agg(approx_count_distinct(col("user_id"), 0.01).as("n_active_approx"),
        count(lit(1)).as("n_events"))
      .orderBy("day_num")

  /** As-of join: each purchase event paired with the user's most recent
    * signup at-or-before it. Spark has no native ASOF JOIN; the scalable
    * re-expression is the tagged-union + running-max window: one shuffle
    * by user_id, no range explosion — the same shape works for
    * fact-to-dimension time-travel joins at 100 TB. */
  def asofPrevSignup(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("sig_ts",
        when(col("event_type") === "signup", col("ts_us")))
      .withColumn("prev_signup_us",
        coalesce(max("sig_ts").over(byUser), lit(-1L)))
      .filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts_us", "prev_signup_us")
      .orderBy("user_id", "ts_us", "event_id")
  }

  def countsByType(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(sum("value"), 2).as("sum_value"),
        round(avg("value"), 4).as("avg_value"),
        round(min("value"), 2).as("min_value"),
        round(max("value"), 2).as("max_value"))
      .orderBy("event_type")

  def errorRateHourly(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy((expr(s"ts_us div $HourUs") * 3600L).as("hour_ts"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("n_errors"))
      .withColumn("error_rate",
        round(col("n_errors").cast("double") / col("n_events"), 4))
      .orderBy("hour_ts")

  def dailyActive(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(expr(s"ts_us div $DayUs").as("day_num"))
      .agg(countDistinct(col("user_id")).as("n_active"),
        count(lit(1)).as("n_events"))
      .orderBy("day_num")

  def topUsers(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
      .orderBy(col("n_events").desc, col("user_id"))
      .limit(20)

  /** The 100 TB path for [[topUsers]]: DataSketches frequent-items via
    * `approx_top_k` — a MERGEABLE heavy-hitters sketch, so map-side
    * partials collapse each partition to one bounded buffer and the
    * shuffle moves sketches, not the per-user aggregate (the exact
    * top-k's groupBy keys by user_id: fine when users ≪ events, a full
    * shuffle of the key space when the key space itself is huge —
    * completing the approx family next to approx_percentile and HLL++
    * count-distinct). maxItemsTracked=10⁴ ≫ test-SF user counts, so
    * the sketch runs in its exact regime here; rows-only (sketch
    * estimates are engine-specific), ApproxSpec pins the estimates
    * against the exact aggregate. */
  def topUsersApprox(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .agg(expr("approx_top_k(user_id, 20, 10000)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("user_id"),
        col("e.count").as("n_events_est"))
      .orderBy(col("n_events_est").desc, col("user_id"))

  def topkPerType(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.events(s, d)
      .groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("n").desc, col("user_id"))
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .orderBy("event_type", "rk")
  }

  /** Exact percentiles (Spark `percentile` ≡ DuckDB `quantile_cont`:
    * both linear-interpolation over the sorted set). Scale path is
    * `approx_percentile` — exact kept for oracle parity at test SF. */
  def percentiles(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        round(expr("percentile(value, 0.99)"), 4).as("p99"))
      .orderBy("event_type")

  def jsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(round(avg("k"), 4).as("avg_k"),
        min("k").as("min_k"), max("k").as("max_k"),
        count(col("k")).as("n_with_k"))
      .orderBy("event_type")

  /** Gap-based sessionization: new session when the gap from the previous
    * event of the same user is >= 30 min (mirrors `session_window`
    * semantics: a session's window is [start, last+gap)). */
  private def sessionized(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    Tables.events(s, d)
      .withColumn("prev_us", lag("ts_us", 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull
          || col("ts_us") - col("prev_us") >= GapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum("new_sess").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  def sessionize(s: SparkSession, d: String): DataFrame =
    sessionized(s, d)
      .select("user_id", "event_id", "ts_us", "session_id")
      .orderBy("user_id", "ts_us", "event_id")

  def sessionStats(s: SparkSession, d: String): DataFrame =
    sessionized(s, d)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("ts_us").as("start_us"),
        (max("ts_us") - min("ts_us")).as("duration_us"),
        round(sum("value"), 2).as("sum_value"))
      .orderBy("user_id", "session_id")

  /** Rolling window over the last 10 events per user. Emits the rolling
    * SUM + frame size (mean = sum/n). The sum of 2-decimal inputs sits on
    * the 0.01 grid, so `round(x, 2)` is engine-agnostic; the mean of an
    * n≤10 frame lands exactly on round-4 midpoints where Spark's
    * BigDecimal HALF_UP and DuckDB's multiply-shift round() disagree. */
  def rollingAvg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      .rowsBetween(-9, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts_us"),
        round(sum("value").over(w), 2).as("rolling_sum"),
        count(lit(1)).over(w).as("n_frame"))
      .orderBy("user_id", "ts_us", "event_id")
  }

  /** Ordered funnel signup → view → purchase: stage counts of users whose
    * first view follows their first signup, etc. */
  def funnel(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select("user_id", "event_type", "ts_us")
    val s1 = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts_us").as("t1"))
    val s2 = e.filter(col("event_type") === "view")
      .join(s1, "user_id").filter(col("ts_us") > col("t1"))
      .groupBy("user_id").agg(min("ts_us").as("t2"))
    val s3 = e.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("ts_us") > col("t2"))
      .groupBy("user_id").agg(min("ts_us").as("t3"))
    s1.select(lit("1_signup").as("stage"), col("user_id"))
      .unionAll(s2.select(lit("2_view_after_signup").as("stage"), col("user_id")))
      .unionAll(s3.select(lit("3_purchase_after_view").as("stage"), col("user_id")))
      .groupBy("stage").agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("stage")
  }

  def anomalyZscore(s: SparkSession, d: String): DataFrame = {
    val stats = Tables.events(s, d)
      .groupBy("event_type")
      .agg(avg("value").as("mu"), stddev_samp("value").as("sd"))
      .filter(col("sd").isNotNull && col("sd") > 0)
    Tables.events(s, d)
      .join(broadcast(stats), "event_type")
      .withColumn("z", (col("value") - col("mu")) / col("sd"))
      .filter(abs(col("z")) > 3)
      .select(col("event_id"), col("event_type"), round(col("z"), 3).as("z"))
      .orderBy("event_id")
  }

  def histValue(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(floor(col("value") / 50).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")

  def lagDelta(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    Tables.events(s, d)
      .withColumn("prev_us", lag("ts_us", 1).over(byUser))
      .filter(col("prev_us").isNotNull)
      .groupBy(expr(s"(ts_us - prev_us) div $MinuteUs").as("delta_min"))
      .agg(count(lit(1)).as("n"))
      .orderBy("delta_min")
  }

  /** DuckDB CTE giving events with µs-since-epoch (mirrors ts_us). */
  private val E =
    "e AS (SELECT event_id, epoch_us(ts) AS tu, user_id, event_type, value, props FROM events)"

  /** Shared sessionize CTE (mirrors [[sessionized]]). */
  private val SessCte =
    s"""WITH $E,
       |lagd AS (
       |  SELECT *, lag(tu) OVER (PARTITION BY user_id ORDER BY tu, event_id) AS prev_us
       |  FROM e),
       |flagged AS (
       |  SELECT *, CASE WHEN prev_us IS NULL OR tu - prev_us >= 1800000000
       |    THEN 1 ELSE 0 END AS new_sess
       |  FROM lagd),
       |sess AS (
       |  SELECT *, sum(new_sess) OVER (
       |    PARTITION BY user_id ORDER BY tu, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_id
       |  FROM flagged)""".stripMargin

  val oracles: Map[String, String] = Map(
    "log_mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY event_type),
        |dev AS (
        |  SELECT e.event_type, e.value, abs(e.value - m.med) AS dev
        |  FROM events e JOIN med m USING (event_type)),
        |mad AS (
        |  SELECT event_type, quantile_cont(dev, 0.5) AS mad
        |  FROM dev GROUP BY event_type)
        |SELECT d.event_type, count(*)::BIGINT AS n,
        |  round(max(m2.med), 4) AS median,
        |  round(max(m3.mad), 4) AS mad,
        |  sum(CASE WHEN d.dev > m3.mad * 3 + 0.0001 THEN 1 ELSE 0 END)
        |    ::BIGINT AS n_outliers,
        |  (sum(CASE WHEN d.dev > m3.mad * 3 + 0.0001 THEN 1 ELSE 0 END)
        |    * 1000000 // count(*))::BIGINT AS outlier_ppm
        |FROM dev d
        |JOIN med m2 USING (event_type)
        |JOIN mad m3 USING (event_type)
        |GROUP BY d.event_type
        |ORDER BY d.event_type""".stripMargin,
    "log_ab_uplift" ->
      """WITH u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS converted
        |  FROM events GROUP BY user_id),
        |v AS (
        |  SELECT CASE WHEN (strpos('0123456789abcdef',
        |        substr(md5(user_id::VARCHAR), 1, 1)) - 1) <= 7
        |      THEN 'A' ELSE 'B' END AS variant, converted
        |  FROM u),
        |t AS (
        |  SELECT
        |    sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END)::BIGINT AS n_a,
        |    sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END)::BIGINT AS n_b,
        |    sum(CASE WHEN variant = 'A' THEN converted ELSE 0 END)::BIGINT
        |      AS conv_a,
        |    sum(CASE WHEN variant = 'B' THEN converted ELSE 0 END)::BIGINT
        |      AS conv_b
        |  FROM v)
        |SELECT n_a, n_b, conv_a, conv_b,
        |  (CASE WHEN n_a > 0 THEN conv_a * 1000000 // n_a ELSE 0 END)::BIGINT
        |    AS conv_a_ppm,
        |  (CASE WHEN n_b > 0 THEN conv_b * 1000000 // n_b ELSE 0 END)::BIGINT
        |    AS conv_b_ppm,
        |  (CASE WHEN n_a > 0 AND n_b > 0
        |    THEN conv_b * 1000000 // n_b - conv_a * 1000000 // n_a
        |    ELSE 0 END)::BIGINT
        |    AS uplift_ppm,
        |  (CASE WHEN n_a > 0 AND n_b > 0
        |    AND conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b
        |    THEN floor(
        |      (conv_b::DOUBLE / n_b - conv_a::DOUBLE / n_a)
        |      / sqrt(
        |          ((conv_a + conv_b)::DOUBLE / (n_a + n_b))
        |          * (1.0 - (conv_a + conv_b)::DOUBLE / (n_a + n_b))
        |          * (1::DOUBLE / n_a + 1::DOUBLE / n_b))
        |      * 1000)
        |    ELSE 0 END)::BIGINT AS z_milli
        |FROM t""".stripMargin,
    "log_out_of_order_stats" ->
      s"""WITH $E,
         |a AS (
         |  SELECT user_id, event_id, tu,
         |    event_id + CASE WHEN event_id % 97 = 0 THEN 1000003
         |      WHEN event_id % 29 = 0 THEN 10007
         |      WHEN event_id % 17 = 0 THEN 101
         |      ELSE 0 END AS arr
         |  FROM e),
         |lat AS (
         |  SELECT user_id,
         |    max(tu) OVER (PARTITION BY user_id ORDER BY arr, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tu
         |      AS late_us
         |  FROM a),
         |b AS (
         |  SELECT user_id, late_us,
         |    CASE WHEN late_us = 0 THEN '0_in_order'
         |      WHEN late_us < 60000000 THEN '1_lt_1m'
         |      WHEN late_us < 3600000000 THEN '2_lt_1h'
         |      ELSE '3_ge_1h' END AS bucket
         |  FROM lat)
         |SELECT bucket, count(*)::BIGINT AS n_events,
         |  count(DISTINCT user_id)::BIGINT AS n_users,
         |  max(late_us)::BIGINT AS max_late_us
         |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "log_attribution" ->
      s"""WITH $E,
         |t AS (
         |  SELECT event_type, round(value * 100)::BIGINT AS v_centi,
         |    first_value(CASE WHEN event_type IN ('view', 'click')
         |        THEN event_type END IGNORE NULLS)
         |      OVER w AS first_touch,
         |    last_value(CASE WHEN event_type IN ('view', 'click')
         |        THEN event_type END IGNORE NULLS)
         |      OVER w AS last_touch
         |  FROM e
         |  WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         |pur AS (SELECT * FROM t WHERE event_type = 'purchase'),
         |m AS (
         |  SELECT 'first' AS model,
         |    coalesce(first_touch, 'none') AS touch_type, v_centi FROM pur
         |  UNION ALL
         |  SELECT 'last', coalesce(last_touch, 'none'), v_centi FROM pur)
         |SELECT model, touch_type, count(*)::BIGINT AS n_conversions,
         |  sum(v_centi)::BIGINT AS value_centi
         |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ingest_json_audit" ->
      """SELECT CASE WHEN event_id % 97 = 0 THEN '_corrupt'
        |       ELSE event_type END AS event_type,
        |  count(*)::BIGINT AS n_rows
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "log_gap_fill" ->
      s"""WITH $E,
         |ev AS (SELECT user_id, tu // 86400000000 AS day FROM e),
         |days AS (
         |  SELECT unnest(generate_series(
         |    (SELECT min(day) FROM ev), (SELECT max(day) FROM ev))) AS day),
         |counts AS (
         |  SELECT user_id, day, count(*)::BIGINT AS n
         |  FROM ev GROUP BY 1, 2)
         |SELECT u.user_id, d.day,
         |  coalesce(c.n, 0)::BIGINT AS n_events,
         |  CASE WHEN c.n IS NULL THEN 1 ELSE 0 END AS filled
         |FROM (SELECT DISTINCT user_id FROM ev) u
         |CROSS JOIN days d
         |LEFT JOIN counts c ON c.user_id = u.user_id AND c.day = d.day
         |ORDER BY u.user_id, d.day""".stripMargin,
    "join_range_bucket" ->
      s"""WITH $E,
         |err AS (SELECT tu AS ets FROM e WHERE event_type = 'error'),
         |p AS (SELECT event_id, tu FROM e WHERE event_type = 'purchase')
         |SELECT p.event_id, p.tu AS ts_us,
         |  count(err.ets)::BIGINT AS n_errors_1h
         |FROM p LEFT JOIN err
         |  ON err.ets >= p.tu - 3600000000 AND err.ets <= p.tu
         |GROUP BY 1, 2 ORDER BY p.event_id""".stripMargin,
    "log_cohort_retention" ->
      s"""WITH $E,
         |days AS (
         |  SELECT DISTINCT user_id, tu // 86400000000 AS day FROM e),
         |first AS (
         |  SELECT user_id, min(day) AS cohort_day FROM days GROUP BY 1),
         |sizes AS (
         |  SELECT cohort_day, count(DISTINCT user_id) AS cohort_size
         |  FROM first GROUP BY 1)
         |SELECT d.cohort_day, d.day_offset, d.n_active, sizes.cohort_size
         |FROM (
         |  SELECT f.cohort_day, days.day - f.cohort_day AS day_offset,
         |    count(DISTINCT days.user_id) AS n_active
         |  FROM days JOIN first f ON days.user_id = f.user_id
         |  WHERE days.day - f.cohort_day <= 7
         |  GROUP BY 1, 2) d
         |JOIN sizes ON d.cohort_day = sizes.cohort_day
         |ORDER BY d.cohort_day, day_offset""".stripMargin,
    "log_jobhistory_stats" ->
      """WITH lines AS (
        |  SELECT 'Job JOBID="job_' || o_orderkey::VARCHAR
        |    || '" STATUS="' || o_orderstatus
        |    || '" PRIORITY="' || o_orderpriority
        |    || '" TOTAL_CENTS="' || round(o_totalprice * 100)::BIGINT::VARCHAR
        |    || '"' AS value
        |  FROM orders),
        |parsed AS (
        |  SELECT regexp_extract(value, '^(\w+) ', 1) AS event,
        |    regexp_extract(value, 'STATUS="([^"]*)"', 1) AS status,
        |    regexp_extract(value, 'PRIORITY="([^"]*)"', 1) AS priority,
        |    regexp_extract(value, 'TOTAL_CENTS="([^"]*)"', 1)::BIGINT AS cents
        |  FROM lines)
        |SELECT event, status, priority, count(*) AS n_jobs,
        |  sum(cents)::BIGINT AS sum_cents
        |FROM parsed GROUP BY 1, 2, 3 ORDER BY status, priority""".stripMargin,
    "log_ingest_parse" ->
      """WITH lines AS (
        |  SELECT strftime(make_timestamp(epoch_us(ts)), '%Y-%m-%d %H:%M:%S')
        |    || ',' || lpad(((epoch_us(ts) % 1000000) // 1000)::VARCHAR, 3, '0')
        |    || ' ' || (CASE WHEN event_type = 'error' THEN 'ERROR' ELSE 'INFO' END)
        |    || ' [main] graft.Events: user=' || user_id::VARCHAR
        |    || ' type=' || event_type
        |    || ' cents=' || round(value * 100)::BIGINT::VARCHAR
        |    || ' job job_' || (epoch_us(ts) // 86400000000)::VARCHAR
        |    || '_' || user_id::VARCHAR AS value
        |  FROM events),
        |parsed AS (
        |  SELECT
        |    strptime(regexp_extract(value,
        |      '^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}),', 1),
        |      '%Y-%m-%d %H:%M:%S') AS ts,
        |    regexp_extract(value,
        |      ',\d{3} (TRACE|DEBUG|INFO|WARN|ERROR|FATAL) ', 1) AS level,
        |    regexp_extract(value, 'user=(\d+)', 1)::BIGINT AS uid,
        |    regexp_extract(value, 'cents=(\d+)', 1)::BIGINT AS cents,
        |    regexp_extract(value, '(job_\d+_\d+)', 1) AS job_id
        |  FROM lines)
        |SELECT level, epoch(date_trunc('hour', ts))::BIGINT AS hour_ts,
        |  count(*) AS n, count(DISTINCT uid) AS n_users,
        |  sum(cents)::BIGINT AS sum_cents, count(DISTINCT job_id) AS n_jobs
        |FROM parsed GROUP BY 1, 2 ORDER BY level, hour_ts""".stripMargin,
    "log_type_transitions" ->
      """WITH o AS (
        |  SELECT user_id, event_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS to_type
        |  FROM events)
        |SELECT event_type AS from_type, to_type, count(*) AS n
        |FROM o WHERE to_type IS NOT NULL
        |GROUP BY from_type, to_type
        |ORDER BY from_type, to_type""".stripMargin,
    "log_counts_by_type" ->
      """SELECT event_type, count(*) AS n,
        |  round(sum(value), 2) AS sum_value,
        |  round(avg(value), 4) AS avg_value,
        |  round(min(value), 2) AS min_value,
        |  round(max(value), 2) AS max_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "log_error_rate_hourly" ->
      s"""WITH $E
         |SELECT (tu // 3600000000) * 3600 AS hour_ts,
         |  count(*) AS n_events,
         |  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS n_errors,
         |  round(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::DOUBLE
         |    / count(*), 4) AS error_rate
         |FROM e GROUP BY 1 ORDER BY hour_ts""".stripMargin,
    "log_daily_active" ->
      s"""WITH $E
         |SELECT tu // 86400000000 AS day_num,
         |  count(DISTINCT user_id) AS n_active, count(*) AS n_events
         |FROM e GROUP BY 1 ORDER BY day_num""".stripMargin,
    "log_rolling_distinct" ->
      s"""WITH $E,
         |ud AS (SELECT DISTINCT tu // 86400000000 AS day_num, user_id
         |       FROM e),
         |b AS (SELECT max(day_num) AS hi FROM ud),
         |d1 AS (SELECT day_num,
         |         count(DISTINCT user_id)::BIGINT AS n_users_1d
         |       FROM ud GROUP BY 1),
         |c AS (SELECT user_id, day_num + g.i AS t_day
         |      FROM ud CROSS JOIN
         |        (SELECT unnest(generate_series(0, 6)) AS i) g),
         |r AS (SELECT t_day, count(DISTINCT user_id)::BIGINT AS n_users_7d
         |      FROM c, b WHERE t_day <= hi GROUP BY 1)
         |SELECT t_day AS day_num,
         |  coalesce(n_users_1d, 0)::BIGINT AS n_users_1d, n_users_7d
         |FROM r LEFT JOIN d1 ON t_day = d1.day_num
         |ORDER BY day_num""".stripMargin,
    "log_top_users" ->
      """SELECT user_id, count(*) AS n_events,
        |  round(sum(value), 2) AS sum_value
        |FROM events GROUP BY user_id
        |ORDER BY n_events DESC, user_id LIMIT 20""".stripMargin,
    "log_topk_per_type" ->
      """WITH counts AS (
        |  SELECT event_type, user_id, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |ranked AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY event_type ORDER BY n DESC, user_id) AS rk
        |  FROM counts)
        |SELECT event_type, user_id, n, rk FROM ranked
        |WHERE rk <= 5 ORDER BY event_type, rk""".stripMargin,
    "log_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.9), 4) AS p90,
        |  round(quantile_cont(value, 0.99), 4) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "log_json_extract" ->
      """SELECT event_type,
        |  round(avg(k), 4) AS avg_k, min(k) AS min_k, max(k) AS max_k,
        |  count(k) AS n_with_k
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "log_sessionize" ->
      s"""$SessCte
         |SELECT user_id, event_id, tu AS ts_us, session_id
         |FROM sess ORDER BY user_id, ts_us, event_id""".stripMargin,
    "log_changepoint_cusum" ->
      s"""WITH $E,
         |evh AS (SELECT event_type, tu // 3600000000 AS h FROM e),
         |sp AS (
         |  SELECT unnest(generate_series((SELECT min(h) FROM evh),
         |    (SELECT max(h) FROM evh))) AS h),
         |ty AS (SELECT DISTINCT event_type FROM evh),
         |cnt AS (SELECT event_type, h, count(*)::BIGINT AS c
         |  FROM evh GROUP BY 1, 2),
         |grid AS (
         |  SELECT ty.event_type, sp.h, coalesce(cnt.c, 0) AS c
         |  FROM ty CROSS JOIN sp
         |  LEFT JOIN cnt ON cnt.event_type = ty.event_type
         |    AND cnt.h = sp.h),
         |tot AS (SELECT event_type, sum(c)::BIGINT AS total,
         |  count(*)::BIGINT AS hh FROM grid GROUP BY 1),
         |st AS (
         |  SELECT g.event_type, g.h,
         |    (t.hh * sum(g.c) OVER (PARTITION BY g.event_type ORDER BY g.h
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      - row_number() OVER (PARTITION BY g.event_type
         |          ORDER BY g.h) * t.total)::BIGINT AS sstat
         |  FROM grid g JOIN tot t ON t.event_type = g.event_type),
         |pick AS (
         |  SELECT *, row_number() OVER (PARTITION BY event_type
         |    ORDER BY abs(sstat) DESC, h) AS rk
         |  FROM st)
         |SELECT event_type, h * 3600 AS change_hour_ts,
         |  abs(sstat)::BIGINT AS cusum_scaled,
         |  CASE WHEN sstat > 0 THEN 'drop' ELSE 'rise' END AS direction
         |FROM pick WHERE rk = 1 ORDER BY event_type""".stripMargin,
    "log_anomaly_seasonal" ->
      s"""WITH $E,
         |evh AS (SELECT event_type, tu // 3600000000 AS h FROM e),
         |sp AS (
         |  SELECT unnest(generate_series((SELECT min(h) FROM evh),
         |    (SELECT max(h) FROM evh))) AS h),
         |ty AS (SELECT DISTINCT event_type FROM evh),
         |cnt AS (SELECT event_type, h, count(*)::BIGINT AS c
         |  FROM evh GROUP BY 1, 2),
         |grid AS (
         |  SELECT ty.event_type, sp.h, coalesce(cnt.c, 0) AS c,
         |    (sp.h + 72) % 168 AS how
         |  FROM ty CROSS JOIN sp
         |  LEFT JOIN cnt ON cnt.event_type = ty.event_type
         |    AND cnt.h = sp.h),
         |st AS (
         |  SELECT event_type, h, how, c,
         |    sum(c) OVER (PARTITION BY event_type, how)::BIGINT
         |      AS slot_total,
         |    count(*) OVER (PARTITION BY event_type, how)::BIGINT
         |      AS n_weeks
         |  FROM grid),
         |dv AS (
         |  SELECT *, (c * n_weeks - slot_total)::BIGINT AS dev,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY abs(c * n_weeks - slot_total) DESC, h) AS rk
         |  FROM st)
         |SELECT event_type, h * 3600 AS hour_ts, how,
         |  c AS n_events, slot_total, n_weeks,
         |  abs(dev)::BIGINT AS dev_scaled,
         |  CASE WHEN slot_total > 0
         |    THEN c * n_weeks * 1000000 // slot_total ELSE 0 END::BIGINT
         |    AS ratio_ppm
         |FROM dv WHERE rk = 1 ORDER BY event_type""".stripMargin,
    "user_engagement_decay" ->
      s"""WITH $E,
         |d AS (SELECT user_id, tu // 86400000000 AS day FROM e),
         |m AS (SELECT max(day) AS max_day FROM d),
         |w AS (
         |  SELECT user_id,
         |    1000000 // (1 << least((max_day - day) // 7, 19)) AS w
         |  FROM d, m)
         |SELECT user_id, count(*)::BIGINT AS n_events,
         |  sum(w)::BIGINT AS decay_score_micro
         |FROM w GROUP BY user_id
         |ORDER BY decay_score_micro DESC, user_id""".stripMargin,
    "event_paths_topk" ->
      s"""$SessCte,
         |tri AS (
         |  SELECT event_type AS step1,
         |    lead(event_type, 1) OVER w AS step2,
         |    lead(event_type, 2) OVER w AS step3
         |  FROM sess
         |  WINDOW w AS (PARTITION BY user_id, session_id
         |    ORDER BY tu, event_id))
         |SELECT step1, step2, step3, count(*)::BIGINT AS n
         |FROM tri WHERE step3 IS NOT NULL
         |GROUP BY step1, step2, step3
         |ORDER BY n DESC, step1, step2, step3 LIMIT 20""".stripMargin,
    "log_session_stats" ->
      s"""$SessCte
         |SELECT user_id, session_id, count(*) AS n_events,
         |  min(tu) AS start_us, max(tu) - min(tu) AS duration_us,
         |  round(sum(value), 2) AS sum_value
         |FROM sess GROUP BY user_id, session_id
         |ORDER BY user_id, session_id""".stripMargin,
    "log_rolling_avg" ->
      s"""WITH $E
         |SELECT user_id, event_id, tu AS ts_us,
         |  round(sum(value) OVER w, 2) AS rolling_sum,
         |  count(*) OVER w AS n_frame
         |FROM e
         |WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id
         |  ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
         |ORDER BY user_id, ts_us, event_id""".stripMargin,
    "log_funnel" ->
      s"""WITH $E,
         |s1 AS (SELECT user_id, min(tu) AS t1 FROM e
         |       WHERE event_type = 'signup' GROUP BY user_id),
         |s2 AS (SELECT e.user_id, min(tu) AS t2 FROM e JOIN s1 USING (user_id)
         |       WHERE event_type = 'view' AND tu > t1 GROUP BY e.user_id),
         |s3 AS (SELECT e.user_id, min(tu) AS t3 FROM e JOIN s2 USING (user_id)
         |       WHERE event_type = 'purchase' AND tu > t2 GROUP BY e.user_id)
         |SELECT stage, count(DISTINCT user_id) AS n_users FROM (
         |  SELECT '1_signup' AS stage, user_id FROM s1
         |  UNION ALL SELECT '2_view_after_signup', user_id FROM s2
         |  UNION ALL SELECT '3_purchase_after_view', user_id FROM s3)
         |GROUP BY stage ORDER BY stage""".stripMargin,
    "log_anomaly_zscore" ->
      """WITH stats AS (
        |  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
        |  FROM events GROUP BY event_type
        |  HAVING stddev_samp(value) IS NOT NULL AND stddev_samp(value) > 0)
        |SELECT event_id, e.event_type, round((value - mu) / sd, 3) AS z
        |FROM events e JOIN stats USING (event_type)
        |WHERE abs((value - mu) / sd) > 3
        |ORDER BY event_id""".stripMargin,
    "log_hist_value" ->
      """SELECT CAST(floor(value / 50) AS BIGINT) AS bucket, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,
    "log_lag_sessions_delta" ->
      s"""WITH $E,
         |lagd AS (
         |  SELECT tu - lag(tu) OVER (
         |    PARTITION BY user_id ORDER BY tu, event_id) AS delta_us
         |  FROM e)
         |SELECT delta_us // 60000000 AS delta_min, count(*) AS n
         |FROM lagd WHERE delta_us IS NOT NULL
         |GROUP BY 1 ORDER BY delta_min""".stripMargin,
    "log_asof_prev_signup" ->
      s"""WITH $E,
         |marked AS (
         |  SELECT *, CASE WHEN event_type = 'signup' THEN tu END AS sig_ts
         |  FROM e),
         |runmax AS (
         |  SELECT *, coalesce(max(sig_ts) OVER (
         |    PARTITION BY user_id ORDER BY tu, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1)
         |    AS prev_signup_us
         |  FROM marked)
         |SELECT user_id, event_id, tu AS ts_us, prev_signup_us
         |FROM runmax WHERE event_type = 'purchase'
         |ORDER BY user_id, ts_us, event_id""".stripMargin
  )
}
