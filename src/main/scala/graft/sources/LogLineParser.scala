package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw log-line → typed DataFrame parsers (the reference's ingest
  * surface: Hadoop daemon/JobHistory logs).
  *
  * Both parsers are pure `regexp_extract` projections — codegen'd,
  * predicate-pushdown-friendly, and safe to run over a 100 TB
  * `spark.read.text(...)` (or `readStream.text`) directory: each line
  * parses independently, so the job is embarrassingly parallel with no
  * shuffle until the caller aggregates.
  */
object LogLineParser {

  /** log4j-style daemon line, e.g.
    * `2024-01-05 12:00:01,123 INFO [main] org.apache.hadoop.mapred.JobTracker: Starting job job_202401_0007`
    */
  private val Log4j =
    "^(\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}),(\\d{3}) " +
      "(TRACE|DEBUG|INFO|WARN|ERROR|FATAL) " +
      "\\[([^\\]]*)\\] ([^:]+): (.*)$"

  /** Parse a one-column DataFrame of raw lines (column `value`, as
    * produced by `spark.read.text`) into typed log records. Unparseable
    * lines get null fields but are retained (callers filter or audit). */
  def parseLog4j(lines: DataFrame): DataFrame =
    lines.select(
      try_to_timestamp(nullIfEmpty(regexp_extract(col("value"), Log4j, 1)),
        lit("yyyy-MM-dd HH:mm:ss")).as("ts"),
      nullIfEmpty(regexp_extract(col("value"), Log4j, 2))
        .cast("int").as("millis"),
      nullIfEmpty(regexp_extract(col("value"), Log4j, 3)).as("level"),
      nullIfEmpty(regexp_extract(col("value"), Log4j, 4)).as("thread"),
      nullIfEmpty(regexp_extract(col("value"), Log4j, 5)).as("logger"),
      nullIfEmpty(regexp_extract(col("value"), Log4j, 6)).as("message"),
      nullIfEmpty(regexp_extract(col("value"),
        "(job_\\d+_\\d+)", 1)).as("job_id"),
      col("value").as("raw"))

  /** JobHistory-style event line: an event type followed by
    * `KEY="value"` attribute pairs, e.g.
    * `Job JOBID="job_202401_0007" FINISH_TIME="1704456000" JOB_STATUS="SUCCESS"`.
    * Returns (event, attrs map, raw); use [[attr]] to project fields.
    *
    * Robustness: the complete `K="v"` unit must match (closing quote
    * required), so an embedded `X="` inside a quoted value cannot start
    * a match. Duplicate keys keep the LAST occurrence (a malformed line
    * must not fail the whole 100 TB job via
    * spark.sql.mapKeyDedupPolicy=EXCEPTION) — handled inside the
    * expression, before any map builder could object, so no session
    * conf is read or mutated and a shared session keeps its own map-key
    * semantics for unrelated queries.
    *
    * Perf shape: attrs come from the native codegen
    * [[graft.plans.JobHistoryAttrs]] expression — ONE compiled-regex
    * scan per line building the map directly. The declarative
    * alternatives both lose: two `regexp_extract_all` passes scan the
    * line twice, and a one-pass variant splitting units with
    * `transform`/`zip_with` is slower still because Spark's
    * higher-order functions are CodegenFallback (interpreted per-element
    * lambdas) — measured at sf0.1: native ≈ 0.6 s, two-pass ≈ 0.98 s,
    * one-pass+HOF ≈ 1.14 s full-query. The anchored event extract stays
    * in its own projection so the empty-to-null CASE WHEN does not
    * evaluate it twice. */
  def parseJobHistory(lines: DataFrame): DataFrame = {
    graft.plans.GraftFunctions.register(lines.sparkSession)
    lines.select(
      col("value"),
      regexp_extract(col("value"), "^(\\w+) ", 1).as("ev_raw"))
      .select(
        nullIfEmpty(col("ev_raw")).as("event"),
        call_function(graft.plans.GraftFunctions.JobHistoryAttrsName,
          col("value")).as("attrs"),
        col("value").as("raw"))
  }

  /** Column helper: attrs['KEY'] from [[parseJobHistory]] output. */
  def attr(name: String) = element_at(col("attrs"), name)

  /** Convenience: read a text directory (batch) and parse as log4j. */
  def readLog4j(spark: SparkSession, path: String): DataFrame =
    parseLog4j(spark.read.text(path))

  private def nullIfEmpty(c: org.apache.spark.sql.Column) =
    when(c === "", null).otherwise(c)
}
