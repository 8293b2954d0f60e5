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
    * Robustness: keys and values are extracted by two passes that both
    * match the complete `K="v"` unit (closing quote required), so the
    * arrays cannot desynchronize — the old key-only pattern `\w+="`
    * could also match INSIDE a quoted value and shift the arrays into a
    * length-mismatch throw. Duplicate keys keep the LAST occurrence (a
    * malformed line must not fail the whole 100 TB job via
    * spark.sql.mapKeyDedupPolicy=EXCEPTION); that is enforced by
    * setting the session's mapKeyDedupPolicy to LAST_WIN here — a
    * deliberate session-level side effect, chosen over an
    * expression-level dedup because Spark INLINES higher-order-function
    * arguments: a filter(entries, …exists(slice(entries…))) dedup
    * re-evaluates the whole per-pair regex transform per entry
    * (measured 7 s for 150k lines vs ~1 s in this form). */
  def parseJobHistory(lines: DataFrame): DataFrame = {
    lines.sparkSession.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    // both passes match the COMPLETE `K="v"` unit (closing quote
    // required), so they find the identical match sequence — an
    // embedded `X="` inside a value cannot start a match, and the two
    // arrays cannot desynchronize; only the captured group differs
    val keys = expr("""regexp_extract_all(value, '(\\w+)="[^"]*"', 1)""")
    val vals = expr("""regexp_extract_all(value, '\\w+="([^"]*)"', 1)""")
    lines.select(
      nullIfEmpty(regexp_extract(col("value"), "^(\\w+) ", 1)).as("event"),
      map_from_arrays(keys, vals).as("attrs"),
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
