package graft

import graft.sources.LogLineParser
import org.apache.spark.sql.functions.col

class LogLineParserSpec extends SparkSpec {

  test("parses log4j daemon lines") {
    import spark.implicits._
    val lines = Seq(
      "2024-01-05 12:00:01,123 INFO [main] org.apache.hadoop.mapred.JobTracker: Starting job job_202401_0007",
      "2024-01-05 12:00:02,456 ERROR [RMCommunicator] org.apache.hadoop.yarn.Client: Container failed",
      "not a log line at all"
    ).toDF("value")
    val parsed = LogLineParser.parseLog4j(lines).collect()
    assert(parsed.length === 3)
    val first = parsed(0)
    assert(first.getAs[String]("level") === "INFO")
    assert(first.getAs[String]("thread") === "main")
    assert(first.getAs[String]("logger") ===
      "org.apache.hadoop.mapred.JobTracker")
    assert(first.getAs[String]("job_id") === "job_202401_0007")
    assert(first.getAs[Int]("millis") === 123)
    assert(first.getAs[java.sql.Timestamp]("ts") != null)
    assert(parsed(1).getAs[String]("level") === "ERROR")
    assert(parsed(1).getAs[String]("job_id") == null)
    assert(parsed(2).getAs[String]("level") == null)
    assert(parsed(2).getAs[String]("raw") === "not a log line at all")
  }

  test("parses JobHistory attribute lines") {
    import spark.implicits._
    val lines = Seq(
      """Job JOBID="job_202401_0007" FINISH_TIME="1704456000" JOB_STATUS="SUCCESS"""",
      """Task TASKID="task_001" TASK_TYPE="MAP" START_TIME="1704455000""""
    ).toDF("value")
    val parsed = LogLineParser.parseJobHistory(lines)
    val rows = parsed.select(LogLineParser.attr("JOBID"),
      LogLineParser.attr("JOB_STATUS"), parsed("event")).collect()
    assert(rows(0).getString(0) === "job_202401_0007")
    assert(rows(0).getString(1) === "SUCCESS")
    assert(rows(0).getString(2) === "Job")
    assert(rows(1).getString(2) === "Task")
    assert(rows(1).isNullAt(0))
  }

  test("JobHistory: duplicate keys keep the last value, no exception") {
    import spark.implicits._
    val lines = Seq(
      """Job JOBID="a" STATUS="RUNNING" STATUS="SUCCESS"""").toDF("value")
    val rows = LogLineParser.parseJobHistory(lines)
      .select(LogLineParser.attr("STATUS"), LogLineParser.attr("JOBID"))
      .collect()
    assert(rows(0).getString(0) === "SUCCESS")
    assert(rows(0).getString(1) === "a")
  }

  test("JobHistory: dedup is expression-local — session conf untouched") {
    import spark.implicits._
    val before = spark.conf.getOption("spark.sql.mapKeyDedupPolicy")
    val lines = Seq(
      """Job JOBID="a" STATUS="RUNNING" STATUS="SUCCESS"""").toDF("value")
    val rows = LogLineParser.parseJobHistory(lines)
      .select(LogLineParser.attr("STATUS")).collect()
    assert(rows(0).getString(0) === "SUCCESS")
    // the parse must not have mutated the session's map-key policy …
    assert(spark.conf.getOption("spark.sql.mapKeyDedupPolicy") === before)
    // … so an unrelated duplicate-key map in the same (shared) session
    // still fails under the default EXCEPTION policy
    val ex = intercept[Exception] {
      spark.sql("SELECT map_from_arrays(array('k','k'), array(1,2))")
        .collect()
    }
    assert(ex.getMessage.toUpperCase.contains("DUPLICATE"),
      s"expected duplicate-key error, got: ${ex.getMessage.take(200)}")
  }

  test("JobHistory: null line → null attrs; attr-less line → empty map") {
    import spark.implicits._
    val lines = Seq(Some("MapAttempt no pairs here"), None)
      .toDF("value")
    val rows = LogLineParser.parseJobHistory(lines)
      .select(col("event"), col("attrs")).collect()
    assert(rows(0).getString(0) === "MapAttempt")
    assert(rows(0).getMap[String, String](1).isEmpty)
    assert(rows(1).isNullAt(1))
  }

  test("JobHistory: value ending in '=' parses whole (K=\"a=\" trap)") {
    import spark.implicits._
    // the unit text `K="a="` contains `="` twice — a last-occurrence
    // key/value split would truncate the value to empty; the compiled
    // single-pass matcher must capture `a=` intact
    val lines = Seq("""Job K="a=" NEXT="ok"""").toDF("value")
    val rows = LogLineParser.parseJobHistory(lines)
      .select(LogLineParser.attr("K"), LogLineParser.attr("NEXT")).collect()
    assert(rows(0).getString(0) === "a=")
    assert(rows(0).getString(1) === "ok")
  }

  test("JobHistory: a value containing X=\" does not desync pairs") {
    import spark.implicits._
    // MSG's value contains what LOOKS like the start of another pair;
    // single-unit extraction must still see exactly two attrs
    val lines = Seq(
      """Job JOBID="j1" MSG="note EXTRA=" STATUS="OK"""").toDF("value")
    val parsed = LogLineParser.parseJobHistory(lines)
    val rows = parsed.select(LogLineParser.attr("JOBID"),
      LogLineParser.attr("MSG"), LogLineParser.attr("STATUS")).collect()
    assert(rows(0).getString(0) === "j1")
    // greedy-free [^"]* closes MSG at the first quote
    assert(rows(0).getString(1) === "note EXTRA=")
    assert(rows(0).getString(2) === "OK")
  }
}
