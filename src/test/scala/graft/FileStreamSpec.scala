package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.Pipelines

/** End-to-end: the streaming tumbling-count pipeline over a parquet
  * file source produces exactly the batch result on the same data —
  * the batch-equivalence claim behind §2G, exercised through a real
  * `readStream` file source, not MemoryStream. */
class FileStreamSpec extends SparkSpec {

  test("file-source streaming tumbling counts == batch on sf0.001") {
    val dir = Files.createTempDirectory("graft-stream").toFile
    try {
      val events = graft.sources.Tables.events(spark, sf0001)
        .select(timestamp_micros(col("ts_us")).as("ts"),
          col("user_id"), col("event_type"), col("value"))
      events.write.mode("overwrite").parquet(dir.getAbsolutePath)
      val stream = spark.readStream
        .schema(events.schema)
        .parquet(dir.getAbsolutePath)
      val q = Pipelines.tumblingCounts(stream)
        .writeStream.format("memory").queryName("file_tumbling")
        .outputMode("complete").start()
      try {
        q.processAllAvailable()
        val streamed = spark.table("file_tumbling")
          .select(col("win_start"), col("event_type"), col("n"))
          .collect().map(_.toString).sorted
        val batch = events
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(col("window.start").as("win_start"), col("event_type"),
            col("n"))
          .collect().map(_.toString).sorted
        assert(streamed.nonEmpty)
        assert(streamed === batch)
      } finally q.stop()
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
  }

  test("streaming JSON ingest quarantines corrupt lines == batch audit") {
    import graft.operators.LogAnalytics
    val dir = Files.createTempDirectory("graft-jsonstream").toFile
    try {
      // same fixture recipe as ingest_json_audit: every event_id
      // ≡ 0 mod 97 line truncated → malformed
      val events = graft.sources.Tables.events(spark, sf0001)
      LogAnalytics.jsonLinesFixture(events)
        .write.mode("overwrite").text(dir.getAbsolutePath)
      val stream = spark.readStream
        .schema(LogAnalytics.JsonIngestSchema)
        .json(dir.getAbsolutePath)
      val q = LogAnalytics.jsonQuarantineStage(stream)
        .writeStream.format("memory").queryName("json_quarantine")
        .outputMode("complete").start()
      try {
        q.processAllAvailable()
        val streamed = spark.table("json_quarantine")
          .collect().map(_.toString).sorted
        val batch = LogAnalytics.jsonQuarantineStage(
            spark.read.schema(LogAnalytics.JsonIngestSchema)
              .json(dir.getAbsolutePath))
          .collect().map(_.toString).sorted
        assert(streamed.nonEmpty)
        assert(streamed === batch)
        // the quarantine bucket is present and holds exactly the
        // truncated lines
        val corrupt = spark.table("json_quarantine")
          .filter(col("event_type") === "_corrupt")
          .collect().map(_.getLong(1)).headOption
        val expected = events
          .filter(pmod(col("event_id"), lit(97)) === 0).count()
        assert(corrupt === Some(expected),
          s"corrupt bucket $corrupt != truncated-line count $expected")
      } finally q.stop()
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
  }
}
