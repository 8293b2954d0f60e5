package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed loaders for the driver-generated star schema.
  *
  * Scale notes: every loader is a plain parquet scan so Catalyst can push
  * filters and prune columns into the scan (verify via `PushedFilters` /
  * `ReadSchema` in `.explain("formatted")`). On a real cluster these would
  * be partitioned/bucketed tables; at 100 TB the fact tables (`lineitem`,
  * `orders`, `events`) shuffle on their join/agg keys and the dimension
  * tables (`region`, `nation`, `supplier`, `part`, `customer`) stay
  * broadcast-able.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** The parsed job-log table. The driver data carries parquet
    * TIMESTAMP(NANOS) which Spark's schema INFERENCE rejects
    * ([PARQUET_TYPE_ILLEGAL]) — so this reader supplies the schema
    * explicitly with `ts` as BIGINT and inference never runs: the
    * vectorized reader happily decodes the INT64 ns values into a long
    * column. This is reader-scoped — no session conf is touched, other
    * readers in the same session are unaffected. (The alternatives were
    * tried: `.option("nanosAsLong", true)` is NOT honored by Spark
    * 4.1's inference path, and the former session-wide
    * `spark.sql.legacy.parquet.nanosAsLong` leaked into every reader.)
    * We derive `ts_us` (µs, truncating div) — bit-identical to DuckDB's
    * ns→µs truncation on the same file, so oracle SQL can use
    * `epoch_us(ts)`.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING")
      .parquet(s"$dir/events.parquet")
      .withColumn("ts_us", expr("ts div 1000"))

  /** All table names this schema ships. */
  val Names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view so the whole surface is
    * reachable from plain `spark.sql(...)` — together with
    * `spark.sql.extensions=graft.plans.GraftExtensions` this gives a
    * SQL-only user the full engine (tables + native functions) with no
    * Scala API calls. `events` registers with the derived `ts_us`
    * column (the ns-safe time handle every query should use). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    Names.foreach {
      case "events" => events(spark, dir).createOrReplaceTempView("events")
      case n => table(spark, dir, n).createOrReplaceTempView(n)
    }
}
