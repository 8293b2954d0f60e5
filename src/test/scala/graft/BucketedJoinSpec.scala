package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** Proof of the §5 co-location story: pre-bucketing both fact tables
  * on the join key lets Spark plan a SortMergeJoin with NO Exchange on
  * either side — at 100 TB this is the difference between a one-time
  * layout cost and re-shuffling every query. */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed orders x lineitem join plans without a shuffle") {
    val wh = Files.createTempDirectory("graft-warehouse")
    // warehouse.dir is a static conf; explicit per-table paths below.
    // Disable auto-broadcast so the tiny test tables exercise the
    // sort-merge path that bucketing co-locates at real scale.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe =
      spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", prev)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      graft.sources.Tables.orders(spark, sf0001)
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"${wh.toUri}/orders_b")
        .saveAsTable("orders_b")
      graft.sources.Tables.lineitem(spark, sf0001)
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"${wh.toUri}/lineitem_b")
        .saveAsTable("lineitem_b")
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"))
      val n = joined.collect().map(_.getLong(1)).sum
      assert(n > 0)
      val plan = joined.queryExecution.explainString(FormattedMode)
        .split("== Initial Plan ==")(0)
      val joinShuffles =
        """(?<!Broadcast)Exchange \(\d+\)""".r.findAllIn(plan).length
      // one exchange for the final groupBy is allowed; the join itself
      // must be co-located (no exchange under the SortMergeJoin)
      assert(plan.contains("SortMergeJoin"),
        s"expected SortMergeJoin over bucketed tables:\n$plan")
      assert(joinShuffles <= 1,
        s"bucketed join should not shuffle join inputs ($joinShuffles):\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prevAqe)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(wh.toFile)
    }
  }
}
