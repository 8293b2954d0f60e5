package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print one query's AQE-finalized formatted plan (the text
  * [[Explain]] writes per-query, without running all of them).
  * Usage: runMain graft.ExplainOne <name> [sfDir]
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir =
      if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect() // finalize AQE
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
