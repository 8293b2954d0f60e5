package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Plan-audit tool: dumps `.explain("formatted")` for every query so
  * shuffle counts, PushedFilters, ReadSchema pruning, and
  * WholeStageCodegen spans can be reviewed (SURVEY.md §5 contract).
  *
  * Usage: runMain graft.Explain <sfDir> <outDir>
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val summary = new StringBuilder
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.collect() // materialize THIS plan so AQE finalizes it (codegen ids)
        val full = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/$name.txt"), full)
        // operator counts from the AQE final-plan TREE only (the
        // echoed initial plan would double-count); codegen ids come
        // from the shared details section (distinct ids)
        val tree = full.split("== Initial Plan ==")(0)
        val nShuffles =
          """(?<!Broadcast)Exchange \(\d+\)""".r.findAllIn(tree).length
        val nBroadcast =
          """BroadcastExchange \(\d+\)""".r.findAllIn(tree).length
        val nCodegen = """\[codegen id : \d+\]""".r.findAllIn(full)
          .toSeq.distinct.length
        summary.append(f"$name%-28s shuffles=$nShuffles%2d " +
          f"broadcasts=$nBroadcast%2d codegenSpans=$nCodegen%2d\n")
      } catch {
        case e: Throwable =>
          summary.append(s"$name FAILED: ${e.getMessage}\n")
      }
    }
    Files.writeString(Paths.get(s"$outDir/SUMMARY.txt"), summary.toString)
    print(summary)
    spark.stop()
  }
}
