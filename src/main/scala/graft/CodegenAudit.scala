package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run every query with whole-stage-codegen fallback disabled so
  * any expression that fails to compile (normally a silent fall-back to
  * interpreted eval + a guava LocalCache error in the logs) surfaces as a
  * hard failure naming the query. Usage:
  *
  *   sbt "runMain graft.CodegenAudit [sfDir]"
  */
object CodegenAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.fallback", "false")
      // also surface non-whole-stage codegen failures (projection /
      // predicate generators normally fall back to interpreted silently)
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var failed = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).count()
        println(s"CODEGEN-OK $name")
      } catch {
        case e: Throwable =>
          failed += 1
          println(s"CODEGEN-FAIL $name: ${e.getClass.getSimpleName}: " +
            s"${String.valueOf(e.getMessage).linesIterator.take(3).mkString(" | ")}")
      }
    }
    println(s"== codegen audit: $failed failures ==")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
