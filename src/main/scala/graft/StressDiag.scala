package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: per-STAGE timing for one query on a K×-scaled stress
  * corpus — pinpoints where wall time goes when shuffle bytes say the
  * work is linear but the clock disagrees. Usage:
  *
  *   sbt "runMain graft.StressDiag <query> [K] [sfDir]"
  *
  * Prints every completed stage: duration, task count, shuffle
  * read/write, and the call-site line the stage was submitted from.
  */
object StressDiag {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val k = if (args.length > 1) args(1).toInt else 16
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = ArrayBuffer[(Int, Long, Int, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val si = ev.stageInfo
        val m = si.taskMetrics
        val dur = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        stages.synchronized {
          stages += ((si.stageId, dur, si.numTasks,
            if (m != null) m.shuffleReadMetrics.totalBytesRead else 0L,
            if (m != null) m.shuffleWriteMetrics.bytesWritten else 0L,
            si.name.take(120)))
        }
      }
    })

    val dir = graft.ops.Scratch.dir(s"stressdiag-x$k")
    val base = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text")
    val copies = (0 until k).map { i =>
      val tag = "q" + ('a' + i).toChar
      base.select(
        (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        regexp_replace(col("text"), "([a-z]+)", tag + "$1").as("text"),
        lit(s"src$i").as("source"))
        .withColumn("lang", lit("xx"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    // cpus-many files, as in Stress: a 1-file corpus makes every
    // CPU-heavy scan a single task and the diagnosis measures packing
    copies.reduce(_ unionAll _).repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // embeddings too (same recipe as Stress) so the ANN suite is
    // diagnosable on the identical scaled corpus
    spark.range(0, k * 5000).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), j =>
          ((pmod(xxhash64(col("id"), j), lit(2000L)) - 1000L)
            .cast("double") / 1000.0).cast("float")).as("embedding"),
        pmod(col("id"), lit(10L)).as("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // relational tables: same K×-fact / fixed-dim recipe as Stress, so
    // the TPC-H heavy hitters are diagnosable on the identical corpus
    def scaleFact(name: String, keyCol: String): Unit = {
      val t = graft.sources.Tables.table(spark, sfDir, name)
      (0 until k).map(i =>
          t.withColumn(keyCol, col(keyCol) + lit(i.toLong * 1000000000L)))
        .reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    scaleFact("orders", "o_orderkey")
    scaleFact("lineitem", "l_orderkey")
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      graft.sources.Tables.table(spark, sfDir, t)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    (0 until k).map(i => ev
        .withColumn("event_id", col("event_id") + lit(i.toLong * 1000000000L))
        .withColumn("user_id", col("user_id") + lit(i.toLong * 1000000000L)))
      .reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    stages.synchronized(stages.clear())
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(spark, dir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    System.err.println(f"== $name: $wall%.2f s wall, $n rows ==")
    stages.synchronized {
      stages.sortBy(-_._2).foreach { case (id, dur, nt, sr, sw, nm) =>
        System.err.println(f"stage $id%4d ${dur / 1000.0}%8.2f s " +
          f"$nt%4d tasks ${sr / 1048576.0}%8.1f MiB read " +
          f"${sw / 1048576.0}%8.1f MiB written  $nm")
      }
    }
    spark.stop()
  }
}
