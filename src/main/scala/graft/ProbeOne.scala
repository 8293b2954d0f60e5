package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev tool: run one query repeatedly and report, per rep, the
  * scheduler-side shape — jobs, stages, tasks, summed task wall — so
  * driver/barrier overhead separates from executor compute (guide §7:
  * a query whose wall ≫ task-time/cores is stage-round-bound, and the
  * fix is fewer exchanges/jobs, not faster per-row code).
  * Usage: runMain graft.ProbeOne <name>[,<name>…] [sfDir] [reps]
  */
object ProbeOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("GRAFT_PROBE_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null)
          taskMs.addAndGet(t.taskInfo.duration)
      }
    })
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { r =>
        jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener events drain asynchronously; settle before reading
        Thread.sleep(300)
        println(f"[probe] $name rep$r: wall=$wall%.2f s jobs=${jobs.get}" +
          f" stages=${stages.get} tasks=${tasks.get}" +
          f" taskSum=${taskMs.get / 1e3}%.2f s ($n rows)")
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
