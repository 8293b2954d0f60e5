package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: one coherent latency table for the SERVING-side query
  * family (the round-6 verdict's ask #8). For each query it reports
  *
  *  - `cold` — the first invocation in the JVM. For `*_from_index`
  *    paths this INCLUDES the one-time index materialization
  *    ([[graft.ops.BuildOnce]]), i.e. the price a deployment pays once
  *    per index generation;
  *  - `steady` — min over the following reps, the per-request latency a
  *    resident serving session observes (index built, code JIT-warm).
  *
  * In-query twins (`bm25_topk`, `phrase_search`, `ann_*_topk`) are
  * included for contrast: their steady-state ≈ cold because they
  * recompute the index every call — exactly the gap the from-index
  * matrix exists to close. Output is the markdown table pasted into
  * docs/DEPLOY.md §"Serving latency"; re-run with
  *
  *   sbt "runMain graft.ServeBench [sfDir] [reps]"
  */
object ServeBench {

  /** (query, family) — family groups the table rows. */
  val Served: Seq[(String, String)] = Seq(
    "ann_bruteforce_topk" -> "vector (exact baseline)",
    "ann_ivf_topk" -> "vector (in-query build)",
    "ann_pq_topk" -> "vector (in-query build)",
    "ann_ivfpq_topk" -> "vector (in-query build)",
    "ann_ivf_from_index" -> "vector (from index)",
    "ann_pq_from_index" -> "vector (from index)",
    "ann_ivfpq_from_index" -> "vector (from index)",
    "ann_pq_rerank" -> "vector (from index)",
    "ann_sq_topk" -> "vector (in-query build)",
    "ann_sq_from_index" -> "vector (from index)",
    "bm25_topk" -> "lexical (in-query build)",
    "phrase_search" -> "lexical (in-query build)",
    "bm25_from_index" -> "lexical (from index)",
    "phrase_from_index" -> "lexical (from index)",
    "snippet_extract" -> "lexical (in-query build)",
    "mmr_diversify" -> "re-rank (post-retrieval)",
    "dedup_minhash_lsh" -> "dedup (in-query build)",
    "dedup_minhash_from_index" -> "dedup (from index)",
    "dedup_clusters" -> "dedup (in-query CC loop)",
    "dedup_clusters_from_index" -> "dedup (from index)",
    "feature_pit_join" -> "features (in-query build)",
    "feature_pit_from_index" -> "features (from index)",
    "stream_feature_snapshot" -> "features (snapshot view)")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"| query | family | cold s | steady s |")
    println(s"|---|---|---|---|")
    Served.foreach { case (name, family) =>
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val steady = times.drop(1).min
      println(f"| $name | $family | ${times.head}%.2f | $steady%.2f |")
    }
    spark.stop()
  }
}
