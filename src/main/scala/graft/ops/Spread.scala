package graft.ops

import org.apache.spark.sql.DataFrame

/** Input-skew fix for CPU-heavy stages rooted at under-split scans
  * (optimization guide §2.5, "Input skew: one huge unsplittable file …
  * otherwise repartition immediately after the read").
  *
  * The driver's testdata ships each table as ONE parquet file with ONE
  * row group, so every scan is a single task and everything computed
  * before the first exchange — tokenize/shingle/hash a whole corpus,
  * argmin a vector table against broadcast centroids — serializes onto
  * one core while the other 31 idle (the `scripts/check.py` "task-packing
  * artifact" note, now fixed at the root instead of worked around in the
  * Stress harness). The same shape recurs at any scale wherever a stage
  * root is a single gzip'd file, a one-row-group parquet part, or a
  * materialized single-partition frame.
  *
  * [[Spread.apply]] round-robin-repartitions a frame to the session's
  * parallelism ONLY when it currently has fewer partitions — a
  * cluster-scale scan with hundreds of splits passes through untouched,
  * so this is an adaptation to degenerate inputs, not a local-mode
  * constant (`graft.scan.spreadParts` overrides the target; 0 disables).
  * The exchange it inserts moves the slim pre-compute rows (ids + text /
  * ids + vectors — bytes that were going to cross the next exchange
  * anyway), and round-robin with Spark's default sort-before-repartition
  * is deterministic under task retry. Only row-order-INVARIANT consumers
  * may sit downstream (aggregations, joins, per-row projections — every
  * use in this codebase); order-sensitive folds must keep their explicit
  * sort keys, never partition order.
  */
object Spread {

  /** Target-partition override (0 disables spreading entirely). */
  val PartsConf = "graft.scan.spreadParts"

  def apply(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    val target = s.conf.getOption(PartsConf).map(_.toInt)
      .getOrElse(s.sparkContext.defaultParallelism)
    if (target <= 1) df
    else if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
  }
}
