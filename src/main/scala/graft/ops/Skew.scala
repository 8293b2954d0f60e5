package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for the two places a hot key hurts at 100 TB:
  * a skewed shuffle join and a skewed aggregation.
  *
  * First line of defense is AQE's runtime skew-join split
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default and pinned by
  * PlanAuditSpec's skew test) — it needs no code changes and reacts to
  * the ACTUAL runtime sizes. These helpers are for the cases AQE cannot
  * fix: a skewed aggregation (AQE never splits a hash-agg group) and
  * plans where the skewed join sits under an operator AQE won't
  * restructure. Salting is a static 1→n key split: deterministic,
  * planner-visible, works in any Spark deployment.
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Equi-join `big ⋈ small` on `key`, with the big side's hot keys
    * spread over `buckets` salt partitions and the small side replicated
    * `buckets`× (explode of a literal range — the replication happens
    * executor-side, no driver loop). Result equals the plain inner join
    * (salt is dropped); the shuffle distributes each hot key over
    * `buckets` reducers instead of one.
    *
    * The default salt is a deterministic hash of the big side's full
    * row, so retried tasks salt identically (a `rand()` salt breaks
    * recomputation idempotency) — but exact duplicate rows then all
    * share one salt, so a hot key whose rows are IDENTICAL (null/default
    * payloads, a common real skew shape) gets no spreading while still
    * paying the small-side replication. For that shape pass
    * `spreadDuplicates = true`: the salt becomes a per-row ordinal
    * (`monotonically_increasing_id` = partition id ‖ in-partition
    * ordinal), which spreads identical rows uniformly. Join RESULTS are
    * identical under any salt (every salt value joins the full
    * replicated small side); the ordinal is only reproducible when the
    * big side is a deterministic scan-rooted plan — downstream of a
    * shuffle, a recomputed partition may re-salt differently, which
    * affects per-bucket balance on retry, never correctness.
    * Replication multiplies the small side's shuffle volume by
    * `buckets` — size it as hot-key-rows / target-partition-rows, not
    * "big". */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      buckets: Int, spreadDuplicates: Boolean = false): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val b = big.withColumn(SaltCol, bigSalt(big, buckets, spreadDuplicates))
    val sm = small.withColumn(SaltCol,
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    b.join(sm, Seq(key, SaltCol)).drop(SaltCol)
  }

  /** The big side's salt column — package-visible so SkewSpec can pin
    * the spreading behavior directly. */
  private[graft] def bigSalt(big: DataFrame, buckets: Int,
      spreadDuplicates: Boolean): org.apache.spark.sql.Column =
    if (spreadDuplicates)
      pmod(monotonically_increasing_id(), lit(buckets.toLong))
    else
      pmod(xxhash64(big.columns.map(col): _*), lit(buckets.toLong))

  /** Skew-safe exact count-distinct. Algebraic aggregates (sum/count/
    * min/max) are already skew-immune — map-side partial aggregation
    * collapses a hot group before the shuffle — but exact
    * `countDistinct` is not: the hot key's whole distinct set funnels
    * into one reducer. Salting by the VALUE hash fixes it exactly:
    * distinct values of each key are partitioned across `buckets`
    * disjoint salt groups (a value always lands in the same bucket, so
    * nothing is double-counted), counted per bucket, then summed per
    * key. Second shuffle: `buckets` rows per key. */
  def saltedCountDistinct(df: DataFrame, key: String, valueCol: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    df.groupBy(col(key),
        pmod(xxhash64(col(valueCol)), lit(buckets.toLong)).as(SaltCol))
      .agg(countDistinct(col(valueCol)).as("__pd"))
      .groupBy(col(key))
      .agg(sum("__pd").as(s"n_distinct_$valueCol"))
  }
}
