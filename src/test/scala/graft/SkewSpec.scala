package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew

/** Skew handling: the salting helpers must be result-identical to their
  * naive forms, actually spread the hot key, and AQE must split a
  * skewed sort-merge join at runtime (the first-line defense the
  * SURVEY §5 contract claims). */
class SkewSpec extends SparkSpec {

  /** 50k rows, 90% on key 0, payload varies per row. */
  private def skewedBig = spark.range(0, 50000).select(
    when(col("id") % 10 === 0, col("id") % 100).otherwise(lit(0L)).as("k"),
    col("id").as("payload"))

  private def smallDim = spark.range(0, 100).select(
    col("id").as("k"), concat(lit("dim"), col("id")).as("name"))

  test("saltedJoin equals the plain join and spreads the hot key") {
    val plain = skewedBig.join(smallDim, "k")
      .agg(count(lit(1)), sum("payload")).collect()(0)
    val salted = Skew.saltedJoin(skewedBig, smallDim, "k", 8)
    val sagg = salted.agg(count(lit(1)), sum("payload")).collect()(0)
    assert(sagg.getLong(0) === plain.getLong(0))
    assert(sagg.getLong(1) === plain.getLong(1))
    assert(!salted.columns.contains("__graft_salt"))
    // the join keys really include the salt (the skew split is in the
    // plan, not just the data)
    assert(salted.queryExecution.executedPlan.toString
      .contains("__graft_salt"))
    // hot key 0 occupies 8 distinct salt buckets pre-join
    val buckets = skewedBig
      .withColumn("s", pmod(xxhash64(col("k"), col("payload")), lit(8L)))
      .filter(col("k") === 0).select("s").distinct().count()
    assert(buckets === 8L)
  }

  test("spreadDuplicates salts identical rows across buckets") {
    // a hot key whose rows are IDENTICAL: content hashing puts them all
    // in one salt bucket; the ordinal salt spreads them
    val dups = spark.range(0, 1000)
      .select(lit(0L).as("k"), lit(7L).as("payload"))
    val byContent = dups
      .withColumn("s", Skew.bigSalt(dups, 8, spreadDuplicates = false))
      .select("s").distinct().count()
    val byOrdinal = dups
      .withColumn("s", Skew.bigSalt(dups, 8, spreadDuplicates = true))
      .select("s").distinct().count()
    assert(byContent === 1L)
    assert(byOrdinal === 8L)
    // results stay identical to the plain join under either salt
    val plain = dups.join(smallDim, "k").count()
    assert(Skew.saltedJoin(dups, smallDim, "k", 8,
      spreadDuplicates = true).count() === plain)
  }

  test("saltedCountDistinct equals exact countDistinct") {
    val df = skewedBig.withColumn("v", col("payload") % 1000)
    val exact = df.groupBy("k").agg(countDistinct("v").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCountDistinct(df, "k", "v", 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted === exact)
  }

  test("AQE splits the skewed partition of a sort-merge join") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // AQE has its OWN broadcast threshold and will convert the SMJ to
      // a broadcast join from runtime stats unless it is also disabled
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB") {
      val j = skewedBig.join(smallDim, "k")
      j.collect() // execute THIS plan so AQE finalizes it
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"no skew split in final plan:\n${plan.take(1500)}")
    }
  }
}
