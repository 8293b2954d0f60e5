package graft

import graft.operators.{Dedup, LogAnalytics}

/** The approx/LSH scale paths must stay close to their exact
  * counterparts on test data — catches a silently broken sketch or a
  * bucketing bug that exactness checks can't see (rows-only keys). */
class ApproxSpec extends SparkSpec {

  test("approx percentiles within 10% of exact") {
    val exact = LogAnalytics.percentiles(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = LogAnalytics.percentilesApprox(spark, sf0001).collect()
    approx.foreach { r =>
      val (p50, p90) = exact(r.getString(0))
      assert(math.abs(r.getDouble(1) - p50) <= 0.1 * p50 + 1.0)
      assert(math.abs(r.getDouble(2) - p90) <= 0.1 * p90 + 1.0)
    }
  }

  test("approx daily active within 5% of exact") {
    val exact = LogAnalytics.dailyActive(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    LogAnalytics.dailyActiveApprox(spark, sf0001).collect().foreach { r =>
      val e = exact(r.getLong(0)).toDouble
      assert(math.abs(r.getLong(1) - e) <= 0.05 * e + 2.0,
        s"day ${r.getLong(0)}: approx ${r.getLong(1)} vs exact $e")
    }
  }

  test("embedding LSH pairs are a subset of exact cosine pairs") {
    val exact = Dedup.embeddingCosine(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingLsh(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"non-verified pairs: ${lsh -- exact}")
    assert(lsh.nonEmpty, "LSH path found no pairs (recall collapse)")
  }
}
