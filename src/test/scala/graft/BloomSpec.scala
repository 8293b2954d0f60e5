package graft

import graft.operators.TextAnalysis

/** Compensating spec for the rows-only `bloom_decontaminate`: Bloom
  * membership has strictly one-sided error, so the sketch's flags must
  * be a SUPERSET of the exact operator's (a clear position can never
  * lie ⇒ no false negatives), per-doc maybe-counts must dominate exact
  * shared-counts, and with the default 2²⁰-slot sketch the
  * false-positive surplus at test SF must be zero. A deliberately
  * starved sketch (512 slots for ~6k positions) is then forced to
  * produce false positives — and the superset invariant must STILL
  * hold, pinning that the only failure mode is over-flagging. */
class BloomSpec extends SparkSpec {

  private def flags(df: org.apache.spark.sql.DataFrame,
      flagCol: String, nCol: String): Map[Long, Long] =
    df.collect().map(r => r.getAs[Long]("doc_id") ->
      (if (r.getAs[Int](flagCol) > 0) r.getAs[Long](nCol) else -1L))
      .toMap

  test("default sketch: superset of exact, zero FP surplus at sf0.001") {
    val exact = TextAnalysis.decontaminate(spark, sf0001)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_shared_5grams"), r.getAs[Int]("contaminated")))
    val bloom = TextAnalysis.bloomDecontaminate(spark, sf0001)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_maybe_5grams"), r.getAs[Int]("contaminated_bloom")))
    assert(exact.map(_._1).toSeq == bloom.map(_._1).toSeq,
      "same doc universe in the same order")
    val byDoc = bloom.map(t => t._1 -> t).toMap
    exact.foreach { case (id, nShared, cont) =>
      val (_, nMaybe, contB) = byDoc(id)
      assert(nMaybe >= nShared,
        s"doc $id: bloom maybe-count $nMaybe < exact shared-count $nShared")
      assert(contB >= cont, s"doc $id: bloom missed an exact contamination")
    }
    val exactFlagged = exact.count(_._3 == 1)
    val bloomFlagged = bloom.count(_._3 == 1)
    assert(bloomFlagged == exactFlagged,
      s"default 2^20-slot sketch should add no FP flags at sf0.001: " +
        s"exact=$exactFlagged bloom=$bloomFlagged")
  }

  test("starved sketch over-flags but never under-flags") {
    val exactSet = TextAnalysis.decontaminate(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("contaminated") === 1)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    spark.conf.set("graft.bloom.bits", "512")
    try {
      val bloomSet = TextAnalysis.bloomDecontaminate(spark, sf0001)
        .filter(org.apache.spark.sql.functions
          .col("contaminated_bloom") === 1)
        .collect().map(_.getAs[Long]("doc_id")).toSet
      assert(exactSet.subsetOf(bloomSet),
        s"one-sided error violated: exact-only docs " +
          s"${(exactSet -- bloomSet).toSeq.sorted.take(5)}")
      assert(bloomSet.size > exactSet.size,
        "512 slots for ~6k positions must produce false positives — " +
          "if not, the sketch isn't actually being consulted")
    } finally spark.conf.unset("graft.bloom.bits")
  }
}
