package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {

  test("minhash-LSH pairs are a subset of exact jaccard pairs") {
    val exact = Dedup.ngramJaccard(spark, sf0001)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(spark, sf0001)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact),
      s"LSH produced non-verified pairs: ${lsh -- exact}")
    assert(lsh.nonEmpty)
  }

  test("simhash near-dup pairs have small hamming and a_id < b_id") {
    val rows = Dedup.simhash(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("a_id") < r.getAs[Long]("b_id"))
      assert(r.getAs[Int]("hamming") <= 3)
    }
  }

  test("cluster roots are cluster minima and pairs share clusters") {
    val labels = Dedup.clusters(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.ngramJaccard(spark, sf0001)
      .select("a_id", "b_id").collect()
    pairs.foreach { r =>
      assert(labels(r.getLong(0)) === labels(r.getLong(1)),
        s"pair ${r.getLong(0)},${r.getLong(1)} in different clusters")
    }
    labels.foreach { case (doc, root) => assert(root <= doc) }
    // roots are their own cluster id
    labels.values.toSet.foreach { root: Long =>
      assert(labels(root) === root)
    }
  }

  test("exact dedup survivors are unique and cover all distinct texts") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val nDistinctTexts = docs.select(countDistinct(md5(col("text"))))
      .collect()(0).getLong(0)
    val survivors = Dedup.exactSurvivors(spark, sf0001).collect()
    assert(survivors.length.toLong === nDistinctTexts)
    assert(survivors.map(_.getLong(0)).distinct.length === survivors.length)
  }
}
