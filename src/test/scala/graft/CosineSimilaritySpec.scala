package graft

import org.apache.spark.sql.functions._
import graft.ops.Fns
import graft.plans.GraftFunctions

class CosineSimilaritySpec extends SparkSpec {

  test("native expression matches declarative fold bit-for-bit") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.5f, -0.25f, 8.0f), Array(-1.5f, 2.5f, 0.125f)),
      (Array(1.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f))
    ).toDF("a", "b")
    val rows = df.select(
      call_function(GraftFunctions.CosineName, col("a"), col("b")).as("native"),
      Fns.cosine(Fns.asDouble(col("a")), Fns.asDouble(col("b"))).as("hof"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    assert(rows(2).getDouble(0) === 1.0)
  }

  test("handles double arrays and nulls") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0, 0.0)), Some(Array(0.0, 1.0))),
      (None, Some(Array(1.0, 1.0)))
    ).toDF("a", "b")
    val out = df.select(call_function(GraftFunctions.CosineName,
      col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) === 0.0)
    assert(out(1).isNullAt(0))
  }

  test("mismatched-length arrays yield null, not a truncated score") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0))).toDF("a", "b")
    val out = df.select(
      call_function(GraftFunctions.CosineName, col("a"), col("b")).as("c"),
      Fns.cosine(col("a"), col("b")).as("hof")).collect()
    assert(out(0).isNullAt(0)) // native
    assert(out(0).isNullAt(1)) // declarative form agrees (null padding)
  }

  test("several instances in one codegen stage compile (freshName locals)") {
    GraftFunctions.register(spark)
    graft.plans.SignatureFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0), Array(2.0, 1.0), Array(3L, 4L)))
      .toDF("a", "b", "hs")
    // two cosines + minhash + simhash in a single projection: bare local
    // names would janino-fail ("Redefinition of local variable") and
    // silently fall back to interpreted eval
    val r = df.select(
      call_function(GraftFunctions.CosineName, col("a"), col("b")).as("c1"),
      call_function(GraftFunctions.CosineName, col("b"), col("a")).as("c2"),
      call_function(graft.plans.SignatureFunctions.MinHashName, col("hs"))
        .as("mh"),
      call_function(graft.plans.SignatureFunctions.SimHashName, col("hs"))
        .as("sh")).collect()
    assert(r(0).getDouble(0) === r(0).getDouble(1))
    assert(r(0).getSeq[Long](2).length === 128)
  }

  test("works on real embeddings against oracle-formula SQL") {
    GraftFunctions.register(spark)
    val e = graft.sources.Tables.embeddings(spark, sf0001).limit(20)
    val viaExpr = e.as("a").crossJoin(e.as("b"))
      .select(call_function(GraftFunctions.CosineName,
        col("a.embedding"), col("b.embedding")).as("c"))
      .collect().map(_.getDouble(0))
    val viaHof = e.as("a").crossJoin(e.as("b"))
      .select(Fns.cosine(Fns.asDouble(col("a.embedding")),
        Fns.asDouble(col("b.embedding"))).as("c"))
      .collect().map(_.getDouble(0))
    viaExpr.zip(viaHof).foreach { case (x, y) =>
      assert(java.lang.Double.doubleToLongBits(x) ===
        java.lang.Double.doubleToLongBits(y))
    }
  }
}
