package graft

import org.apache.spark.sql.functions._
import graft.plans.{Mix64, SignatureFunctions}

class SignaturesSpec extends SparkSpec {

  test("minhash signature: interpreted == codegen, set-order invariant") {
    SignatureFunctions.register(spark)
    import spark.implicits._
    val a = Seq(1L, 2L, 3L, 99L)
    val df = Seq((a, a.reverse)).toDF("x", "y")
    val row = df.select(
      call_function(SignatureFunctions.MinHashName, col("x")),
      call_function(SignatureFunctions.MinHashName, col("y"))).collect()(0)
    val s1 = row.getSeq[Long](0)
    val s2 = row.getSeq[Long](1)
    assert(s1.length === 128)
    assert(s1 === s2) // order-invariant over the set
    // spot-check against the scala-side mixer
    val seed0 = Mix64.mix(0L)
    assert(s1.head === a.map(h => Mix64.mix(h ^ seed0)).min)
  }

  test("simhash signature: majority bit votes") {
    SignatureFunctions.register(spark)
    import spark.implicits._
    // two identical hashes: every bit of the result equals that hash
    val h = 0x0123456789ABCDEFL
    val df = Seq((Seq(h, h), Seq(h, ~h))).toDF("same", "tied")
    val row = df.select(
      call_function(SignatureFunctions.SimHashName, col("same")),
      call_function(SignatureFunctions.SimHashName, col("tied"))).collect()(0)
    assert(row.getLong(0) === h)
    assert(row.getLong(1) === 0L) // ties resolve to 0 bits
  }

  test("minhash-union aggregate: union(sig(A), sig(B)) == sig(A ∪ B)") {
    SignatureFunctions.register(spark)
    import spark.implicits._
    val a = (1 to 40).map(i => Mix64.mix(i.toLong))
    val b = (30 to 70).map(i => Mix64.mix(i.toLong))
    val c = (500 to 520).map(i => Mix64.mix(i.toLong))
    // group 1 = {A, B, C} as three rows; direct = one row with A∪B∪C
    val grouped = Seq((1, a), (1, b), (1, c)).toDF("g", "hs")
      .select(col("g"),
        call_function(SignatureFunctions.MinHashName, col("hs")).as("sig"))
      .groupBy("g")
      .agg(call_function(SignatureFunctions.MinHashUnionName, col("sig"))
        .as("usig"))
      .collect()(0).getSeq[Long](1)
    val direct = Seq(Tuple1((a ++ b ++ c).distinct))
      .toDF("hs")
      .select(call_function(SignatureFunctions.MinHashName, col("hs")))
      .collect()(0).getSeq[Long](0)
    assert(grouped.length === 128)
    assert(grouped === direct)
  }

  test("minhash-union: null rows are skipped, empty group = identity") {
    SignatureFunctions.register(spark)
    import spark.implicits._
    val a = Seq(5L, 6L, 7L)
    val df = Seq((1, Some(a)), (1, None), (2, None))
      .toDF("g", "hs")
      .select(col("g"),
        when(col("hs").isNotNull,
          call_function(SignatureFunctions.MinHashName, col("hs"))).as("sig"))
      .groupBy("g")
      .agg(call_function(SignatureFunctions.MinHashUnionName, col("sig"))
        .as("usig"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val direct = Seq(Tuple1(a)).toDF("hs")
      .select(call_function(SignatureFunctions.MinHashName, col("hs")))
      .collect()(0).getSeq[Long](0)
    assert(df(1) === direct)
    assert(df(2).forall(_ == Long.MaxValue))
  }

  test("minhash-union: wrong-length input throws, never corrupts buffer") {
    SignatureFunctions.register(spark)
    import spark.implicits._
    // graft_minhash_union is SQL-exposed: an arbitrary-length
    // array<bigint> must fail cleanly at its first update instead of
    // writing null into the non-nullable 128-long buffer
    val df = Seq((1, Seq(1L, 2L, 3L))).toDF("g", "sig")
    val ex = intercept[Exception] {
      df.groupBy("g")
        .agg(call_function(SignatureFunctions.MinHashUnionName, col("sig")))
        .collect()
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(msgs.contains("length mismatch"), s"unexpected failure: $msgs")
  }

  test("similar token sets yield close simhashes, dissimilar far") {
    SignatureFunctions.register(spark)
    import spark.implicits._
    val base = (1 to 50).map(i => Mix64.mix(i.toLong))
    val near = base.drop(2) ++ Seq(Mix64.mix(1000L), Mix64.mix(1001L))
    val far = (100 to 150).map(i => Mix64.mix(i.toLong))
    val df = Seq((base, near, far)).toDF("a", "b", "c")
    val row = df.select(
      call_function(SignatureFunctions.SimHashName, col("a")),
      call_function(SignatureFunctions.SimHashName, col("b")),
      call_function(SignatureFunctions.SimHashName, col("c"))).collect()(0)
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(row.getLong(0), row.getLong(1)) <
      ham(row.getLong(0), row.getLong(2)))
  }
}
