package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.Fns
import graft.plans.{GraftFunctions, Mix64, SignatureFunctions}

/** Property-based invariants for the native expressions — randomized
  * inputs catch the edge shapes hand-written cases miss (empty sets,
  * duplicate elements, extreme values). Each property batches its
  * random cases into ONE DataFrame so the whole suite stays a few
  * Spark jobs, not thousands. */
class PropertySpec extends SparkSpec {

  private val hashGen: Gen[Seq[Long]] =
    Gen.chooseNum(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Long.MinValue + 1, Long.MaxValue)))

  /** Seeded sampling: same cases every run (a flaky property test is
    * worse than none). */
  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val shuffler = new scala.util.Random(7)

  test("minhash: permutation-invariant; union = element-wise min") {
    SignatureFunctions.register(spark)
    import spark.implicits._
    val cases = sample(Gen.listOfN(40, Gen.zip(hashGen, hashGen)), 42L)
    val df = cases.zipWithIndex
      .map { case ((a, b), i) => (i, a, b, shuffler.shuffle(a)) }
      .toDF("i", "a", "b", "aShuffled")
    val rows = df.select(col("i"),
      call_function(SignatureFunctions.MinHashName, col("a")).as("sa"),
      call_function(SignatureFunctions.MinHashName, col("aShuffled"))
        .as("saShuf"),
      call_function(SignatureFunctions.MinHashName, col("b")).as("sb"),
      call_function(SignatureFunctions.MinHashName,
        array_union(col("a"), col("b"))).as("sUnion"))
      .collect()
    rows.foreach { r =>
      val sa = r.getSeq[Long](1)
      val saShuf = r.getSeq[Long](2)
      val sb = r.getSeq[Long](3)
      val sUnion = r.getSeq[Long](4)
      assert(sa === saShuf, "minhash must be input-order invariant")
      // sig(A ∪ B) = element-wise min — the LSH banding + the
      // MinHashUnion aggregate both rest on exactly this identity
      assert(sUnion === sa.zip(sb).map { case (x, y) => math.min(x, y) })
    }
  }

  test("minhash jaccard estimator tracks true jaccard on random sets") {
    SignatureFunctions.register(spark)
    import spark.implicits._
    // overlapping sets with known composition: shared ∪ ownA vs
    // shared ∪ ownB (disjoint own parts by sign namespace)
    val cases = (0 until 30).map { i =>
      val shared = (0 until 20 + i).map(j => Mix64.mix(j.toLong * 7 + 1))
      val ownA = (0 until 5 + i).map(j => Mix64.mix(-(j.toLong * 13 + 3)))
      val ownB = (0 until 15).map(j => Mix64.mix(1000000L + j * 31))
      (i, shared ++ ownA, shared ++ ownB,
        shared.size.toDouble / (shared.size + ownA.size + ownB.size))
    }
    val df = cases.toDF("i", "a", "b", "trueJ")
    val rows = df.select(col("trueJ"),
      call_function(SignatureFunctions.MinHashName, col("a")).as("sa"),
      call_function(SignatureFunctions.MinHashName, col("b")).as("sb"))
      .collect()
    val devs = rows.map { r =>
      val est = r.getSeq[Long](1).zip(r.getSeq[Long](2))
        .count { case (x, y) => x == y } / 128.0
      math.abs(est - r.getDouble(0))
    }
    assert(devs.max <= 0.25, s"estimator off: max dev ${devs.max}")
    assert(devs.sum / devs.length <= 0.08,
      s"estimator biased: mean dev ${devs.sum / devs.length}")
  }

  test("simhash: identical sets → hamming 0; disjoint sets uncorrelated") {
    SignatureFunctions.register(spark)
    import spark.implicits._
    val cases = sample(Gen.listOfN(40, hashGen), 43L)
    val df = cases.zipWithIndex
      .map { case (a, i) => (i, a, shuffler.shuffle(a)) }
      .toDF("i", "a", "aShuf")
    df.select(
      call_function(SignatureFunctions.SimHashName, col("a")).as("s1"),
      call_function(SignatureFunctions.SimHashName, col("aShuf")).as("s2"))
      .collect()
      .foreach(r => assert(r.getLong(0) === r.getLong(1),
        "simhash must be order-invariant"))
  }

  test("zip_min: commutative, associative, identity — the merge algebra") {
    // the MinHashUnion aggregate is only correct if its update/merge
    // expression is a commutative monoid over signatures with the
    // all-MaxValue buffer as identity; pin that algebra on random input
    import graft.plans.ZipMin
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    def lit128(xs: Seq[Long]) =
      Literal.create(xs.toArray, ArrayType(LongType, containsNull = false))
    def zm(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      ZipMin(lit128(a), lit128(b)).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
    val sigGen = Gen.listOfN(128,
      Gen.chooseNum(Long.MinValue + 1, Long.MaxValue))
    val cases = sample(Gen.listOfN(25,
      Gen.zip(sigGen, sigGen, sigGen)), 45L)
    val identity = Seq.fill(128)(Long.MaxValue)
    cases.foreach { case (a, b, c) =>
      assert(zm(a, b) === zm(b, a), "commutativity")
      assert(zm(zm(a, b), c) === zm(a, zm(b, c)), "associativity")
      assert(zm(a, identity) === a, "identity element")
      assert(zm(a, a) === a, "idempotence")
    }
  }

  test("cosine: native == declarative fold bitwise on random vectors") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val vecGen = Gen.listOfN(64,
      Gen.chooseNum(-1000, 1000).map(_ / 250.0f))
    val cases = sample(Gen.listOfN(50, Gen.zip(vecGen, vecGen)), 44L)
    val df = cases.map { case (a, b) => (a.toArray, b.toArray) }
      .toDF("a", "b")
    df.select(
      call_function(GraftFunctions.CosineName, col("a"), col("b"))
        .as("native"),
      Fns.cosine(Fns.asDouble(col("a")), Fns.asDouble(col("b"))).as("hof"))
      .collect()
      .foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
          java.lang.Double.doubleToLongBits(r.getDouble(1)),
          s"native ${r.getDouble(0)} != fold ${r.getDouble(1)}")
      }
  }
}
