package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Semantics pins for the Pareto-skyline sweep: the two-level running
  * min must reproduce the textbook NOT-EXISTS definition exactly,
  * including the tie cases where the sweep form is easiest to get
  * wrong (equal points co-survive; equal-price-worse-size dies). */
class SkylineSpec extends SparkSpec {

  private def skyOf(rows: Seq[(Long, Double, Int)]) = {
    import spark.implicits._
    Relational.skylineOf(rows.toDF("p_partkey", "p_retailprice", "p_size")
        .withColumn("pc",
          expr("cast(round(p_retailprice * 100) as bigint)")))
      .collect().map(_.getLong(0)).toSet
  }

  test("tie semantics: identical points co-survive, dominated ties die") {
    // (1, 2) twice: neither dominates the other -> both survive.
    // same price worse size dies; cheaper-but-bigger survives (tradeoff);
    // strictly dominated dies.
    val sky = skyOf(Seq(
      (1L, 2.0, 2), (2L, 2.0, 2), // identical pair: co-survive
      (3L, 2.0, 3), // same price, worse size: dominated by 1/2
      (4L, 1.0, 5), // cheaper but bigger: survives (tradeoff)
      (5L, 3.0, 2), // pricier, same size as 1/2: dominated
      (6L, 1.0, 1) // dominates everything except nothing dominates it
    ))
    assert(sky === Set(6L),
      "(1,1) dominates every other point incl. the (2,2) ties")
    val sky2 = skyOf(Seq(
      (1L, 2.0, 2), (2L, 2.0, 2), (3L, 2.0, 3), (4L, 1.0, 5)))
    assert(sky2 === Set(1L, 2L, 4L),
      "identical tradeoff points must co-survive with the cheaper-bigger one")
  }

  test("sweep equals brute-force NOT-EXISTS on the sf0.001 part table") {
    val got = Relational.queries("skyline_pareto")(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    val parts = graft.sources.Tables.part(spark, sf0001)
      .select("p_partkey", "p_retailprice", "p_size").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val brute = parts.filter { case (_, p, s) =>
      !parts.exists { case (_, qp, qs) =>
        qp <= p && qs <= s && (qp < p || qs < s)
      }
    }.map(_._1).toSet
    assert(got === brute, "sweep skyline != brute-force skyline")
    assert(got.nonEmpty, "degenerate: empty skyline")
  }
}
