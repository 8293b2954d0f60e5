package graft

import graft.operators.Similarity

/** Compensating invariants for the rows-only `pca_power_topcomp`:
  * the eigen identity itself (residual against the SAME exact-integer
  * Gram the query accumulates), unit norm, dominance over every
  * coordinate variance (cross-checked against the oracle-passing
  * `embedding_dim_stats`), canonical sign, and determinism. */
class PcaSpec extends SparkSpec {

  test("top component satisfies the eigen identity on the exact Gram") {
    val (gm, _) = Similarity.gramMatrix(spark, sf0001)
    val dim = gm.length
    val rows = Similarity.pcaPowerTopcomp(spark, sf0001).collect()
    assert(rows.length == dim)
    val v = rows.sortBy(_.getInt(0)).map(_.getLong(1).toDouble / 1e6)
    // unit norm on the grid (floor loses ≤ 1e-6 per component)
    val nrm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(nrm - 1.0) < 1e-3, s"‖v‖ = $nrm")
    // residual ‖Gv − λv‖ ≤ 1% λ — power iteration actually converged
    val gv = Array.tabulate(dim)(i =>
      (0 until dim).map(j => gm(i)(j) * v(j)).sum)
    val lambda = (0 until dim).map(i => v(i) * gv(i)).sum
    val resid = math.sqrt(
      (0 until dim).map(i => math.pow(gv(i) - lambda * v(i), 2)).sum)
    assert(resid <= 0.01 * lambda,
      s"residual $resid vs lambda $lambda — not converged")
    // canonical sign: the largest-|loading| component is positive
    val top = v.maxBy(math.abs)
    assert(top > 0, "sign convention broken")
  }

  test("eigen-variance dominates every per-dimension variance") {
    val eigVarE6 = Similarity.pcaPowerTopcomp(spark, sf0001)
      .collect().head.getLong(2)
    val maxDimVarE6 = Similarity.embeddingDimStats(spark, sf0001)
      .collect().map(_.getLong(3) / 1000000L).max
    // λ_max ≥ max_i Σ_ii for any PSD matrix; both sides in 1e-6 units
    assert(eigVarE6 + 1 >= maxDimVarE6,
      s"top eigenvalue $eigVarE6 below a coordinate variance $maxDimVarE6")
    val ppm = Similarity.pcaPowerTopcomp(spark, sf0001)
      .collect().head.getLong(3)
    assert(ppm > 0 && ppm <= 1000000L, s"explained share out of range: $ppm")
  }

  test("pca output is deterministic across runs") {
    val a = Similarity.pcaPowerTopcomp(spark, sf0001).collect()
    val b = Similarity.pcaPowerTopcomp(spark, sf0001).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }
}
