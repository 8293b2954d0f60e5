package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions registration path: a user who sets
  * `spark.sql.extensions=graft.plans.GraftExtensions` must get every
  * native function in plain SQL with no imperative register() call —
  * this is how the library plugs into a cluster they don't control
  * (spark-submit --conf), so it needs its own end-to-end proof. */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions loads all graft native functions") {
    // separate session: the point is that NOTHING calls register().
    // getOrCreate() would hand back another suite's active session (and
    // skip extension application), so detach default/active first — the
    // new session reuses the JVM's SparkContext but gets ITS OWN
    // sessionState built through GraftExtensions. NB spark.sql.extensions
    // is a STATIC conf: it must be on the SparkContext (SparkSpec sets
    // it, as spark-submit --conf would); a builder config on a reused
    // context is ignored.
    val oldDefault = SparkSession.getDefaultSession
    val oldActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val row = s.sql(
        """SELECT
          |  graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
          |  graft_minhash_sig(array(1L, 2L, 3L)) AS mh,
          |  graft_simhash_sig(array(1L, 1L)) AS sh
          |""".stripMargin).collect()(0)
      assert(row.getDouble(0) === 1.0)
      assert(row.getSeq[Long](1).length === 128)
      // the aggregate registers too
      val agg = s.sql(
        """SELECT graft_minhash_union(sig) FROM (
          |  SELECT graft_minhash_sig(array(1L, 2L)) AS sig
          |  UNION ALL SELECT graft_minhash_sig(array(2L, 3L)))
          |""".stripMargin).collect()(0)
      assert(agg.getSeq[Long](0).length === 128)
      // the SQL-only user path: views + native functions, zero Scala API
      graft.sources.Tables.registerViews(s, "/root/testdata/sf0.001")
      val sqlOnly = s.sql(
        """SELECT d.doc_id,
          |  graft_minhash_sig(array(xxhash64(d.text))) IS NOT NULL AS ok
          |FROM documents d ORDER BY d.doc_id LIMIT 3""".stripMargin)
        .collect()
      assert(sqlOnly.length === 3 && sqlOnly.forall(_.getBoolean(1)))
    } finally {
      // restore the shared session WITHOUT stopping the JVM-wide
      // SparkContext other suites are using
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      oldDefault.foreach(SparkSession.setDefaultSession)
      oldActive.foreach(SparkSession.setActiveSession)
    }
  }
}
