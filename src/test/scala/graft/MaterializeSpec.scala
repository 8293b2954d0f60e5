package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.ops.Materialize

/** The materialized-output surface must round-trip exactly AND produce
  * the layout its scale story claims: partition pruning in the read
  * plan, disjoint sorted files within a partition, shuffle-free joins
  * from the bucketed layout. */
class MaterializeSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("out").toString

  private def rm(path: String): Unit = {
    def go(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(go)); f.delete()
    }
    go(new java.io.File(path).getParentFile)
  }

  test("survivorCorpus round-trips: row parity with dedup survivors") {
    val path = tmp("graft-mat-surv")
    try {
      Materialize.survivorCorpus(spark, sf0001, path)
      val back = spark.read.parquet(path)
      val expected = Dedup.exactSurvivors(spark, sf0001).collect()
        .map(_.getLong(0)).toSet
      val got = back.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got === expected, "read-back doc_ids != survivor set")
      // the split partition column survives the directory round-trip
      val splits = back.select("split").distinct().collect()
        .map(_.getString(0)).toSet
      assert(splits.subsetOf(Set("train", "valid", "test")) && splits("train"))
    } finally rm(path)
  }

  test("partitioned write prunes partitions and sorts within files") {
    val path = tmp("graft-mat-prune")
    try {
      Materialize.survivorCorpus(spark, sf0001, path)
      // (a) partition pruning: the split filter must reach the scan's
      // PartitionFilters (directory-level pruning, not a post-scan filter)
      val filtered = spark.read.parquet(path)
        .filter(col("split") === "valid").select("doc_id")
      val plan = filtered.queryExecution.explainString(FormattedMode)
      val pf = "PartitionFilters: \\[[^\\]]*split[^\\]]*\\]".r
        .findFirstIn(plan)
      assert(pf.isDefined, s"split filter not pushed to partitions:\n$plan")
      // (b) each data file within a partition holds a SORTED doc_id run
      // and files are disjoint ranges (repartitionByRange + sort) — the
      // precondition for row-group min/max pruning
      val trainFiles = Option(
        new java.io.File(s"$path/split=train").listFiles).get
        .filter(_.getName.endsWith(".parquet")).map(_.toString)
      assert(trainFiles.nonEmpty)
      val ranges = trainFiles.map { f =>
        val ids = spark.read.parquet(f).select("doc_id").collect()
          .map(_.getLong(0))
        assert(ids.sameElements(ids.sorted), s"unsorted file $f")
        (ids.head, ids.last)
      }.sortBy(_._1)
      ranges.sliding(2).foreach {
        case Array((_, hi), (lo, _)) =>
          assert(hi < lo, "file doc_id ranges overlap")
        case _ =>
      }
    } finally rm(path)
  }

  test("bucketed write joins without an exchange on the bucket key") {
    val path = tmp("graft-mat-bucket")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe =
      spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", prev)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      Materialize.bucketed(Materialize.survivorFrame(spark, sf0001),
        "surv_b", path, "doc_id", 8, Seq("doc_id"))
      val t = spark.table("surv_b")
      val joined = t.select("doc_id", "lang")
        .join(t.select(col("doc_id"), col("n_chars")), "doc_id")
      assert(joined.count() ===
        Dedup.exactSurvivors(spark, sf0001).count())
      val plan = joined.queryExecution.explainString(FormattedMode)
        .split("== Initial Plan ==")(0)
      val shuffles = """(?<!Broadcast)Exchange \(\d+\)""".r
        .findAllIn(plan).length
      assert(shuffles === 0,
        s"bucketed self-join should plan no exchange:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prevAqe)
      spark.sql("DROP TABLE IF EXISTS surv_b")
      rm(path)
    }
  }

  test("ivfIndex materializes a cell-pruned index + tiny centroids") {
    val path = tmp("graft-mat-ivf")
    try {
      Materialize.ivfIndex(spark, sf0001, path)
      val idx = spark.read.parquet(s"$path/index")
      val cents = spark.read.parquet(s"$path/centroids")
      val n = graft.sources.Tables.embeddings(spark, sf0001).count()
      assert(idx.count() === n, "index must cover every vector")
      assert(cents.count() <= 256, "coarse quantizer stays metadata-sized")
      // probing one cell reads a pruned fraction via PartitionFilters
      val cid0 = idx.select("cid").limit(1).collect()(0).getInt(0)
      val probe = idx.filter(col("cid") === cid0)
      val plan = probe.queryExecution.explainString(FormattedMode)
      assert("PartitionFilters: \\[[^\\]]*cid[^\\]]*\\]".r
        .findFirstIn(plan).isDefined,
        s"cid filter not pushed to partitions:\n$plan")
      assert(probe.count() < n, "one cell must be a strict subset")
    } finally rm(path)
  }
}
