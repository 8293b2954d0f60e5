package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-stress harness for the dedup/ANN suite: synthesizes a K×-scaled
  * corpus from the sf0.1 testdata and measures the operators on it, so
  * the "would this hold at 100× the rows" claim is a measured CURVE,
  * not an asserted plan shape. Usage:
  *
  *   sbt "runMain graft.Stress [K] [sfDir]"     # default K=4, sf0.1
  *
  * Run at K = 1, 4, 16 and read docs/STRESS.md for the recorded curve.
  *
  * Measured per query: wall seconds, result rows, and SHUFFLE BYTES
  * (read+written, via a stage-metrics listener) — shuffle volume is the
  * quantity that blows up first when an operator hides quadratic work,
  * and it is hardware-independent, so its growth ratio across K is the
  * portable receipt. For the two LSH operators the raw CANDIDATE-PAIR
  * counts are also recorded: candidates ∝ n·bands (not n²) is the exact
  * claim the band-bucket design makes.
  *
  * Scaling construction (deterministic, no RNG):
  *  - documents: K namespaced copies — every token is prefixed with a
  *    per-copy letter tag (regexp on word boundaries), so copies share
  *    ZERO shingles: the result is K independent corpora in one table,
  *    and the near-dup structure (planted pairs, df distribution shape)
  *    scales exactly linearly. Appending identical copies instead would
  *    make every doc a K-clique of its clones — a quadratic artifact
  *    the real pipeline never sees.
  *  - embeddings: K×n fresh vectors with components derived from
  *    xxhash64(vec_id, component) — uniform in [-1, 1), which preserves
  *    the "random directions, low pairwise cosine" regime of the
  *    original table.
  *
  * Emits one JSON line with per-query seconds/rows/shuffle bytes.
  */
object Stress {
  /** Doc-id namespace stride between the K scaled copies — ONE named
    * constant shared by the corpus builder, the echo offset, and the
    * delta-refresh cut so the three can never drift: a stride change
    * in one place would otherwise silently cut the old/new boundary
    * mid-copy and measure a different batch than documented. */
  val CopyStride = 10000000L

  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(4)
    val sfDir =
      if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the receipts below call package-private stages directly (e.g.
    // hyperplaneCandidates → the cosine expression) — register the
    // custom functions up front so a delta-sweep subset that skips
    // every self-registering query still resolves them
    graft.plans.GraftFunctions.register(spark)

    // stage-level shuffle accounting; reset around each measurement
    val shuffleBytes = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val m = ev.stageInfo.taskMetrics
        if (m != null) {
          shuffleBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    // measurement hygiene: queries are independent jobs in production,
    // but in ONE sweep JVM each query's localCheckpoint blocks
    // (hundreds of MB at 16×, MEMORY_AND_DISK) would otherwise pile up
    // until storage memory saturates and later queries pay eviction +
    // GC — measured as 3-5× wall inflation with UNCHANGED shuffle
    // bytes (the giveaway that it was the harness, not the operator).
    // ONE definition, called after every measured action AND after
    // un-measured setup work (artifact builds) — two inline copies of
    // the ritual could drift
    def hygiene(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      Thread.sleep(400) // let the listener bus drain stage events
    }
    def measure(tag: String)(action: => Long): (Double, Long, Long) = {
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val rows = action
      val sec = (System.nanoTime() - t0) / 1e9
      hygiene()
      val sb = shuffleBytes.get()
      System.err.println(
        f"[stress] $tag%-24s $sec%7.2f s  ${sb / 1048576.0}%8.1f MiB shuffle  ($rows rows)")
      (sec, rows, sb)
    }

    val dir = graft.ops.Scratch.dir(s"stress-x$k")
    val base = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text")
    val nBase = base.count()
    val copies = (0 until k).map { i =>
      val tag = "q" + ('a' + i).toChar // letters only: a digit would
      // split the token under the [^a-z]+ tokenizer
      base.select(
        (col("doc_id") + lit(i.toLong * CopyStride)).as("doc_id"),
        regexp_replace(col("text"), "([a-z]+)", tag + "$1").as("text"),
        lit(s"src$i").as("source"))
        .withColumn("lang", lit("xx"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    // repartition before write: a K-copy union otherwise lands as K
    // parquet files (1 at K=1), and the driver testdata is a single
    // sub-128MB file either way — so every CPU-heavy scan (tokenize,
    // shingle, winnow) would run as ONE task and the curve would
    // measure packing, not the operator. A real cluster reads
    // thousands of splits; cpus-many files model that here.
    copies.reduce(_ unionAll _).repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val nVecs = k * 5000
    spark.range(0, nVecs).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), j =>
          ((pmod(xxhash64(col("id"), j), lit(2000L)) - 1000L)
            .cast("double") / 1000.0).cast("float")).as("embedding"),
        pmod(col("id"), lit(10L)).as("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    // relational fact scaling: K orderkey-offset copies of orders +
    // lineitem (each copied order keeps its own basket under a fresh
    // orderkey — basket sizes and join fan-outs stay constant, row
    // volume scales exactly K×); dims (customer/supplier/part/nation/
    // region) are fixed, as at a real site where facts grow and
    // reference data doesn't — per-customer/supplier activity thus
    // grows K×, which is the skew direction that stresses the
    // partitioned windows and semi/anti joins
    val keyOff = 1000000000L
    def scaleFact(name: String, keyCol: String): Unit = {
      val t = graft.sources.Tables.table(spark, sfDir, name)
      (0 until k).map(i =>
          t.withColumn(keyCol, col(keyCol) + lit(i.toLong * keyOff)))
        .reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    scaleFact("orders", "o_orderkey")
    scaleFact("lineitem", "l_orderkey")
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      graft.sources.Tables.table(spark, sfDir, t)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    // events: K user-offset copies (event ids re-keyed too) — user
    // count grows K×, per-user timeline density stays constant: the
    // organic growth direction for sessionization and the stream-
    // stream interval join (whose state is per-user). ts round-trips
    // as the raw ns BIGINT (Tables.events re-derives ts_us).
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    (0 until k).map(i => ev
        .withColumn("event_id", col("event_id") + lit(i.toLong * keyOff))
        .withColumn("user_id", col("user_id") + lit(i.toLong * keyOff)))
      .reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    // the lexical retrieval terms must exist in the tag-prefixed
    // synthetic vocabulary: one query-term set per copy tag, so
    // per-term df stays 1/K of docs and total term-row volume scales
    // exactly K× (query volume per sub-corpus constant)
    spark.conf.set(graft.operators.Retrieval.QTermsConf,
      (0 until k).map(i => "q" + ('a' + i).toChar)
        .flatMap(t => graft.operators.Retrieval.QTerms.map(t + _))
        .mkString(","))

    // optional 3rd arg: comma-separated subset (delta sweeps for newly
    // added operators without re-running the recorded full curve)
    val queries = if (args.length > 2) args(2).split(",").toSeq
    else Seq(
      "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
      "dedup_simhash", "dedup_clusters", "dedup_source_minhash",
      "dedup_embedding_lsh", "dedup_incremental", "ann_ivf_topk",
      "ann_lsh_topk", "text_tfidf_top_terms", "text_normalize",
      "text_decontaminate", "text_repetition", "text_pack_sequences",
      "materialize_survivors", "dedup_span_flags", "text_bigram_lm_score",
      "text_token_entropy", "cluster_kmeans",
      "dedup_containment", "dedup_cross_source_rate",
      "neardup_degree_dist", "dedup_best_survivor", "dedup_token_savings",
      "quality_logit_score", "mixture_resample", "mixture_upsample",
      "dedup_semantic", "dedup_semantic_incremental",
      "basket_part_pairs", "window_decile_spend", "q9_product_profit",
      "q21_waiting_supplier",
      "merge_upsert", "neardup_pagerank", "neardup_triangles",
      "skew_key_stats",
      "stream_interval_join", "ann_pq_topk",
      "bm25_topk", "bm25_from_index", "phrase_from_index",
      "rrf_fusion", "knn_classify", "text_chunk",
      "ann_ivfpq_topk",
      "logreg_quality_train", "logreg_quality_apply", "bpe_merges",
      "quality_threshold_sweep", "stream_contamination_hits",
      "embedding_int8_quantize", "sample_fixed_per_source",
      "text_winnow_fingerprint", "phrase_search", "snippet_extract",
      "mmr_diversify", "ann_range_search", "feature_hash_bow",
      "cluster_source_mixture", "agg_incremental_refresh",
      "stream_stateful_sessions", "quality_score_calibration",
      "knn_eval_confusion", "bpe_apply", "ann_index_upsert",
      "curation_overlap", "vocab_drift", "corpus_build_manifest",
      "erasure_cascade_audit", "basket_lift", "neardup_quality_delta",
      "mm_resize_grid", "mm_phash_dedup", "cluster_silhouette",
      "ann_ivfpq_from_index",
      // round-7 additions (embedding_threshold_sweep excluded: it is
      // the guarded all-pairs oracle baseline, quadratic by contract)
      "compaction_plan", "event_paths_topk", "skyline_pareto",
      "seasonality_profile", "user_engagement_decay",
      "feature_pit_join", "feature_pit_from_index",
      "stream_feature_snapshot", "neardup_kcore", "cc_incremental",
      "active_learning_pick", "mixture_token_budget_plan",
      // round-7b additions (cluster_dbscan excluded: its pair stage is
      // the guarded all-pairs oracle baseline, quadratic by contract —
      // the scale path swaps in dedup_embedding_lsh candidates)
      "dedup_substring_runs", "minhash_tuning_curve", "log_ab_uplift",
      "stream_upsert_latest", "orders_forecast_ewma",
      // round-9 additions
      "dedup_jaccard_prefix", "nb_lang_apply", "mm_byte_entropy",
      "orders_dup_payment_audit", "log_attribution",
      "supplier_lead_trend", "retrieval_eval_recall", "ann_sq_topk",
      "join_view_delta_refresh",
      // round-15 additions
      "stream_vec_refresh_tick", "ann_ivf_tuning_curve",
      "ann_pq_tuning_curve", "index_compaction_plan")
    val results = queries.map { name =>
      val (sec, rows, sb) =
        measure(name)(SparkEntry.queries(name)(spark, dir).count())
      (name, sec, rows, sb)
    }
    // candidate-count receipts: the LSH designs' core claim is that the
    // pre-verification candidate volume grows ∝ n, never n²
    val (_, lshCands, _) = measure("minhash_lsh_candidates")(
      graft.operators.Dedup.minhashCandidateStage(spark, dir)._1.count())
    val (_, ngramCands, _) = measure("ngram_candidates")(
      graft.operators.Dedup.ngramCandidateStage(spark, dir)._1.count())
    // prefix-filter receipt: candidates from the rarest-⌊n/2⌋+1 prefix
    // index must grow ∝ n like the df-capped index's — but with ZERO
    // false negatives at any corpus (the completeness the cap trades
    // away); same stage the query itself verifies
    val (_, prefixCands, _) = measure("jaccard_prefix_candidates")(
      graft.operators.Dedup.jaccardPrefixStage(spark,
        graft.sources.Tables.documents(spark, dir)
          .select("doc_id", "text"))._2.count())
    // triangle-wedge receipt on a HUB-PLANTED graph (one mega-hub of
    // degree ~2000·K + a degree-≤3 chain — the boilerplate-template
    // shape the near-dup graph takes at corpus scale): the
    // degree-oriented enumeration must stay ~linear in K where the
    // middle-vertex join a naive pairs⋈pairs would run grows ~K²
    // (both counts recorded; the mid-vertex one is computed as
    // Σ_m deg_<(m)·deg_>(m) — no need to materialize the blow-up)
    // semantic-dedup receipt: intra-cell candidate pairs under the
    // PRODUCTION cell-size knob (cells ∝ n, target occupancy 256) must
    // grow ~K — the oracle-mode 256-cell cap would grow them ~K²/C
    spark.conf.set("graft.semantic.cellSize", "256")
    val (_, semCands, _) = measure("semantic_candidates_prod")(
      graft.operators.Dedup.semanticStage(spark, dir)._2.count())
    spark.conf.unset("graft.semantic.cellSize")
    // dbscan production receipt: under the occupancy-scaled plane
    // count (buckets ∝ n, the embeddingLsh rule) the hyperplane
    // candidate volume and the full production DBSCAN must grow ~K —
    // the guarded all-pairs oracle baseline would grow ~K²
    val dbPlanes =
      graft.ops.Fns.lshPlanes(spark, "graft.dbscan.lshPlanes", nVecs)
    spark.conf.set("graft.dbscan.lshPlanes", dbPlanes.toString)
    val (_, dbCands, _) = measure("dbscan_candidates_prod")(
      graft.operators.Dedup.hyperplaneCandidates(
        graft.sources.Tables.embeddings(spark, dir)
          .select("vec_id", "embedding"), nBands = 8, nPlanes = dbPlanes)
        .count())
    measure("cluster_dbscan_prod")(
      SparkEntry.queries("cluster_dbscan")(spark, dir).count())
    spark.conf.unset("graft.dbscan.lshPlanes")
    // phash hot-band receipt on a DEGENERATE corpus (every payload
    // identical — the blank-frame pile-up): all rows land in 4 band
    // buckets; the df-cap must report them and bound the candidate
    // join to ZERO surviving band rows, while the potential pair
    // volume (Σ df·(df−1)/2, computed from the dfs, never
    // materialized) records the quadratic blow-up that was avoided
    val nDeg = k * 5000L
    spark.range(0, nDeg)
      .select(col("id").as("doc_id"),
        lit("the same blank frame payload every single time").as("text"))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir-deg/documents.parquet")
    // both numbers read inside ONE measured action: measure()'s
    // hygiene pass unpersists localCheckpoint blocks afterwards, so a
    // second read of the stage frames would hit
    // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND (the hubPairs note)
    var phashAvoided = 0L
    val (_, phashSurvivors, _) = measure("phash_capped_band_rows") {
      val (bandedDeg, hotDeg) =
        graft.operators.Multimodal.phashBandStage(spark, s"$dir-deg")
      phashAvoided = hotDeg
        .agg(coalesce(sum(expr("df * (df - 1) div 2")), lit(0L)))
        .head().getLong(0)
      bandedDeg.count()
    }
    // cc_incremental working-set receipt: the contracted loop input
    // (touched super-nodes + contracted delta edges) must stay a small
    // fraction of the full graph at every K — the "untouched
    // components never enter the loop" claim, measured. The namespaced
    // K-copy corpus is DEGENERATE for this receipt (copies share zero
    // shingles, so the new half touches nothing — round-8's receipt
    // measured only the contracted-edge count), so the receipt runs on
    // an ECHO corpus: the K-copy base plus one exact-duplicate echo of
    // every 64th document, re-keyed ABOVE the split cut (offset 3·K·10⁷
    // keeps cut = (min+max)/2 strictly between base ids and echo ids).
    // Every echo is a genuine cross-cut near-dup, so the touched set is
    // the echoed components — a measured, nonzero working set to hold
    // against the TOTAL old-component population (untouched components
    // must dominate at every K).
    val echoOff = 3L * k * CopyStride
    graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text")
      .unionAll(graft.sources.Tables.documents(spark, dir)
        .filter(pmod(col("doc_id"), lit(64)) === 0)
        .select((col("doc_id") + lit(echoOff)).as("doc_id"), col("text")))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir-cc/documents.parquet")
    var ccContracted = 0L
    var ccOldComponents = 0L
    val (_, ccTouched, _) = measure("cc_inc_working_set") {
      val (touched, contracted, oldLabels) =
        graft.operators.Dedup.ccIncrementalStage(spark, s"$dir-cc")
      ccContracted = contracted.count()
      ccOldComponents =
        oldLabels.select("label").distinct().count()
      touched.count()
    }
    // artifact-mode receipt: with the previous cycle's labels
    // persisted (Materialize.ccLabelsOf over the old half — built
    // OUTSIDE the measurement: that cost belongs to the previous
    // cycle), the incremental run must skip both the old-half loop
    // and the old×old pair graph — wall AND shuffle must sit well
    // under the in-query derivation on the same echo corpus
    val ccDocs = graft.sources.Tables.documents(spark, s"$dir-cc")
    // the SAME split rule the query's in-query mode replays
    // (Dedup.idCut) — an inline copy here could silently drift and
    // publish a curve for a misaligned configuration
    val ccCut = graft.operators.Dedup.idCut(ccDocs)
    val ccOldPath = s"$dir-cc-oldlabels"
    graft.ops.Materialize.ccLabelsOf(spark,
      ccDocs.filter(col("doc_id") < ccCut).select("doc_id", "text"),
      ccOldPath, s"$dir-cc")
    // the build is NOT part of either measurement (it is the previous
    // cycle's cost) — hygiene so its checkpoint blocks and straggler
    // stage events cannot load the default-mode measurement below.
    // The measured action is a VALUE-LEVEL checksum, not a bare
    // count: cc_incremental emits one row per doc in both modes, so
    // counts are equal even if every cluster label diverged — the
    // checksum (order-insensitive sum of per-row hashes, mod-reduced
    // so the sum stays ANSI-safe up to ~10¹⁴ rows) is what actually
    // checks the published "output row-identical across modes" claim
    // where the modes could diverge (slice-vs-full df caps)
    hygiene()
    def ccChecksum(): Long =
      SparkEntry.queries("cc_incremental")(spark, s"$dir-cc")
        .agg(sum(pmod(xxhash64(col("doc_id"), col("cluster_id"),
          col("is_survivor")), lit(1000000007L))))
        .head().getLong(0)
    val (ccDefSec, ccDefChk, ccDefSb) =
      measure("cc_incremental_default")(ccChecksum())
    spark.conf.set("graft.cc.oldLabelsPath", ccOldPath)
    val (ccArtSec, ccArtChk, ccArtSb) =
      try measure("cc_incremental_artifact")(ccChecksum())
      finally spark.conf.unset("graft.cc.oldLabelsPath")
    require(ccDefChk == ccArtChk,
      s"artifact-mode cc_incremental output checksum $ccArtChk != " +
        s"default $ccDefChk — the modes diverged")
    // pair-graph artifact receipt (round 11): the six pair-consuming
    // graph metrics re-derive the verified pair frame per query in
    // default mode; with Materialize.pairGraph persisted once (built
    // OUTSIDE the measurement — the refresh cycle's cost, recorded
    // separately) and graft.dedup.pairsPath set, the six-query audit
    // must drop both wall and shuffle: the shingle scan + candidate
    // join runs ONCE per cycle, not once per consumer. The measured
    // action is a value-level checksum over all six outputs (the
    // cc_incremental receipt rule) so mode divergence fails loudly
    // instead of publishing a speedup for different answers.
    val pairPath = s"$dir-pairs-artifact"
    // measured (not just timed): the build's shuffle is the yardstick
    // the delta receipt below compares against
    val (pairBuildSec, _, pairBuildSb) = measure("pair_graph_build") {
      graft.ops.Materialize.pairGraph(spark, dir, pairPath)
      spark.read.parquet(pairPath).count()
    }
    val pairConsumers = Seq("neardup_degree_dist", "neardup_pagerank",
      "neardup_triangles", "neardup_kcore", "neardup_quality_delta",
      "dedup_cross_source_rate")
    def graphChecksum(): Long = pairConsumers.map { q =>
      val df = SparkEntry.queries(q)(spark, dir)
      // coalesce: sum over an empty output is NULL (the phashAvoided
      // rule) — an empty consumer must checksum as 0, not NPE hours in
      df.agg(coalesce(sum(pmod(xxhash64(df.columns.map(col): _*),
        lit(1000000007L))), lit(0L))).head().getLong(0)
    }.sum
    val (pairDefSec, pairDefChk, pairDefSb) =
      measure("graph_family_default")(graphChecksum())
    spark.conf.set("graft.dedup.pairsPath", pairPath)
    val (pairArtSec, pairArtChk, pairArtSb) =
      try measure("graph_family_pairs_artifact")(graphChecksum())
      finally spark.conf.unset("graft.dedup.pairsPath")
    require(pairDefChk == pairArtChk,
      s"pairs-artifact graph-family checksum $pairArtChk != default " +
        s"$pairDefChk — the modes diverged")
    // delta-refresh receipts (round 12): the artifact-boundary delta
    // writers' claim is compute ∝ batch, not corpus. Old artifact =
    // the first K-1 namespaced copies (built OUTSIDE the measurement —
    // the previous cycle's cost); batch = the LAST copy (nBase docs,
    // FIXED across K), so the measured delta-refresh wall must stay
    // ~flat across K while the full rebuild's grows ∝ K
    // (pair_graph_build_sec above IS the pair rebuild curve; the
    // lexical full build is measured here for its own curve). The one
    // corpus-proportional delta term is the merged artifact's
    // REWRITE of old rows — pure columnar I/O with no shingle/token
    // recompute, the price of a self-contained write-once output.
    // At K=1 there is no "previous copy": fall back to the midpoint
    // rule (the batch is then half the corpus — the K≥4 points carry
    // the flatness claim).
    val docsAll = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text")
    val deltaCut = if (k > 1) (k - 1).toLong * CopyStride
      else graft.operators.Dedup.idCut(docsAll)
    val oldSlice = docsAll.filter(col("doc_id") < deltaCut)
    graft.ops.Materialize.pairGraphOf(spark, oldSlice,
      s"$dir-pairdelta-old", dir)
    hygiene()
    val (pairDeltaSec, _, pairDeltaSb) = measure("pair_graph_delta") {
      graft.ops.Materialize.pairGraphDelta(spark, dir,
        s"$dir-pairdelta-old", s"$dir-pairdelta-new")
      spark.read.parquet(s"$dir-pairdelta-new").count()
    }
    // the quantity that IS ∝ batch: the delta-scoped candidate join's
    // volume (Σ df_prefix·df_prefix_new). With the batch pinned to one
    // copy, this must stay ~FLAT across K while the full join's
    // jaccard_prefix_candidates grows ∝ K — the separation between
    // "the join the delta avoids re-running" and the two disclosed
    // corpus-proportional floors (the df-order shingle scan, which
    // prefix completeness forces, and the merged-artifact rewrite,
    // pure columnar I/O)
    val (_, pairDeltaCands, _) = measure("pair_delta_candidates")(
      graft.operators.Dedup.jaccardPrefixStage(spark, docsAll,
        _.filter(col("doc_id") >= deltaCut))._2.count())
    graft.ops.Materialize.lexicalIndexOf(spark, oldSlice,
      s"$dir-lexdelta-old", dir)
    hygiene()
    val (lexFullSec, _, lexFullSb) = measure("lexical_index_full") {
      graft.ops.Materialize.lexicalIndexOf(spark, docsAll,
        s"$dir-lexfull", dir)
      spark.read.parquet(s"$dir-lexfull/postings").count()
    }
    val (lexDeltaSec, _, lexDeltaSb) = measure("lexical_index_delta") {
      graft.ops.Materialize.lexicalIndexDelta(spark, dir,
        s"$dir-lexdelta-old", s"$dir-lexdelta-new")
      spark.read.parquet(s"$dir-lexdelta-new/postings").count()
    }
    // append mode: ONLY the batch is written (plus vocabulary-sized
    // merged stats) — the one refresh whose wall must stay ~flat
    // across K (the merge writer's corpus-proportional rewrite is the
    // term it deletes); the count reads the batch generation alone
    val (lexAppendSec, _, lexAppendSb) = measure("lexical_index_append") {
      graft.ops.Materialize.lexicalIndexAppend(spark, dir,
        s"$dir-lexdelta-old", s"$dir-lexappend-new")
      spark.read.parquet(s"$dir-lexappend-new/postings").count()
    }
    // feature store: the natural boundary is temporal (a daily
    // refresh), so the batch here is the post-midpoint DAYS — user
    // volume in the batch grows ∝ K like the corpus (events scale by
    // users, not days); the receipt's claim is therefore the RATIO:
    // delta ≪ full at every K, because the old days' windows are
    // seeded from O(users) totals instead of re-aggregated
    val fsEv = graft.operators.Training.pitEvents(spark, dir)
    val fsB = fsEv.agg(min("day"), max("day")).head()
    val fsCut = (fsB.getLong(0) + fsB.getLong(1)) / 2
    graft.ops.Materialize.featureStoreOf(spark,
      fsEv.filter(col("day") <= fsCut), s"$dir-featdelta-old", dir)
    hygiene()
    val (featFullSec, _, featFullSb) = measure("feature_store_full") {
      graft.ops.Materialize.featureStore(spark, dir, s"$dir-featfull")
      spark.read.parquet(s"$dir-featfull/snapshots").count()
    }
    val (featDeltaSec, _, featDeltaSb) = measure("feature_store_delta") {
      graft.ops.Materialize.featureStoreDelta(spark, dir,
        s"$dir-featdelta-old", s"$dir-featdelta-new")
      spark.read.parquet(s"$dir-featdelta-new/snapshots").count()
    }
    // append mode: only the batch days' snapshots + O(users) totals
    // are written — the merge writer's history rewrite is deleted
    val (featAppendSec, _, featAppendSb) =
      measure("feature_store_append") {
        graft.ops.Materialize.featureStoreAppend(spark, dir,
          s"$dir-featdelta-old", s"$dir-featappend-new")
        spark.read.parquet(s"$dir-featappend-new/snapshots").count()
      }
    // signature append (round 13): bands/sigs are pure per-doc facts,
    // so the generation holds ONLY the batch — with the batch pinned
    // to one copy, wall AND shuffle must stay ~flat across K (the
    // batch-flat receipt the round-12 verdict asked for). The old
    // index build is untimed setup; the additive-provenance sanity
    // check below is the cheap value guard (DedupSpec pins full
    // row-identity at fixture SF).
    graft.ops.Materialize.minhashIndexOf(spark, oldSlice,
      s"$dir-mhappend-old", dir)
    hygiene()
    val (mhAppendSec, _, mhAppendSb) = measure("minhash_index_append") {
      graft.ops.Materialize.minhashIndexAppend(spark, dir,
        s"$dir-mhappend-old", s"$dir-mhappend-new")
      spark.read.parquet(s"$dir-mhappend-new/sigs").count()
    }
    require(graft.ops.ArtifactTag
        .readProps(spark, s"$dir-mhappend-new")("n_docs").toLong ==
      docsAll.count(),
      "minhash append-chain provenance lost docs vs the corpus")
    // vector-index append (round 14): a generation holds ONLY the
    // batch's frozen-quantizer assignments / frozen-codebook codes +
    // the ≤256-row centroid/codebook copy — with the batch pinned to
    // 5000 vectors, wall AND shuffle must stay ~flat across K while
    // the corpus grows K× (the minhash batch-flat claim, vector
    // edition). Base builds are untimed setup; MaterializeSpec pins
    // chain ≡ frozen-assign and compaction ≡ chain at fixture SF.
    val vecsAll = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding")
    val vecCut = if (k > 1) (k - 1).toLong * 5000L else 2500L
    val vecOld = vecsAll.filter(col("vec_id") < vecCut)
    graft.ops.Materialize.ivfIndexOf(spark, vecOld,
      s"$dir-ivfappend-old", dir)
    hygiene()
    val (ivfAppendSec, _, ivfAppendSb) = measure("ivf_index_append") {
      graft.ops.Materialize.ivfIndexAppend(spark, dir,
        s"$dir-ivfappend-old", s"$dir-ivfappend-new")
      spark.read.parquet(s"$dir-ivfappend-new/index").count()
    }
    require(graft.ops.ArtifactTag
        .readProps(spark, s"$dir-ivfappend-new")("n_vecs").toLong ==
      vecsAll.count(),
      "ivf append-chain provenance lost vectors vs the corpus")
    graft.ops.Materialize.pqIndexOf(spark, vecOld,
      s"$dir-pqappend-old", dir)
    hygiene()
    val (pqAppendSec, _, pqAppendSb) = measure("pq_index_append") {
      graft.ops.Materialize.pqIndexAppend(spark, dir,
        s"$dir-pqappend-old", s"$dir-pqappend-new")
      spark.read.parquet(s"$dir-pqappend-new/codes").count()
    }
    // vector refresh TICK (round 15): the streaming ingest loop's
    // whole foreachBatch body — marker-guarded landing into the table
    // of record + one frozen generation per family + head flip —
    // measured with the batch PINNED (last copy's 5000 vectors) while
    // the corpus grows K×. The tick composes the two batch-flat
    // appends above plus one parquet append of the batch, so shuffle
    // must stay ~flat across K (wall carries the admissions' old-
    // slice scan, the appends' documented slow term). Setup untimed:
    // a tick corpus holding the old slice, g0 IVF+PQ builds.
    val tickDir = s"$dir-vectick"
    vecOld.write.mode("overwrite")
      .parquet(s"$tickDir/embeddings.parquet")
    val tickState = graft.streaming.Pipelines.initVecRefresh(spark,
      tickDir, s"$tickDir-chain")
    hygiene()
    val tickBatch = vecsAll.filter(col("vec_id") >= vecCut)
    val (vecTickSec, _, vecTickSb) = measure("vec_refresh_tick") {
      graft.streaming.Pipelines.vecRefreshTick(tickState)(tickBatch, 0L)
      spark.read.parquet(s"$tickDir-chain/ivf-g1/index").count()
    }
    require(graft.ops.ArtifactTag.readProps(spark,
        tickState.head("ivf"))("n_vecs").toLong == vecsAll.count(),
      "vec tick chain provenance lost vectors vs the corpus")
    // value-level cross-check: the delta artifacts must equal the full
    // builds they claim row-identity with (the graphChecksum rule —
    // a speedup for different answers must fail loudly here, not in
    // some later consumer)
    def fileChecksum(path: String, cols: Seq[String]): Long = {
      val df = spark.read.parquet(path)
      df.agg(coalesce(sum(pmod(xxhash64(cols.map(col): _*),
        lit(1000000007L))), lit(0L))).head().getLong(0)
    }
    require(fileChecksum(s"$dir-pairdelta-new",
        Seq("a_id", "b_id", "inter", "na", "nb")) ==
      fileChecksum(pairPath, Seq("a_id", "b_id", "inter", "na", "nb")),
      "pair delta artifact diverged from the full pair build")
    require(fileChecksum(s"$dir-lexdelta-new/postings",
        Seq("tok", "doc_id", "dl", "tf")) ==
      fileChecksum(s"$dir-lexfull/postings",
        Seq("tok", "doc_id", "dl", "tf")),
      "lexical delta postings diverged from the full index build")
    // the append CHAIN (old generation ∪ batch generation) must carry
    // the same rows as the merged rebuild — the checksum is an
    // order-insensitive sum, so chain value = Σ generation values
    require(fileChecksum(s"$dir-lexdelta-old/postings",
        Seq("tok", "doc_id", "dl", "tf")) +
      fileChecksum(s"$dir-lexappend-new/postings",
        Seq("tok", "doc_id", "dl", "tf")) ==
      fileChecksum(s"$dir-lexfull/postings",
        Seq("tok", "doc_id", "dl", "tf")),
      "append-chain postings diverged from the full index build")
    require(fileChecksum(s"$dir-featdelta-new/snapshots",
        Seq("user_id", "day", "n_events_prior", "n_purchases_prior",
          "value_centi_prior", "days_active_prior")) ==
      fileChecksum(s"$dir-featfull/snapshots",
        Seq("user_id", "day", "n_events_prior", "n_purchases_prior",
          "value_centi_prior", "days_active_prior")),
      "feature-store delta snapshots diverged from the full build")
    require(fileChecksum(s"$dir-featdelta-old/snapshots",
        Seq("user_id", "day", "n_events_prior", "n_purchases_prior",
          "value_centi_prior", "days_active_prior")) +
      fileChecksum(s"$dir-featappend-new/snapshots",
        Seq("user_id", "day", "n_events_prior", "n_purchases_prior",
          "value_centi_prior", "days_active_prior")) ==
      fileChecksum(s"$dir-featfull/snapshots",
        Seq("user_id", "day", "n_events_prior", "n_purchases_prior",
          "value_centi_prior", "days_active_prior")),
      "feature-store append chain diverged from the full build")
    // dup-payment organic receipt: the K-copy fact corpus above
    // multiplies every customer-day K× — a planted K-clique of TRUE
    // double-bills on every customer-day, so the audit's output there
    // is genuinely quadratic in K (it measures the planted corpus, not
    // operator overhead — the documents-scaling note's clique artifact,
    // fact edition). The receipt therefore scales in the ORGANIC
    // direction instead: K custkey-offset copies (customers grow K×,
    // per-customer same-day density constant) — suspect pairs and
    // shuffle must grow ∝ K
    val ordersBase = graft.sources.Tables.table(spark, sfDir, "orders")
    (0 until k).map(i => ordersBase
        .withColumn("o_orderkey", col("o_orderkey") + lit(i.toLong * keyOff))
        .withColumn("o_custkey", col("o_custkey") + lit(i.toLong * keyOff)))
      .reduce(_ unionAll _)
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir-dup/orders.parquet")
    val (_, dupPairsOrganic, _) = measure("dup_payment_pairs_organic")(
      SparkEntry.queries("orders_dup_payment_audit")(spark, s"$dir-dup")
        .count())
    // mrr probe-workload receipt: the probe panel is a fixed COUNT
    // (graft.mrr.nProbes, default 50), so the scored-pair volume must
    // follow the panel's query terms' postings — ~flat across K on the
    // namespaced corpus (each probe's terms match only its own copy's
    // docs), where the round-8 mod-50 RATE would have grown probes,
    // and with them candidate volume, ∝ K
    val (_, mrrScoredRows, _) = measure("mrr_scored_rows")(
      graft.operators.Retrieval.mrrScored(spark, dir).count())
    // kcore rounds receipt: h-index rounds-to-fixpoint must track the
    // densest component's coreness diameter, NOT corpus size — flat
    // across K on the namespaced-copy corpus
    var kcoreRounds = 0
    measure("kcore_rounds_to_fixpoint") {
      val (res, r) = graft.operators.Dedup.kcoreWithRounds(
        graft.operators.Dedup.ngramJaccard(spark, dir)
          .select("a_id", "b_id"), 30)
      kcoreRounds = r
      res.count()
    }
    // no persistence on hubPairs: measure()'s hygiene pass unpersists
    // every RDD between measurements, which would invalidate a
    // localCheckpoint before the second wedge receipt reads it
    // (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND — a checkpoint truncates
    // lineage, so unlike a plain persist it cannot recompute); the
    // frame is synthetic range math, trivially re-derivable
    val h = k * 2000
    val hub = (h / 2).toLong
    val hubPairs = spark.range(1, h + 1).filter(col("id") =!= hub)
      .select(least(col("id"), lit(hub)).as("a_id"),
        greatest(col("id"), lit(hub)).as("b_id"))
      .unionAll(spark.range(1, h)
        .select(col("id").as("a_id"), (col("id") + 1).as("b_id")))
      .distinct()
    val (_, wedgesOriented, _) = measure("triangle_wedges_oriented")(
      graft.operators.Dedup.triangleWedges(hubPairs).count())
    val (_, wedgesMid, _) = measure("triangle_wedges_midvertex")(
      hubPairs.groupBy(col("b_id").as("m")).agg(count(lit(1)).as("dl"))
        .join(hubPairs.groupBy(col("a_id").as("m"))
          .agg(count(lit(1)).as("dg")), "m")
        .agg(sum(col("dl") * col("dg")).as("w")).head().getLong(0))

    val qJson = results.map { case (n, s, r, sb) =>
      "\"" + n + "\":{\"sec\":" + s + ",\"rows\":" + r +
        ",\"shuffle_bytes\":" + sb + "}"
    }.mkString("{", ",", "}")
    println(s"""{"stress_scale":$k,"n_docs":${nBase * k},"n_vecs":$nVecs,""" +
      s""""lsh_candidates":$lshCands,"ngram_candidates":$ngramCands,""" +
      s""""jaccard_prefix_candidates":$prefixCands,""" +
      s""""triangle_wedges_oriented":$wedgesOriented,""" +
      s""""triangle_wedges_midvertex":$wedgesMid,""" +
      s""""semantic_candidates_prod":$semCands,""" +
      s""""dbscan_candidates_prod":$dbCands,""" +
      s""""dbscan_lsh_planes":$dbPlanes,""" +
      s""""phash_capped_band_rows":$phashSurvivors,""" +
      s""""phash_avoided_pairs":$phashAvoided,""" +
      s""""cc_inc_touched_supernodes":$ccTouched,""" +
      s""""cc_inc_contracted_edges":$ccContracted,""" +
      s""""cc_inc_old_components":$ccOldComponents,""" +
      s""""cc_inc_default_sec":$ccDefSec,""" +
      s""""cc_inc_default_shuffle":$ccDefSb,""" +
      s""""cc_inc_artifact_sec":$ccArtSec,""" +
      s""""cc_inc_artifact_shuffle":$ccArtSb,""" +
      s""""pair_graph_build_sec":$pairBuildSec,""" +
      s""""pair_graph_build_shuffle":$pairBuildSb,""" +
      s""""pair_delta_candidates":$pairDeltaCands,""" +
      s""""graph_family_default_sec":$pairDefSec,""" +
      s""""graph_family_default_shuffle":$pairDefSb,""" +
      s""""graph_family_artifact_sec":$pairArtSec,""" +
      s""""graph_family_artifact_shuffle":$pairArtSb,""" +
      s""""pair_delta_sec":$pairDeltaSec,""" +
      s""""pair_delta_shuffle":$pairDeltaSb,""" +
      s""""lexical_full_sec":$lexFullSec,""" +
      s""""lexical_full_shuffle":$lexFullSb,""" +
      s""""lexical_delta_sec":$lexDeltaSec,""" +
      s""""lexical_delta_shuffle":$lexDeltaSb,""" +
      s""""lexical_append_sec":$lexAppendSec,""" +
      s""""lexical_append_shuffle":$lexAppendSb,""" +
      s""""feature_full_sec":$featFullSec,""" +
      s""""feature_full_shuffle":$featFullSb,""" +
      s""""feature_delta_sec":$featDeltaSec,""" +
      s""""feature_delta_shuffle":$featDeltaSb,""" +
      s""""feature_append_sec":$featAppendSec,""" +
      s""""feature_append_shuffle":$featAppendSb,""" +
      s""""minhash_append_sec":$mhAppendSec,""" +
      s""""minhash_append_shuffle":$mhAppendSb,""" +
      s""""ivf_append_sec":$ivfAppendSec,""" +
      s""""ivf_append_shuffle":$ivfAppendSb,""" +
      s""""pq_append_sec":$pqAppendSec,""" +
      s""""pq_append_shuffle":$pqAppendSb,""" +
      s""""vec_tick_sec":$vecTickSec,""" +
      s""""vec_tick_shuffle":$vecTickSb,""" +
      s""""dup_payment_pairs_organic":$dupPairsOrganic,""" +
      s""""mrr_scored_rows":$mrrScoredRows,""" +
      s""""kcore_rounds":$kcoreRounds,""" +
      s""""queries":$qJson}""")
    spark.stop()
  }
}

/** Focused octave sweep for the DBSCAN production candidate curve —
  * round 8 measured 875k/3.96M/17.7M candidates at 1×/4×/16× (20.2×
  * at 16×, super-linear because the occupancy-constant plane rule
  * rounds DISCRETELY: planes = ⌈log₂(n/64)⌉ holds expected bucket
  * occupancy ~constant, but between rounding steps occupancy — and
  * with it candidates-per-row — can drift up to 2×). This main runs
  * ONLY the embedding synthesis + candidate count, so the curve can
  * be extended an octave (64×: 320k vectors) without re-running the
  * full corpus sweep: if the rule holds, candidates/row at 64× stays
  * within the same 2× occupancy band and the exponent is not
  * compounding. Usage: runMain graft.StressDbscan [K] */
object StressDbscan {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftFunctions.register(spark)
    val nVecs = k * 5000
    // the same deterministic synthesis as Stress's embeddings table
    val emb = spark.range(0, nVecs).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), j =>
        ((pmod(xxhash64(col("id"), j), lit(2000L)) - 1000L)
          .cast("double") / 1000.0).cast("float")).as("embedding"))
    // the PRODUCTION rule (Fns.lshPlanes: occupancy-constant with the
    // 24-plane cap), not an inline copy — the receipt must measure a
    // plane count production would actually run
    val planes =
      graft.ops.Fns.lshPlanes(spark, "graft.dbscan.lshPlanes", nVecs)
    val t0 = System.nanoTime()
    val cands = graft.operators.Dedup.hyperplaneCandidates(
      emb, nBands = 8, nPlanes = planes).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"stress_scale":$k,"n_vecs":$nVecs,""" +
      s""""dbscan_lsh_planes":$planes,"dbscan_candidates_prod":$cands,""" +
      s""""cands_per_row":${cands / nVecs},"sec":$sec}""")
    spark.stop()
  }
}
