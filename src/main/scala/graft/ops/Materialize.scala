package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The materialized-output surface. A training-data pipeline's product
  * is not a DataFrame — it is a LAID-OUT dataset on storage: the deduped
  * corpus partitioned by split, the ANN index partitioned by cell, the
  * co-location layout future joins reuse. These writers encode the three
  * layouts that matter at 100 TB:
  *
  *  - '''partitioned''' (+ sorted): directory-level partition pruning
  *    (a reader of `split=valid` or `cid IN (…)` never lists the other
  *    directories) and tight parquet row-group min/max stats for
  *    range/point reads within a file;
  *  - '''bucketed''': hash-bucket + sort by join key at write time, so
  *    every future join/agg on that key plans with NO exchange
  *    (BucketedJoinSpec shows the shuffle-free SortMergeJoin);
  *  - '''survivorCorpus / ivfIndex''': the two concrete products the
  *    dedup and similarity suites promise — written through the
  *    writers above so their scale story is real, not a doc comment.
  */
object Materialize {

  /** WRITE-ONCE guard for serving artifacts (round-9 advisor fix): an
    * in-place `mode("overwrite")` to a caller-supplied path DELETES
    * the directory — `_graft_corpus` sidecar included — before
    * rewriting, so a concurrent reader of a shared path can observe a
    * missing tag or half-written parquet. [[ArtifactTag]]'s
    * immutable-per-cycle discipline (refresh = NEW path + pointer
    * flip) was previously enforced only by scaladoc; this makes the
    * writer refuse an existing non-empty target, so path reuse fails
    * loudly at write time instead of racing readers. Scratch-rooted
    * artifacts are unaffected (fresh per-JVM temp root + BuildOnce's
    * once-per-path guard). */
  private def requireFresh(s: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    // ANY existing path fails — even an empty directory: the writers
    // split between path-direct (ccLabels, sqIndex — Spark's own
    // ErrorIfExists would refuse an empty pre-created dir with its
    // raw message) and subpath ($path/bands — which would silently
    // ACCEPT one), so without a uniform rule here the same
    // pre-created target is refused by one artifact kind and written
    // by another; and an existing-but-empty root is indistinguishable
    // from a half-deleted artifact, which write-once semantics must
    // treat as already-used
    require(!fs.exists(p),
      s"artifact target $path already exists — serving artifacts are " +
        "write-once per cycle (a refresh writes to a NEW path and " +
        "flips the conf pointer; overwriting in place races readers " +
        "of the old artifact). Pick a fresh path.")
  }

  /** Write `df` as partitioned + sorted parquet.
    *
    * `repartitionByRange` over (partitionCols ++ sortCols) gives every
    * writer task a contiguous slice of ONE partition value: write
    * parallelism stays at shuffle-partition width (a naive
    * `repartition(partitionCol)` funnels each partition value through a
    * single task — with 3 split values that is a 3-task write at any
    * corpus size), each output file lands in exactly one partition
    * directory (no small-file explosion from every task writing every
    * partition), and `sortWithinPartitions` makes the files disjoint
    * sorted ranges so parquet row-group min/max stats prune point and
    * range reads inside a partition. */
  def partitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      sortCols: Seq[String] = Nil): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    val keys = (partitionCols ++ sortCols).map(col)
    df.repartitionByRange(keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
  }

  /** Write `df` as a bucketed + sorted external table: rows hash to
    * `nBuckets` files by `bucketCol`, sorted within each bucket, so a
    * later join or aggregation on that key reads co-located sorted
    * buckets and plans without an exchange. Bucketing metadata lives in
    * the catalog (`saveAsTable` is required); `path` keeps the data
    * external so it outlives the catalog entry. */
  def bucketed(df: DataFrame, table: String, path: String,
      bucketCol: String, nBuckets: Int, sortCols: Seq[String] = Nil): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol, sortCols.filterNot(_ == bucketCol): _*)
      .option("path", path)
      .saveAsTable(table)

  /** The deduped corpus + split assignment `survivorCorpus` writes,
    * exposed for the oracle-checked roundtrip query and the spec: every
    * exact-dedup survivor row (keep-min-doc_id per md5(text), the same
    * semantics as `dedup_exact_survivors`) with its reproducible
    * train/valid/test split. */
  def survivorFrame(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val surv = docs
      .groupBy(md5(col("text")).as("m"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    docs.join(surv, "doc_id")
      .withColumn("split", Fns.splitOf(Fns.md5Bucket(col("text"))))
  }

  /** Materialize the training corpus: exact-dedup survivors written
    * `partitionBy(split)`, doc_id-sorted. A trainer reading
    * `split=train` prunes the valid/test directories at file-listing
    * time; doc_id range reads prune row groups. */
  def survivorCorpus(s: SparkSession, dir: String, path: String): Unit =
    partitioned(survivorFrame(s, dir), path, Seq("split"), Seq("doc_id"))

  /** The QUALITY-AWARE survivor corpus — [[survivorFrame]]'s sibling
    * for the near-dup/best-survivor policy: every document that
    * `dedup_best_survivor` elects (each near-dup cluster keeps its
    * highest-logit member; singleton clusters keep themselves), with
    * the same reproducible split. This is the corpus a real curation
    * run persists — exact-dedup survivors still carry the worst-OCR'd
    * copy of every near-dup template cluster. */
  def bestSurvivorFrame(s: SparkSession, dir: String): DataFrame = {
    val surv = graft.operators.Dedup.bestSurvivor(s, dir)
      .select(col("survivor_id").as("doc_id"))
    Tables.documents(s, dir).join(surv, "doc_id")
      .withColumn("split", Fns.splitOf(Fns.md5Bucket(col("text"))))
  }

  /** Materialize the best-survivor corpus `partitionBy(split)`,
    * doc_id-sorted — the nightly product the NEXT incremental run
    * dedups its batch against (DedupSpec pins the disk→
    * `Dedup.incrementalFrames` cycle ≡ the in-memory frame). */
  def bestSurvivorCorpus(s: SparkSession, dir: String, path: String): Unit =
    partitioned(bestSurvivorFrame(s, dir), path, Seq("split"), Seq("doc_id"))

  /** Materialize the IVF ANN index the way `ann_ivf_topk`'s scale story
    * promises: the (vec_id, embedding, cid) assignment written
    * `partitionBy(cid)` under `path`/index — a query that probes
    * `nprobe` cells lists and reads nprobe/C of the data — plus the
    * (cid, cvec) coarse-quantizer centroids (C ≤ 256 rows, the tiny
    * driver-side metadata) under `path`/centroids. */
  def ivfIndex(s: SparkSession, dir: String, path: String): Unit = {
    val (index, cents) = graft.operators.Similarity.ivfBuild(s, dir)
    partitioned(index, s"$path/index", Seq("cid"), Seq("vec_id"))
    cents.coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Materialize the MINHASH band-bucket index — the near-dup serving
    * artifact completing the from-index matrix on the DEDUP side the
    * way [[lexicalIndex]] completes retrieval and [[ivfIndex]]/
    * [[pqIndex]] complete ANN. `dedup_minhash_lsh` recomputes
    * tokenize→shingle→128-min signatures for the WHOLE corpus per
    * call; a nightly pipeline pays that once here, and every
    * subsequent candidate generation (full re-dedup, or a new-batch
    * scope à la `dedup_incremental`) is a pure equi-join over these
    * files:
    *
    *  - `path`/bands: (doc_id, band, band_sig) — the 64 LSH band keys
    *    per doc, band_sig-range-sorted so a bucket probe prunes to
    *    matching row groups;
    *  - `path`/sigs: (doc_id, hs, n) — the shingle-hash arrays the
    *    verification join reads, doc_id-range-sorted for the id-keyed
    *    point reads.
    */
  def minhashIndex(s: SparkSession, dir: String, path: String): Unit =
    minhashIndexOf(s,
      Tables.documents(s, dir).select("doc_id", "text"), path, dir)

  /** [[minhashIndex]] over an explicit (doc_id, text) corpus slice —
    * the OLD-corpus-only state `dedup_minhash_incremental` probes.
    * `tag` is the corpus directory the slice came from (the
    * [[ccLabelsOf]] tagging discipline); write-once + slice
    * provenance since round 11, so the artifact-boundary incremental
    * mode can refuse a wrong or drifted previous cycle. */
  def minhashIndexOf(s: SparkSession, docs: org.apache.spark.sql.DataFrame,
      path: String, tag: String): Unit = {
    requireFresh(s, path)
    val (bands, sigs) =
      graft.operators.Dedup.minhashIndexFramesOf(s, docs)
    bands.repartitionByRange(col("band"), col("band_sig"))
      .sortWithinPartitions("band", "band_sig", "doc_id")
      .write.parquet(s"$path/bands")
    sigs.repartitionByRange(col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.parquet(s"$path/sigs")
    writeSliceProvenance(s, path, docs, tag)
  }

  /** Tag + provenance sidecars for a slice-derived signature index —
    * the `_graft_corpus` binding plus the (n_docs, content_xor,
    * max_doc_id) facts an ARTIFACT-BOUNDARY incremental reader needs:
    * max_doc_id + 1 IS the old/new cut (the index defines the
    * boundary, the [[ccLabelsOf]] rule — deriving it from the current
    * table's midpoint double-emits or drops docs the moment the
    * artifact slice and the midpoint disagree), and the checksum lets
    * the reader refuse id reuse, backfill, or in-place edits of
    * already-indexed docs instead of serving stale signatures. */
  private def writeSliceProvenance(s: SparkSession, path: String,
      docs: org.apache.spark.sql.DataFrame, tag: String): Unit = {
    ArtifactTag.write(s, path, tag)
    // ONE aggregate pass for all three provenance facts — a second
    // max(doc_id) action would re-scan the (doc_id, text) slice,
    // a full redundant corpus read at nightly-refresh sizes. The xor
    // expression is the same [[SliceXor]] the reader replays.
    val r = docs.select("doc_id", "text")
      .agg(count(lit(1L)), expr(SliceXor), max("doc_id")).head()
    val xor = if (r.isNullAt(1)) 0L else r.getLong(1)
    ArtifactTag.writeProps(s, path, Map(
      "n_docs" -> r.getLong(0).toString,
      "content_xor" -> xor.toString) ++
      (if (r.isNullAt(2)) Map.empty[String, String]
       else Map("max_doc_id" -> r.getLong(2).toString)))
  }

  /** Materialize the SIMHASH banded-signature index — the
    * [[minhashIndex]] treatment for the simhash candidate family:
    * `path`/bands holds (doc_id, sig, k, bh) — each doc's 64-bit
    * signature with its four 16-bit band keys — (k, bh)-range-sorted
    * so a band-bucket probe prunes to matching row groups. The frame
    * is [[graft.operators.Dedup.simhashBanded]], the very one the
    * in-query `dedup_simhash` joins, so `dedup_simhash_from_index`
    * is row-identical by construction (DedupSpec pins it). */
  def simhashIndex(s: SparkSession, dir: String, path: String): Unit =
    simhashIndexOf(s,
      Tables.documents(s, dir).select("doc_id", "text"), path, dir)

  /** [[simhashIndex]] over an explicit (doc_id, text) slice — the
    * old-corpus-only index `dedup_simhash_incremental` point-probes
    * (the [[minhashIndexOf]] discipline, provenance included). */
  def simhashIndexOf(s: SparkSession,
      docs: org.apache.spark.sql.DataFrame, path: String,
      tag: String): Unit = {
    requireFresh(s, path)
    graft.operators.Dedup.simhashBandedOf(s, docs)
      .repartitionByRange(col("k"), col("bh"))
      .sortWithinPartitions("k", "bh", "doc_id")
      .write.parquet(s"$path/bands")
    writeSliceProvenance(s, path, docs, tag)
  }

  /** Materialize the VERIFIED near-dup PAIR-GRAPH artifact — the
    * (a_id, b_id, inter, na, nb) frame [[graft.operators.Dedup
    * .ngramJaccard]] emits (exact Jaccard ≥ 0.5, a_id < b_id), written
    * (a_id, b_id)-range-sorted. This is the [[ccLabels]] discipline
    * applied one stage EARLIER: the cluster family serves off one
    * persisted label source, but the six pair-CONSUMING graph metrics
    * (degree_dist, pagerank, triangles, kcore, quality_delta,
    * cross_source_rate) each re-derived the same shingle scan +
    * candidate join in-query — a nightly audit running all six paid
    * the pair graph six times. Persist it once per refresh, set
    * `graft.dedup.pairsPath`, and every consumer starts from a pure
    * parquet scan of 5-long rows.
    *
    * Provenance (`_graft_props`): the candidate-stage configuration
    * the pairs were built under (readers refuse stage/df-cap drift —
    * a dfcap-built graph is missing exactly the hot-only pairs the
    * prefix stage keeps) plus the [[ccSliceChecksum]] of the source
    * corpus, recorded for audit and any future artifact-boundary
    * incremental contract. */
  def pairGraph(s: SparkSession, dir: String, path: String): Unit =
    pairGraphOf(s, Tables.documents(s, dir).select("doc_id", "text"),
      path, dir)

  /** [[pairGraph]] over an explicit (doc_id, text) corpus slice —
    * `tag` is the corpus directory the slice came from (the
    * [[ccLabelsOf]] tagging discipline). Always computes fresh pairs
    * via the conf-routed candidate stage — never reads
    * `graft.dedup.pairsPath` back (the [[graft.operators.Dedup
    * .loopLabels]] self-reference rule). */
  def pairGraphOf(s: SparkSession, docs: org.apache.spark.sql.DataFrame,
      path: String, tag: String): Unit = {
    requireFresh(s, path)
    graft.operators.Dedup.ngramJaccardOf(s, docs)
      .repartitionByRange(col("a_id"), col("b_id"))
      .sortWithinPartitions("a_id", "b_id")
      .write.parquet(path)
    ArtifactTag.write(s, path, tag)
    val (n, xor) = ccSliceChecksum(docs.select("doc_id", "text"))
    ArtifactTag.writeProps(s, path, Map(
      "pair_stage" -> graft.operators.Dedup.candidateStage(s),
      "max_shingle_df" -> graft.operators.Dedup.maxShingleDf(s).toString,
      "n_docs" -> n.toString,
      "content_xor" -> xor.toString))
  }

  /** Materialize the connected-component LABEL artifact — the
    * (doc_id, cluster_id) frame `dedup_clusters`' pointer-jumping
    * loop produces, written doc_id-range-sorted. DEPLOY.md prescribes
    * persisting this once per refresh: four queries (clusters,
    * soft_weights, best_survivor, cluster_size_dist) all start from
    * the same CC labeling, and a serving/audit pass
    * (`dedup_clusters_from_index`) should read the label files — a
    * pure parquet scan with doc_id row-group pruning — never re-run
    * the O(log diameter) loop. The incremental path
    * (`cc_incremental`) then contracts THIS artifact's components
    * instead of recomputing the old half. */
  def ccLabels(s: SparkSession, dir: String, path: String): Unit =
    writeCcLabels(s, graft.operators.Dedup.loopLabels(s, dir),
      Tables.documents(s, dir).select("doc_id", "text"), path, dir)

  /** [[ccLabels]] over an explicit (doc_id, text) corpus slice — the
    * OLD-corpus-only state `cc_incremental` contracts against when
    * `graft.cc.oldLabelsPath` points here (the [[minhashIndexOf]]
    * pattern on the CC side): each nightly cycle persists its labels
    * with this writer, and the next cycle's incremental run reads
    * them instead of re-deriving the old components in-query. `tag`
    * is the corpus directory the slice came from — written into the
    * artifact's `_graft_corpus` sidecar so readers can refuse a
    * wrong-corpus serve ([[ArtifactTag]]). */
  def ccLabelsOf(s: SparkSession, docs: org.apache.spark.sql.DataFrame,
      path: String, tag: String): Unit =
    writeCcLabels(s, graft.operators.Dedup.loopLabelsOf(s, docs), docs,
      path, tag)

  /** The (n_docs, content_xor) checksum of a (doc_id, text) slice —
    * ONE definition shared by the label-artifact writer and
    * `cc_incremental`'s artifact-mode reader (round-9 advisor fix #2:
    * the coverage guard compared only row counts, so 1:1 doc_id reuse
    * or in-place edits of already-labeled docs served stale labels
    * silently). XOR of per-doc (doc_id, md5(text)) hashes is
    * order-invariant and associative, so it map-side combines; any id
    * substitution or content edit flips it w.h.p. The fields hash as
    * SEPARATE xxhash64 args with the null text coalesced to a sentinel
    * (round-10 advisor fix: a string concat with a NULL text is NULL,
    * so every null-text doc hashed to the constant seed and doc_id was
    * never mixed in — id substitution confined to null-text docs below
    * the cut passed the guard); separate args mix doc_id even when the
    * text side degenerates, and the sentinel keeps null ≠ ''. */
  /** The per-doc hash the checksum XORs — ONE definition for the
    * reader-side replay ([[ccSliceChecksum]]) and the writer-side
    * combined provenance aggregate ([[writeSliceProvenance]]); two
    * inline copies could drift and the checksum guard would then
    * refuse every artifact. */
  private val SliceXor =
    "bit_xor(xxhash64(doc_id, coalesce(md5(text), '<null>')))"

  private[graft] def ccSliceChecksum(
      docs: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val r = docs.agg(count(lit(1L)), expr(SliceXor)).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  private def writeCcLabels(s: SparkSession,
      labels: org.apache.spark.sql.DataFrame,
      docs: org.apache.spark.sql.DataFrame,
      path: String, tag: String): Unit = {
    requireFresh(s, path)
    labels
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.parquet(path)
    ArtifactTag.write(s, path, tag)
    // provenance props (round-9 advisor fixes #1+#2): the pair-stage
    // configuration the labels were built under, and the content
    // checksum of the labeled slice — cc_incremental's reader refuses
    // stage/cap drift and silent slice substitution
    val (n, xor) = ccSliceChecksum(docs.select("doc_id", "text"))
    ArtifactTag.writeProps(s, path, Map(
      "pair_stage" -> graft.operators.Dedup.candidateStage(s),
      "max_shingle_df" -> graft.operators.Dedup.maxShingleDf(s).toString,
      "n_docs" -> n.toString,
      "content_xor" -> xor.toString))
  }

  /** Materialize the LEXICAL inverted index — the serving artifact the
    * retrieval suite's scale story promises, completing the from-index
    * matrix on the text side the way [[ivfIndex]]/[[pqIndex]] complete
    * it on the vector side. `bm25_topk` recomputes df/tf/avgdl from
    * the corpus per call and `phrase_search` rebuilds the positional
    * gram stream in-query; a deployment pays that scan once here
    * and point-reads per query:
    *
    *  - `path`/postings: (tok, doc_id, dl, tf) — the document-keyed
    *    inverted index, one row per distinct (token, doc). Files are
    *    tok-range-sorted (`repartitionByRange` + sort, the [[pqIndex]]
    *    layout rule) so a query-term read prunes to the row groups
    *    whose tok min/max cover it — a point-lookup, not a scan.
    *  - `path`/grams: (gram, doc_id, pos) positional trigram postings,
    *    gram-range-sorted the same way — phrase lookups read only the
    *    matching gram's row groups.
    *  - `path`/gramstats: (gram, n) occurrence totals — vocabulary-
    *    sized planner metadata (the phrase twin derives its standing
    *    query from the top row; a production call passes a constant).
    *  - `path`/stats: ONE row (n, avgdl) — the BM25 globals, computed
    *    over dl > 0 docs exactly as the in-query path does, so scores
    *    from the index are bit-identical to scores from the corpus.
    */
  def lexicalIndex(s: SparkSession, dir: String, path: String): Unit = {
    val c = Tables.documents(s, dir)
      .select(col("doc_id"), Fns.tokens(col("text")).as("w"))
      .select(col("doc_id"), col("w"), size(col("w")).as("dl"))
      .filter(col("dl") > 0)
      .localCheckpoint() // consumed by the stats agg AND the postings
    c.select(col("doc_id"), col("dl"), explode(col("w")).as("tok"))
      .groupBy("tok", "doc_id", "dl").agg(count(lit(1)).as("tf"))
      .repartitionByRange(col("tok"))
      .sortWithinPartitions("tok", "doc_id")
      .write.mode("overwrite").parquet(s"$path/postings")
    c.agg(count(lit(1)).cast("double").as("n"), avg("dl").as("avgdl"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
    val grams = Tables.documents(s, dir)
      .select(col("doc_id"),
        posexplode_outer(Fns.shingles3(Fns.tokens(col("text")))))
      .toDF("doc_id", "pos", "gram")
      .filter(col("gram").isNotNull)
      .localCheckpoint() // consumed by the postings write + the stats
    grams.repartitionByRange(col("gram"))
      .sortWithinPartitions("gram", "doc_id")
      .write.mode("overwrite").parquet(s"$path/grams")
    grams.groupBy("gram").agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$path/gramstats")
  }

  /** Materialize the PQ index `ann_pq_topk`'s scale story promises:
    * the (vec_id, sub, code) byte-codes under `path`/codes — the ONLY
    * per-vector state a probe ever reads, 8 bytes of payload per
    * vector vs 256 for the float32 embedding — plus the (sub, cid,
    * cvec) codebooks (≤ 8×256 rows of broadcast metadata) under
    * `path`/codebooks. Codes pack vec_id-sorted so a filtered re-rank
    * (IVF-PQ composition: cell candidates → ADC scores) prunes row
    * groups by vec_id range. */
  def pqIndex(s: SparkSession, dir: String, path: String): Unit = {
    val (codes, cb) = graft.operators.Similarity.pqBuild(s, dir)
    codes.repartitionByRange(col("vec_id"))
      .sortWithinPartitions("vec_id", "sub")
      .write.mode("overwrite").parquet(s"$path/codes")
    cb.coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
  }

  /** Materialize the SQ serving index — the (vec_id, qs) symmetric
    * unit-norm int8 code table behind `ann_sq_from_index`: 64 longs
    * per vector (codes only, no floats), vec_id-range-sorted so the
    * serve-time shortlist scans slim code files and the re-rank's
    * point reads prune row groups. The code rule is
    * [[graft.operators.Similarity.sqNormCodes]] — the one definition
    * the in-query twin computes. */
  def sqIndex(s: SparkSession, dir: String, path: String): Unit = {
    requireFresh(s, path)
    graft.operators.Similarity.sqNormCodes(
      graft.sources.Tables.embeddings(s, dir))
      .select("vec_id", "qs")
      .repartitionByRange(col("vec_id"))
      .sortWithinPartitions("vec_id")
      .write.parquet(path)
  }

  /** Materialize the point-in-time FEATURE STORE — the (user_id, day)
    * → prior-day snapshot table behind `feature_pit_join`: written
    * once per refresh, (user_id, day)-range-sorted so a training-set
    * build's equi-join point-reads prune row groups by user range,
    * and no consumer ever re-runs the cumulative windows. */
  def featureStore(s: SparkSession, dir: String, path: String): Unit =
    graft.operators.Training.pitFeatureFrame(s, dir)
      .repartitionByRange(col("user_id"), col("day"))
      .sortWithinPartitions("user_id", "day")
      .write.mode("overwrite").parquet(path)
}
