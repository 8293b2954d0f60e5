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
  def ivfIndex(s: SparkSession, dir: String, path: String): Unit =
    ivfIndexOf(s, Tables.embeddings(s, dir)
      .select("vec_id", "embedding"), path, dir)

  /** [[ivfIndex]] over an explicit (vec_id, embedding) slice — the
    * base build of the IVF generational append cycle
    * ([[ivfIndexAppend]]), write-once + vector-slice provenance. */
  def ivfIndexOf(s: SparkSession, vecs: org.apache.spark.sql.DataFrame,
      path: String, tag: String): Unit = {
    requireFresh(s, path)
    val (index, cents) = graft.operators.Similarity.ivfBuildOf(s, vecs)
    partitioned(index, s"$path/index", Seq("cid"), Seq("vec_id"))
    cents.coalesce(1).write.parquet(s"$path/centroids")
    writeVecProvenance(s, path, vecs, tag)
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
      docs: org.apache.spark.sql.DataFrame, tag: String,
      extra: Map[String, String] = Map.empty): Unit = {
    ArtifactTag.write(s, path, tag)
    // ONE aggregate pass for all three provenance facts — a second
    // max(doc_id) action would re-scan the (doc_id, text) slice,
    // a full redundant corpus read at nightly-refresh sizes. The xor
    // expression is the same [[SliceXor]] the reader replays.
    val r = docs.select("doc_id", "text")
      .agg(count(lit(1L)), expr(SliceXor), max("doc_id")).head()
    val xor = if (r.isNullAt(1)) 0L else r.getLong(1)
    ArtifactTag.writeProps(s, path, Map(
      "prov_ver" -> ArtifactTag.ProvVersion,
      "n_docs" -> r.getLong(0).toString,
      "content_xor" -> xor.toString) ++
      (if (r.isNullAt(2)) Map.empty[String, String]
       else Map("max_doc_id" -> r.getLong(2).toString)) ++ extra)
  }

  /** Additive provenance for an APPEND generation (round-12 advisor
    * fix): the new head's facts merge from the PARENT's recorded props
    * plus a BATCH-only aggregate — n_docs adds, content_xor XORs,
    * max_doc_id maxes — so the append cycle's compute stays strictly
    * ∝ batch, as the append writers' contract documents (the previous
    * full-corpus [[writeSliceProvenance]] call re-ran the md5
    * content-xor over every OLD row on every refresh, a
    * corpus-proportional scan that even `graft.artifact
    * .trustOldContent` did not remove). Soundness: the corpus is the
    * disjoint union of the below-cut slice and the batch, XOR/count/
    * max all merge over disjoint unions, and the parent's facts were
    * verified at admission (checksum replay — or count-only under
    * trustOldContent, which trusts the stored xor by contract), so
    * parent ⊕ batch is BIT-EQUAL to the full-slice aggregate (the
    * next cycle's admission replay still passes; MaterializeSpec pins
    * the equality). */
  private def writeSliceProvenanceAppended(s: SparkSession, path: String,
      batch: org.apache.spark.sql.DataFrame, tag: String,
      parent: Map[String, String],
      extra: Map[String, String] = Map.empty): Unit = {
    ArtifactTag.write(s, path, tag)
    val r = batch.select("doc_id", "text")
      .agg(count(lit(1L)), expr(SliceXor), max("doc_id")).head()
    val bXor = if (r.isNullAt(1)) 0L else r.getLong(1)
    val maxId = (parent.get("max_doc_id").map(_.toLong) ++
      (if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .reduceOption(_ max _)
    ArtifactTag.writeProps(s, path, Map(
      "prov_ver" -> ArtifactTag.ProvVersion,
      "n_docs" -> (parent("n_docs").toLong + r.getLong(0)).toString,
      "content_xor" ->
        (parent("content_xor").toLong ^ bXor).toString) ++
      maxId.map(m => "max_doc_id" -> m.toString) ++ extra)
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

  /** The shared admission prefix of the signature-index APPEND
    * writers ([[lexAdmission]]'s sibling on the signature side): tag,
    * provenance version, boundary presence, and the old-slice guard.
    * Returns (cut, props, full-corpus docs). */
  private def sigAdmission(s: SparkSession, dir: String,
      oldPath: String, what: String): (Long, Map[String, String],
      org.apache.spark.sql.DataFrame) = {
    ArtifactTag.require(s, oldPath, dir)
    val props = ArtifactTag.readProps(s, oldPath)
    ArtifactTag.requireProvVersion(props, oldPath)
    require(props.contains("max_doc_id"),
      s"$what index at $oldPath carries no max_doc_id provenance — an " +
        "empty or pre-provenance index has no append mode; rebuild it " +
        "with the Materialize writer")
    val cut = props("max_doc_id").toLong + 1L
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    requireDocSlice(s, props, oldPath, docs, cut,
      "signed", s"re-sign the corpus with the full $what writer instead")
    (cut, props, docs)
  }

  /** GENERATIONAL (append-mode) refresh of the MINHASH band index —
    * the [[lexicalIndexAppend]] shape on the signature side, and the
    * most natural of all: bands and verification sigs are pure PER-DOC
    * facts, so a generation holds ONLY the batch's rows (band_sig- /
    * doc_id-range-sorted within the generation) plus a `parent`
    * pointer — there is no cumulative part at all. Write cost strictly
    * ∝ batch: no old doc is re-tokenized, re-signed, read, or
    * rewritten, and the provenance sidecar merges additively
    * ([[writeSliceProvenanceAppended]]). Readers resolve the
    * [[genChain]] and union per-generation sorted scans — a band
    * probe prunes row groups inside every generation exactly as in a
    * merged index. COMPACTION = [[sigIndexCompact]]: a pure columnar
    * chain-collapse re-sort, no signature recompute. */
  def minhashIndexAppend(s: SparkSession, dir: String, oldPath: String,
      newPath: String): Unit = {
    requireFresh(s, newPath)
    val (cut, props, docs) = sigAdmission(s, dir, oldPath, "minhash")
    val batch = docs.filter(col("doc_id") >= cut)
    val (bands, sigs) =
      graft.operators.Dedup.minhashIndexFramesOf(s, batch)
    bands.repartitionByRange(col("band"), col("band_sig"))
      .sortWithinPartitions("band", "band_sig", "doc_id")
      .write.parquet(s"$newPath/bands")
    sigs.repartitionByRange(col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.parquet(s"$newPath/sigs")
    writeSliceProvenanceAppended(s, newPath, batch, dir, props,
      Map("parent" -> oldPath))
  }

  /** [[minhashIndexAppend]] for the SIMHASH banded-signature index —
    * one (doc_id, sig, k, bh) part, same per-doc append shape. */
  def simhashIndexAppend(s: SparkSession, dir: String, oldPath: String,
      newPath: String): Unit = {
    requireFresh(s, newPath)
    val (cut, props, docs) = sigAdmission(s, dir, oldPath, "simhash")
    val batch = docs.filter(col("doc_id") >= cut)
    graft.operators.Dedup.simhashBandedOf(s, batch)
      .repartitionByRange(col("k"), col("bh"))
      .sortWithinPartitions("k", "bh", "doc_id")
      .write.parquet(s"$newPath/bands")
    writeSliceProvenanceAppended(s, newPath, batch, dir, props,
      Map("parent" -> oldPath))
  }

  /** COMPACTION of a signature-index generation chain: the per-doc
    * parts chain-union → one range-re-sort → a merged write-once
    * artifact carrying the head's (cumulative, admission-verified)
    * provenance without a parent pointer. Pure columnar I/O — unlike
    * the lexical/feature compactions (which route through their merge
    * writers), signatures never recompute here because nothing in the
    * artifact is derived across docs. `parts` maps part name →
    * (projection columns, range-sort key). */
  def sigIndexCompact(s: SparkSession, dir: String, headPath: String,
      newPath: String,
      parts: Map[String, (Seq[String], Seq[String])]): Unit = {
    requireFresh(s, newPath)
    ArtifactTag.require(s, headPath, dir)
    val props = ArtifactTag.readProps(s, headPath)
    ArtifactTag.requireProvVersion(props, headPath)
    parts.foreach { case (part, (cols, sortCols)) =>
      chainRead(s, headPath, dir, part, cols)
        .repartitionByRange(sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
        .write.parquet(s"$newPath/$part")
    }
    ArtifactTag.write(s, newPath, dir)
    ArtifactTag.writeProps(s, newPath, props - "parent")
  }

  /** The minhash-index parts' (projection, range-sort key) layout —
    * shared by the compactor's callers and the spec (one
    * definition). */
  val MinhashParts: Map[String, (Seq[String], Seq[String])] = Map(
    "bands" -> (Seq("doc_id", "band", "band_sig"),
      Seq("band", "band_sig", "doc_id")),
    "sigs" -> (Seq("doc_id", "hs", "n"), Seq("doc_id")))

  /** The simhash-index part's layout. */
  val SimhashParts: Map[String, (Seq[String], Seq[String])] = Map(
    "bands" -> (Seq("doc_id", "sig", "k", "bh"),
      Seq("k", "bh", "doc_id")))

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
    // full slice provenance INCLUDING max_doc_id: the recorded max id
    // + 1 is the artifact-boundary cut [[pairGraphDelta]] refreshes
    // from (the round-11 signature-index discipline applied to pairs)
    writeSliceProvenance(s, path, docs, tag, pairStageProps(s))
  }

  /** The candidate-stage configuration props a pair-derived artifact
    * records — ONE definition for the full writer, the delta writer,
    * and the label writer, so a reader's drift refusal always compares
    * against the same keys. */
  private def pairStageProps(s: SparkSession): Map[String, String] = Map(
    "pair_stage" -> graft.operators.Dedup.candidateStage(s),
    "max_shingle_df" -> graft.operators.Dedup.maxShingleDf(s).toString)

  /** INCREMENTAL refresh of the pair-graph artifact — the last
    * rebuild-whole cost in the dedup serving story (round-11 verdict
    * task #1): instead of re-running the candidate join over the
    * whole corpus, the stored artifact's own `max_doc_id` provenance
    * DEFINES the old/new cut (its recorded max id + 1 — the
    * [[graft.operators.Dedup]] `oldIndexPath` discipline), old pairs
    * are a pure parquet scan of `oldPath`, and only the NEW-TOUCHING
    * pairs (b_id ≥ cut) are computed, via the delta-scoped candidate
    * stage ([[graft.operators.Dedup.deltaPairGraph]]: the self-join's
    * b side is new docs only, so candidate cost is Σ df·df_new —
    * linear in the batch where the full build's Σ df² is linear in
    * the corpus). The merged output is written WRITE-ONCE to
    * `newPath` with full current-corpus provenance, so the next
    * refresh deltas from it in turn.
    *
    * Content contract: under the default `prefix` stage the output is
    * row-identical to a full [[pairGraph]] rebuild at every corpus
    * (the prefix lemma is exact; old pairs ARE the true old×old set,
    * delta pairs ARE the true new-touching set — DedupSpec pins the
    * equality on a fixture whose delta touches old pairs). Under
    * `dfcap` the old rows keep the df statistics of THEIR build time,
    * so a from-scratch rebuild under grown dfs may cap differently —
    * the cap's own disclosed approximation, inherited, never widened
    * (stage and cap-value drift are still refused).
    *
    * Guards, in order: `_graft_corpus` tag must name THIS corpus;
    * candidate-stage/df-cap drift refused; provenance version gated
    * ([[ArtifactTag.requireProvVersion]] — a formula change reads as
    * "rebuild", not as corpus corruption); `max_doc_id` must exist
    * (empty or pre-round-12 artifacts have no delta mode); and the
    * stored content checksum must replay on the current below-cut
    * slice (id reuse, backfill, or in-place edits of already-paired
    * docs refuse loudly — a stale pair graph silently corrupts every
    * downstream graph metric). */
  def pairGraphDelta(s: SparkSession, dir: String, oldPath: String,
      newPath: String): Unit = {
    requireFresh(s, newPath)
    ArtifactTag.require(s, oldPath, dir)
    val props = ArtifactTag.readProps(s, oldPath)
    val stage = graft.operators.Dedup.candidateStage(s)
    require(props.get("pair_stage").contains(stage),
      s"pair-graph artifact at $oldPath was built under pair stage " +
        s"'${props.getOrElse("pair_stage", "<none>")}' but this " +
        s"session runs '$stage' (graft.dedup.candidateStage) — a " +
        "delta under a different stage diverges from a rebuild; " +
        "rebuild the artifact or match the conf")
    require(stage != "dfcap"
        || props.get("max_shingle_df")
             .contains(graft.operators.Dedup.maxShingleDf(s).toString),
      s"pair-graph artifact at $oldPath was built with maxShingleDf=" +
        s"${props.getOrElse("max_shingle_df", "<none>")} but this " +
        s"session caps at ${graft.operators.Dedup.maxShingleDf(s)} — " +
        "a df-cap change changes the pair graph; rebuild")
    ArtifactTag.requireProvVersion(props, oldPath)
    require(props.contains("max_doc_id"),
      s"pair-graph artifact at $oldPath carries no max_doc_id " +
        "provenance — an empty or pre-delta artifact has no " +
        "incremental mode; run the full pairGraph build once")
    val cut = props("max_doc_id").toLong + 1L
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    requireDocSlice(s, props, oldPath, docs, cut,
      "paired", "run the full pairGraph build instead")
    val oldPairs = s.read.parquet(oldPath)
      .select("a_id", "b_id", "inter", "na", "nb")
    oldPairs.unionAll(graft.operators.Dedup.deltaPairGraph(s, dir, cut))
      .repartitionByRange(col("a_id"), col("b_id"))
      .sortWithinPartitions("a_id", "b_id")
      .write.parquet(newPath)
    writeSliceProvenance(s, newPath, docs, dir, pairStageProps(s))
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
      Tables.documents(s, dir).select("doc_id", "text"), path, dir,
      guardPairs = true)

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
    // guardPairs = false: [[graft.operators.Dedup.loopLabelsOf]]
    // derives the slice's pairs in-query (never reads
    // graft.dedup.pairsPath), so there is no pair artifact to be
    // stale against — and the slice's checksum would legitimately
    // differ from any full-corpus pair artifact's
    writeCcLabels(s, graft.operators.Dedup.loopLabelsOf(s, docs), docs,
      path, tag, guardPairs = false)

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

  /** The [[graft.operators.Dedup]] `graft.cc.trustOldContent`
    * downgrade, generalized to every delta writer: a deployment on an
    * IMMUTABLE store may skip the old-slice content replay (the one
    * corpus-proportional md5 scan in a delta refresh) and keep only
    * the count guard — catches backfill and dropped rows, NOT 1:1
    * substitution or in-place edits, which an immutable store rules
    * out by construction. Default off: the checksum replay is the
    * guard that makes a delta artifact trustworthy on a mutable
    * store. */
  private def trustOldContent(s: SparkSession): Boolean =
    s.conf.getOption("graft.artifact.trustOldContent").contains("true")

  /** Old-slice admission guard for the doc-keyed delta writers (pair
    * graph, lexical index) — ONE definition so the two refusals can
    * never drift: full mode replays the writer's content checksum on
    * the current below-cut slice; [[trustOldContent]] mode checks the
    * count only. `verb` names what the previous cycle did with the
    * slice; `remedy` is the rebuild instruction. */
  private def requireDocSlice(s: SparkSession,
      props: Map[String, String], oldPath: String,
      docs: org.apache.spark.sql.DataFrame, cut: Long,
      verb: String, remedy: String): Unit = {
    val below = docs.filter(col("doc_id") < cut)
    if (trustOldContent(s)) {
      val n = below.count()
      require(props.get("n_docs").contains(n.toString),
        s"old-slice count mismatch at $oldPath (artifact " +
          s"n=${props.getOrElse("n_docs", "<none>")}, corpus n=$n) — " +
          s"docs appeared or vanished below the boundary ($cut) since " +
          s"the previous cycle $verb the slice (id backfill or " +
          s"drops); $remedy")
    } else {
      val (n, xor) = ccSliceChecksum(below)
      require(props.get("n_docs").contains(n.toString)
          && props.get("content_xor").contains(xor.toString),
        s"old-slice checksum mismatch at $oldPath (artifact " +
          s"n=${props.getOrElse("n_docs", "<none>")} " +
          s"xor=${props.getOrElse("content_xor", "<none>")}, " +
          s"corpus n=$n xor=$xor) — the docs below the boundary " +
          s"($cut) are not the slice the previous cycle $verb " +
          s"(id reuse, backfill, or in-place edits); $remedy")
    }
  }

  private def writeCcLabels(s: SparkSession,
      labels: => org.apache.spark.sql.DataFrame, // by-name: the CC loop
      // runs jobs eagerly, so evaluate only after the guards pass
      docs: org.apache.spark.sql.DataFrame,
      path: String, tag: String, guardPairs: Boolean): Unit = {
    requireFresh(s, path)
    // the checksum of the slice being labeled — computed BEFORE any
    // file is written, because it double-duties as the stale-pair
    // guard below and a guard failure must leave no half-artifact
    val (n, xor) = ccSliceChecksum(docs.select("doc_id", "text"))
    // stale-pair guard (round-11 advisor finding): when the edge
    // source is the persisted pair artifact (graft.dedup.pairsPath,
    // see [[graft.operators.Dedup.loopLabels]]), the labels INHERIT
    // its content — but this writer stamps them with a FRESH corpus
    // checksum, so labels built from a stale pair artifact (corpus
    // regenerated in place under the same dir) would pass every
    // downstream checksum guard. Refuse at write time: the pair
    // artifact's recorded corpus checksum must match the corpus being
    // labeled. Essentially free — the (n, xor) aggregate above is
    // computed for the props sidecar anyway.
    if (guardPairs)
      s.conf.getOption("graft.dedup.pairsPath").foreach { pp =>
        val pairProps = ArtifactTag.readProps(s, pp)
        ArtifactTag.requireProvVersion(pairProps, pp)
        require(pairProps.get("n_docs").contains(n.toString)
            && pairProps.get("content_xor").contains(xor.toString),
          s"refusing to persist CC labels: the edge source is the " +
            s"pair artifact at $pp, whose recorded corpus checksum " +
            s"(n=${pairProps.getOrElse("n_docs", "<none>")} " +
            s"xor=${pairProps.getOrElse("content_xor", "<none>")}) " +
            s"does not match the corpus being labeled (n=$n " +
            s"xor=$xor) — the labels would derive from STALE pairs " +
            "yet carry a fresh checksum (provenance laundering); " +
            "rebuild the pair artifact first")
      }
    labels
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.parquet(path)
    ArtifactTag.write(s, path, tag)
    // provenance props (round-9 advisor fixes #1+#2): the pair-stage
    // configuration the labels were built under, and the content
    // checksum of the labeled slice — cc_incremental's reader refuses
    // stage/cap drift and silent slice substitution
    ArtifactTag.writeProps(s, path, Map(
      "prov_ver" -> ArtifactTag.ProvVersion,
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
  def lexicalIndex(s: SparkSession, dir: String, path: String): Unit =
    lexicalIndexOf(s,
      Tables.documents(s, dir).select("doc_id", "text"), path, dir)

  /** [[lexicalIndex]] over an explicit (doc_id, text) corpus slice —
    * the [[minhashIndexOf]] discipline on the lexical side: write-once
    * target, `_graft_corpus` tag, and versioned slice provenance
    * (n_docs/content_xor/max_doc_id) PLUS the two additive BM25-global
    * merge facts (`n_dl` = docs with dl > 0, `sum_dl` = Σ dl over
    * them), which is what makes [[lexicalIndexDelta]] possible: the
    * stats row is (n, avgdl) and avgdl is NOT mergeable, but (n, Σdl)
    * is — and because dl are integers whose running double sum stays
    * exact below 2⁵³ (Σ tokens at 100 TB ≈ 10¹³ ≪ 9·10¹⁵), writing
    * `Σdl/n` reproduces Spark's own `avg(dl)` BIT-EXACTLY, so
    * from-index BM25 scores never drift between a full build and a
    * merged one. */
  def lexicalIndexOf(s: SparkSession, docs: org.apache.spark.sql.DataFrame,
      path: String, tag: String): Unit = {
    requireFresh(s, path)
    val (postings, grams, nDl, sumDl) = lexBatchParts(s, docs)
    writeLexParts(s, path, postings, grams,
      grams.groupBy("gram").agg(count(lit(1)).as("n")), nDl, sumDl)
    writeSliceProvenance(s, path, docs, tag, Map(
      "n_dl" -> nDl.toString, "sum_dl" -> sumDl.toString))
  }

  /** INCREMENTAL refresh of the lexical index — the [[pairGraphDelta]]
    * shape for postings (round-11 verdict task #2): the stored
    * artifact's `max_doc_id` + 1 defines the cut; ONLY the new batch
    * is tokenized (postings and positional grams are per-doc facts, so
    * batch rows are exactly the rebuild's rows for those docs); old
    * postings/grams are pure parquet scans merged in by a
    * tok/gram-range re-sort; the 1-row (n, avgdl) BM25 globals merge
    * ADDITIVELY from the recorded (n_dl, sum_dl) facts — bit-equal to
    * a rebuild's `avg(dl)` (see [[lexicalIndexOf]]); and `gramstats`
    * occurrence totals merge by summation. Guards: corpus tag,
    * provenance version, max_doc_id presence, and the below-cut
    * content-checksum replay (id reuse, backfill, or in-place edits of
    * already-indexed docs refuse loudly — stale postings silently
    * mis-rank every query). RetrievalOracleSpec pins {old + delta} ≡
    * full rebuild part-for-part and `bm25_from_index` /
    * `phrase_from_index` row-identical when served off the delta
    * artifact via `graft.lex.indexPath`. */
  def lexicalIndexDelta(s: SparkSession, dir: String, oldPath: String,
      newPath: String): Unit = {
    requireFresh(s, newPath)
    val (cut, props, docs) = lexAdmission(s, dir, oldPath)
    val (postings, grams, gramstats, nTot, sumTot) =
      lexDeltaParts(s, docs, oldPath, cut,
        props("n_dl").toLong, props("sum_dl").toLong)
    writeLexParts(s, newPath, postings, grams, gramstats, nTot, sumTot)
    writeSliceProvenance(s, newPath, docs, dir, Map(
      "n_dl" -> nTot.toString, "sum_dl" -> sumTot.toString))
  }

  /** GENERATIONAL (append-mode) refresh of the lexical index — the
    * LSM shape next to [[lexicalIndexDelta]]'s merge: the new artifact
    * holds ONLY the batch's postings and grams (tok/gram-range-sorted
    * within the generation) plus the two vocabulary-sized merged
    * parts — summed `gramstats` and the additive 1-row BM25 stats —
    * and a `parent` pointer to the previous generation. Write cost is
    * therefore ∝ batch STRICTLY: no old posting is read, decoded,
    * re-sorted, or rewritten (the merge writer's one
    * corpus-proportional term). Readers resolve the [[genChain]] and
    * union the per-generation sorted scans — the query-term filter
    * prunes row groups inside every generation exactly as in a merged
    * artifact, at the cost of one scan node per generation (bounded:
    * 64 generations, then compact). COMPACTION is not new machinery:
    * [[lexicalIndexDelta]] over a chain head reads the full chain on
    * its old side, so `lexicalIndexDelta(dir, chainHead, newPath)`
    * collapses any chain into one merged artifact (spec-pinned).
    *
    * Admission guards are [[lexicalIndexDelta]]'s ([[lexAdmission]] —
    * one definition); provenance records the FULL current corpus, so
    * the next refresh (append or merge) cuts from this generation's
    * boundary. */
  def lexicalIndexAppend(s: SparkSession, dir: String, oldPath: String,
      newPath: String): Unit = {
    requireFresh(s, newPath)
    val (cut, props, docs) = lexAdmission(s, dir, oldPath)
    val batch = docs.filter(col("doc_id") >= cut)
    val (newPost, newGrams, nNew, sumNew) = lexBatchParts(s, batch)
    // vocabulary-sized merges only — the whole point of append mode
    // is that per-DOC state (postings, grams) is never rewritten.
    // gramstats reads the HEAD generation alone: every writer stores
    // the CUMULATIVE totals, so a chain union would double-count
    val gramstats = s.read.parquet(s"$oldPath/gramstats")
      .select("gram", "n")
      .unionAll(newGrams.groupBy("gram").agg(count(lit(1)).as("n")))
      .groupBy("gram").agg(sum("n").as("n"))
    val nTot = props("n_dl").toLong + nNew
    val sumTot = props("sum_dl").toLong + sumNew
    writeLexParts(s, newPath, newPost, newGrams, gramstats, nTot,
      sumTot)
    // provenance merges ADDITIVELY from the admitted parent + the
    // batch — the append contract's "write cost strictly ∝ batch"
    // holds for the sidecar too ([[writeSliceProvenanceAppended]])
    writeSliceProvenanceAppended(s, newPath, batch, dir, props, Map(
      "n_dl" -> nTot.toString, "sum_dl" -> sumTot.toString,
      "parent" -> oldPath))
  }

  /** The shared admission prefix of the two lexical refresh writers:
    * tag, provenance version, boundary presence, and the old-slice
    * guard ([[requireDocSlice]]). Returns (cut, props, full-corpus
    * docs). */
  private def lexAdmission(s: SparkSession, dir: String,
      oldPath: String): (Long, Map[String, String],
      org.apache.spark.sql.DataFrame) = {
    ArtifactTag.require(s, oldPath, dir)
    val props = ArtifactTag.readProps(s, oldPath)
    ArtifactTag.requireProvVersion(props, oldPath)
    require(props.contains("max_doc_id"),
      s"lexical index at $oldPath carries no max_doc_id provenance — " +
        "an empty or pre-delta index has no incremental mode; run the " +
        "full lexicalIndex build once")
    val cut = props("max_doc_id").toLong + 1L
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    requireDocSlice(s, props, oldPath, docs, cut,
      "indexed", "re-index the corpus instead")
    (cut, props, docs)
  }

  /** Resolve an artifact's generation chain, head first — a merged
    * artifact is its own 1-element chain (no `parent` prop), an
    * append generation points at its predecessor. Every generation's
    * corpus tag is re-verified (a chain must not silently cross
    * corpora), depth is bounded, and a cycle refuses. Shared by the
    * lexical and feature-store generational modes (one walker — two
    * copies could drift on the guard rules). */
  private[graft] def genChain(s: SparkSession, path: String,
      tag: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var p = path
    while (p != null) {
      require(!out.contains(p),
        s"artifact chain at $path cycles through $p — the parent " +
          "pointers are corrupt; rebuild the artifact")
      require(out.size < 64,
        s"artifact chain at $path exceeds 64 generations — compact it " +
          "(the family's merge writer over the chain head collapses " +
          "the chain into one artifact)")
      ArtifactTag.require(s, p, tag)
      out += p
      p = ArtifactTag.readProps(s, p).getOrElse("parent", null)
    }
    out.toSeq
  }

  /** One index part unioned across a chain — per-generation sorted
    * scans, so pushed filters prune row groups inside every
    * generation. */
  private[graft] def chainRead(s: SparkSession, path: String,
      tag: String, part: String,
      cols: Seq[String]): org.apache.spark.sql.DataFrame =
    genChain(s, path, tag)
      .map(p => s.read.parquet(s"$p/$part")
        .select(cols.map(col): _*))
      .reduce(_ unionAll _)

  /** The merged frames a delta refresh writes — ONE definition shared
    * with the spec's plan pin (the [[graft.operators.Dedup
    * .ccIncrementalStage]] discipline), so the pinned plan is the very
    * plan the writer executes: the old side of every merged frame is a
    * parquet scan of the INDEX files — the merged plans contain no
    * `documents` scan at all (spec-pinned); the new side tokenizes
    * only the `doc_id ≥ cut` batch, the filter applied before
    * tokenization by construction ([[lexBatchParts]] over the filtered
    * slice, whose eager checkpoint is where the one corpus read
    * happens). */
  private[graft] def lexDeltaParts(s: SparkSession,
      docs: org.apache.spark.sql.DataFrame, oldPath: String, cut: Long,
      nOld: Long, sumOld: Long): (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
      Long, Long) = {
    val (newPost, newGrams, nNew, sumNew) =
      lexBatchParts(s, docs.filter(col("doc_id") >= cut))
    // the old side resolves the GENERATION CHAIN (one scan for a
    // merged artifact; per-generation scans for an append chain) —
    // which is what makes this writer the chain's COMPACTION: a merge
    // refresh over a chain head collapses every generation into one
    // artifact. The tag is taken from the head's own sidecar: callers
    // already admitted the head against the corpus dir, and the chain
    // walk re-verifies each generation against the same tag.
    val tag = ArtifactTag.readTag(s, oldPath)
    val postings = chainRead(s, oldPath, tag, "postings",
        Seq("tok", "doc_id", "dl", "tf"))
      .unionAll(newPost.select("tok", "doc_id", "dl", "tf"))
    val grams = chainRead(s, oldPath, tag, "grams",
        Seq("doc_id", "pos", "gram"))
      .unionAll(newGrams.select("doc_id", "pos", "gram"))
    // occurrence totals merge additively from the HEAD's cumulative
    // gramstats ∪ new-batch counts (never re-counts the old postings,
    // and never chain-unions — each generation's totals are cumulative)
    val gramstats = s.read.parquet(s"$oldPath/gramstats")
      .select("gram", "n")
      .unionAll(newGrams.groupBy("gram").agg(count(lit(1)).as("n")))
      .groupBy("gram").agg(sum("n").as("n"))
    (postings, grams, gramstats, nOld + nNew, sumOld + sumNew)
  }

  /** Tokenize ONE (doc_id, text) batch into its index contribution:
    * (postings, positional grams, n_dl, sum_dl). Shared by the full
    * writer and the delta writer, so batch rows can never drift from
    * rebuild rows. */
  private def lexBatchParts(s: SparkSession,
      docs: org.apache.spark.sql.DataFrame): (org.apache.spark.sql
      .DataFrame, org.apache.spark.sql.DataFrame, Long, Long) = {
    val c = docs
      .select(col("doc_id"), Fns.tokens(col("text")).as("w"))
      .select(col("doc_id"), col("w"), size(col("w")).as("dl"))
      .filter(col("dl") > 0)
      .localCheckpoint() // consumed by the stats agg AND the postings
    val postings = c
      .select(col("doc_id"), col("dl"), explode(col("w")).as("tok"))
      .groupBy("tok", "doc_id", "dl").agg(count(lit(1)).as("tf"))
    val st = c.agg(count(lit(1)), sum("dl")).head()
    val grams = docs
      .select(col("doc_id"),
        posexplode_outer(Fns.shingles3(Fns.tokens(col("text")))))
      .toDF("doc_id", "pos", "gram")
      .filter(col("gram").isNotNull)
      .localCheckpoint() // consumed by the postings write + the stats
    (postings, grams, st.getLong(0),
      if (st.isNullAt(1)) 0L else st.getLong(1))
  }

  /** Lay out the four lexical-index parts (see [[lexicalIndex]] for
    * the per-part sort rationale). The stats row is written from the
    * additive (n_dl, Σdl) facts — bit-equal to `avg(dl)` (integer dl,
    * exact double sums below 2⁵³), and the ONLY form a delta refresh
    * can reproduce without rescanning old documents. */
  private def writeLexParts(s: SparkSession, path: String,
      postings: org.apache.spark.sql.DataFrame,
      grams: org.apache.spark.sql.DataFrame,
      gramstats: org.apache.spark.sql.DataFrame,
      nDl: Long, sumDl: Long): Unit = {
    postings.repartitionByRange(col("tok"))
      .sortWithinPartitions("tok", "doc_id")
      .write.parquet(s"$path/postings")
    s.range(1).select(lit(nDl.toDouble).as("n"),
        (if (nDl == 0L) lit(null).cast("double")
         else lit(sumDl.toDouble / nDl)).as("avgdl"))
      .coalesce(1).write.parquet(s"$path/stats")
    grams.repartitionByRange(col("gram"))
      .sortWithinPartitions("gram", "doc_id")
      .write.parquet(s"$path/grams")
    gramstats.write.parquet(s"$path/gramstats")
  }

  /** Materialize the PQ index `ann_pq_topk`'s scale story promises:
    * the (vec_id, sub, code) byte-codes under `path`/codes — the ONLY
    * per-vector state a probe ever reads, 8 bytes of payload per
    * vector vs 256 for the float32 embedding — plus the (sub, cid,
    * cvec) codebooks (≤ 8×256 rows of broadcast metadata) under
    * `path`/codebooks. Codes pack vec_id-sorted so a filtered re-rank
    * (IVF-PQ composition: cell candidates → ADC scores) prunes row
    * groups by vec_id range. */
  def pqIndex(s: SparkSession, dir: String, path: String): Unit =
    pqIndexOf(s, Tables.embeddings(s, dir)
      .select("vec_id", "embedding"), path, dir)

  /** [[pqIndex]] over an explicit (vec_id, embedding) slice — the
    * base build of the PQ generational append cycle, with the same
    * write-once + provenance discipline as the signature indexes. */
  def pqIndexOf(s: SparkSession, vecs: org.apache.spark.sql.DataFrame,
      path: String, tag: String): Unit = {
    requireFresh(s, path)
    val (codes, cb) = graft.operators.Similarity.pqBuildOf(s, vecs)
    codes.repartitionByRange(col("vec_id"))
      .sortWithinPartitions("vec_id", "sub")
      .write.parquet(s"$path/codes")
    cb.coalesce(1).write.parquet(s"$path/codebooks")
    writeVecProvenance(s, path, vecs, tag)
  }

  // ——— Vector-index generational append (round 14: the one index
  // family still rebuilding from scratch — minhash/simhash/lexical/
  // gram/feature-store all had the LSM rung already) ———

  /** Per-row vector content hash for the embedding-slice checksum —
    * the [[SliceXor]] idea on the vector side (xxhash64 hashes the
    * float array natively; Spark-side admission only, never
    * oracle-replayed). */
  private val VecSliceXor = "bit_xor(xxhash64(vec_id, embedding))"

  /** (n_vecs, content_xor, max_vec_id) provenance for a vector-index
    * artifact — what an append cycle needs to define its id boundary
    * and refuse id reuse/backfill/in-place edits of already-indexed
    * vectors (the [[writeSliceProvenance]] discipline). */
  private def writeVecProvenance(s: SparkSession, path: String,
      vecs: org.apache.spark.sql.DataFrame, tag: String,
      extra: Map[String, String] = Map.empty): Unit = {
    ArtifactTag.write(s, path, tag)
    val r = vecs.select("vec_id", "embedding")
      .agg(count(lit(1L)), expr(VecSliceXor), max("vec_id")).head()
    val xor = if (r.isNullAt(1)) 0L else r.getLong(1)
    ArtifactTag.writeProps(s, path, Map(
      "prov_ver" -> ArtifactTag.ProvVersion,
      "n_vecs" -> r.getLong(0).toString,
      "content_xor" -> xor.toString) ++
      (if (r.isNullAt(2)) Map.empty[String, String]
       else Map("max_vec_id" -> r.getLong(2).toString)) ++ extra)
  }

  /** Additive provenance for a vector APPEND generation — parent ⊕
    * batch, so the append's compute stays strictly ∝ batch (the
    * [[writeSliceProvenanceAppended]] soundness argument: disjoint
    * union, XOR/count/max all merge). */
  private def writeVecProvenanceAppended(s: SparkSession, path: String,
      batch: org.apache.spark.sql.DataFrame, tag: String,
      parent: Map[String, String],
      extra: Map[String, String] = Map.empty): Unit = {
    ArtifactTag.write(s, path, tag)
    val r = batch.select("vec_id", "embedding")
      .agg(count(lit(1L)), expr(VecSliceXor), max("vec_id")).head()
    val bXor = if (r.isNullAt(1)) 0L else r.getLong(1)
    val maxId = (parent.get("max_vec_id").map(_.toLong) ++
      (if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .reduceOption(_ max _)
    ArtifactTag.writeProps(s, path, Map(
      "prov_ver" -> ArtifactTag.ProvVersion,
      "n_vecs" -> (parent("n_vecs").toLong + r.getLong(0)).toString,
      "content_xor" ->
        (parent("content_xor").toLong ^ bXor).toString) ++
      maxId.map(m => "max_vec_id" -> m.toString) ++ extra)
  }

  /** The shared admission prefix of the vector append writers
    * ([[sigAdmission]] on the embedding side): tag, provenance
    * version, boundary presence, and the old-slice replay —
    * count-only under `graft.artifact.trustOldContent`, full
    * [[VecSliceXor]] checksum otherwise. Returns (cut, props,
    * full-corpus vecs). */
  private def vecAdmission(s: SparkSession, dir: String,
      oldPath: String, what: String): (Long, Map[String, String],
      org.apache.spark.sql.DataFrame) = {
    ArtifactTag.require(s, oldPath, dir)
    val props = ArtifactTag.readProps(s, oldPath)
    ArtifactTag.requireProvVersion(props, oldPath)
    require(props.contains("max_vec_id"),
      s"$what index at $oldPath carries no max_vec_id provenance — an " +
        "empty or pre-provenance index has no append mode; rebuild it " +
        "with the Materialize writer")
    val cut = props("max_vec_id").toLong + 1L
    val vecs = Tables.embeddings(s, dir).select("vec_id", "embedding")
    val below = vecs.filter(col("vec_id") < cut)
    if (trustOldContent(s)) {
      val n = below.count()
      require(props.get("n_vecs").contains(n.toString),
        s"old-slice count mismatch at $oldPath (artifact " +
          s"n=${props.getOrElse("n_vecs", "<none>")}, corpus n=$n) — " +
          s"vectors appeared or vanished below the boundary ($cut) " +
          s"since the previous cycle indexed the slice; re-index with " +
          s"the full $what writer instead")
    } else {
      val r = below.agg(count(lit(1L)), expr(VecSliceXor)).head()
      val xor = if (r.isNullAt(1)) 0L else r.getLong(1)
      require(props.get("n_vecs").contains(r.getLong(0).toString)
          && props.get("content_xor").contains(xor.toString),
        s"old-slice checksum mismatch at $oldPath (artifact " +
          s"n=${props.getOrElse("n_vecs", "<none>")} " +
          s"xor=${props.getOrElse("content_xor", "<none>")}, corpus " +
          s"n=${r.getLong(0)} xor=$xor) — the vectors below the " +
          s"boundary ($cut) are not the slice the previous cycle " +
          s"indexed (id reuse, backfill, or in-place edits); re-index " +
          s"with the full $what writer instead")
    }
    (cut, props, vecs)
  }

  /** GENERATIONAL (append-mode) refresh of the IVF index — the
    * nightly-embedding-ingest rung the vector family was missing:
    * the new batch assigns to the head's FROZEN coarse quantizer
    * ([[graft.operators.Similarity.ivfAssignFrozen]] — the
    * `ann_index_upsert` no-retrain recipe, now writing the artifact),
    * and the generation holds ONLY the batch's cell-partitioned rows
    * plus a `parent` pointer and additive provenance — write cost
    * strictly ∝ batch, no old vector re-read or re-assigned. The
    * ≤ 256-row centroid metadata travels WITH every generation (a
    * duplicated tiny file beats a second chain walk on every probe).
    * Readers resolve [[genChain]] and union per-generation
    * cell-pruned scans; COMPACTION = [[ivfIndexCompact]], a pure
    * columnar chain-collapse (assignments against a frozen quantizer
    * never recompute). Growth skew across cells remains the rebuild
    * trigger `ann_index_upsert` measures. */
  def ivfIndexAppend(s: SparkSession, dir: String, oldPath: String,
      newPath: String): Unit = {
    requireFresh(s, newPath)
    val (cut, props, vecs) = vecAdmission(s, dir, oldPath, "ivf")
    val batch = vecs.filter(col("vec_id") >= cut)
    val cents = s.read.parquet(s"$oldPath/centroids")
    partitioned(graft.operators.Similarity.ivfAssignFrozen(batch, cents),
      s"$newPath/index", Seq("cid"), Seq("vec_id"))
    cents.coalesce(1).write.parquet(s"$newPath/centroids")
    writeVecProvenanceAppended(s, newPath, batch, dir, props,
      Map("parent" -> oldPath))
  }

  /** [[ivfIndexAppend]] for the PQ byte-code index: the batch encodes
    * against the head's FROZEN codebooks
    * ([[graft.operators.Similarity.pqEncodeFrozen]]), the generation
    * holds the batch's vec_id-sorted code rows + the codebook copy +
    * parent pointer. Quantization drift under a frozen codebook is
    * the rebuild trigger (the same story as IVF cell skew). */
  def pqIndexAppend(s: SparkSession, dir: String, oldPath: String,
      newPath: String): Unit = {
    requireFresh(s, newPath)
    val (cut, props, vecs) = vecAdmission(s, dir, oldPath, "pq")
    val batch = vecs.filter(col("vec_id") >= cut)
    val cb = s.read.parquet(s"$oldPath/codebooks")
    graft.operators.Similarity.pqEncodeFrozen(batch, cb)
      .repartitionByRange(col("vec_id"))
      .sortWithinPartitions("vec_id", "sub")
      .write.parquet(s"$newPath/codes")
    cb.coalesce(1).write.parquet(s"$newPath/codebooks")
    writeVecProvenanceAppended(s, newPath, batch, dir, props,
      Map("parent" -> oldPath))
  }

  /** COMPACTION of an IVF generation chain: chain-union of the
    * per-generation cell rows → ONE re-partitioned cell-partitioned
    * write + the head's centroids + the head's (cumulative) props
    * without a parent pointer. Pure columnar I/O — frozen-quantizer
    * assignments never recompute. MaterializeSpec pins compacted ≡
    * chain row sets. */
  def ivfIndexCompact(s: SparkSession, dir: String, headPath: String,
      newPath: String): Unit = {
    requireFresh(s, newPath)
    ArtifactTag.require(s, headPath, dir)
    val props = ArtifactTag.readProps(s, headPath)
    ArtifactTag.requireProvVersion(props, headPath)
    partitioned(
      chainRead(s, headPath, dir, "index",
        Seq("vec_id", "embedding", "cid")),
      s"$newPath/index", Seq("cid"), Seq("vec_id"))
    s.read.parquet(s"$headPath/centroids")
      .coalesce(1).write.parquet(s"$newPath/centroids")
    ArtifactTag.write(s, newPath, dir)
    ArtifactTag.writeProps(s, newPath, props - "parent")
  }

  /** [[ivfIndexCompact]] for the PQ chain: codes re-sort to one
    * vec_id-range artifact, head codebooks + props carry over. */
  def pqIndexCompact(s: SparkSession, dir: String, headPath: String,
      newPath: String): Unit = {
    requireFresh(s, newPath)
    ArtifactTag.require(s, headPath, dir)
    val props = ArtifactTag.readProps(s, headPath)
    ArtifactTag.requireProvVersion(props, headPath)
    chainRead(s, headPath, dir, "codes", Seq("vec_id", "sub", "code"))
      .repartitionByRange(col("vec_id"))
      .sortWithinPartitions("vec_id", "sub")
      .write.parquet(s"$newPath/codes")
    s.read.parquet(s"$headPath/codebooks")
      .coalesce(1).write.parquet(s"$newPath/codebooks")
    ArtifactTag.write(s, newPath, dir)
    ArtifactTag.writeProps(s, newPath, props - "parent")
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
    * → prior-day snapshot table behind `feature_pit_join`, written
    * once per refresh under `path`/snapshots, (user_id, day)-range-
    * sorted so a training-set build's equi-join point-reads prune row
    * groups by user range, and no consumer ever re-runs the cumulative
    * windows. Since round 12 the artifact also carries
    * `path`/totals — per-user running totals INCLUDING every stored
    * day — because the snapshot rows alone cannot seed a delta
    * refresh: a snapshot's priors EXCLUDE its own day, so the next
    * day's priors would need that day's daily aggregates, which live
    * only in the events table ([[featureStoreDelta]] reads the
    * O(users) totals instead of rescanning events). Write-once + tag
    * + versioned provenance (n_events / events_xor / max_day over the
    * events slice), the signature-index discipline on the feature
    * side. */
  def featureStore(s: SparkSession, dir: String, path: String): Unit =
    featureStoreOf(s, graft.operators.Training.pitEvents(s, dir), path,
      dir)

  /** [[featureStore]] over an explicit (event_id, user_id, event_type,
    * day, v_centi) event slice — the old-cycle state
    * [[featureStoreDelta]] refreshes from (a previous cycle persisted
    * its store over events with day ≤ its max_day). */
  def featureStoreOf(s: SparkSession, ev: org.apache.spark.sql.DataFrame,
      path: String, tag: String): Unit = {
    requireFresh(s, path)
    val daily = graft.operators.Training.pitDaily(ev).localCheckpoint()
    writeFeatureParts(s, path,
      graft.operators.Training.pitFeatureFromDaily(daily),
      totalsOf(daily))
    writeEventProvenance(s, path, ev, tag)
  }

  /** INCREMENTAL refresh of the feature store — the artifact a
    * production pipeline refreshes most often (daily), and
    * append-only by construction: a snapshot for day D uses only
    * events BEFORE D, so rows for days ≤ the stored max_day never
    * change when later events arrive. The stored `max_day` defines
    * the cut; only events with day > max_day aggregate (work ∝
    * batch); each new day's priors seed from the stored per-user
    * totals plus a window over the BATCH's own earlier days; old
    * snapshot rows merge in as a pure parquet scan; totals merge
    * additively. All sums are longs, so {stored + delta} is
    * row-identical to a full rebuild (TrainingSpec pins it).
    *
    * Guards: corpus tag, provenance version, max_day presence, and
    * the ≤-max_day event-slice checksum replay — LATE-ARRIVING events
    * (day ≤ max_day) refuse loudly, because their day's snapshot and
    * every later prior would silently understate; so do edits or
    * backfill of already-stored events. */
  def featureStoreDelta(s: SparkSession, dir: String, oldPath: String,
      newPath: String): Unit = {
    requireFresh(s, newPath)
    val (cutDay, _, ev) = featAdmission(s, dir, oldPath)
    val newDaily = graft.operators.Training
      .pitDaily(ev.filter(col("day") > cutDay))
      .localCheckpoint() // consumed by the snapshots AND the totals
    // old snapshots resolve the GENERATION CHAIN (one scan for a
    // merged store; per-generation scans for an append chain) — which
    // makes this writer the chain's COMPACTION, the lexDeltaParts rule
    val snapshots = chainRead(s, oldPath, ArtifactTag.readTag(s, oldPath),
        "snapshots", Seq("user_id", "day", "n_events_prior",
          "n_purchases_prior", "value_centi_prior", "days_active_prior"))
      .unionAll(featSeeded(s, oldPath, newDaily))
    writeFeatureParts(s, newPath, snapshots,
      featTotalsMerged(s, oldPath, newDaily))
    writeEventProvenance(s, newPath, ev, dir)
  }

  /** GENERATIONAL (append-mode) refresh of the feature store — the
    * [[lexicalIndexAppend]] shape on the feature side, and the natural
    * one: snapshots are append-only BY DAY, so a generation holds ONLY
    * the batch days' seeded snapshot rows plus the O(users) merged
    * totals (the next cycle's seed — cumulative at every head, the
    * gramstats rule) and a `parent` pointer. Write cost carries no
    * old-snapshot rewrite — the merge writer's one history-
    * proportional term; the PIT readers resolve the chain and union
    * per-generation (user, day)-sorted scans. Compaction =
    * [[featureStoreDelta]] over the chain head. */
  def featureStoreAppend(s: SparkSession, dir: String, oldPath: String,
      newPath: String): Unit = {
    requireFresh(s, newPath)
    val (cutDay, props, ev) = featAdmission(s, dir, oldPath)
    val batch = ev.filter(col("day") > cutDay)
    val newDaily = graft.operators.Training.pitDaily(batch)
      .localCheckpoint() // consumed by the snapshots AND the totals
    writeFeatureParts(s, newPath, featSeeded(s, oldPath, newDaily),
      featTotalsMerged(s, oldPath, newDaily))
    // additive sidecar from the admitted parent + the batch events —
    // the [[writeSliceProvenanceAppended]] rule on the event side
    writeEventProvenanceAppended(s, newPath, batch, dir, props,
      Map("parent" -> oldPath))
  }

  /** The shared admission prefix of the two feature-store refresh
    * writers ([[lexAdmission]]'s sibling): tag, provenance version,
    * boundary presence, and the stored-event-slice guard (checksum
    * replay, or the count guard under [[trustOldContent]]). Returns
    * (cutDay, props, full pitEvents frame). */
  private def featAdmission(s: SparkSession, dir: String,
      oldPath: String): (Long, Map[String, String],
      org.apache.spark.sql.DataFrame) = {
    ArtifactTag.require(s, oldPath, dir)
    val props = ArtifactTag.readProps(s, oldPath)
    ArtifactTag.requireProvVersion(props, oldPath)
    require(props.contains("max_day"),
      s"feature store at $oldPath carries no max_day provenance — an " +
        "empty or pre-delta store has no incremental mode; run the " +
        "full featureStore build once")
    val cutDay = props("max_day").toLong
    val ev = graft.operators.Training.pitEvents(s, dir)
    val below = ev.filter(col("day") <= cutDay)
    if (trustOldContent(s)) {
      val n = below.count()
      require(props.get("n_events").contains(n.toString),
        s"stored-slice count mismatch at $oldPath (store " +
          s"n=${props.getOrElse("n_events", "<none>")}, events n=$n) " +
          s"— events arrived at day ≤ $cutDay since the previous " +
          "cycle snapshotted (late-arriving events or backfill); " +
          "rebuild the store instead")
    } else {
      val (n, xor) = eventSliceChecksum(below)
      require(props.get("n_events").contains(n.toString)
          && props.get("events_xor").contains(xor.toString),
        s"stored-slice checksum mismatch at $oldPath (store " +
          s"n=${props.getOrElse("n_events", "<none>")} " +
          s"xor=${props.getOrElse("events_xor", "<none>")}, " +
          s"events n=$n xor=$xor) — the events at day ≤ $cutDay are " +
          "not the slice the previous cycle snapshotted " +
          "(late-arriving events, edits, or backfill); rebuild the " +
          "store instead")
    }
    (cutDay, props, ev)
  }

  /** The batch days' snapshot rows, priors seeded from the stored
    * per-user totals — within-batch priors from a window over the new
    * days only, plus the HEAD's cumulative totals (0 for users first
    * seen in the batch): exactly the rebuild's unbounded window split
    * at the cut, term by term, in long arithmetic. ONE definition for
    * the merge and append writers. */
  private def featSeeded(s: SparkSession, oldPath: String,
      newDaily: org.apache.spark.sql.DataFrame): org.apache.spark.sql
      .DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val prior = w.partitionBy("user_id").orderBy("day")
      .rowsBetween(w.unboundedPreceding, -1)
    val oldTotals = s.read.parquet(s"$oldPath/totals")
      .select(col("user_id"), col("n_total").as("t_n"),
        col("n_purch_total").as("t_purch"), col("v_total").as("t_v"),
        col("days_total").as("t_days"))
    newDaily
      .withColumn("b_n", coalesce(sum("n").over(prior), lit(0L)))
      .withColumn("b_purch", coalesce(sum("n_purch").over(prior), lit(0L)))
      .withColumn("b_v", coalesce(sum("v_sum").over(prior), lit(0L)))
      .withColumn("b_days", coalesce(count(lit(1)).over(prior), lit(0L)))
      .join(oldTotals, Seq("user_id"), "left")
      .select(col("user_id"), col("day"),
        (col("b_n") + coalesce(col("t_n"), lit(0L)))
          .as("n_events_prior"),
        (col("b_purch") + coalesce(col("t_purch"), lit(0L)))
          .as("n_purchases_prior"),
        (col("b_v") + coalesce(col("t_v"), lit(0L)))
          .as("value_centi_prior"),
        (col("b_days") + coalesce(col("t_days"), lit(0L)))
          .as("days_active_prior"))
  }

  /** Totals merged additively from the HEAD's cumulative totals ∪ the
    * batch's (full outer via union+groupBy: batch-only users appear,
    * old-only users carry over) — never chain-unioned, the gramstats
    * rule. ONE definition for the merge and append writers. */
  private def featTotalsMerged(s: SparkSession, oldPath: String,
      newDaily: org.apache.spark.sql.DataFrame): org.apache.spark.sql
      .DataFrame =
    s.read.parquet(s"$oldPath/totals")
      .select("user_id", "n_total", "n_purch_total", "v_total",
        "days_total")
      .unionAll(totalsOf(newDaily))
      .groupBy("user_id")
      .agg(sum("n_total").as("n_total"),
        sum("n_purch_total").as("n_purch_total"),
        sum("v_total").as("v_total"),
        sum("days_total").as("days_total"))

  /** Per-user running totals over a daily frame — the delta seed.
    * `v_total` coalesces a sum that is null only when every summand
    * is (matching the rebuild's coalesce-to-0 of the prior window). */
  private def totalsOf(
      daily: org.apache.spark.sql.DataFrame): org.apache.spark.sql
      .DataFrame =
    daily.groupBy("user_id")
      .agg(sum("n").as("n_total"),
        sum("n_purch").as("n_purch_total"),
        coalesce(sum("v_sum"), lit(0L)).as("v_total"),
        count(lit(1)).as("days_total"))

  private def writeFeatureParts(s: SparkSession, path: String,
      snapshots: org.apache.spark.sql.DataFrame,
      totals: org.apache.spark.sql.DataFrame): Unit = {
    snapshots.repartitionByRange(col("user_id"), col("day"))
      .sortWithinPartitions("user_id", "day")
      .write.parquet(s"$path/snapshots")
    totals.repartitionByRange(col("user_id"))
      .sortWithinPartitions("user_id")
      .write.parquet(s"$path/totals")
  }

  /** The per-event content hash the store's provenance XORs — the
    * [[SliceXor]] idea over the five columns the snapshots derive
    * from; any edit, id reuse, or late arrival below the cut flips it
    * w.h.p. */
  private val EventXor = "bit_xor(xxhash64(event_id, user_id, day, " +
    "v_centi, coalesce(event_type, '<null>')))"

  private[graft] def eventSliceChecksum(
      ev: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val r = ev.agg(count(lit(1L)), expr(EventXor)).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** [[writeSliceProvenanceAppended]] on the event side: n_events
    * adds, events_xor XORs, max_day maxes from the parent's verified
    * props + a batch-only aggregate — the feature-store append cycle
    * never re-hashes stored events. */
  private def writeEventProvenanceAppended(s: SparkSession, path: String,
      batch: org.apache.spark.sql.DataFrame, tag: String,
      parent: Map[String, String],
      extra: Map[String, String] = Map.empty): Unit = {
    ArtifactTag.write(s, path, tag)
    val r = batch.agg(count(lit(1L)), expr(EventXor), max("day")).head()
    val bXor = if (r.isNullAt(1)) 0L else r.getLong(1)
    val maxDay = (parent.get("max_day").map(_.toLong) ++
      (if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .reduceOption(_ max _)
    ArtifactTag.writeProps(s, path, Map(
      "prov_ver" -> ArtifactTag.ProvVersion,
      "n_events" -> (parent("n_events").toLong + r.getLong(0)).toString,
      "events_xor" ->
        (parent("events_xor").toLong ^ bXor).toString) ++
      maxDay.map(m => "max_day" -> m.toString) ++ extra)
  }

  private def writeEventProvenance(s: SparkSession, path: String,
      ev: org.apache.spark.sql.DataFrame, tag: String,
      extra: Map[String, String] = Map.empty): Unit = {
    ArtifactTag.write(s, path, tag)
    // one fused pass for all three facts (the writeSliceProvenance
    // rule): count + content xor + the max stored day that defines
    // the next delta's cut
    val r = ev.agg(count(lit(1L)), expr(EventXor), max("day")).head()
    val xor = if (r.isNullAt(1)) 0L else r.getLong(1)
    ArtifactTag.writeProps(s, path, Map(
      "prov_ver" -> ArtifactTag.ProvVersion,
      "n_events" -> r.getLong(0).toString,
      "events_xor" -> xor.toString) ++
      (if (r.isNullAt(2)) Map.empty[String, String]
       else Map("max_day" -> r.getLong(2).toString)) ++ extra)
  }
}
