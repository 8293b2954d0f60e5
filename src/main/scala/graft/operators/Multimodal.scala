package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** §2F — multimodal (opaque binary) column plumbing.
  *
  * Images/audio/video are carried as opaque `binary` payloads with typed
  * metadata. The decode step is STUBBED (no media libs in this
  * environment): `mm_feature_extract` runs a deterministic fake
  * byte-statistics "decoder". What is real and load-bearing for 100 TB:
  * the schema (binary + metadata columns), batched per-partition
  * processing (the Scala analogue of `mapInPandas` — decode cost is
  * amortized over batches, memory bounded by batch size), and the fact
  * that nothing leaves the executors.
  */
object Multimodal {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta" -> binaryMeta,
    "mm_feature_extract" -> featureExtract,
    "mm_frame_sample" -> frameSample
  )

  /** Frame sampling over an opaque payload — the video-shaped access
    * pattern: fixed-width frames at a stride (every 2nd 32-byte frame
    * here), each fingerprinted independently. The explode is
    * executor-side (`sequence` up to len/step per row, no driver
    * loop) and each output row carries a fingerprint, not the frame
    * bytes — at 100 TB the frame table is what shuffles, so it must be
    * hashes + offsets, never payload slices. Payload = UTF-8 bytes of
    * `text` (ASCII data), so the DuckDB oracle can chunk the same
    * string and md5 the same byte ranges.
    *
    * Empty payloads are filtered on BOTH engines: for length 0 Spark's
    * truncate-toward-zero `(len-1)/step → 0` and DuckDB's floor `//`
    * `→ -1` disagree (a phantom frame-0 row vs no row); with length ≥ 1
    * the frame count is non-negative and the two divisions coincide. */
  def frameSample(s: SparkSession, d: String): DataFrame = {
    val frame = 32
    val step = frame * 2 // stride 2: sample every other frame
    Tables.documents(s, d)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0),
          ((length(col("text")) - 1) / step).cast("int"))).as("frame_no"))
      .select(col("doc_id"), col("frame_no").cast("long").as("frame_no"),
        md5(expr(s"substring(text, frame_no * $step + 1, $frame)"))
          .as("frame_md5"),
        expr(s"length(substring(text, frame_no * $step + 1, $frame))")
          .cast("long").as("frame_chars"))
      .orderBy("doc_id", "frame_no")
  }

  /** Opaque-binary metadata: byte size, md5-derived hash bucket, and a
    * "magic bytes" sniff of the first 2 bytes (hex). */
  def binaryMeta(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .select(col("doc_id"),
        expr("octet_length(payload)").cast("long").as("n_bytes"),
        (instr(lit("0123456789abcdef"), substring(md5(col("text")), 1, 1))
          - 1).cast("long").as("md5_bucket"),
        hex(encode(substring(col("text"), 1, 2), "UTF-8")).as("magic"))
      .orderBy("doc_id")

  case class Payload(doc_id: Long, payload: Array[Byte])
  case class Features(doc_id: Long, n_bytes: Long,
      mean_byte: Double, max_byte: Int, rolling: Long)

  /** Batched per-partition feature extraction over binary payloads.
    * The decode is a deterministic stand-in (byte statistics); the
    * plumbing — binary column in, fixed-width feature row out, batch
    * loop inside `mapPartitions` — is the real contract. Rows-only. */
  def featureExtract(s: SparkSession, d: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val batchSize = 64
    Tables.documents(s, d)
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .select(col("doc_id"), col("payload"))
      .as[Payload]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // STUB decoder: real impl would decode image/audio bytes here,
          // one batch at a time (model inference amortization).
          batch.map { p =>
            var sum = 0L; var max = 0; var roll = 1125899906842597L
            var i = 0
            while (i < p.payload.length) {
              val b = p.payload(i) & 0xff
              sum += b; if (b > max) max = b
              roll = java.lang.Long.rotateLeft(roll, 5) ^ b.toLong
              i += 1
            }
            val n = p.payload.length
            Features(p.doc_id, n.toLong,
              if (n == 0) 0.0 else sum.toDouble / n, max, roll)
          }
        }
      }(Encoders.product[Features])
      .toDF()
      .orderBy("doc_id")
  }

  val oracles: Map[String, String] = Map(
    "mm_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id, text,
        |    unnest(generate_series(0, (length(text) - 1) // 64)) AS k
        |  FROM documents WHERE length(text) > 0)
        |SELECT doc_id, k::BIGINT AS frame_no,
        |  md5(substring(text, (k * 64 + 1)::INT, 32)) AS frame_md5,
        |  length(substring(text, (k * 64 + 1)::INT, 32))::BIGINT
        |    AS frame_chars
        |FROM f ORDER BY doc_id, frame_no""".stripMargin,
    "mm_binary_meta" ->
      """SELECT doc_id,
        |  octet_length(encode(text))::BIGINT AS n_bytes,
        |  (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1)::BIGINT
        |    AS md5_bucket,
        |  hex(encode(substring(text, 1, 2))) AS magic
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
