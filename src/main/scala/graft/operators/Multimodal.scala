package graft.operators

import graft.Tables
import graft.queries.QueryDef
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: opaque `binary` payloads with typed
 * metadata, processed in partition-local batches.
 *
 * The container has no image/audio codecs, so the DECODE STEP IS A STUB —
 * [[StubDecoder.decode]] derives deterministic fake dimensions from the
 * byte stream. Everything around it is the real Spark shape for
 * multimodal corpora at 100 TB:
 *  - payloads live in a BINARY column next to a metadata struct (the
 *    parquet layout used for image/audio shards);
 *  - feature extraction runs via mapPartitions over a typed Dataset in
 *    fixed-size batches (the vectorized-decoder call shape: batch in,
 *    batch out, no per-row JNI crossings);
 *  - nothing is collected to the driver; output is columnar features.
 *
 * The `documents.text` bytes stand in for media payloads in the testdata.
 */
object Multimodal {

  final case class BinaryDoc(doc_id: Long, payload: Array[Byte],
      lang: String, source: String)

  final case class MediaFeatures(doc_id: Long, n_bytes: Int,
      payload_md5: String, width: Int, height: Int, format: String)

  /** The stubbed media decoder. Deterministic arithmetic on the payload —
    * replace with a real codec (??? boundary) when the runtime has one. */
  object StubDecoder {
    val BatchSize = 64

    def decode(batch: Seq[BinaryDoc]): Seq[MediaFeatures] = batch.map { d =>
      val n = d.payload.length
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(d.payload).map("%02x".format(_)).mkString
      MediaFeatures(
        doc_id = d.doc_id,
        n_bytes = n,
        payload_md5 = hex,
        width = 64 + n % 577,
        height = 64 + (n * 31) % 353,
        format = Vector("jpeg", "png", "webp")(n % 3))
    }
  }

  /** documents → (doc_id, payload BINARY, metadata struct). */
  def toBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(col("lang"), col("source"), col("n_chars")).as("meta"))

  /** Batched partition-local feature extraction over the binary column. */
  def extractFeatures(spark: SparkSession, binaryDocs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    binaryDocs
      .select(col("doc_id"), col("payload"),
        col("meta.lang").as("lang"), col("meta.source").as("source"))
      .as[BinaryDoc]
      .mapPartitions { it =>
        it.grouped(StubDecoder.BatchSize).flatMap(StubDecoder.decode)
      }
  }

  final case class ResizedMedia(doc_id: Long, width: Int, height: Int,
      thumb_w: Int, thumb_h: Int)

  /** Stub resize: fit into a ThumbBox square with integer math (the
    * shape of a thumbnailing stage — batch in, batch out; a real impl
    * swaps the arithmetic for the codec call). */
  object StubResizer {
    val ThumbBox = 128

    def resize(batch: Seq[MediaFeatures]): Seq[ResizedMedia] = batch.map { f =>
      val m = math.max(f.width, f.height)
      if (m <= ThumbBox) ResizedMedia(f.doc_id, f.width, f.height, f.width, f.height)
      else ResizedMedia(f.doc_id, f.width, f.height,
        f.width * ThumbBox / m, f.height * ThumbBox / m)
    }
  }

  /** Batched resize stage over extracted features. */
  def resizeFeatures(spark: SparkSession, feats: Dataset[MediaFeatures]): Dataset[ResizedMedia] = {
    import spark.implicits._
    feats.mapPartitions(it => it.grouped(StubDecoder.BatchSize).flatMap(StubResizer.resize))
  }

  final case class FrameSample(doc_id: Long, frame_idx: Int, frame_md5: String)

  /** Frame sampling: treat the payload as a clip of n_bytes/1000 + 1
    * frames and emit every FrameStep-th frame id with a deterministic
    * per-frame fingerprint — one output row per SAMPLED frame (the video
    * extraction shape: row explosion happens executor-side, bounded by
    * the sampling rate, never on the driver). */
  object StubFrameSampler {
    val FrameStep = 5

    def sample(f: MediaFeatures): Seq[FrameSample] = {
      val nFrames = f.n_bytes / 1000 + 1
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until nFrames by FrameStep).map { i =>
        val hex = md.digest(s"${f.payload_md5}:$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        FrameSample(f.doc_id, i, hex)
      }
    }
  }

  def sampleFrames(spark: SparkSession, feats: Dataset[MediaFeatures]): Dataset[FrameSample] = {
    import spark.implicits._
    feats.flatMap(StubFrameSampler.sample)
  }

  /** The verifiable query: full binary pipeline, oracle reproduces the
    * stub arithmetic in SQL (md5/byte-length are engine-identical). */
  private val multimodalFeatures = QueryDef(
    (s, dir) => extractFeatures(s, toBinary(Tables.documents(s, dir)))
      .toDF().orderBy("doc_id"),
    Some("""SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      |  md5(text) AS payload_md5,
      |  CAST(64 + octet_length(encode(text)) % 577 AS INT) AS width,
      |  CAST(64 + (octet_length(encode(text)) * 31) % 353 AS INT) AS height,
      |  ['jpeg', 'png', 'webp'][CAST(octet_length(encode(text)) % 3 AS INT) + 1] AS format
      |FROM documents ORDER BY doc_id""".stripMargin))

  private val multimodalResize = QueryDef(
    (s, dir) => resizeFeatures(s,
      extractFeatures(s, toBinary(Tables.documents(s, dir))))
      .toDF().orderBy("doc_id"),
    Some("""WITH f AS (
      |  SELECT doc_id,
      |    CAST(64 + octet_length(encode(text)) % 577 AS INT) AS width,
      |    CAST(64 + (octet_length(encode(text)) * 31) % 353 AS INT) AS height
      |  FROM documents)
      |SELECT doc_id, width, height,
      |  CAST(CASE WHEN greatest(width, height) <= 128 THEN width
      |       ELSE width * 128 // greatest(width, height) END AS INT) AS thumb_w,
      |  CAST(CASE WHEN greatest(width, height) <= 128 THEN height
      |       ELSE height * 128 // greatest(width, height) END AS INT) AS thumb_h
      |FROM f ORDER BY doc_id""".stripMargin))

  private val multimodalFrameSample = QueryDef(
    (s, dir) => sampleFrames(s,
      extractFeatures(s, toBinary(Tables.documents(s, dir))))
      .toDF().orderBy("doc_id", "frame_idx"),
    Some("""WITH f AS (
      |  SELECT doc_id, md5(text) AS payload_md5,
      |    octet_length(encode(text)) // 1000 + 1 AS n_frames
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(unnest(range(0, n_frames, 5)) AS INT) AS frame_idx,
      |  md5(payload_md5 || ':' || CAST(unnest(range(0, n_frames, 5)) AS VARCHAR)) AS frame_md5
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin))

  val all: Map[String, QueryDef] = Map(
    "multimodal_features" -> multimodalFeatures,
    "multimodal_resize" -> multimodalResize,
    "multimodal_frame_sample" -> multimodalFrameSample)
}
