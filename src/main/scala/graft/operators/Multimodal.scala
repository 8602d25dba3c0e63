package graft.operators

import graft.Tables
import graft.queries.QueryDef
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: opaque `binary` payloads with typed
 * metadata, processed in partition-local batches.
 *
 * The decode step is REAL for images — [[MediaDecoder.decode]] sniffs the
 * payload's magic bytes and runs PNG/JPEG/GIF/BMP through `javax.imageio`
 * (JDK-built-in, no new dependency) for true dimensions and container
 * format. Non-image payloads (the synthetic testdata uses document text
 * as a stand-in byte stream) fall back to deterministic stub arithmetic,
 * so oracles stay engine-checkable. The decode step is REAL for audio
 * too — [[AudioDecoder]] runs RIFF/WAVE PCM through `javax.sound.sampled`
 * (also JDK-built-in). VIDEO codecs are absent from the JDK, so frame
 * sampling remains stubbed arithmetic. Everything
 * around the decoders is the real Spark shape for multimodal corpora at
 * 100 TB:
 *  - payloads live in a BINARY column next to a metadata struct (the
 *    parquet layout used for image/audio shards);
 *  - feature extraction runs via mapPartitions over a typed Dataset in
 *    fixed-size batches (the vectorized-decoder call shape: batch in,
 *    batch out, no per-row JNI crossings);
 *  - nothing is collected to the driver; output is columnar features.
 */
object Multimodal {

  final case class BinaryDoc(doc_id: Long, payload: Array[Byte],
      lang: String, source: String)

  final case class MediaFeatures(doc_id: Long, n_bytes: Int,
      payload_md5: String, width: Int, height: Int, format: String)

  /** The media decoder: real `javax.imageio` decode for payloads whose
    * magic bytes identify a JDK-supported image container; deterministic
    * stub arithmetic for everything else (synthetic fixtures, unsupported
    * media). Runs executor-side inside the batched mapPartitions. */
  object MediaDecoder {
    val BatchSize = 64

    /** Container format via magic bytes — cheap reject before the codec
      * touches the stream (a 100 TB corpus mustn't pay a codec attempt
      * per non-image row). */
    def sniff(p: Array[Byte]): Option[String] = {
      @inline def u(i: Int): Int = p(i) & 0xff
      if (p.length >= 8 && u(0) == 0x89 && u(1) == 'P' && u(2) == 'N' &&
        u(3) == 'G' && u(4) == 0x0d && u(5) == 0x0a && u(6) == 0x1a &&
        u(7) == 0x0a) Some("png")
      else if (p.length >= 3 && u(0) == 0xff && u(1) == 0xd8 && u(2) == 0xff)
        Some("jpeg")
      else if (p.length >= 6 && u(0) == 'G' && u(1) == 'I' && u(2) == 'F' &&
        u(3) == '8') Some("gif")
      else if (p.length >= 2 && u(0) == 'B' && u(1) == 'M') Some("bmp")
      else None
    }

    /** Stub dimensional arithmetic — ONE definition, oracle-pinned
      * (MultimodalSuite asserts it in every path that uses it). */
    private[operators] def stubDims(n: Int): (Int, Int) =
      (64 + n % 577, 64 + (n * 31) % 353)

    /** Stub path: deterministic arithmetic on the byte stream (pinned by
      * the DuckDB oracles over the text-payload fixtures). */
    private def stubFeatures(docId: Long, n: Int, hex: String): MediaFeatures = {
      val (w, h) = stubDims(n)
      MediaFeatures(
        doc_id = docId,
        n_bytes = n,
        payload_md5 = hex,
        width = w,
        height = h,
        format = Vector("jpeg", "png", "webp")(n % 3))
    }

    /** Sniff + decode: Some(image) iff the payload is a real, READABLE
      * image. Catches every non-fatal codec failure — corrupt bodies
      * throw RuntimeExceptions from deep inside ImageIO (broken ICC
      * profiles, truncated scans), and one bad row must degrade to the
      * stub, never fail the partition. */
    private[operators] def readImage(p: Array[Byte]): Option[java.awt.image.BufferedImage] =
      sniff(p).flatMap { _ =>
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p)))
        catch { case scala.util.control.NonFatal(_) => None }
      }

    def decode(batch: Seq[BinaryDoc]): Seq[MediaFeatures] = batch.map { d =>
      val n = d.payload.length
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(d.payload).map("%02x".format(_)).mkString
      (sniff(d.payload), readImage(d.payload)) match {
        case (Some(fmt), Some(img)) =>
          MediaFeatures(d.doc_id, n, hex, img.getWidth, img.getHeight, fmt)
        case _ => stubFeatures(d.doc_id, n, hex)
      }
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
        it.grouped(MediaDecoder.BatchSize).flatMap(MediaDecoder.decode)
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
    feats.mapPartitions(it => it.grouped(MediaDecoder.BatchSize).flatMap(StubResizer.resize))
  }

  final case class ResizedImage(doc_id: Long, width: Int, height: Int,
      thumb_w: Int, thumb_h: Int, thumb_png: Array[Byte])

  /** REAL thumbnailing over the binary column: payloads whose magic bytes
    * identify a JDK-decodable image are decoded, scaled into the
    * [[StubResizer.ThumbBox]] square with Java2D (bilinear), and
    * re-encoded as PNG; non-image payloads get the stub dimensional
    * arithmetic and a null thumbnail. Batched mapPartitions like
    * [[extractFeatures]] — the whole decode→scale→encode loop runs
    * executor-side, emitting columnar (dims + thumbnail bytes). */
  def resizeImages(spark: SparkSession, binaryDocs: DataFrame): Dataset[ResizedImage] = {
    import spark.implicits._
    def fit(w: Int, h: Int): (Int, Int) = {
      val m = math.max(w, h)
      if (m <= StubResizer.ThumbBox) (w, h)
      else (math.max(1, w * StubResizer.ThumbBox / m),
        math.max(1, h * StubResizer.ThumbBox / m))
    }
    def one(d: BinaryDoc): ResizedImage =
      MediaDecoder.readImage(d.payload) match {
        case Some(img) =>
          val (w, h) = (img.getWidth, img.getHeight)
          val (tw, th) = fit(w, h)
          val thumb = new java.awt.image.BufferedImage(tw, th,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = thumb.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, tw, th, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(thumb, "png", bos)
          ResizedImage(d.doc_id, w, h, tw, th, bos.toByteArray)
        case None =>
          val (w, h) = MediaDecoder.stubDims(d.payload.length)
          val (tw, th) = fit(w, h)
          ResizedImage(d.doc_id, w, h, tw, th, null)
      }
    binaryDocs
      .select(col("doc_id"), col("payload"),
        col("meta.lang").as("lang"), col("meta.source").as("source"))
      .as[BinaryDoc]
      .mapPartitions(_.grouped(MediaDecoder.BatchSize).flatMap(_.map(one)))
  }

  final case class AudioFeatures(doc_id: Long, n_bytes: Int, format: String,
      sample_rate: Int, channels: Int, bits: Int, n_frames: Long,
      duration_ms: Long, rms_x1000: Long, peak_x1000: Long)

  /** The audio decoder: REAL for WAV/PCM — `javax.sound.sampled` is
    * JDK-built-in (no external codec needed for RIFF/WAVE containers
    * carrying PCM), so the decode step is genuine where the image half's
    * `javax.imageio` precedent applies: magic-byte sniff first (a 100 TB
    * corpus mustn't pay a codec attempt per non-audio row), then header
    * + sample decode for true rate/channels/frames and integer-exact
    * RMS/peak energy (sum of squared 16-bit samples in a Long — no
    * float accumulation order to disagree about). Non-audio payloads
    * (the synthetic fixtures' text bytes) take deterministic stub
    * arithmetic, keeping the DuckDB oracle engine-checkable; WAV
    * encodings other than 16-bit signed PCM degrade to the stub too
    * (compressed WAV is out of JDK scope). */
  object AudioDecoder {

    /** RIFF....WAVE container magic. */
    def sniffAudio(p: Array[Byte]): Option[String] =
      if (p.length >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' &&
        p(3) == 'F' && p(8) == 'W' && p(9) == 'A' && p(10) == 'V' &&
        p(11) == 'E') Some("wav")
      else None

    final case class WavFormat(sampleRate: Int, channels: Int)
    final case class Pcm(sampleRate: Int, channels: Int, bits: Int,
        nFrames: Long, rmsX1000: Long, peakX1000: Long)

    /** Decode a WAV payload's 16-bit signed PCM stream into samples.
      * None for non-WAV, corrupt, or non-16-bit-PCM payloads — one bad
      * row must degrade to the stub, never fail the partition. */
    private[operators] def readWavSamples(
        p: Array[Byte]): Option[(WavFormat, Array[Short])] =
      sniffAudio(p).flatMap { _ =>
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(p))
          try {
            val fmt = ais.getFormat
            val ok = fmt.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              fmt.getSampleSizeInBits == 16
            if (!ok) None
            else {
              val bytes = ais.readAllBytes()
              val samples = new Array[Short](bytes.length / 2)
              var i = 0
              while (i + 1 < bytes.length) {
                // WAV PCM is little-endian
                samples(i / 2) = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort
                i += 2
              }
              Some((WavFormat(fmt.getSampleRate.toInt, fmt.getChannels), samples))
            }
          } finally ais.close()
        } catch { case scala.util.control.NonFatal(_) => None }
      }

    private[operators] def readWav(p: Array[Byte]): Option[Pcm] =
      readWavSamples(p).map { case (fmt, samples) =>
        var i = 0
        var sumSq = 0L
        var peak = 0L
        while (i < samples.length) {
          val s = samples(i).toLong
          sumSq += s * s
          val a = math.abs(s)
          if (a > peak) peak = a
          i += 1
        }
        val frames = samples.length.toLong / math.max(1, fmt.channels)
        val rms =
          if (samples.isEmpty) 0L
          else math.round(math.sqrt(sumSq.toDouble / samples.length) * 1000.0 / 32768.0)
        Pcm(fmt.sampleRate, fmt.channels, 16, frames, rms,
          math.round(peak * 1000.0 / 32768.0))
      }

    /** Stub arithmetic for non-audio payloads — ONE definition, mirrored
      * clause-for-clause by the `multimodal_audio` DuckDB twin. */
    private[operators] def stubAudio(docId: Long, n: Int): AudioFeatures = {
      val rate = 8000 + (n % 3) * 4000
      val frames = n.toLong / 4 + 1
      AudioFeatures(docId, n, "raw",
        sample_rate = rate, channels = 1 + n % 2, bits = 16,
        n_frames = frames, duration_ms = frames * 1000 / rate,
        rms_x1000 = (n.toLong * 37) % 1000,
        peak_x1000 = (n.toLong * 53) % 1000)
    }

    def decode(batch: Seq[BinaryDoc]): Seq[AudioFeatures] = batch.map { d =>
      val n = d.payload.length
      readWav(d.payload) match {
        case Some(pcm) =>
          AudioFeatures(d.doc_id, n, "wav", pcm.sampleRate, pcm.channels,
            pcm.bits, pcm.nFrames,
            if (pcm.sampleRate <= 0) 0L else pcm.nFrames * 1000 / pcm.sampleRate,
            pcm.rmsX1000, pcm.peakX1000)
        case None => stubAudio(d.doc_id, n)
      }
    }
  }

  final case class AudioWindow(doc_id: Long, window_idx: Int,
      n_frames: Long, rms_x1000: Long)

  /** Windowed segment energies — the audio analogue of frame sampling
    * (fixed-length analysis windows are what downstream audio-embedding
    * and VAD stages consume). REAL for WAV/PCM: the decoded frame
    * stream splits into [[AudioWindower.WindowFrames]]-frame windows
    * (short final window kept) with per-window integer-exact RMS; the
    * stub path treats the payload as [[AudioDecoder.stubAudio]]'s frame
    * count split into [[AudioWindower.StubWindowFrames]]-frame windows
    * with deterministic arithmetic the DuckDB twin mirrors. Row
    * explosion happens executor-side, bounded by the window length,
    * never on the driver. */
  object AudioWindower {
    val WindowFrames = 2048
    val StubWindowFrames = 256L

    def windows(d: BinaryDoc): Seq[AudioWindow] =
      AudioDecoder.readWavSamples(d.payload) match {
        case Some((fmt, samples)) =>
          val ch = math.max(1, fmt.channels)
          val perWindow = WindowFrames * ch
          val out = scala.collection.mutable.ArrayBuffer.empty[AudioWindow]
          var idx = 0
          var off = 0
          while (off < samples.length) {
            val len = math.min(perWindow, samples.length - off)
            var i = 0
            var sumSq = 0L
            while (i < len) {
              val s = samples(off + i).toLong; sumSq += s * s; i += 1
            }
            val rms = math.round(
              math.sqrt(sumSq.toDouble / len) * 1000.0 / 32768.0)
            out += AudioWindow(d.doc_id, idx, len.toLong / ch, rms)
            idx += 1
            off += len
          }
          out.toSeq
        case None =>
          val n = d.payload.length
          val total = n.toLong / 4 + 1
          (0L until total by StubWindowFrames).map { start =>
            AudioWindow(d.doc_id, (start / StubWindowFrames).toInt,
              math.min(StubWindowFrames, total - start),
              (n.toLong * 37 + (start / StubWindowFrames) * 101) % 1000)
          }
      }
  }

  /** Batched windowed-energy extraction over the binary column. */
  def extractAudioWindows(spark: SparkSession,
      binaryDocs: DataFrame): Dataset[AudioWindow] = {
    import spark.implicits._
    binaryDocs
      .select(col("doc_id"), col("payload"),
        col("meta.lang").as("lang"), col("meta.source").as("source"))
      .as[BinaryDoc]
      .mapPartitions { it =>
        it.grouped(MediaDecoder.BatchSize)
          .flatMap(_.flatMap(AudioWindower.windows))
      }
  }

  final case class ResampledAudio(doc_id: Long, src_rate: Int,
      src_channels: Int, src_frames: Long, dst_rate: Int, dst_frames: Long,
      wav: Array[Byte])

  /** Resample to 16 kHz MONO — the canonical audio-ingest prep (what
    * speech/audio-embedding models consume), the audio mirror of
    * [[resizeImages]]: decode, channel-average to mono (integer),
    * linear-interpolate to the target rate with EXACT integer
    * arithmetic (`pos = j·srcRate/dstRate` kept as quotient+remainder —
    * no float phase accumulator to drift or to round differently across
    * platforms), re-encode as a real RIFF/WAVE payload via the JDK
    * encoder. Non-audio payloads carry stub metadata and a null
    * payload, keeping the oracle row engine-checkable. */
  object AudioResampler {
    val TargetRate = 16000

    private[operators] def mono(samples: Array[Short], ch: Int): Array[Short] =
      if (ch <= 1) samples
      else {
        val n = samples.length / ch
        val out = new Array[Short](n)
        var i = 0
        while (i < n) {
          var acc = 0L
          var c = 0
          while (c < ch) { acc += samples(i * ch + c); c += 1 }
          out(i) = (acc / ch).toShort
          i += 1
        }
        out
      }

    private[operators] def interpolate(src: Array[Short], srcRate: Int,
        dstRate: Int): Array[Short] = {
      if (srcRate == dstRate || src.isEmpty) return src
      val dstFrames = (src.length.toLong * dstRate / srcRate).toInt
      val out = new Array[Short](dstFrames)
      var j = 0
      while (j < dstFrames) {
        val num = j.toLong * srcRate // source position = num / dstRate
        val idx = (num / dstRate).toInt
        val rem = num % dstRate
        val a = src(math.min(idx, src.length - 1)).toLong
        val b = src(math.min(idx + 1, src.length - 1)).toLong
        out(j) = (a + (b - a) * rem / dstRate).toShort
        j += 1
      }
      out
    }

    private[operators] def encodeWav(samples: Array[Short], rate: Int): Array[Byte] = {
      val bytes = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        bytes(i * 2) = (samples(i) & 0xff).toByte
        bytes(i * 2 + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    def resample(d: BinaryDoc): ResampledAudio =
      AudioDecoder.readWavSamples(d.payload) match {
        case Some((fmt, samples)) =>
          val m = mono(samples, fmt.channels)
          val out = interpolate(m, fmt.sampleRate, TargetRate)
          ResampledAudio(d.doc_id, fmt.sampleRate, fmt.channels,
            m.length.toLong, TargetRate, out.length.toLong,
            encodeWav(out, TargetRate))
        case None =>
          val stub = AudioDecoder.stubAudio(d.doc_id, d.payload.length)
          ResampledAudio(d.doc_id, stub.sample_rate, stub.channels,
            stub.n_frames, TargetRate,
            stub.n_frames * TargetRate / stub.sample_rate, null)
      }
  }

  /** Batched resample stage over the binary column. */
  def resampleAudio(spark: SparkSession,
      binaryDocs: DataFrame): Dataset[ResampledAudio] = {
    import spark.implicits._
    binaryDocs
      .select(col("doc_id"), col("payload"),
        col("meta.lang").as("lang"), col("meta.source").as("source"))
      .as[BinaryDoc]
      .mapPartitions { it =>
        it.grouped(MediaDecoder.BatchSize).flatMap(_.map(AudioResampler.resample))
      }
  }

  /** Batched partition-local audio feature extraction — the same
    * mapPartitions call shape as [[extractFeatures]]. */
  def extractAudio(spark: SparkSession, binaryDocs: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    binaryDocs
      .select(col("doc_id"), col("payload"),
        col("meta.lang").as("lang"), col("meta.source").as("source"))
      .as[BinaryDoc]
      .mapPartitions { it =>
        it.grouped(MediaDecoder.BatchSize).flatMap(AudioDecoder.decode)
      }
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
    * stub arithmetic in SQL (md5/byte-length are engine-identical).
    *
    * Measured r21: spreading the six query entry points
    * (Tables.documentsSpread before toBinary) REGRESSED the family
    * 0.42 -> 0.71 s avg at sf0.1 — the stub decoders are too light per
    * row to amortize the round-robin exchange (contrast
    * text_repetition's rolling-hash fold, where the r20 spread won
    * 4x). A REAL codec deployment (javax.sound decode of genuine WAV
    * payloads, frame extraction) should revisit: the scan stays as-is
    * here, and at 100 TB the scan parallelizes by itself. */
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

  /** The audio pipeline's verifiable query: the fixtures' text payloads
    * all take the stub path (no RIFF magic), so the DuckDB twin mirrors
    * [[AudioDecoder.stubAudio]] clause-for-clause; the REAL WAV/PCM
    * decode is suite-gated against synthesized PCM with analytically
    * known energy (MultimodalSuite). */
  private val multimodalAudio = QueryDef(
    (s, dir) => extractAudio(s, toBinary(Tables.documents(s, dir)))
      .toDF().orderBy("doc_id"),
    Some("""WITH b AS (
      |  SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n FROM documents)
      |SELECT doc_id, n AS n_bytes, 'raw' AS format,
      |  CAST(8000 + (n % 3) * 4000 AS INT) AS sample_rate,
      |  CAST(1 + n % 2 AS INT) AS channels,
      |  CAST(16 AS INT) AS bits,
      |  CAST(n // 4 + 1 AS BIGINT) AS n_frames,
      |  CAST((n // 4 + 1) * 1000 // (8000 + (n % 3) * 4000) AS BIGINT) AS duration_ms,
      |  CAST((n * 37) % 1000 AS BIGINT) AS rms_x1000,
      |  CAST((n * 53) % 1000 AS BIGINT) AS peak_x1000
      |FROM b ORDER BY doc_id""".stripMargin))

  /** Windowed audio energies through the batched pipeline; fixtures all
    * take the stub split (mirrored by the twin), the real per-window
    * PCM RMS is suite-gated against a two-tone signal whose windows
    * have different analytic energies. */
  private val multimodalAudioWindows = QueryDef(
    (s, dir) => extractAudioWindows(s, toBinary(Tables.documents(s, dir)))
      .toDF().orderBy("doc_id", "window_idx"),
    Some("""WITH b AS (
      |  SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n FROM documents),
      |f AS (SELECT doc_id, n, CAST(n // 4 + 1 AS BIGINT) AS total FROM b)
      |SELECT doc_id,
      |  CAST(unnest(range(0, total, 256)) // 256 AS INT) AS window_idx,
      |  CAST(LEAST(256, total - unnest(range(0, total, 256))) AS BIGINT) AS n_frames,
      |  CAST((n * 37 + (unnest(range(0, total, 256)) // 256) * 101) % 1000 AS BIGINT) AS rms_x1000
      |FROM f ORDER BY doc_id, window_idx""".stripMargin))

  /** Resample metadata through the batched pipeline (payload column
    * dropped for the oracle — fixtures are non-audio, so payloads are
    * null and the metadata is the stub arithmetic the twin mirrors; the
    * REAL 16 kHz mono round trip is suite-gated). */
  private val multimodalAudioResample = QueryDef(
    (s, dir) => resampleAudio(s, toBinary(Tables.documents(s, dir)))
      .toDF().drop("wav").orderBy("doc_id"),
    Some("""WITH b AS (
      |  SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n FROM documents)
      |SELECT doc_id,
      |  CAST(8000 + (n % 3) * 4000 AS INT) AS src_rate,
      |  CAST(1 + n % 2 AS INT) AS src_channels,
      |  CAST(n // 4 + 1 AS BIGINT) AS src_frames,
      |  CAST(16000 AS INT) AS dst_rate,
      |  CAST((n // 4 + 1) * 16000 // (8000 + (n % 3) * 4000) AS BIGINT) AS dst_frames
      |FROM b ORDER BY doc_id""".stripMargin))

  val all: Map[String, QueryDef] = Map(
    "multimodal_features" -> multimodalFeatures,
    "multimodal_resize" -> multimodalResize,
    "multimodal_frame_sample" -> multimodalFrameSample,
    "multimodal_audio" -> multimodalAudio,
    "multimodal_audio_windows" -> multimodalAudioWindows,
    "multimodal_audio_resample" -> multimodalAudioResample)
}
