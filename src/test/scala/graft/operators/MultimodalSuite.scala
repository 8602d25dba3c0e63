package graft.operators

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

class MultimodalSuite extends SparkSuite {

  test("binary pipeline: schema, batching, deterministic stub decode") {
    val bin = Multimodal.toBinary(Tables.documents(spark, sfDir))
    // payload is a real BINARY column with a typed metadata struct
    assert(bin.schema("payload").dataType.typeName === "binary")
    assert(bin.schema("meta").dataType.typeName === "struct")

    val feats = Multimodal.extractFeatures(spark, bin)
    val rows = feats.collect()
    assert(rows.length === bin.count())
    // deterministic: same input => same features on re-run
    val again = Multimodal.extractFeatures(spark, bin).collect()
    assert(rows.sortBy(_.doc_id).toSeq === again.sortBy(_.doc_id).toSeq)
    // stub decode arithmetic holds and md5 matches Spark's own md5()
    val one = rows.minBy(_.doc_id)
    assert(one.width === 64 + one.n_bytes % 577)
    assert(one.height === 64 + (one.n_bytes * 31) % 353)
    val sparkMd5 = Tables.documents(spark, sfDir)
      .filter(col("doc_id") === one.doc_id)
      .select(md5(col("text"))).head().getString(0)
    assert(one.payload_md5 === sparkMd5)
  }

  test("decoder batch shape: batches of <= BatchSize, order preserved") {
    val docs = (0L until 150L).map(i =>
      Multimodal.BinaryDoc(i, s"payload-$i".getBytes("UTF-8"), "en", "src"))
    val out = docs.grouped(Multimodal.MediaDecoder.BatchSize)
      .flatMap(Multimodal.MediaDecoder.decode).toSeq
    assert(out.map(_.doc_id) === (0L until 150L))
  }

  /** A real image produced by the JDK's own encoder: `w`×`h`, deterministic
    * pixel pattern, in the given container format ("png"/"jpeg"/"bmp"/"gif"). */
  private def realImage(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 31 + y * 7) % 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, bos), s"no $format writer")
    bos.toByteArray
  }

  test("real images decode through javax.imageio: true dimensions + container format") {
    for ((fmt, w, h) <- Seq(("png", 37, 23), ("jpeg", 64, 48), ("bmp", 17, 5), ("gif", 9, 11))) {
      val bytes = realImage(w, h, fmt)
      assert(Multimodal.MediaDecoder.sniff(bytes) === Some(fmt), fmt)
      val Seq(f) = Multimodal.MediaDecoder.decode(
        Seq(Multimodal.BinaryDoc(1L, bytes, "en", "img"))).toList
      assert((f.width, f.height, f.format) === ((w, h, fmt)), fmt)
      assert(f.n_bytes === bytes.length)
    }
  }

  test("real decode runs executor-side through the full binary pipeline") {
    import spark.implicits._
    val png = realImage(40, 30, "png")
    val txt = "just some text payload".getBytes("UTF-8")
    val df = Seq((1L, png, "en", "img", 0L), (2L, txt, "en", "txt", 0L))
      .toDF("doc_id", "payload", "lang", "source", "n_chars")
      .select(col("doc_id"), col("payload"),
        struct(col("lang"), col("source"), col("n_chars")).as("meta"))
    val feats = Multimodal.extractFeatures(spark, df)
      .collect().map(f => f.doc_id -> f).toMap
    assert((feats(1L).width, feats(1L).height, feats(1L).format) === ((40, 30, "png")))
    // non-image payload takes the stub path, untouched semantics
    val n = txt.length
    assert((feats(2L).width, feats(2L).height) === ((64 + n % 577, 64 + (n * 31) % 353)))
  }

  test("real resize: images scale into the thumb box and re-encode as valid PNG") {
    import spark.implicits._
    val png = realImage(200, 100, "png") // > ThumbBox → scales to 128x64
    val small = realImage(50, 40, "jpeg") // <= ThumbBox → passes through
    val txt = "not an image at all".getBytes("UTF-8")
    val df = Seq((1L, png, "en", "img", 0L), (2L, small, "en", "img", 0L),
      (3L, txt, "en", "txt", 0L))
      .toDF("doc_id", "payload", "lang", "source", "n_chars")
      .select(col("doc_id"), col("payload"),
        struct(col("lang"), col("source"), col("n_chars")).as("meta"))
    val out = Multimodal.resizeImages(spark, df)
      .collect().map(r => r.doc_id -> r).toMap
    assert((out(1L).width, out(1L).height, out(1L).thumb_w, out(1L).thumb_h)
      === ((200, 100, 128, 64)))
    // the thumbnail is a REAL png at the thumb dimensions
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1L).thumb_png))
    assert((back.getWidth, back.getHeight) === ((128, 64)))
    // small image passes through unscaled
    assert((out(2L).thumb_w, out(2L).thumb_h) === ((50, 40)))
    // non-image payload keeps stub arithmetic, no thumbnail bytes
    val n = txt.length
    assert((out(3L).width, out(3L).height) === ((64 + n % 577, 64 + (n * 31) % 353)))
    assert(out(3L).thumb_png === null)
  }

  /** A real RIFF/WAVE payload: 16-bit signed PCM sine at `amp` of full
    * scale, written through the JDK's own WAV encoder. */
  private def realWav(rate: Int, channels: Int, nFrames: Int,
      amp: Double): Array[Byte] = {
    val samples = new Array[Byte](nFrames * channels * 2)
    for (i <- 0 until nFrames; c <- 0 until channels) {
      val v = math.round(amp * 32767.0 *
        math.sin(2 * math.Pi * 440.0 * i / rate)).toInt
      val off = (i * channels + c) * 2
      samples(off) = (v & 0xff).toByte // little-endian
      samples(off + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, channels,
      true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real WAV decodes through javax.sound: true rate/frames + analytic energy") {
    // a 0.5-amplitude sine has RMS 0.5/sqrt(2) ~ 0.354 and peak ~ 0.5 of
    // full scale — the decode must recover both from the samples, not
    // from arithmetic on byte length
    val wav = realWav(rate = 16000, channels = 1, nFrames = 16000, amp = 0.5)
    assert(Multimodal.AudioDecoder.sniffAudio(wav) === Some("wav"))
    val Seq(f) = Multimodal.AudioDecoder.decode(
      Seq(Multimodal.BinaryDoc(1L, wav, "en", "aud"))).toList
    assert(f.format === "wav")
    assert((f.sample_rate, f.channels, f.bits) === ((16000, 1, 16)))
    assert(f.n_frames === 16000L && f.duration_ms === 1000L)
    assert(math.abs(f.rms_x1000 - 354L) <= 2, s"rms ${f.rms_x1000}")
    assert(math.abs(f.peak_x1000 - 500L) <= 2, s"peak ${f.peak_x1000}")

    // stereo: frames are per-channel sample PAIRS
    val st = realWav(rate = 8000, channels = 2, nFrames = 4000, amp = 0.25)
    val Seq(g) = Multimodal.AudioDecoder.decode(
      Seq(Multimodal.BinaryDoc(2L, st, "en", "aud"))).toList
    assert((g.channels, g.n_frames, g.duration_ms) === ((2, 4000L, 500L)))
    assert(math.abs(g.rms_x1000 - 177L) <= 2, s"stereo rms ${g.rms_x1000}")
  }

  test("real audio decode runs executor-side through the batched pipeline; non-audio stubs") {
    import org.apache.spark.sql.functions._
    val wav = realWav(rate = 16000, channels = 1, nFrames = 8000, amp = 0.5)
    val txt = "not audio at all".getBytes("UTF-8")
    val df = { import spark.implicits._
      Seq((1L, wav, "en", "aud", 0), (2L, txt, "en", "doc", txt.length))
        .toDF("doc_id", "payload", "lang", "source", "n_chars")
        .select(col("doc_id"), col("payload"),
          struct(col("lang"), col("source"), col("n_chars")).as("meta"))
    }
    val out = Multimodal.extractAudio(spark, df)
      .collect().map(r => r.doc_id -> r).toMap
    assert(out(1L).format === "wav" && out(1L).n_frames === 8000L)
    // the text payload takes the stub path, matching stubAudio exactly
    val stub = Multimodal.AudioDecoder.stubAudio(2L, txt.length)
    assert(out(2L) === stub)
  }

  test("windowed audio energies localize: a two-tone signal splits by window") {
    // 8192 frames at amp 0.25 then 8192 at amp 0.5 — with 2048-frame
    // windows, windows 0-3 must read ~177 and windows 4-7 ~354: the RMS
    // comes from THAT window's samples, not a whole-file aggregate
    val rate = 16000
    val half = 8192
    val samples = new Array[Byte](2 * half * 2)
    for (i <- 0 until 2 * half) {
      val amp = if (i < half) 0.25 else 0.5
      val v = math.round(amp * 32767.0 *
        math.sin(2 * math.Pi * 440.0 * i / rate)).toInt
      samples(i * 2) = (v & 0xff).toByte
      samples(i * 2 + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, (2 * half).toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray

    val ws = Multimodal.AudioWindower.windows(
      Multimodal.BinaryDoc(5L, wav, "en", "aud")).sortBy(_.window_idx)
    assert(ws.length === 8 && ws.forall(_.n_frames === 2048L))
    ws.take(4).foreach(w => assert(math.abs(w.rms_x1000 - 177L) <= 2,
      s"window ${w.window_idx}: ${w.rms_x1000}"))
    ws.drop(4).foreach(w => assert(math.abs(w.rms_x1000 - 354L) <= 2,
      s"window ${w.window_idx}: ${w.rms_x1000}"))

    // non-audio payload splits by the stub arithmetic, matching it exactly
    val txt = Array.fill[Byte](4100)('x')
    val stub = Multimodal.AudioWindower.windows(
      Multimodal.BinaryDoc(6L, txt, "en", "doc"))
    val total = 4100L / 4 + 1 // 1026 frames -> windows of 256: 4x256 + 2
    assert(stub.map(_.n_frames) === Seq(256L, 256L, 256L, 256L, 2L))
    stub.zipWithIndex.foreach { case (w, i) =>
      assert(w.rms_x1000 === (4100L * 37 + i * 101) % 1000)
    }
    assert(stub.map(_.n_frames).sum === total)
  }

  test("resample to 16 kHz mono: real round trip preserves duration and energy") {
    // 8 kHz mono, 1 s of 440 Hz at amp 0.5 — upsampling to 16 kHz must
    // double the frame count, keep the duration, and preserve RMS (the
    // tone sits far below both Nyquist limits)
    val up = Multimodal.AudioResampler.resample(
      Multimodal.BinaryDoc(1L, realWav(8000, 1, 8000, 0.5), "en", "aud"))
    assert((up.src_rate, up.src_channels, up.src_frames) === ((8000, 1, 8000L)))
    assert((up.dst_rate, up.dst_frames) === ((16000, 16000L)))
    val Seq(f) = Multimodal.AudioDecoder.decode(
      Seq(Multimodal.BinaryDoc(1L, up.wav, "en", "aud"))).toList
    assert((f.format, f.sample_rate, f.channels) === (("wav", 16000, 1)))
    assert(f.n_frames === 16000L && f.duration_ms === 1000L)
    assert(math.abs(f.rms_x1000 - 354L) <= 3, s"rms after upsample: ${f.rms_x1000}")

    // 44.1 kHz stereo downsamples to mono 16 kHz with the exact
    // integer frame count and preserved energy
    val down = Multimodal.AudioResampler.resample(
      Multimodal.BinaryDoc(2L, realWav(44100, 2, 44100, 0.5), "en", "aud"))
    assert((down.src_channels, down.src_frames) === ((2, 44100L)))
    assert(down.dst_frames === 44100L * 16000 / 44100)
    val Seq(g) = Multimodal.AudioDecoder.decode(
      Seq(Multimodal.BinaryDoc(2L, down.wav, "en", "aud"))).toList
    assert((g.sample_rate, g.channels, g.duration_ms) === ((16000, 1, 1000L)))
    assert(math.abs(g.rms_x1000 - 354L) <= 3, s"rms after downsample: ${g.rms_x1000}")

    // non-audio payload: stub metadata, null payload, arithmetic exact
    val txt = Array.fill[Byte](997)('q')
    val stub = Multimodal.AudioResampler.resample(
      Multimodal.BinaryDoc(3L, txt, "en", "doc"))
    val sf = Multimodal.AudioDecoder.stubAudio(3L, 997)
    assert(stub.wav === null)
    assert((stub.src_rate, stub.src_frames) === ((sf.sample_rate, sf.n_frames)))
    assert(stub.dst_frames === sf.n_frames * 16000 / sf.sample_rate)
  }

  test("corrupt RIFF header degrades to the audio stub instead of failing the batch") {
    val corrupt = "RIFFxxxxWAVE".getBytes("UTF-8") ++ Array.fill[Byte](40)(0x17)
    assert(Multimodal.AudioDecoder.sniffAudio(corrupt) === Some("wav"))
    val Seq(f) = Multimodal.AudioDecoder.decode(
      Seq(Multimodal.BinaryDoc(9L, corrupt, "en", "aud"))).toList
    assert(f === Multimodal.AudioDecoder.stubAudio(9L, corrupt.length))
  }

  test("corrupt image header degrades to the stub instead of failing the batch") {
    // valid PNG magic, garbage body — ImageIO returns null/throws
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      Array.fill[Byte](32)(0x42)
    assert(Multimodal.MediaDecoder.sniff(corrupt) === Some("png"))
    val Seq(f) = Multimodal.MediaDecoder.decode(
      Seq(Multimodal.BinaryDoc(7L, corrupt, "en", "img"))).toList
    val n = corrupt.length
    assert((f.width, f.height) === ((64 + n % 577, 64 + (n * 31) % 353)))
  }
}
