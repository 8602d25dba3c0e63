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
