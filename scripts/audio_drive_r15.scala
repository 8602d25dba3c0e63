object AudioDrive {
  def run(): Unit = {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    // library-consumer shape: binary column in, columnar features out
    val bin = graft.operators.Multimodal.toBinary(graft.Tables.documents(s, dir))
    val feats = graft.operators.Multimodal.extractAudio(s, bin)
    println("AUDIODRIVE features " + feats.count())
    val wins = graft.operators.Multimodal.extractAudioWindows(s, bin)
    println("AUDIODRIVE windows " + wins.count())
    val res = graft.operators.Multimodal.resampleAudio(s, bin)
    println("AUDIODRIVE resampled " + res.filter(_.wav == null).count() + " stub")
    // a REAL wav flows through the same pipeline from a DataFrame
    val rate = 16000
    val samples = new Array[Byte](rate * 2)
    for (i <- 0 until rate) {
      val v = math.round(0.5 * 32767.0 * math.sin(2 * math.Pi * 440.0 * i / rate)).toInt
      samples(i * 2) = (v & 0xff).toByte; samples(i * 2 + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, rate.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    import s.implicits._
    import org.apache.spark.sql.functions._
    val wavDf = Seq((1L, bos.toByteArray, "en", "aud", 0)).toDF("doc_id", "payload", "lang", "source", "n_chars")
      .select(col("doc_id"), col("payload"), struct(col("lang"), col("source"), col("n_chars")).as("meta"))
    val f = graft.operators.Multimodal.extractAudio(s, wavDf).collect()(0)
    println(s"AUDIODRIVE realwav fmt=${f.format} rate=${f.sample_rate} frames=${f.n_frames} rms=${f.rms_x1000}")
  }
}
AudioDrive.run()
System.exit(0)
