package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * FIT-AND-SAMPLE corpus synthesizer for the scaling sweep: the driver
 * ships test data only up to sf0.1, so proving the ×10 scaling story
 * empirically needs a same-shape corpus at 10× the rows. Rather than
 * invent new distributions (which would make the ×10 ratio
 * incomparable), every generation parameter is FITTED from the source
 * corpus — word frequencies, language/source mixes, words-per-doc
 * range, the exact-duplicate rate, embedding dimension / label count /
 * cluster tilt — and rows are drawn deterministically from a per-row
 * seeded RNG (`id`-mixed, order- and partition-independent), so the
 * 1× synthetic twin both validates the generator against the real
 * sf0.1 numbers and anchors the ×10 ratio.
 *
 * Only the three tables the heavy measured family reads are emitted:
 * `documents` (dedup/pipeline), `embeddings` (kNN/cosine),
 * `customer` (entity resolution). The 10× corpus is written as ~10
 * files so per-task scan row counts match the 1× layout (at 100 TB the
 * scan is many splits either way; every measured operator repartitions
 * right after the scan).
 */
object ScaleCorpus extends Serializable {

  /** SplitMix64 — one 64-bit mix gives every row an independent stream. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  final case class DocFit(words: Array[String], cum: Array[Double],
      langs: Array[String], langCum: Array[Double], nSources: Int,
      minWords: Int, maxWords: Int, dupEvery: Long, rows: Long)

  final case class EmbFit(dim: Int, labels: Int, alpha: Double, rows: Long)

  /** Heaps' law V = K·T^β, fitted from the source corpus. */
  final case class HeapsFit(beta: Double, k: Double)

  def fitDocuments(spark: SparkSession, srcDir: String): DocFit = {
    val docs = Tables.documents(spark, srcDir)
    val wordRows = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().orderBy("w").collect()
    val words = wordRows.map(_.getString(0))
    val counts = wordRows.map(_.getLong(1).toDouble)
    val total = counts.sum
    val cum = counts.scanLeft(0.0)(_ + _).tail.map(_ / total)
    val langRows = docs.groupBy("lang").count().orderBy("lang").collect()
    val langs = langRows.map(_.getString(0))
    val lc = langRows.map(_.getLong(1).toDouble)
    val langCum = lc.scanLeft(0.0)(_ + _).tail.map(_ / lc.sum)
    val Seq(rows, distinctTexts, nSources, minW, maxW) = docs
      .agg(count(lit(1)), countDistinct(col("text")),
        countDistinct(col("source")),
        min(size(split(col("text"), " "))),
        max(size(split(col("text"), " "))))
      .head().toSeq.map(_.toString.toLong).toSeq
    val dups = rows - distinctTexts
    val dupEvery = if (dups <= 0) Long.MaxValue else math.max(2L, rows / dups)
    DocFit(words, cum, langs, langCum, nSources.toInt,
      minW.toInt, maxW.toInt, dupEvery, rows)
  }

  def fitEmbeddings(spark: SparkSession, srcDir: String): EmbFit = {
    val emb = Tables.embeddings(spark, srcDir)
    val rows = emb.count()
    val labels = emb.agg(countDistinct(col("label"))).head().getLong(0).toInt
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    // cluster tilt: mean cosine of a vector to its label centroid (the
    // source vectors are unit-norm, so the dot IS the cosine)
    val withC = emb.groupBy("label")
      .agg(array((0 until dim).map(i =>
        avg(col("embedding").getItem(i))): _*).as("c"))
    val alpha = emb.join(broadcast(withC), "label")
      .select(
        (aggregate(zip_with(col("embedding"), col("c"), (a, b) => a * b),
          lit(0.0d), (acc, x) => acc + x) /
          sqrt(aggregate(transform(col("c"), x => x * x),
            lit(0.0d), (acc, x) => acc + x))).as("cos"))
      .agg(avg("cos")).head().getDouble(0)
    EmbFit(dim, labels, alpha, rows)
  }

  /** Fit Heaps' law from the source corpus's UNSATURATED regime. The
    * fitted fixture has a BOUNDED word vocabulary (31 words at every
    * SF), so the only vocabulary-growth signal it carries is the
    * realized 3-shingle space before it saturates: distinct shingles
    * over the first 1/16 vs 1/8 of docs still grow cleanly (measured
    * ~T^0.62 at sf0.1; past ~1/4 the 31-word shingle space is
    * exhausted). β is fitted from that regime — not invented — and
    * drives the word-level Zipf exponent of [[generateDocumentsHeaps]]
    * (Heaps-from-Zipf: exponent 1/β realizes V ≈ T^β), so the Heaps
    * corpus's shingle vocabulary keeps growing the way real text's
    * does. That is the corpus the containment-dedup scaling claim is
    * judged on; the bounded-vocabulary twin stays as the adversarial
    * worst case. */
  def fitHeaps(spark: SparkSession, srcDir: String): HeapsFit = {
    val docs = Tables.documents(spark, srcDir)
    val total = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
    def point(denom: Long): (Double, Double) = {
      val sub = docs.filter(col("doc_id") < total / denom)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 3)
      val t = sub.agg(sum(size(col("toks")))).head().getLong(0).toDouble
      val v = sub.select(explode(expr(
          """transform(sequence(0, size(toks) - 3),
            |  i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2]))"""
            .stripMargin)).as("sh"))
        .agg(countDistinct(col("sh"))).head().getLong(0).toDouble
      (t, v)
    }
    // widest UNSATURATED window: walk the doubling curve from the
    // smallest prefix and stop where incremental growth collapses
    // (exponent < 0.25 — the bounded shingle space running out). On
    // sf0.1 this fits 1/16→1/4 at β ≈ 0.50; a corpus too small to
    // saturate fits its whole range. Clamped to Heaps' plausible band
    // so a degenerate fixture can't destabilize the Zipf generator.
    val pts = Seq(16L, 8L, 4L, 2L, 1L).map(point)
    var end = 0
    while (end + 1 < pts.length && {
      val (ta, va) = pts(end); val (tb, vb) = pts(end + 1)
      math.log(vb / va) / math.log(tb / ta) >= 0.25
    }) end += 1
    val (t1, v1) = pts.head
    val (t2, v2) = pts(math.max(1, end))
    val beta = math.min(0.85, math.max(0.35,
      math.log(v2 / v1) / math.log(t2 / t1)))
    HeapsFit(beta, v1 / math.pow(t1, beta))
  }

  /** Documents with a HEAPS-LAW (growing) vocabulary: same row count,
    * doc-length range, language/source mix and planted-duplicate rate
    * as the fitted generator, but each token at (approximate) global
    * corpus position g draws UNIFORMLY from the first ⌈K·g^β⌉ word ids
    * — realized vocabulary grows ∝ T^β by construction, with no
    * distribution head. (A Zipf(1/β) head was tried first and rejected
    * by measurement: at β≈0.5 the exponent forces a degenerate head —
    * one word ≈ 60% of tokens — whose hot shingles made ~4% of ALL doc
    * pairs genuine 0.8-containment pairs, quadratic OUTPUT that no
    * engine work can make linear. Real text's containment pairs are
    * rare; the uniform-over-growing-vocab draw keeps them so while
    * preserving the vocabulary-growth property under test.) Global
    * position is approximated as id×avgWords — the draws stay per-row
    * deterministic and order-independent, and the approximation only
    * jitters WHEN a word id becomes drawable, not the growth rate. */
  def generateDocumentsHeaps(spark: SparkSession, fit: DocFit, hfit: HeapsFit,
      factor: Int, seed: Long, out: String): Unit = {
    import spark.implicits._
    val n = fit.rows * factor
    val avgWords = (fit.minWords + fit.maxWords) / 2.0
    val f = fit
    val beta = hfit.beta
    val k = hfit.k
    def textFor(id: Long): String = {
      val r = new java.util.SplittableRandom(mix64(seed ^ mix64(id) ^ 0x4EA95L))
      val nw = f.minWords + r.nextInt(f.maxWords - f.minWords + 1)
      val base = id.toDouble * avgWords
      val sb = new StringBuilder
      var i = 0
      while (i < nw) {
        if (i > 0) sb.append(' ')
        val drawable = math.max(4L,
          math.ceil(k * math.pow(base + i + 1.0, beta)).toLong)
        sb.append("hw").append(r.nextLong(drawable))
        i += 1
      }
      sb.toString
    }
    spark.range(0, n, 1, 8 * factor).map { boxed =>
      val id: Long = boxed
      val src = if (f.dupEvery != Long.MaxValue &&
        id % f.dupEvery == f.dupEvery - 1 && id > 0) id - 1 else id
      val text = textFor(src)
      val r = new java.util.SplittableRandom(mix64(seed ^ mix64(id) ^ 0x5CA1EL))
      val lang = f.langs(sampleIdx(f.langCum, r.nextDouble()))
      (id, text, lang, s"src${(id % f.nSources).toInt}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(factor)
      .write.mode("overwrite").parquet(out)
  }

  /** Generate the documents-only Heaps corpus at `factor`× under
    * `outDir` (idempotent overwrite; fully seed-deterministic). */
  def generateHeaps(spark: SparkSession, srcDir: String, outDir: String,
      factor: Int, seed: Long = 2016L): HeapsFit = {
    val docFit = fitDocuments(spark, srcDir)
    val hfit = fitHeaps(spark, srcDir)
    generateDocumentsHeaps(spark, docFit, hfit, factor, seed,
      s"$outDir/documents.parquet")
    hfit
  }

  private def sampleIdx(cum: Array[Double], u: Double): Int = {
    val i = java.util.Arrays.binarySearch(cum, u)
    val k = if (i >= 0) i else -i - 1
    math.min(k, cum.length - 1)
  }

  def generateDocuments(spark: SparkSession, fit: DocFit, factor: Int,
      seed: Long, out: String): Unit = {
    import spark.implicits._
    val n = fit.rows * factor
    val f = fit
    def textFor(id: Long): String = {
      val r = new java.util.SplittableRandom(mix64(seed ^ mix64(id)))
      val nw = f.minWords + r.nextInt(f.maxWords - f.minWords + 1)
      val sb = new StringBuilder
      var i = 0
      while (i < nw) {
        if (i > 0) sb.append(' ')
        sb.append(f.words(sampleIdx(f.cum, r.nextDouble())))
        i += 1
      }
      sb.toString
    }
    spark.range(0, n, 1, 8 * factor).map { boxed =>
      val id: Long = boxed
      // planted exact duplicates at the fitted rate: the dup row
      // REGENERATES its neighbor's text (deterministic), never reads it
      val src = if (f.dupEvery != Long.MaxValue &&
        id % f.dupEvery == f.dupEvery - 1 && id > 0) id - 1 else id
      val text = textFor(src)
      val r = new java.util.SplittableRandom(mix64(seed ^ mix64(id) ^ 0x5CA1EL))
      val lang = f.langs(sampleIdx(f.langCum, r.nextDouble()))
      (id, text, lang, s"src${(id % f.nSources).toInt}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(factor)
      .write.mode("overwrite").parquet(out)
  }

  def generateEmbeddings(spark: SparkSession, fit: EmbFit, factor: Int,
      seed: Long, out: String): Unit = {
    import spark.implicits._
    val n = fit.rows * factor
    val f = fit
    val centers: Array[Array[Double]] = {
      val r = new java.util.SplittableRandom(mix64(seed ^ 0xCE27E85L))
      Array.fill(f.labels) {
        val v = Array.fill(f.dim)(r.nextGaussian())
        val norm = math.sqrt(v.map(x => x * x).sum)
        v.map(_ / norm)
      }
    }
    spark.range(0, n, 1, 8 * factor).map { boxed =>
      val id: Long = boxed
      val r = new java.util.SplittableRandom(mix64(seed ^ mix64(id) ^ 0xE3BL))
      val label = r.nextInt(f.labels)
      val c = centers(label)
      val g = Array.fill(f.dim)(r.nextGaussian())
      val gn = math.sqrt(g.map(x => x * x).sum)
      val v = Array.tabulate(f.dim)(i => f.alpha * c(i) + g(i) / gn)
      val vn = math.sqrt(v.map(x => x * x).sum)
      (id, v.map(x => (x / vn).toFloat), label)
    }.toDF("vec_id", "embedding", "label")
      .coalesce(factor)
      .write.mode("overwrite").parquet(out)
  }

  def generateCustomer(spark: SparkSession, srcDir: String, factor: Int,
      seed: Long, out: String): Unit = {
    import spark.implicits._
    val src = Tables.customer(spark, srcDir)
    val rows = src.count()
    val segments = src.select("c_mktsegment").distinct()
      .orderBy("c_mktsegment").collect().map(_.getString(0))
    val nations = src.agg(max(col("c_nationkey"))).head().getInt(0) + 1
    spark.range(0, rows * factor, 1, 8 * factor).map { boxed =>
      val id: Long = boxed
      val r = new java.util.SplittableRandom(mix64(seed ^ mix64(id) ^ 0xC057L))
      (id, f"Customer#$id%09d", r.nextInt(nations),
        math.rint(r.nextDouble(-999.99, 9999.99) * 100) / 100,
        segments(r.nextInt(segments.length)))
    }.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .coalesce(factor)
      .write.mode("overwrite").parquet(out)
  }

  /** Generate the three-table corpus at `factor`× the source rows under
    * `outDir` (idempotent overwrite; fully seed-deterministic). */
  def generate(spark: SparkSession, srcDir: String, outDir: String,
      factor: Int, seed: Long = 2016L): Unit = {
    val docFit = fitDocuments(spark, srcDir)
    val embFit = fitEmbeddings(spark, srcDir)
    generateDocuments(spark, docFit, factor, seed, s"$outDir/documents.parquet")
    generateEmbeddings(spark, embFit, factor, seed, s"$outDir/embeddings.parquet")
    generateCustomer(spark, srcDir, factor, seed, s"$outDir/customer.parquet")
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/tmp/graft_scale/x10")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, srcDir, outDir, factor)
    println(s"generated ${factor}x corpus from $srcDir at $outDir")
    spark.stop()
  }
}
