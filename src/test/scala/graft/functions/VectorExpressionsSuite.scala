package graft.functions

import graft.{SparkSuite, Tables}
import graft.operators.Similarity
import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._

class VectorExpressionsSuite extends SparkSuite {

  test("native cosine matches the HOF fold bit-for-bit on real embeddings") {
    val emb = Tables.embeddings(spark, sfDir).limit(200)
    val a = emb.select(col("vec_id").as("id1"), col("embedding").as("e1"))
    val b = emb.select(col("vec_id").as("id2"), col("embedding").as("e2"))
    val pairs = a.crossJoin(b).filter(col("id1") < col("id2"))

    def hofDot(x: String, y: String) = aggregate(
      zip_with(col(x), col(y), (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val hof = hofDot("e1", "e2") /
      (sqrt(hofDot("e1", "e1")) * sqrt(hofDot("e2", "e2")))
    val native = VectorFunctions.cosineSimilarity(col("e1"), col("e2"))

    // bit-for-bit: both accumulate left-to-right over doubles
    val diff = pairs.select(abs(hof - native).as("d"))
      .agg(max("d")).head().getDouble(0)
    assert(diff === 0.0)
  }

  test("SQL registration via extensions: SELECT cosine_similarity(...)") {
    GraftExtensions.register(spark)
    Tables.embeddings(spark, sfDir).limit(10).createOrReplaceTempView("emb_v")
    val rows = spark.sql(
      """SELECT a.vec_id, b.vec_id, cosine_similarity(a.embedding, b.embedding) AS s
        |FROM emb_v a JOIN emb_v b ON a.vec_id < b.vec_id""".stripMargin)
      .collect()
    assert(rows.length === 45)
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
  }

  test("codegen path: expression evaluates inside WholeStageCodegen") {
    val emb = Tables.embeddings(spark, sfDir).limit(50)
    val df = emb.select(
      VectorFunctions.cosineSimilarity(col("embedding"), col("embedding")).as("self"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1)"), p.take(1500))
    // self-similarity ~ 1 (sqrt(x)*sqrt(x) rounds, so not bit-exact)
    val Seq(lo, hi) = df.agg(min("self"), max("self")).head().toSeq
      .map(_.asInstanceOf[Double])
    assert(math.abs(lo - 1.0) < 1e-12 && math.abs(hi - 1.0) < 1e-12)
  }

  test("null and error semantics") {
    val sparkS = spark
    import sparkS.implicits._
    GraftExtensions.register(spark)
    val one = Seq((Array(1.0f, 0f), Array(1.0f, 0f))).toDF("a", "b")
    assert(one.selectExpr("cosine_similarity(a, b)").head().getDouble(0) === 1.0)
    assert(one.selectExpr("cosine_similarity(a, CAST(NULL AS ARRAY<FLOAT>))")
      .head().isNullAt(0))
    val bad = Seq((Array(1.0f), Array(1.0f, 2f))).toDF("a", "b")
    intercept[Exception](bad.selectExpr("cosine_similarity(a, b)").collect())
  }

  test("simhash64 matches the explode+groupBy signature exactly (the oracle's form)") {
    val docs = Tables.documents(spark, sfDir)
    val native = docs.select(col("doc_id"),
      VectorFunctions.simhash64(split(col("text"), " ")).as("s_native"))
    // the original 64-column aggregate shape (still what the DuckDB twin
    // spells out): explode every token occurrence, ±1 per md5 hex bit
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", md5(col("tok")))
    val bitSums = (0 until 64).map { b =>
      val bit = expr(s"shiftright(instr('0123456789abcdef', substring(h, ${b / 4 + 1}, 1)) - 1, ${3 - b % 4}) % 2")
      sum(when(bit === 1, 1).otherwise(-1)).as(s"s$b")
    }
    val sig = (0 until 64).map(b => when(col(s"s$b") >= 0, lit(1L << b)).otherwise(0L)).reduce(_ + _)
    val hof = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), sig.as("s_hof"))
    val mismatches = native.join(hof, "doc_id")
      .filter(col("s_native") =!= col("s_hof")).count()
    assert(mismatches === 0L)
    assert(native.count() === hof.count())
  }

  test("dot_double matches the aggregate(zip_with) fold bit-for-bit") {
    val emb = Tables.embeddings(spark, sfDir).limit(300)
    // a deterministic ±1 weight vector, like an SRP hyperplane
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val w = (0 until dim).map(d => if (d % 3 == 0) -1.0 else 1.0)
    val hof = aggregate(
      zip_with(col("embedding"), typedLit(w), (x, s) => x.cast("double") * s),
      lit(0.0), (acc, x) => acc + x)
    val native = VectorFunctions.dotDouble(col("embedding"), typedLit(w))
    val diff = emb.select(abs(hof - native).as("d")).agg(max("d")).head().getDouble(0)
    assert(diff === 0.0)
  }

  test("array_md5 matches transform+md5 byte-for-byte, prefix and nulls included") {
    val sparkS = spark
    import sparkS.implicits._
    val docs = Tables.documents(spark, sfDir).limit(300)
      .withColumn("sh", split(col("text"), " "))
    def same(prefix: String): Long = docs.select(
      (graft.functions.VectorFunctions.arrayMd5(col("sh"), lit(prefix)) =!=
        expr(s"transform(sh, x -> md5(concat('$prefix', x)))")).as("ne"))
      .filter(col("ne")).count()
    assert(same("") === 0L)
    assert(same("3:") === 0L)
    // null array ⇒ null; null ELEMENT ⇒ null element (the HOF truth table)
    val edge = Seq(
      (1L, Array[String]("a", null, "b")),
      (2L, null.asInstanceOf[Array[String]]),
      (3L, Array.empty[String])).toDF("id", "sh")
    val got = edge.select(col("id"),
      graft.functions.VectorFunctions.arrayMd5(col("sh"), lit("")).as("m"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[String](1)))
      .toMap
    assert(got(2L) === null)
    assert(got(3L) === Seq.empty)
    assert(got(1L)(1) === null && got(1L)(0) != null && got(1L)(2) != null)
  }
}
