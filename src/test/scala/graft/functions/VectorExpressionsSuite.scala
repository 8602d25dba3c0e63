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

  test("the full native-function surface is SQL-callable") {
    GraftExtensions.register(spark)
    Tables.embeddings(spark, sfDir).limit(5).createOrReplaceTempView("emb_sql")
    val r = spark.sql(
      """SELECT
        |  dot_long(array(2L, 3L), array(4L, 5L)) AS dl,
        |  simhash64(array('a', 'b')) AS sh,
        |  array_md5(array('x'), 'p:') AS am,
        |  size(srp_band_codes(embedding, 6, 24)) AS nb
        |FROM emb_sql LIMIT 1""".stripMargin).head()
    assert(r.getLong(0) === 23L)
    assert(r.getSeq[String](2).head ===
      java.security.MessageDigest.getInstance("MD5")
        .digest("p:x".getBytes("UTF-8")).map(b => f"$b%02x").mkString)
    assert(r.getInt(3) === 24)
    // non-literal band params are rejected with a clear message
    val err = intercept[Exception](spark.sql(
      "SELECT srp_band_codes(embedding, CAST(vec_id AS INT), 4) FROM emb_sql").collect())
    assert(err.getMessage.contains("rowsPerBand"))
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

  test("dot_long matches the aggregate(zip_with) integer fold exactly") {
    val emb = Tables.embeddings(spark, sfDir).limit(300)
      .withColumn("q", expr(
        "transform(embedding, x -> cast(floor(cast(x as double) * 64 + 0.5) as bigint))"))
    val hof = aggregate(
      zip_with(col("q"), col("q"), (a, b) => a * b),
      lit(0L), (acc, v) => acc + v)
    val native = VectorFunctions.dotLong(col("q"), col("q"))
    val mismatches = emb.select((hof =!= native).as("ne")).filter(col("ne")).count()
    assert(mismatches === 0L)
    // null element ⇒ null result, as the HOF
    val sparkS = spark
    import sparkS.implicits._
    val edge = Seq(
      (1L, Array[java.lang.Long](2L, 3L), Array[java.lang.Long](4L, 5L)),
      (2L, Array[java.lang.Long](2L, null), Array[java.lang.Long](4L, 5L)))
      .toDF("id", "x", "y")
    val got = edge.select(col("id"),
      VectorFunctions.dotLong(col("x"), col("y")).as("d")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(1L) === Some(23L))
    assert(got(2L) === None)
  }

  test("dot_tiny matches the bigint fold on int8 codes and is SQL-callable") {
    GraftExtensions.register(spark)
    val emb = Tables.embeddings(spark, sfDir).limit(300)
      .withColumn("c", expr(
        "transform(embedding, x -> cast(floor(cast(x as double) * 64 + 0.5) as tinyint))"))
    // the widened dot over the same values is the executable spec
    val viaLong = VectorFunctions.dotLong(
      expr("transform(c, x -> cast(x as bigint))"),
      expr("transform(c, x -> cast(x as bigint))"))
    val native = VectorFunctions.dotTiny(col("c"), col("c"))
    val mismatches = emb.select((viaLong =!= native).as("ne"))
      .filter(col("ne")).count()
    assert(mismatches === 0L)
    // SQL registration + extreme signed bytes (-128 * -128 = 16384)
    val r = spark.sql(
      """SELECT dot_tiny(array(CAST(-128 AS TINYINT), CAST(127 AS TINYINT)),
        |                array(CAST(-128 AS TINYINT), CAST(127 AS TINYINT)))""".stripMargin)
      .head().getLong(0)
    assert(r === 16384L + 16129L)
    // null element ⇒ null; length mismatch ⇒ loud
    val sparkS = spark
    import sparkS.implicits._
    val edge = Seq((Array[java.lang.Byte](2.toByte, null),
      Array[java.lang.Byte](4.toByte, 5.toByte))).toDF("x", "y")
    assert(edge.select(VectorFunctions.dotTiny(col("x"), col("y")))
      .head().isNullAt(0))
    val bad = Seq((Array[Byte](1), Array[Byte](1, 2))).toDF("x", "y")
    intercept[Exception](
      bad.select(VectorFunctions.dotTiny(col("x"), col("y"))).collect())
  }

  test("null ELEMENTS propagate to a null result, matching the HOF truth table") {
    val sparkS = spark
    import sparkS.implicits._
    // parquet-shaped schema: ARRAY<FLOAT> with containsNull = true
    val rows = Seq(
      (1L, Array[java.lang.Float](1.0f, 2.0f), Array[java.lang.Double](1.0, 1.0)),
      (2L, Array[java.lang.Float](1.0f, null), Array[java.lang.Double](1.0, 1.0)),
      (3L, Array[java.lang.Float](1.0f, 2.0f), Array[java.lang.Double](null, 1.0)))
      .toDF("id", "x", "w")
    val hof = aggregate(
      zip_with(col("x"), col("w"), (a, b) => a.cast("double") * b),
      lit(0.0), (acc, v) => acc + v)
    val got = rows.select(col("id"),
      VectorFunctions.dotDouble(col("x"), col("w")).as("native"), hof.as("hof"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1), r.isNullAt(2),
        if (r.isNullAt(1)) 0.0 else r.getDouble(1)))
    got.foreach { case (id, nativeNull, hofNull, v) =>
      assert(nativeNull === hofNull, s"id=$id")
      if (id == 1L) assert(!nativeNull && v === 3.0)
    }
    // cosine: same contract
    val emb = Seq(
      (1L, Array[java.lang.Float](1.0f, 0f), Array[java.lang.Float](1.0f, 0f)),
      (2L, Array[java.lang.Float](1.0f, null), Array[java.lang.Float](1.0f, 0f)))
      .toDF("id", "a", "b")
    val cos = emb.select(col("id"),
      VectorFunctions.cosineSimilarity(col("a"), col("b")).as("c")).collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(cos(1L) === false)
    assert(cos(2L) === true)
  }
}
