package graft.plans

import graft.functions.CosineSimilarity
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * Session extensions: registers the engine's native expressions so SQL
 * users get them too (`SELECT cosine_similarity(a, b)`). Install with
 *
 *   SparkSession.builder()
 *     .withExtensions(new GraftExtensions)          // or
 *     .config("spark.sql.extensions", "graft.plans.GraftExtensions")
 *
 * Kept to genuinely-needed surface: no custom Rule/Strategy exists
 * because Catalyst already plans everything this engine declares
 * (SURVEY.md §7.3 decision table).
 */
final class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSimilarityDescriptor)
  }
}

object GraftExtensions {
  private[plans] val cosineSimilarityDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_similarity"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
    (args: Seq[Expression]) => {
      require(args.length == 2,
        s"cosine_similarity expects 2 arguments, got ${args.length}")
      CosineSimilarity(args.head, args(1))
    })

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (id, info, builder) = cosineSimilarityDescriptor
    spark.sessionState.functionRegistry
      .registerFunction(id, info, builder.andThen(identity))
  }
}
