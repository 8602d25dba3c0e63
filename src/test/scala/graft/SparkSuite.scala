package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for specs. One session per suite keeps the
  * JVM warm; local[4] + 4 shuffle partitions keeps tests fast. */
trait SparkSuite extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // same session invariant Tables.configure sets for the mains
    .config("spark.sql.parquet.aggregatePushdown", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = {
    // Session is shared across suites in one fork; don't stop it here.
    super.afterAll()
  }

  def sfDir: String = "/root/testdata/sf0.001"

  /** Flatten an executed plan INCLUDING the subtrees AQE hides:
    * AdaptiveSparkPlanExec and QueryStageExec are leaves to a naive
    * `children` traversal (the r5 SkipListSuite lesson), so any
    * plan-shape assertion that walks children alone can't see inside
    * finished stages. The ONE traversal every suite should use. */
  def flattenPlan(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val through = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: through.flatMap(flattenPlan)
  }
}
