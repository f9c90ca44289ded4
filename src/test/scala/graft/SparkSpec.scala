package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared tuned session for every suite (JVM-wide; suites run in one
  * forked JVM, so session startup cost is paid once). */
object SharedSpark {
  lazy val spark: SparkSession = GraftSession.local(cores = 4)
}

/** Base for Spark-backed suites. */
abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"

  /** `input_file_name()` may or may not carry a `file:` scheme
    * depending on the source; resolve either form to a local Path. */
  def localPath(f: String): java.nio.file.Path =
    if (f.startsWith("file:")) java.nio.file.Paths.get(new java.net.URI(f))
    else java.nio.file.Paths.get(f)

  /** Collect matching nodes from a physical plan, walking THROUGH the
    * wrappers plan-shape assertions keep tripping on: AQE roots hide the
    * (re-)planned tree behind `executedPlan`, and query stages are
    * leaves to `collect()` with the real operators behind `plan`. */
  def collectPlan[T](root: org.apache.spark.sql.execution.SparkPlan)(
      pf: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T]): Seq[T] = {
    def expand(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val inner = p.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q.plan
      }
      p +: inner.flatMap(expand)
    }
    expand(root).flatMap(_.collect(pf))
  }
}
