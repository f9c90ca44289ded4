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
}
