package graft.tools
import graft.{GraftSession, SparkEntry}
object QSmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = "/root/testdata/sf0.001"
    args.foreach { q =>
      println(s"===== $q =====")
      SparkEntry.queries(q)(spark, dir).show(50, truncate = false)
    }
    spark.stop()
  }
}
