package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool: print the formatted physical plan of selected queries.
  * Usage: runMain graft.tools.Explain <sfDir> <query>... */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(8)
    args.drop(1).foreach { q =>
      println(s"==== $q ====")
      SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
