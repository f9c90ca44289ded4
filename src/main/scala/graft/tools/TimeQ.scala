package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool: time one query N times. Usage: runMain graft.tools.TimeQ <sfDir> <query> [n] */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.local(32)
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(args(1))(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
