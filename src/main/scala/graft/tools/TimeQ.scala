package graft.tools

import graft.{GraftSession, SparkEntry, Tables}

/** Dev tool: steady-state timings for one or more queries.
  *
  *   sbt "runMain graft.tools.TimeQ <sfDir> <query> [query...]"
  *
  * Runs each query SPARK_GRAFT_PROFILE_RUNS times (default 3) after
  * warming codegen and every fixture table's file-index/footer read, and
  * prints all run times so warm-up vs steady state is visible (Bench's
  * min-of-2 still carries first-codegen cost).
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROFILE_RUNS", "3").toInt
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    // SPARK_GRAFT_PROFILE_CPUS: core-scaling spot checks (SURVEY §6)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_PROFILE_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    Tables.names.foreach { t =>
      try Tables.load(spark, dir, t).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"unknown query: $name")
        case Some(fn) =>
          val times = (1 to runs).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, dir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"$name%-28s ${times.map(t => f"$t%6.2f").mkString(" ")}")
      }
    }
    spark.stop()
  }
}
