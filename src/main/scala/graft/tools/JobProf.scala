package graft.tools

import graft.{GraftSession, SparkEntry, Tables}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import scala.collection.mutable

/** Dev tool: per-JOB wall-time breakdown for one or more queries.
  *
  *   sbt "runMain graft.tools.JobProf <sfDir> <query> [query...]"
  *
  * Runs each query once cold + once measured (after the TimeQ-style
  * warmup) with a listener that records every Spark job's duration and
  * call site, so a multi-job query (training loops, connected
  * components, sampled centers) shows WHERE its wall clock goes —
  * the guide-§1 measurement the stage-less noop timing can't give. */
object JobProf {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1).toSeq
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val rows = mutable.ArrayBuffer[(Double, String)]()
    val stageJob = mutable.Map[Int, (Int, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        js.stageIds.foreach(id => stageJob(id) = (js.jobId, site))
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for { s <- si.submissionTime; e <- si.completionTime }
          yield (e - s) / 1e3).getOrElse(0.0)
        val m = si.taskMetrics
        val frame = si.details.linesIterator
          .find(l => l.contains("graft.") && !l.contains("JobProf"))
          .map(_.trim).getOrElse(si.name.takeWhile(_ != '\n'))
        val (jid, jsite) = stageJob.getOrElse(si.stageId, (-1, ""))
        val io = f"job=$jid%-3d in=${m.inputMetrics.bytesRead / 1e6}%.0fMB " +
          f"sr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%.1fMB " +
          f"sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%.1fMB " +
          f"cpu=${m.executorRunTime / 1e3}%.1fs gc=${m.jvmGCTime / 1e3}%.1fs " +
          f"tasks=${si.numTasks}"
        rows += ((wall, f"$io  $jsite  $frame"))
      }
    }
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    Tables.names.foreach { t =>
      try Tables.load(spark, dir, t).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"unknown query: $name")
        case Some(fn) =>
          // warm run (codegen), then the measured run
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          rows.clear()
          spark.sparkContext.addSparkListener(listener)
          val t0 = System.nanoTime()
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          val total = (System.nanoTime() - t0) / 1e9
          spark.sparkContext.removeSparkListener(listener)
          Thread.sleep(200) // drain listener bus
          println(f"== $name total $total%.2f s, ${rows.size} stages, " +
            f"stage-wall-sum ${rows.map(_._1).sum}%.2f s ==")
          rows.zipWithIndex.foreach { case ((sec, site), i) =>
            if (sec >= 0.05) println(f"  st$i%-3d $sec%7.3f s  $site")
          }
      }
    }
    spark.stop()
  }
}
