package graft.tools
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

object CCProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables.load(spark, dir, "documents")
    // keep the CHECKPOINTED frame — timing must isolate the CC loop, not
    // re-pay candidate generation on every probe of `pairs`
    val pairs = graft.operators.Dedup.nearDupCandidates(docs, "text", "doc_id")
      .localCheckpoint()
    pairs.count()
    val t0 = System.nanoTime()
    val out = graft.operators.Dedup.clusters(pairs, "doc_id_a", "doc_id_b")
    val n = out.count()
    println(f"clusters: $n rows in ${(System.nanoTime()-t0)/1e9}%.2f s")
    println("pairs=" + pairs.count())
    spark.stop()
  }
}
