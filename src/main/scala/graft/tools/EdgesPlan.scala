package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Plan-evidence probe for the r19 Dedup.clusters edge build: dumps the
  * physical plan of the edges frame (the subtree `clusters` evaluates
  * once under its localCheckpoint) for BOTH constructions over q171's
  * fuzzy-join pairs — the pre-r19 union-of-four-selects (which inlines
  * the pair subtree four times) and the shipped single-explode form.
  * Terminal q172 plans can't show this (the loop hides behind the
  * checkpoint), so this probe is the committed artifact's source. */
object EdgesPlan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val pairs = graft.SparkEntry.queries("q171_fuzzy_join")(spark, dir)
    val (aCol, bCol) = ("p_partkey", "b_id")

    println("==== q172 edges: union form (pre-r19) ====")
    val directed = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
    directed.union(directed.select(col("src"), col("src").as("dst")))
      .distinct()
      .explain("formatted")

    println("==== q172 edges: explode form (r19, as shipped) ====")
    pairs
      .select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")),
        struct(col(aCol).as("src"), col(aCol).as("dst")),
        struct(col(bCol).as("src"), col(bCol).as("dst")))).as("__e"))
      .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
      .distinct()
      .explain("formatted")
    spark.stop()
  }
}
