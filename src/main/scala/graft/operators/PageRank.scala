package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over a document graph — the link-analysis quality signal
  * crawl curation weights documents by (host graphs, near-dup graphs:
  * rank concentrates on the "canonical" member of a dup cluster).
  *
  * Power iteration: `rank'(v) = (1−d)/N + d · Σ_{u→v} rank(u)/outdeg(u)`
  * for a fixed `iters` rounds. Dangling nodes (no out-edges) leak their
  * mass — the simple variant, documented; with `undirected = true`
  * every node has out-edges and total rank stays 1.
  *
  * Scale posture ([[Dedup.clusters]]'s discipline): the edge frame is
  * checkpointed ONCE with out-degrees attached; each round is one join
  * (rank onto edges by src) + one groupBy (sum contributions by dst) +
  * one node-sized left join — all on the graph's natural keys, and the
  * rank frame `localCheckpoint`s per round so lineage stays flat across
  * iterations. State is O(|nodes|), fully distributed; the only driver
  * scalar is the node count. Rank values are doubles built from the
  * same expression shape the DuckDB oracle uses, so 6-dp-rounded ranks
  * hash-match across engines.
  */
object PageRank {

  /** (node, rank) after `iters` rounds from a uniform 1/N start. */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
            iters: Int = 3, damping: Double = 0.85,
            undirected: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be positive: $iters")
    require(damping > 0 && damping < 1, s"damping must be in (0,1): $damping")
    val dir0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val dir = if (undirected)
      dir0.union(dir0.select(col("dst").as("src"), col("src").as("dst")))
    else dir0
    val e = dir.distinct().localCheckpoint()
    val withDeg = e
      .join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint() // probed every round; degree computed once
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count() // the one driver scalar (bounded: a count)
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = withDeg.join(ranks, col("src") === col("node"))
        .select(col("dst"), (col("rank") / col("outdeg")).as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = nodes.join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit((1 - damping) / n) + lit(damping) * coalesce(col("s"), lit(0.0)))
            .as("rank"))
        .localCheckpoint()
    }
    ranks
  }
}
