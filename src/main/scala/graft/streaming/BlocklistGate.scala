package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.UrlOps

/** Streaming twin of [[UrlOps.dropBlockedDomains]] — the crawl-ingest
  * member of the gate family (exact/shape/meaning/span/eval-leak/THIS:
  * known-bad origin). The batch operator's explode→semi-join→anti-join
  * needs a stream-stream join a stateless gate can't run, so the
  * streaming form follows the [[DecontamGate]] discipline: the
  * blocklist rides the plan as a LITERAL hash set (`InSet` under the
  * `exists` HOF — O(host labels) per row, no state store, no shuffle,
  * Append mode, no watermark; batch == stream by construction) and the
  * literal budget is therefore REQUIRED: a list past `maxEntries`
  * fails fast pointing at the batch path, whose join handles the
  * multi-million-entry UT1 shape.
  *
  * Same match semantics as the batch gate: host or any parent domain
  * listed → dropped; entries lowercased; unparseable hosts pass. */
object BlocklistGate {

  /** Literal-set budget: 2^16 domains ≈ a few MB of plan — the
    * curated-list regime; UT1-scale lists belong to the batch join. */
  val LiteralDomainLimit: Int = 1 << 16

  def admitted(stream: DataFrame, urlCol: String, blocked: DataFrame,
               domainCol: String = "domain",
               maxEntries: Int = LiteralDomainLimit): DataFrame = {
    require(blocked.columns.contains(domainCol),
      s"BlocklistGate: blocklist frame lacks '$domainCol'")
    val distinctDomains = blocked
      .select(lower(col(domainCol)).as("__d")).distinct()
    val n = distinctDomains.count()
    if (n > maxEntries) throw new IllegalArgumentException(
      s"BlocklistGate: blocklist carries $n distinct domains, over the " +
        s"$maxEntries literal budget the stateless streaming gate " +
        "requires. Gate against a curated list, or run batch " +
        "UrlOps.dropBlockedDomains over the landed corpus, whose " +
        "suffix semi-join handles this size")
    val set = distinctDomains.collect().map(_.getString(0)).toSeq
    // The host expression is the full URL-normalization regexp chain —
    // bind it ONCE via a single-element-array HOF before fanning out to
    // the per-suffix lambda. Referencing it directly from inside the
    // lambdas re-inlines the whole chain at every reference (codegen
    // subexpression elimination does not cross lambda boundaries):
    // measured 15.3 s -> ~1 s on the q205 frontier at sf0.1.
    val host = UrlOps.domainOf(col(urlCol))
    val blockedPred = exists(
      transform(array(host), h => split(h, "\\.")),
      labels => exists(
        transform(sequence(lit(1), size(labels)),
          i => array_join(slice(labels, i, size(labels)), ".")),
        s => s.isInCollection(set)))
    stream.filter(set.isEmpty match {
      case true => lit(true)
      case false => !blockedPred
    })
  }
}
