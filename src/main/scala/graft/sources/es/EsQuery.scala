package graft.sources.es

import org.apache.spark.sql.sources._

/** P1 on the wire: translate pushed-down Spark filters into a Lucene
  * query-string clause ANDed with the user's `--query`, so filtered
  * documents never leave the cluster.
  *
  * The translation is deliberately conservative — a clause is emitted only
  * when the Lucene form provably matches a superset of the Spark filter
  * (numeric/boolean comparisons and IsNotNull). String equality is NOT
  * pushed: on an analyzed `text` field a term query consults the analyzer,
  * not the raw value, and could drop matching documents. Safety net
  * either way: the scan returns every filter as residual, so Spark
  * re-evaluates semantics above the source (same stance as the jsonl
  * connector's RowFilter).
  */
object EsQuery {

  /** Lucene clause for one filter; None = not translatable. */
  def clause(f: Filter): Option[String] = f match {
    case EqualTo(a, v)            => literal(v).map(l => s"$a:$l")
    case GreaterThan(a, v)        => literal(v).map(l => s"$a:{$l TO *}")
    case GreaterThanOrEqual(a, v) => literal(v).map(l => s"$a:[$l TO *]")
    case LessThan(a, v)           => literal(v).map(l => s"$a:{* TO $l}")
    case LessThanOrEqual(a, v)    => literal(v).map(l => s"$a:[* TO $l]")
    case IsNotNull(a)             => Some(s"_exists_:$a")
    case And(l, r) =>
      (clause(l), clause(r)) match {
        case (Some(a), Some(b)) => Some(s"($a AND $b)")
        // And is safe to push partially: each side alone is a superset
        case (Some(a), None)    => Some(a)
        case (None, Some(b))    => Some(b)
        case _                  => None
      }
    // Or/Not must translate completely or not at all; Not flips superset
    // to subset, so it is never pushed.
    case Or(l, r) =>
      for (a <- clause(l); b <- clause(r)) yield s"($a OR $b)"
    case _ => None
  }

  private def literal(v: Any): Option[String] = v match {
    case _: Byte | _: Short | _: Int | _: Long | _: Float | _: Double =>
      Some(v.toString)
    case b: Boolean => Some(b.toString)
    case _          => None // strings/dates: analyzer semantics, stay residual
  }

  /** Combined query-string: user query AND every translatable filter. */
  def combine(userQuery: Option[String], filters: Seq[Filter]): Option[String] = {
    val clauses = userQuery.map(q => s"($q)").toSeq ++ filters.flatMap(clause)
    if (clauses.isEmpty) None else Some(clauses.mkString(" AND "))
  }
}
