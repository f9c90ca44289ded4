package graft.sinks

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.unsafe.types.UTF8String

import graft.sinks.Snapshots.{ColStat, FileStats, NullStat, NumStat, StrStat}

/** DATA SKIPPING from the log — the evaluator that lets EVERY filtered
  * snapshot scan (not just an explicit [[Snapshots.prunedRead]] call)
  * skip files whose logged bounds provably exclude the predicate: the
  * file indexes ([[org.apache.spark.sql.graftshim.LogFileIndex]] for
  * the Scala API, [[org.apache.spark.sql.graftshim.SnapshotScanShim]]
  * for SQL) receive the query's data filters in `listFiles` and drop
  * files where [[mayMatch]] returns false — the Delta
  * TahoeFileIndex/data-skipping shape, evaluated on the driver against
  * per-file bounds that came from ONE entry read.
  *
  * SOUNDNESS is the only hard requirement, and it is conservative by
  * construction: `mayMatch` returns true (keep the file) for every
  * expression shape, column, or bound it does not positively
  * understand; it returns false only when the bounds PROVE no row can
  * satisfy the filter. The scan re-applies the full predicate to the
  * kept files, so skipping can only save IO, never change an answer.
  * NULL semantics make this sound for comparisons: a row with a NULL
  * operand never satisfies `<`/`=`/`>`-family predicates, and logged
  * bounds describe exactly the non-NULL values. Logged NULL COUNTS
  * (r17) add three more pruning classes — `IS NULL` on a zero-null
  * column, `IS NOT NULL` on an all-null column, comparisons on an
  * all-null column — while `Not` stays unpruned (negation over
  * bounds is not sound in general). String comparisons follow the
  * [[Snapshots]] BMP guard:
  * bounds are BMP-only by construction, and a non-BMP literal keeps
  * the file rather than comparing across the UTF-8/UTF-16 order
  * divide. */
object StatsPruning {

  /** May a file with these per-column stats contain a row satisfying
    * `expr`? Column lookup is case-insensitive (Spark's default
    * resolution; stats are logged under the table's casing). Null
    * counts add three pruning classes beyond bounds: `IS NULL` on a
    * zero-null column, `IS NOT NULL` on an all-null column, and any
    * comparison on an all-null column (no non-NULL value exists to
    * satisfy it). */
  def mayMatch(stats: FileStats, expr: Expression): Boolean =
    mayMatchAll(stats, Seq(expr))

  /** [[mayMatch]] over a filter CONJUNCTION — the listFiles shape: one
    * lowercased column map per file, however many filters the query
    * pushed (the per-(file, filter) map rebuild would be O(files ×
    * filters × columns) driver allocations per plan at estate scale). */
  def mayMatchAll(stats: FileStats, filters: Seq[Expression]): Boolean = {
    if (stats.isEmpty) return true
    if (stats.rows == 0) return false // a logged-empty file matches nothing
    val byLower = stats.cols.map { case (k, v) =>
      k.toLowerCase(java.util.Locale.ROOT) -> v
    }
    def statOf(a: Attribute): Option[ColStat] =
      byLower.get(a.name.toLowerCase(java.util.Locale.ROOT))

    def asNum(v: Any): Option[Double] = v match {
      case null => None
      case x: java.lang.Number => Some(x.doubleValue())
      case x: java.math.BigDecimal => Some(x.doubleValue())
      case x: org.apache.spark.sql.types.Decimal => Some(x.toDouble)
      case _ => None
    }
    def asStr(v: Any): Option[String] = v match {
      case null => None
      case x: UTF8String => Some(x.toString)
      case x: String => Some(x)
      case _ => None
    }
    def bmp(x: String) = x.forall(c => c < '\ud800' || c > '\udfff')

    /** lo/hi test per stat kind; keep on any representation mismatch,
      * non-BMP string literal, or NaN literal (Spark's NaN ordering
      * differs from IEEE comparisons — never prune on it). */
    def cmp(st: ColStat, v: Any)(numTest: (Double, Double, Double) => Boolean)
           (strTest: (String, String, String) => Boolean): Boolean =
      st match {
        case NumStat(mn, mx, _) => asNum(v) match {
          case Some(d) if !d.isNaN => numTest(mn, mx, d)
          case _ => true
        }
        case StrStat(mn, mx, _) => asStr(v) match {
          case Some(s) if bmp(s) => strTest(mn, mx, s)
          case _ => true
        }
        case NullStat(_) => true // no bounds; allNull handled by callers
      }

    /** the column provably holds ONLY nulls in this file. */
    def allNull(st: ColStat): Boolean =
      stats.rows >= 0 && st.nulls.contains(stats.rows)

    def may(e: Expression): Boolean = e match {
      case And(l, r) => may(l) && may(r)
      case Or(l, r) => may(l) || may(r)
      // IS NULL: prune when the footer states zero nulls
      case IsNull(a: Attribute) =>
        statOf(a).forall(st => !st.nulls.contains(0L))
      case EqualNullSafe(a: Attribute, Literal(null, _)) =>
        statOf(a).forall(st => !st.nulls.contains(0L))
      case EqualNullSafe(Literal(null, _), a: Attribute) =>
        statOf(a).forall(st => !st.nulls.contains(0L))
      // IS NOT NULL: prune when every row of the file is null here
      case IsNotNull(a: Attribute) => statOf(a).forall(st => !allNull(st))
      // a = v: some value in [mn, mx] can equal v
      case EqualTo(a: Attribute, Literal(v, _)) => eqMay(a, v)
      case EqualTo(Literal(v, _), a: Attribute) => eqMay(a, v)
      case EqualNullSafe(a: Attribute, Literal(v, _)) if v != null => eqMay(a, v)
      case EqualNullSafe(Literal(v, _), a: Attribute) if v != null => eqMay(a, v)
      // a < v: needs mn < v   |   a <= v: needs mn <= v
      case LessThan(a: Attribute, Literal(v, _)) => ltMay(a, v, strict = true)
      case LessThanOrEqual(a: Attribute, Literal(v, _)) => ltMay(a, v, strict = false)
      case GreaterThan(Literal(v, _), a: Attribute) => ltMay(a, v, strict = true)
      case GreaterThanOrEqual(Literal(v, _), a: Attribute) => ltMay(a, v, strict = false)
      // a > v: needs mx > v   |   a >= v: needs mx >= v
      case GreaterThan(a: Attribute, Literal(v, _)) => gtMay(a, v, strict = true)
      case GreaterThanOrEqual(a: Attribute, Literal(v, _)) => gtMay(a, v, strict = false)
      case LessThan(Literal(v, _), a: Attribute) => gtMay(a, v, strict = true)
      case LessThanOrEqual(Literal(v, _), a: Attribute) => gtMay(a, v, strict = false)
      case In(a: Attribute, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        vs.exists { case Literal(v, _) => eqMay(a, v) }
      case InSet(a: Attribute, vs) => vs.exists(v => eqMay(a, v))
      // doc-id/URL prefix scans: a file may hold a `prefix…` value iff
      // [mn, mx] intersects [prefix, prefix+1) — mx >= prefix and
      // mn < upper(prefix)
      case StartsWith(a: Attribute, Literal(v, _)) =>
        (statOf(a), asStr(v)) match {
          case (Some(st), _) if allNull(st) => false
          case (Some(StrStat(mn, mx, _)), Some(p)) if bmp(p) && p.nonEmpty =>
            mx >= p && incrementLast(p).forall(up => mn < up)
          case _ => true
        }
      case _ => true // unknown shape: keep — soundness over pruning
    }

    def eqMay(a: Attribute, v: Any): Boolean = statOf(a) match {
      case None => true
      case Some(st) if allNull(st) => false // no non-NULL value to equal
      case Some(st) =>
        cmp(st, v)((mn, mx, d) => d >= mn && d <= mx)(
          (mn, mx, s) => s >= mn && s <= mx)
    }
    // NUMERIC strict tests are deliberately relaxed to NON-strict:
    // literals compare in double space while the real predicate may be
    // exact int64 — a literal past 2^53 rounds, and `mn < d` could
    // wrongly drop a file whose min equals the rounded literal but
    // satisfies the exact `<`. Keeping the boundary file costs one
    // file occasionally; dropping it loses rows. STRING tests are
    // exact (no rounding), so strictness stands there.
    def ltMay(a: Attribute, v: Any, strict: Boolean): Boolean =
      statOf(a) match {
        case None => true
        case Some(st) if allNull(st) => false
        case Some(st) =>
          cmp(st, v)((mn, _, d) => mn <= d)(
            (mn, _, s) => if (strict) mn < s else mn <= s)
      }
    def gtMay(a: Attribute, v: Any, strict: Boolean): Boolean =
      statOf(a) match {
        case None => true
        case Some(st) if allNull(st) => false
        case Some(st) =>
          cmp(st, v)((_, mx, d) => mx >= d)(
            (_, mx, s) => if (strict) mx > s else mx >= s)
      }

    filters.forall(may)
  }

  /** The exclusive upper bound of the `startsWith(p)` value range:
    * `p` with its rightmost incrementable char bumped (skipping the
    * surrogate range). None → no finite bound, keep the file. */
  private def incrementLast(p: String): Option[String] = {
    val a = p.toCharArray
    var i = a.length - 1
    var out: Option[String] = None
    while (out.isEmpty && i >= 0) {
      val n = a(i) + 1
      if (n <= 0xFFFF && (n < 0xD800 || n > 0xDFFF)) {
        a(i) = n.toChar
        out = Some(new String(a, 0, i + 1))
      }
      i -= 1
    }
    out
  }
}
