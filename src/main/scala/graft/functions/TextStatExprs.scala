package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd kernels for the per-document text statistics that
  * the interpreted HOF forms make hot: repetition run-stats (q70) and
  * gram overlap against a fixed benchmark set (q69's decontamination).
  * Both shingle INSIDE the kernel (the [[HashOps.minhashBands]] lesson:
  * `Text.shingles` is an interpreted `transform`+`slice`+`array_join`
  * per gram, and dominates the wall time of anything that calls it per
  * row). The composable built-ins forms stay in their operators as the
  * spec; differential tests pin native == composable.
  */
object TextStatOps {

  private val utf8Cmp = new java.util.Comparator[UTF8String] {
    def compare(a: UTF8String, b: UTF8String): Int = a.compareTo(b)
  }

  private val space = UTF8String.fromString(" ")

  /** Word `n`-gram shingles of a token array, space-joined — the native
    * twin of `Text.shingles` (concatWs skips null tokens exactly like
    * array_join). Empty when the doc has fewer than n tokens. */
  private[functions] def shingleGrams(toks: ArrayData, n: Int): Array[UTF8String] = {
    val m = toks.numElements()
    val cnt = m - n + 1
    if (cnt <= 0) return Array.empty
    val ts = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      ts(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      i += 1
    }
    val out = new Array[UTF8String](cnt)
    var j = 0
    while (j < cnt) {
      out(j) = UTF8String.concatWs(space, java.util.Arrays.copyOfRange(ts, j, j + n): _*)
      j += 1
    }
    out
  }

  /** (total, distinct, max run) over the doc's `n`-gram multiset in one
    * shingle + sort + scan. Counts are order-insensitive, so the binary
    * UTF8 sort only needs to be *a* consistent ordering, not a
    * collation. */
  def repStats(toks: ArrayData, n: Int): InternalRow = {
    val a = shingleGrams(toks, n)
    java.util.Arrays.sort(a, utf8Cmp)
    var distinct = 0L
    var maxRun = 0L
    var run = 0L
    var j = 0
    while (j < a.length) {
      if (j == 0 || a(j).compareTo(a(j - 1)) != 0) { distinct += 1; run = 1L }
      else run += 1L
      if (run > maxRun) maxRun = run
      j += 1
    }
    InternalRow(a.length.toLong, distinct, maxRun)
  }

  /** (distinct grams, distinct grams present in `bench`) for one doc —
    * the per-row half of decontamination, one pass, one hash set of the
    * doc's own grams. */
  def gramOverlap(toks: ArrayData, n: Int,
                  bench: java.util.HashSet[UTF8String]): InternalRow = {
    val grams = shingleGrams(toks, n)
    val seen = new java.util.HashSet[UTF8String](math.max(4, grams.length * 2))
    var matched = 0L
    var i = 0
    while (i < grams.length) {
      if (seen.add(grams(i)) && bench.contains(grams(i))) matched += 1L
      i += 1
    }
    InternalRow(seen.size.toLong, matched)
  }

  /** (total chars, distinct chars, Simpson diversity 1 − Σp²) over the
    * string's code points. Simpson instead of Shannon on purpose: the
    * index is pure integer arithmetic plus ONE double division, so the
    * oracle reproduces the exact bits — no libm log whose last ulp can
    * differ between engines. 0.0 for the empty string. */
  def charStats(s: UTF8String): InternalRow = {
    val cps = s.toString.codePoints().toArray
    java.util.Arrays.sort(cps)
    val n = cps.length.toLong
    var distinct = 0L
    var sumSq = 0L
    var run = 0L
    var j = 0
    while (j < cps.length) {
      if (j == 0 || cps(j) != cps(j - 1)) {
        if (run > 0) sumSq += run * run
        distinct += 1
        run = 1L
      } else run += 1L
      j += 1
    }
    if (run > 0) sumSq += run * run
    val diversity = if (n == 0) 0.0 else 1.0 - sumSq.toDouble / (n * n).toDouble
    InternalRow(n, distinct, diversity)
  }

  /** One BPE merge pass: every adjacent (a, b) symbol pair becomes the
    * concatenated symbol, greedy left-to-right (after "a a a" with pair
    * (a,a), the first two merge, the third survives) — the classic
    * tokenizer-training step. */
  def bpeMerge(arr: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = arr.numElements()
    val buf = new Array[AnyRef](n)
    val merged = UTF8String.concat(a, b)
    var m = 0
    var i = 0
    while (i < n) {
      val cur = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      if (cur != null && i + 1 < n && !arr.isNullAt(i + 1) &&
          cur.equals(a) && arr.getUTF8String(i + 1).equals(b)) {
        buf(m) = merged
        i += 2
      } else {
        buf(m) = cur
        i += 1
      }
      m += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOfRange(buf, 0, m))
  }

  /** Single-pass BPE encode: applies an ENTIRE ranked merge list to one
    * symbol array via the standard pair-priority loop (the tokenizer
    * encode algorithm) — find the lowest-rank adjacent pair present,
    * merge all its occurrences greedily left-to-right, repeat until no
    * ranked pair remains. On TRAINED merge lists (each side is a single
    * char or an earlier merge's output — what [[graft.operators.Bpe
    * .train]] emits) this is equivalent to folding [[bpeMerge]] over the
    * merges in rank order (BpeSpec pins the differential plus a seeded
    * property over generated well-formed lists): a merge at rank k only
    * ever creates pairs involving its new symbol, which by construction
    * carry ranks > k, so processing present-pairs in ascending rank
    * order visits exactly the ranks the fold would apply. On malformed
    * lists (a rank referencing a LATER merge's output) the two
    * legitimately differ, and this loop keeps standard tokenizer
    * priority semantics — apply the best pair PRESENT — which is the
    * behavior real encoders ship (also pinned).
    * Unlike the fold, the plan cost is ONE kernel call regardless of
    * vocabulary size — a 32k-merge vocabulary encodes without a
    * 32k-deep projection chain. */
  def bpeEncode(arr: ArrayData,
      ranks: java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, Integer]])
      : ArrayData = {
    val n = arr.numElements()
    val s = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      s(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val len = bpeMergeLoop(s, n, ranks)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOfRange(s.asInstanceOf[Array[AnyRef]], 0, len))
  }

  /** The pair-priority merge loop of [[bpeEncode]], in place over
    * `s[0, len0)`; returns the merged length. Shared with [[bpeIds]],
    * which runs it once per pretoken. */
  private def bpeMergeLoop(s: Array[UTF8String], len0: Int,
      ranks: java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, Integer]])
      : Int = {
    var len = len0
    var i = 0
    var continue = len >= 2
    while (continue) {
      var bestRank = Integer.MAX_VALUE
      var bi = -1
      i = 0
      while (i + 1 < len) {
        val l = s(i)
        val r = s(i + 1)
        if (l != null && r != null) {
          val m = ranks.get(l)
          if (m != null) {
            val rk = m.get(r)
            if (rk != null && rk < bestRank) { bestRank = rk; bi = i }
          }
        }
        i += 1
      }
      if (bi < 0) continue = false
      else {
        val l = s(bi)
        val r = s(bi + 1)
        val merged = UTF8String.concat(l, r)
        var w = 0
        i = 0
        while (i < len) {
          if (i + 1 < len && s(i) != null && s(i + 1) != null &&
              s(i).equals(l) && s(i + 1).equals(r)) {
            s(w) = merged
            i += 2
          } else {
            s(w) = s(i)
            i += 1
          }
          w += 1
        }
        len = w
      }
    }
    len
  }

  /** Text → token ids, the step after [[bpeEncode]] a training job
    * actually consumes: for each pretoken (null entries skipped), split
    * to code points, run the same pair-priority merge loop, then map
    * every surviving symbol to an integer id — a trained merge product
    * looks up `vocab` (id = 256 + first rank producing that string,
    * [[buildVocab]]); anything else falls back to its raw UTF-8 BYTES,
    * one id per byte (ids < 256 ARE bytes), so every string encodes
    * with no unknown-token escape hatch. Ids concatenate across
    * pretokens in document order. */
  def bpeIds(words: ArrayData,
      ranks: java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, Integer]],
      vocab: java.util.HashMap[UTF8String, Integer]): ArrayData = {
    val out = new java.util.ArrayList[Integer]()
    var wi = 0
    while (wi < words.numElements()) {
      if (!words.isNullAt(wi)) {
        val w = words.getUTF8String(wi).toString
        val syms = new Array[UTF8String](w.codePointCount(0, w.length))
        var i = 0
        var k = 0
        while (i < w.length) {
          val cp = w.codePointAt(i)
          val cc = Character.charCount(cp)
          syms(k) = UTF8String.fromString(w.substring(i, i + cc))
          i += cc
          k += 1
        }
        val len = bpeMergeLoop(syms, k, ranks)
        var j = 0
        while (j < len) {
          val id = vocab.get(syms(j))
          if (id != null) out.add(id)
          else {
            val bytes = syms(j).getBytes
            var b = 0
            while (b < bytes.length) { out.add(bytes(b) & 0xff); b += 1 }
          }
          j += 1
        }
      }
      wi += 1
    }
    val arr = new Array[Int](out.size())
    var i = 0
    while (i < arr.length) { arr(i) = out.get(i).intValue(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  /** Token-string → id table for [[bpeIds]]: merge rank r's output
    * string `lefts(r) + rights(r)` gets id `256 + r`; when two merges
    * produce the same string the FIRST (lowest) rank wins — one string,
    * one id, the GPT-2 vocab convention. */
  private[functions] def buildVocab(ls: Any, rs: Any)
      : java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    if (ls != null && rs != null) {
      val la = ls.asInstanceOf[ArrayData]
      val ra = rs.asInstanceOf[ArrayData]
      require(la.numElements() == ra.numElements(),
        s"merge lefts/rights must be parallel arrays: ${la.numElements()} vs ${ra.numElements()}")
      var i = 0
      while (i < la.numElements()) {
        if (!la.isNullAt(i) && !ra.isNullAt(i)) {
          m.putIfAbsent(
            UTF8String.concat(la.getUTF8String(i), ra.getUTF8String(i)).clone(),
            Integer.valueOf(256 + i))
        }
        i += 1
      }
    }
    m
  }

  /** Builds the rank table for [[bpeEncode]] from two constant parallel
    * arrays (merge lefts, merge rights): left -> right -> rank. Nested
    * maps rather than a joined key, so lookups allocate nothing and no
    * separator can collide with symbol bytes. A duplicated pair keeps its
    * FIRST (lowest) rank — the fold applies it there and a merged pair
    * can never re-form. */
  private[functions] def buildRanks(ls: Any, rs: Any)
      : java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, Integer]] = {
    val m = new java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, Integer]]()
    if (ls != null && rs != null) {
      val la = ls.asInstanceOf[ArrayData]
      val ra = rs.asInstanceOf[ArrayData]
      require(la.numElements() == ra.numElements(),
        s"merge lefts/rights must be parallel arrays: ${la.numElements()} vs ${ra.numElements()}")
      var i = 0
      while (i < la.numElements()) {
        if (!la.isNullAt(i) && !ra.isNullAt(i)) {
          val l = la.getUTF8String(i).clone()
          val r = ra.getUTF8String(i).clone()
          m.computeIfAbsent(l, _ => new java.util.HashMap[UTF8String, Integer]())
            .putIfAbsent(r, Integer.valueOf(i))
        }
        i += 1
      }
    }
    m
  }

  /** [[shingleGrams]] boxed as Catalyst array data (for [[ShinglesExpr]]). */
  def shingleArray(toks: ArrayData, n: Int): ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      shingleGrams(toks, n).asInstanceOf[Array[AnyRef]])

  /** Builds the shared benchmark-gram hash set from a constant array. */
  private[functions] def buildSet(arr: Any): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      var i = 0
      while (i < a.numElements()) {
        if (!a.isNullAt(i)) s.add(a.getUTF8String(i).clone())
        i += 1
      }
    }
    s
  }
}

/** array<string> tokens -> the space-joined word `shingle`-grams as ONE
  * codegen'd kernel call — the hot-path twin of the composable
  * `Text.shingles` (an interpreted transform+slice+array_join per gram,
  * which dominates wall time when a corpus-sized gram stream is
  * exploded: the q85/q87 lesson, same as MinHashBands'). Gram text is
  * identical to the composable form (concatWs skips nulls exactly like
  * array_join); sub-`shingle` docs yield an empty array. Null tokens
  * array -> null (the composable form's `when` gives empty — callers
  * tokenize from non-null text, pinned by the differential spec). */
case class ShinglesExpr(child: Expression, shingle: Int) extends UnaryExpression {
  require(shingle >= 1, "shingle size must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = ShinglesExpr.name

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    TextStatOps.shingleArray(input.asInstanceOf[ArrayData], shingle)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatOps.shingleArray($c, $shingle)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShinglesExpr {
  val name = "graft_shingles"
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(classOf[ShinglesExpr].getName, name),
    (children: Seq[Expression]) => {
      if (children.length != 2) throw new IllegalArgumentException(
        s"$name expects exactly 2 arguments (tokens, shingle), got ${children.length}")
      children(1) match {
        case Literal(v: Int, IntegerType) => ShinglesExpr(children.head, v)
        case other => throw new IllegalArgumentException(
          s"$name: shingle size must be an integer literal, got $other")
      }
    })
}

/** array<string> tokens -> struct(total_grams, distinct_grams, max_run)
  * over the doc's word `shingle`-grams: the q70 repetition statistics in
  * one codegen'd call per row. */
case class RepStats(child: Expression, shingle: Int) extends UnaryExpression {
  require(shingle >= 1, "shingle size must be positive")

  override def dataType: DataType = StructType(Seq(
    StructField("total_grams", LongType, nullable = false),
    StructField("distinct_grams", LongType, nullable = false),
    StructField("max_run", LongType, nullable = false)))
  override def prettyName: String = RepStats.name

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    TextStatOps.repStats(input.asInstanceOf[ArrayData], shingle)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatOps.repStats($c, $shingle)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepStats {
  val name = "graft_rep_stats"
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(classOf[RepStats].getName, name),
    (children: Seq[Expression]) => {
      if (children.length != 2) throw new IllegalArgumentException(
        s"$name expects exactly 2 arguments (tokens, shingle), got ${children.length}")
      children(1) match {
        case Literal(v: Int, IntegerType) => RepStats(children.head, v)
        case other => throw new IllegalArgumentException(
          s"$name: shingle size must be an integer literal, got $other")
      }
    })
}

/** string -> struct(total_chars, distinct_chars, char_diversity): the
  * q76 character-level quality signal in one codegen'd call per row. */
case class CharStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("total_chars", LongType, nullable = false),
    StructField("distinct_chars", LongType, nullable = false),
    StructField("char_diversity", DoubleType, nullable = false)))
  override def prettyName: String = CharStats.name

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    TextStatOps.charStats(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatOps.charStats($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharStats {
  val name = "graft_char_stats"
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(classOf[CharStats].getName, name),
    (children: Seq[Expression]) => {
      if (children.length != 1) throw new IllegalArgumentException(
        s"$name expects exactly 1 argument (text), got ${children.length}")
      CharStats(children.head)
    })
}

/** (array<string> symbols, string a, string b) -> the array with every
  * adjacent (a, b) pair merged into the concatenated symbol, greedy
  * left-to-right: one codegen'd BPE merge pass per row. */
case class BpeMergeExpr(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = BpeMergeExpr.name

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), StringType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (f, s, t) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, string, string), got " +
          s"(${f.simpleString}, ${s.simpleString}, ${t.simpleString})")
    }

  protected override def nullSafeEval(arr: Any, a: Any, b: Any): Any =
    TextStatOps.bpeMerge(arr.asInstanceOf[ArrayData],
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (arr, a, b) =>
      s"graft.functions.TextStatOps.bpeMerge($arr, $a, $b)")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}

object BpeMergeExpr {
  val name = "graft_bpe_merge"
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(classOf[BpeMergeExpr].getName, name),
    (children: Seq[Expression]) => {
      if (children.length != 3) throw new IllegalArgumentException(
        s"$name expects exactly 3 arguments (symbols, left, right), got ${children.length}")
      BpeMergeExpr(children(0), children(1), children(2))
    })
}

/** (array<string> symbols, CONSTANT array<string> merge lefts, CONSTANT
  * array<string> merge rights) -> the symbols with the ENTIRE ranked
  * merge list applied via the single-pass pair-priority loop
  * ([[TextStatOps.bpeEncode]]). The rank table is built once per plan
  * and shipped as a codegen reference object, so a 32k-merge vocabulary
  * costs one kernel call per row instead of a 32k-deep projection
  * chain of [[BpeMergeExpr]]s. */
case class BpeEncodeExpr(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = BpeEncodeExpr.name

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _), ArrayType(StringType, _))
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, foldable array<string>, " +
          s"foldable array<string>), got (${a.simpleString}, ${b.simpleString}, " +
          s"${c.simpleString})")
    }

  @transient private lazy val ranks
      : java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, Integer]] =
    TextStatOps.buildRanks(second.eval(null), third.eval(null))

  protected override def nullSafeEval(a: Any, unused1: Any, unused2: Any): Any =
    TextStatOps.bpeEncode(a.asInstanceOf[ArrayData], ranks)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("graftBpeRanks", ranks,
      classOf[java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, Integer]]].getName)
    nullSafeCodeGen(ctx, ev, (a, _, _) =>
      s"${ev.value} = graft.functions.TextStatOps.bpeEncode($a, $ranksRef);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BpeEncodeExpr {
  val name = "graft_bpe_encode"
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(classOf[BpeEncodeExpr].getName, name),
    (children: Seq[Expression]) => {
      if (children.length != 3) throw new IllegalArgumentException(
        s"$name expects exactly 3 arguments (symbols, lefts, rights), got ${children.length}")
      BpeEncodeExpr(children(0), children(1), children(2))
    })
}

/** (array<string> pretokens, CONSTANT merge lefts, CONSTANT merge
  * rights) -> array<int> token IDS — the whole pretoken -> symbols ->
  * merges -> ids pipeline ([[TextStatOps.bpeIds]]) as ONE kernel call
  * per document: both the rank table and the vocab (string -> 256+rank,
  * bytes for everything else) are built once per plan and ride
  * generated code as reference objects, so a 32k-merge tokenizer
  * encodes a corpus with a flat plan and zero shuffles. */
case class BpeIdsExpr(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = BpeIdsExpr.name

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _), ArrayType(StringType, _))
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, foldable array<string>, " +
          s"foldable array<string>), got (${a.simpleString}, ${b.simpleString}, " +
          s"${c.simpleString})")
    }

  @transient private lazy val ranks
      : java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, Integer]] =
    TextStatOps.buildRanks(second.eval(null), third.eval(null))
  @transient private lazy val vocab: java.util.HashMap[UTF8String, Integer] =
    TextStatOps.buildVocab(second.eval(null), third.eval(null))

  protected override def nullSafeEval(a: Any, unused1: Any, unused2: Any): Any =
    TextStatOps.bpeIds(a.asInstanceOf[ArrayData], ranks, vocab)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("graftBpeIdsRanks", ranks,
      classOf[java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, Integer]]].getName)
    val vocabRef = ctx.addReferenceObj("graftBpeIdsVocab", vocab,
      classOf[java.util.HashMap[UTF8String, Integer]].getName)
    nullSafeCodeGen(ctx, ev, (a, _, _) =>
      s"${ev.value} = graft.functions.TextStatOps.bpeIds($a, $ranksRef, $vocabRef);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BpeIdsExpr {
  val name = "graft_bpe_ids"
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(classOf[BpeIdsExpr].getName, name),
    (children: Seq[Expression]) => {
      if (children.length != 3) throw new IllegalArgumentException(
        s"$name expects exactly 3 arguments (pretokens, lefts, rights), got ${children.length}")
      BpeIdsExpr(children(0), children(1), children(2))
    })
}

/** (array<string> tokens, CONSTANT array<string> benchmark grams) ->
  * struct(n_grams, matched): distinct `shingle`-grams of the doc and how
  * many of them appear in the benchmark. The benchmark hash set is built
  * ONCE per plan and shipped as a codegen reference object — not
  * re-hashed per row the way `array_intersect` against a literal is. */
case class GramOverlap(left: Expression, right: Expression, shingle: Int)
    extends BinaryExpression {
  require(shingle >= 1, "shingle size must be positive")

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("matched", LongType, nullable = false)))
  override def prettyName: String = GramOverlap.name

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, foldable array<string>), " +
        s"got (${l.simpleString}, ${r.simpleString}${if (right.foldable) "" else ", non-foldable"})")
  }

  @transient private lazy val set: java.util.HashSet[UTF8String] =
    TextStatOps.buildSet(right.eval(null))

  protected override def nullSafeEval(a: Any, unused: Any): Any =
    TextStatOps.gramOverlap(a.asInstanceOf[ArrayData], shingle, set)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("graftBenchGrams", set,
      classOf[java.util.HashSet[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, (a, _) =>
      s"${ev.value} = graft.functions.TextStatOps.gramOverlap($a, $shingle, $setRef);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object GramOverlap {
  val name = "graft_gram_overlap"
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(classOf[GramOverlap].getName, name),
    (children: Seq[Expression]) => {
      if (children.length != 3) throw new IllegalArgumentException(
        s"$name expects exactly 3 arguments (tokens, benchGrams, shingle), got ${children.length}")
      children(2) match {
        case Literal(v: Int, IntegerType) => GramOverlap(children(0), children(1), v)
        case other => throw new IllegalArgumentException(
          s"$name: shingle size must be an integer literal, got $other")
      }
    })
}
