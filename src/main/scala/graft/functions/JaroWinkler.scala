package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity kernel, shared by the interpreted and
  * codegen paths of [[JaroWinkler]]. Semantics are pinned to DuckDB's
  * `jaro_winkler_similarity` (the oracle for q110), verified value-for-
  * value against it:
  *
  *   - match window = max(|a|,|b|)/2 − 1 (floor, min 0) — so "ab"/"ba"
  *     is 0.0, not a transposition;
  *   - transpositions = half the positions where the two matched
  *     subsequences disagree;
  *   - Winkler boost only when jaro > 0.7: jw = j + ℓ·0.1·(1−j) with ℓ
  *     the common prefix capped at 4;
  *   - any empty input → 0.0 (DuckDB returns 0 even for ""/"").
  */
object JaroWinklerImpl {

  // per-thread scratch for the match flags: the kernel runs millions
  // of times per task in fuzzy joins, and two fresh Array[Boolean]
  // per call (plus two String copies on the ASCII path) measured ~35%
  // of kernel wall-clock at sf0.1 — reuse + byte access removes both
  private final class Scratch {
    var s: Array[Boolean] = new Array[Boolean](64)
    var t: Array[Boolean] = new Array[Boolean](64)
    def ensure(n: Int, m: Int): Unit = {
      if (s.length < n) s = new Array[Boolean](Integer.highestOneBit(n) * 2)
      else java.util.Arrays.fill(s, 0, n, false)
      if (t.length < m) t = new Array[Boolean](Integer.highestOneBit(m) * 2)
      else java.util.Arrays.fill(t, 0, m, false)
    }
  }
  private val scratch = new ThreadLocal[Scratch] {
    override def initialValue(): Scratch = new Scratch
  }

  def sim(a: UTF8String, b: UTF8String): Double =
    // full-ASCII inputs (the overwhelming case for names/codes): bytes
    // ARE chars, so the byte kernel is exactly the char kernel minus
    // two String materializations per call
    if (a.isFullAscii && b.isFullAscii) simAscii(a, b)
    else simChars(a.toString, b.toString)

  private def simAscii(a: UTF8String, b: UTF8String): Double = {
    val n = a.numBytes
    val m = b.numBytes
    if (n == 0 || m == 0) return 0.0
    val window = math.max(0, math.max(n, m) / 2 - 1)
    val sc = scratch.get()
    sc.ensure(n, m)
    val sMatch = sc.s
    val tMatch = sc.t
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && a.getByte(i) == b.getByte(j)) {
          sMatch(i) = true; tMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var half = 0
    var k = 0
    i = 0
    while (i < n) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (a.getByte(i) != b.getByte(k)) half += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    val jaro = (mm / n + mm / m + (mm - half / 2.0) / mm) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val cap = math.min(4, math.min(n, m))
    while (prefix < cap && a.getByte(prefix) == b.getByte(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  private def simChars(s: String, t: String): Double = {
    val n = s.length
    val m = t.length
    if (n == 0 || m == 0) return 0.0
    val window = math.max(0, math.max(n, m) / 2 - 1)
    val sMatch = new Array[Boolean](n)
    val tMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s.charAt(i) == t.charAt(j)) {
          sMatch(i) = true; tMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var half = 0
    var k = 0
    i = 0
    while (i < n) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) half += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    val jaro = (mm / n + mm / m + (mm - half / 2.0) / mm) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val cap = math.min(4, math.min(n, m))
    while (prefix < cap && s.charAt(prefix) == t.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

object JaroWinklerGateImpl {

  /** Exact `jaro_winkler(a,b) >= theta`, with an O(|a|+|b|) character-
    * histogram admission bound run BEFORE the O(|a|·window) kernel.
    *
    * Soundness: `jw >= θ` forces `jaro >= (θ-0.4)/0.6` (the Winkler
    * prefix boost adds at most `0.4·(1-j)`), and the kernel's matched
    * count `m` can never exceed the byte-multiset intersection H of
    * the two strings (window-constrained 1:1 matching is a sub-
    * multiset of the unconstrained intersection), while
    * `jaro <= (m/n + m/m' + 1)/3`. So
    * `H·(n+m') < (3·j_min − 1)·n·m'` proves the pair cannot reach θ
    * and the kernel is skipped — NO false negatives, and survivors
    * always run the exact kernel, so no false positives either. The
    * byte histogram equals the char histogram only for ASCII, so
    * non-ASCII inputs skip the bound and go straight to the kernel.
    *
    * On blocked entity-resolution joins the bound rejects the vast
    * majority of candidate pairs at ~1/40 the kernel's cost — this
    * gate is why the fuzzy join's cost is the PAIR COUNT, not the
    * kernel count.
    */
  def atLeast(a: UTF8String, b: UTF8String, theta: Double): Boolean = {
    val n = a.numBytes
    val m = b.numBytes
    if (n == 0 || m == 0) return false // sim() is 0.0 for empty inputs
    val jMin = (theta - 0.4) / 0.6
    if (jMin > 0.0 && 3.0 * jMin - 1.0 > 0.0) {
      val ha = new Array[Int](32)
      val hb = new Array[Int](32)
      var ascii = true
      var i = 0
      while (i < n && ascii) {
        val c = a.getByte(i)
        if (c < 0) ascii = false
        else ha(lane(c)) += 1
        i += 1
      }
      i = 0
      while (i < m && ascii) {
        val c = b.getByte(i)
        if (c < 0) ascii = false
        else hb(lane(c)) += 1
        i += 1
      }
      if (ascii) {
        var inter = 0
        i = 0
        while (i < 32) {
          inter += math.min(ha(i), hb(i))
          i += 1
        }
        if (inter.toLong * (n + m) < (3.0 * jMin - 1.0) * n * m)
          return false
      }
    }
    JaroWinklerImpl.sim(a, b) >= theta
  }

  /** 'a'..'z' → 0..25, digits → 26..29 (mod 4), everything else → 30;
    * merging symbols into one lane only OVERcounts the intersection,
    * which keeps the bound an upper bound (safe).
    */
  @inline private def lane(c: Byte): Int = {
    if (c >= 'a' && c <= 'z') c - 'a'
    else if (c >= '0' && c <= '9') 26 + (c & 3)
    else 30
  }
}

/** `jaro_winkler(a, b)` — native codegen'd Jaro–Winkler similarity of
  * two strings (SURVEY.md §2.E17 extension point; fuzzy entity-
  * resolution joins, q110). The generated code is a single static call
  * into [[JaroWinklerImpl]] — the same pattern Spark's own
  * `levenshtein` uses (the kernel is branchy scratch-array code that
  * gains nothing from inlining into the stage body, but participating
  * in WholeStageCodegen keeps the surrounding filter/join stage fused).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerImpl.sim($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

/** `jaro_winkler_gte(a, b, θ)` — exact `jaro_winkler(a,b) >= θ` as one
  * boolean expression, so the histogram admission bound in
  * [[JaroWinklerGateImpl]] can reject a candidate pair BEFORE the
  * quadratic kernel runs. Semantically identical to
  * `JaroWinkler(a,b) >= lit(θ)` (spec-pinned); meant for the filter
  * position of fuzzy joins, where it turns kernel cost into pair cost.
  */
case class JaroWinklerGte(left: Expression, right: Expression, theta: Double)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "jaro_winkler_gte"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerGateImpl.atLeast(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], theta)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerGateImpl.atLeast($a, $b, $theta)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerGte =
    copy(left = newLeft, right = newRight)
}
