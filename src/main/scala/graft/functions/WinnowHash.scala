package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprints (Schleimer et al.) over a string —
  * the fused replacement for the SQL higher-order-function chain
  * (`transform(sequence(...), i -> Σ ascii(substring(t, i+j, 1))·31^j)`
  * + per-window `array_min(slice(...))` + `array_distinct`), whose
  * per-element interpreted lambdas cost ~12 s at sf0.1 where this loop
  * costs milliseconds (the q76 interpreted-HOF lesson, at its extreme:
  * ~23 M lambda evaluations collapse into one per-row pass).
  *
  * Semantics are pinned BIT-FOR-BIT to the SQL formulation the DuckDB
  * oracles (q46/q138) recompute:
  *  - input lowercased with the engine's `lower` semantics
  *    (`UTF8String.toLowerCase`);
  *  - gram hash at 1-based position i = Σ_{j<k} cp(i+j)·31^j over CODE
  *    POINTS (`ascii()` semantics), with out-of-range positions
  *    contributing 0 (`ascii('') = 0`) — so strings shorter than k
  *    still emit the single partial gram both engines agree on;
  *  - `max(nGrams − window + 1, 1)` windows, each the min over the
  *    up-to-`window` gram hashes it can reach (`slice` truncates at
  *    the end);
  *  - distinct minima in first-occurrence order (`array_distinct`).
  *
  * Row-level `CodegenFallback` is deliberate: the work is one native
  * loop per ROW, so the fallback's per-row boxing is noise — unlike
  * per-ELEMENT lambda interpretation, which is what this exists to
  * remove.
  */
case class WinnowHash(child: Expression, k: Int, window: Int)
    extends UnaryExpression with CodegenFallback {

  require(k > 0 && window > 0, "k and window must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toLowerCase.toString
    // code points, matching ascii(substring(t, i, 1)) per position
    val n = s.codePointCount(0, s.length)
    val cps = new Array[Int](n)
    var ci = 0; var pos = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      cps(pos) = cp; pos += 1; ci += Character.charCount(cp)
    }
    val nGrams = math.max(n - k + 1, 1)
    val grams = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      var h = 0L; var p = 1L; var j = 0
      while (j < k) {
        if (i + j < n) h += cps(i + j) * p
        p *= 31L; j += 1
      }
      grams(i) = h; i += 1
    }
    val nWin = math.max(nGrams - window + 1, 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i < nWin) {
      var m = grams(i)
      var j = i + 1
      val end = math.min(i + window, nGrams)
      while (j < end) { if (grams(j) < m) m = grams(j); j += 1 }
      seen.add(m); i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator(); var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
