package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (the rsync/LBFS/FastCDC family): split a
  * string at positions where a rolling k-gram hash satisfies
  * `h % divisor == 0`, so chunk boundaries depend on CONTENT, not
  * offsets — an insertion early in a document shifts every fixed-size
  * block but leaves all content-defined chunks after the edit point
  * identical, which is what makes chunk-hash dedup work across
  * near-duplicate documents (expected chunk length ≈ `divisor` chars).
  * This is the storage/transfer-dedup primitive a snapshotting corpus
  * pipeline runs to measure and exploit cross-version redundancy.
  *
  * Semantics are pinned to the SQL formulation the q264 oracle
  * recomputes (the q46/q138 portable-hash discipline):
  *  - gram hash at 1-based code-point position i = Σ_{j<k} cp(i+j)·31^j
  *    (identical to [[WinnowHash]]'s gram, full-range positions only —
  *    strings shorter than k emit no grams and stay one whole chunk);
  *  - a gram at position i with h % divisor == 0 cuts AFTER position
  *    i + k − 1; chunks are the substrings between consecutive cuts
  *    (sentinel cut at 0, implicit tail to the end; a cut landing
  *    exactly at the end emits no empty tail).
  *
  * Production CDC adds min/max chunk clamps; the pure mask rule is
  * kept here because the clamp is a sequential-scan constraint that
  * no declarative oracle can replay, and the fixture's chunk-length
  * distribution is already geometric around `divisor`. Row-level
  * `CodegenFallback`: one native loop per row (the [[WinnowHash]]
  * argument).
  */
case class CdcChunks(child: Expression, k: Int, divisor: Long)
    extends UnaryExpression with CodegenFallback {

  require(k > 0, "k must be positive")
  require(divisor >= 2, "divisor < 2 cuts at every gram")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "cdc_chunks"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    // code points, matching ascii()/substring() positions in the oracle
    val n = s.codePointCount(0, s.length)
    val cps = new Array[Int](n)
    val charOff = new Array[Int](n + 1) // code-point index -> char offset
    var ci = 0; var pos = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      cps(pos) = cp; charOff(pos) = ci
      pos += 1; ci += Character.charCount(cp)
    }
    charOff(n) = s.length
    val chunks = scala.collection.mutable.ArrayBuffer[Any]()
    var prevCut = 0 // code-point count already emitted
    var i = 0
    val lastGram = n - k // 0-based: grams start at 0..n-k
    while (i <= lastGram) {
      var h = 0L; var p = 1L; var j = 0
      while (j < k) { h += cps(i + j) * p; p *= 31L; j += 1 }
      if (h % divisor == 0L) {
        val cut = i + k // cut AFTER code point i+k-1
        chunks += UTF8String.fromString(
          s.substring(charOff(prevCut), charOff(cut)))
        prevCut = cut
      }
      i += 1
    }
    if (prevCut < n)
      chunks += UTF8String.fromString(s.substring(charOff(prevCut)))
    new GenericArrayData(chunks.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
