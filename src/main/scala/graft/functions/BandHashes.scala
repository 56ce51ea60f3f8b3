package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Native LSH band hashes over a MinHash signature — the fused
  * replacement for the SQL higher-order chain
  * `transform(sequence(0, bands-1), j -> hash(slice(sig, j*r+1, r)))`
  * on every banding site (near-dup LSH, incremental/indexed dedup, the
  * link-prediction approx path). Spark higher-order functions are not
  * codegen'd: each lambda application ran interpreted `Slice.
  * nullSafeEval`, allocating a `GenericArrayData` slice plus boxed
  * longs per BAND per ROW — the round-13 JFR profile of the 10× q279
  * rep attributed ~33% of all execution samples to exactly that
  * allocation chain (`Slice.nullSafeEval` + `GenericArrayData.<init>`
  * + `IterableOnceOps.toArray` + `Long.valueOf`), and it is the
  * measured cause of the q279/q178 ~K^1.2 cpu-exponent WATCH. This
  * expression computes all bands in one allocation-free loop per row.
  *
  * Semantics are pinned BIT-FOR-BIT to the HOF formulation so the
  * candidate sets (and thus every declared relation) are unchanged:
  * Spark's `hash()` over an ArrayType(Long) column is a Murmur3_x86_32
  * chain seeded 42 folding each element via `hashLong`, `slice`
  * truncates at the array end (an empty tail slice hashes to the bare
  * seed), and `hash()` SKIPS null array elements (the chain value
  * passes through unchanged) — all three reproduced exactly here. The
  * signature pipelines never produce null elements, but the function
  * is registered session-wide for SQL, so the null case must match
  * `Murmur3Hash` rather than fold garbage.
  *
  * Row-level `CodegenFallback` is deliberate (the [[WinnowHash]]
  * lesson): the work is one native loop per ROW; what this removes is
  * per-ELEMENT lambda interpretation.
  */
case class BandHashes(child: Expression, bands: Int, r: Int)
    extends UnaryExpression with CodegenFallback {

  require(bands > 0 && r > 0, "bands and r must be positive")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "band_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val sig = input.asInstanceOf[ArrayData]
    val n = sig.numElements()
    val out = new Array[Int](bands)
    var j = 0
    while (j < bands) {
      var h = 42
      var t = j * r
      val end = math.min(t + r, n)
      while (t < end) {
        if (!sig.isNullAt(t)) h = Murmur3_x86_32.hashLong(sig.getLong(t), h)
        t += 1
      }
      out(j) = h
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
