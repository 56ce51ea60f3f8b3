package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** All random-hyperplane LSH bucket keys for one embedding, fused into a
  * single codegen'd pass (SURVEY.md §2.E14/E17).
  *
  * The interpreted formulation — one `aggregate(zip_with(e, plane, *))`
  * fold per (table, bit) — evaluates tables×bits separate higher-order
  * lambdas per row with no common-subexpression elimination: at 8×8×dim64
  * that is 64 interpreted array walks and ~4096 boxed lambda frames per
  * row, and it made the ANN query the slowest in the benchmark. This
  * expression is the same math as one matrix–vector product: a single
  * primitive loop over a flattened `[tables·bits·dim]` plane matrix,
  * spliced into the enclosing WholeStageCodegen stage.
  *
  * The planes are derived from `seed` with the exact gaussian draw order
  * the interpreted code used (t-major, then bit, then component), so for
  * fully non-null embeddings bucket assignments — and the measured
  * recall — are bit-identical to the HOF version; the equivalence is
  * spec-pinned.
  *
  * Returns `array<int>` of length `tables`: element t packs the sign
  * bits (projection > 0) of table t's `bits` hyperplanes. Null array or
  * null ELEMENT → null buckets; length ≠ `dim` → error. The null-element
  * case is an intentional deviation from the historical HOF fold (which
  * treated a null projection as a 0 bit): a vector with null components
  * has no meaningful cosine — the exact-verify stage would null it out
  * anyway — so such rows drop out of LSH bucketing entirely instead of
  * colliding in an arbitrary bucket. Spec-pinned in HyperplaneBucketsSpec.
  */
case class HyperplaneBuckets(
    child: Expression,
    dim: Int,
    tables: Int,
    bits: Int,
    seed: Long)
    extends UnaryExpression {

  require(dim > 0 && tables > 0 && bits > 0 && bits <= 31,
    s"bad LSH shape: dim=$dim tables=$tables bits=$bits")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "hyperplane_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Flattened [tables·bits·dim] gaussian plane matrix; draw order
    * matches the historical per-plane `Seq.fill(dim)(rnd.nextGaussian())`.
    */
  @transient private lazy val planes: Array[Double] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables * bits * dim)(rnd.nextGaussian())
  }

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val n = e.numElements()
    if (n != dim)
      throw new IllegalArgumentException(
        s"$prettyName: embedding length $n != dim $dim")
    val fl = isFloat
    val keys = new Array[Int](tables)
    var p = 0
    var t = 0
    while (t < tables) {
      var key = 0
      var j = 0
      while (j < bits) {
        var acc = 0.0
        var d = 0
        while (d < dim) {
          if (e.isNullAt(d)) return null
          val x = if (fl) e.getFloat(d).toDouble else e.getDouble(d)
          acc += x * planes(p + d)
          d += 1
        }
        p += dim
        if (acc > 0) key |= (1 << j)
        j += 1
      }
      keys(t) = key
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, e => {
      val n = ctx.freshName("n")
      val keys = ctx.freshName("keys")
      val p = ctx.freshName("p")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val key = ctx.freshName("key")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $e.numElements();
         |if ($n != $dim) {
         |  throw new IllegalArgumentException(
         |    "hyperplane_buckets: embedding length " + $n + " != dim $dim");
         |}
         |final int[] $keys = new int[$tables];
         |int $p = 0;
         |for (int $t = 0; $t < $tables && !${ev.isNull}; $t++) {
         |  int $key = 0;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      if ($e.isNullAt($d)) { ${ev.isNull} = true; break; }
         |      $acc += ((double) $e.$get($d)) * $planesRef[$p + $d];
         |    }
         |    if (${ev.isNull}) break;
         |    $p += $dim;
         |    if ($acc > 0) $key |= (1 << $j);
         |  }
         |  $keys[$t] = $key;
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($keys);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}
