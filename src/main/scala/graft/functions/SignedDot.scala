package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** One output dimension of the Johnson–Lindenstrauss ±1 projection as a
  * native codegen'd expression: Σ_i s(j,i)·x_i (the caller divides by
  * √outDims AFTER the sum, so term-level arithmetic stays bitwise
  * identical to the SQL oracle's list_sum/sqrt order), with the
  * sign row derived from the repo's md5 portable-determinism scheme
  * (`md5("salt|j|i")`, first 15 hex chars, parity — the exact formula
  * the q208 oracle replays in SQL).
  *
  * Why an Expression and not `aggregate(zip_with(...))`: higher-order
  * functions are CodegenFallback — the q208 projection's HOF
  * formulation left the ENTIRE Project outside WholeStageCodegen
  * (PlanShapeSpec caught it), paying boxed lambda frames per element.
  * This is the [[HyperplaneBuckets]] recipe: derive the constant
  * matrix from primitive params (canonicalization-safe, no array in
  * the case-class signature), one primitive fused-multiply loop,
  * spliced into the enclosing stage.
  *
  * Null ELEMENT → null result (a vector with null components has no
  * meaningful projection — same convention as [[HyperplaneBuckets]]);
  * length ≠ inDims → error (callers gate width first).
  */
case class SignedDot(
    child: Expression,
    salt: String,
    j: Int,
    inDims: Int,
    outDims: Int)
    extends UnaryExpression {

  require(inDims > 0 && outDims > 0 && j >= 0 && j < outDims,
    s"bad projection shape: j=$j inDims=$inDims outDims=$outDims")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "signed_dot"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** ±1 per input index, md5-derived — computed once per plan. */
  @transient private lazy val row: Array[Double] =
    SignedDot.signRow(salt, j, inDims)

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val n = e.numElements()
    if (n != inDims)
      throw new IllegalArgumentException(
        s"$prettyName: embedding length $n != inDims $inDims")
    val fl = isFloat
    var acc = 0.0
    var d = 0
    while (d < inDims) {
      if (e.isNullAt(d)) return null
      val x = if (fl) e.getFloat(d).toDouble else e.getDouble(d)
      acc += x * row(d)
      d += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rowRef = ctx.addReferenceObj("signRow", row, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, e => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $e.numElements();
         |if ($n != $inDims) {
         |  throw new IllegalArgumentException(
         |    "signed_dot: embedding length " + $n + " != inDims $inDims");
         |}
         |double $acc = 0.0;
         |for (int $d = 0; $d < $inDims; $d++) {
         |  if ($e.isNullAt($d)) { ${ev.isNull} = true; break; }
         |  $acc += ((double) $e.$get($d)) * $rowRef[$d];
         |}
         |if (!${ev.isNull}) { ${ev.value} = $acc; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignedDot =
    copy(child = newChild)
}

object SignedDot {
  /** The md5 parity ±1 sign row. Public so specs and the interpreted
    * replica can pin the exact constants.
    */
  def signRow(salt: String, j: Int, inDims: Int): Array[Double] =
    Array.tabulate(inDims) { i0 =>
      val i = i0 + 1 // 1-based index, matching the SQL oracle
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$salt|$j|$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0L) 1.0 else -1.0
    }
}
