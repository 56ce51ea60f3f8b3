package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd hex-string → BIGINT parse — the hot primitive of
  * every md5-derived-uniform operator (bootstrap weights, stratified
  * sampling, split hashing: `conv(substring(md5(..)), 16, 10)` is the
  * house determinism scheme, and builtin `conv` is an interpreted
  * NumberConverter that dominated q133's profile at ~0.5 µs/call).
  *
  * Semantics are pinned to the DuckDB oracle's `('0x' || s)::BIGINT`
  * for the inputs the scheme produces (1–15 lowercase hex chars, so
  * the value fits a signed long with headroom): case-insensitive hex
  * digits, no sign, no prefix. NULL for empty input, any non-hex
  * character, or length > 15 — the callers' md5 slices can never hit
  * those, and null is safer than a silent wrong weight if one ever
  * does. Interpreted `eval` and `doGenCode` are spec-pinned equal to
  * `conv(s, 16, 10) cast long` on valid inputs.
  */
case class HexLong(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "hex_long"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    if (n == 0 || n > 15) return null
    val bytes = s.getBytes
    var acc = 0L
    var i = 0
    while (i < n) {
      val b = bytes(i)
      val d =
        if (b >= '0' && b <= '9') b - '0'
        else if (b >= 'a' && b <= 'f') b - 'a' + 10
        else if (b >= 'A' && b <= 'F') b - 'A' + 10
        else return null
      acc = (acc << 4) | d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $s.numBytes();
         |if ($n == 0 || $n > 15) {
         |  ${ev.isNull} = true;
         |} else {
         |  final byte[] $bytes = $s.getBytes();
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final byte $b = $bytes[$i];
         |    final int $d =
         |      ($b >= '0' && $b <= '9') ? $b - '0' :
         |      ($b >= 'a' && $b <= 'f') ? $b - 'a' + 10 :
         |      ($b >= 'A' && $b <= 'F') ? $b - 'A' + 10 : -1;
         |    if ($d < 0) { ${ev.isNull} = true; break; }
         |    $acc = ($acc << 4) | $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
