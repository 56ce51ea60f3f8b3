package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** log-Γ kernel shared by the interpreted and codegen paths of
  * [[LogGamma]]. Spark has no built-in `lgamma`, yet every exact count
  * test (hypergeometric/Fisher, binomial tails, Poisson pmf) needs
  * log-factorials far past where `factorial` overflows — this is the
  * standard Lanczos approximation (g = 607/128, 15 terms; Godfrey's
  * public coefficient set, the same family Boost/GSL ship), giving
  * |Δ lgamma| ≲ 1e-13 across the positive axis — indistinguishable
  * from libm's `lgamma` (the DuckDB oracle's) after the 1e-6 oracle
  * rounding.
  */
object LogGammaImpl {

  private val G = 607.0 / 128.0
  private val LnSqrt2Pi = 0.9189385332046727417803297364
  private val C: Array[Double] = Array(
    0.99999999999999709182,
    57.156235665862923517,
    -59.597960355475491248,
    14.136097974741747174,
    -0.49191381609762019978,
    0.33994649984811888699e-4,
    0.46523628927048575665e-4,
    -0.98374475304879564677e-4,
    0.15808870322491248884e-3,
    -0.21026444172410488319e-3,
    0.21743961811521264320e-3,
    -0.16431810653676389022e-3,
    0.84418223983852743293e-4,
    -0.26190838401581408670e-4,
    0.36899182659531622704e-5)

  def lgamma(x: Double): Double = {
    if (x.isNaN || x <= 0.0 && x == math.floor(x)) return Double.NaN
    if (x < 0.5) {
      // reflection: lgamma(x) = ln(pi / |sin(pi x)|) - lgamma(1 - x)
      return math.log(math.Pi / math.abs(math.sin(math.Pi * x))) -
        lgamma(1.0 - x)
    }
    var s = C(0)
    var k = 1
    while (k < 15) {
      s += C(k) / (x - 1.0 + k)
      k += 1
    }
    val t = x + G - 0.5
    (x - 0.5) * math.log(t) - t + LnSqrt2Pi + math.log(s)
  }
}

/** `lgamma(x)` — natural log of the gamma function as a native codegen
  * expression (SURVEY.md §2.E17 family). Matches libm/DuckDB `lgamma`
  * to ~1e-13; NaN for non-positive integers (poles) to keep the
  * expression total.
  */
case class LogGamma(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "lgamma"

  // accepts every numeric type, incl. DECIMAL (SQL literals like 10.0
  // parse as decimal(3,1)) — all widen losslessly enough for log-Γ
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType | IntegerType | LongType | ShortType |
        ByteType | _: DecimalType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a numeric input, got ${other.catalogString}")
  }

  private def toD(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case i: Int => i.toDouble
    case l: Long => l.toDouble
    case s: Short => s.toDouble
    case b: Byte => b.toDouble
    case dec: Decimal => dec.toDouble
  }

  override def nullSafeEval(v: Any): Any = LogGammaImpl.lgamma(toD(v))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case _: DecimalType =>
        defineCodeGen(ctx, ev, c =>
          s"graft.functions.LogGammaImpl.lgamma($c.toDouble())")
      case _ =>
        defineCodeGen(ctx, ev, c =>
          s"graft.functions.LogGammaImpl.lgamma((double)($c))")
    }

  override protected def withNewChildInternal(newChild: Expression): LogGamma =
    copy(child = newChild)
}
