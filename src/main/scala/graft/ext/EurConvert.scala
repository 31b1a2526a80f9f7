package graft.ext

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression for the conversion kernel (SURVEY.md §7.5's
  * optional extension demo): `eur_convert(amount, currency, rate)` with the
  * reference's exact semantics — EUR passes through untouched, otherwise
  * exact decimal division by `Decimal(str(rate))` with HALF_EVEN 2-dp
  * rounding (`dags/order_currency_conversion_dag.py:106-109`).
  *
  * This is the (b) tier of the custom-operator ladder: a native expression
  * with `doGenCode`, so it inlines into WholeStageCodegen like a built-in
  * (one static call per row, no UDF serialization, null handling generated
  * around it). The pure-DataFrame composition in ops.Convert remains the
  * primary surface; equivalence is pinned in ExtSpec.
  *
  * The rate argument must be pre-coalesced (null rate = 1.0 belongs to the
  * caller, mirroring `exchange_rates.get(currency, 1.0)`) — see
  * [[GraftFunctions.eurConvertBuilder]].
  */
/** Inputs must arrive as (DecimalType, StringType, DoubleType) — enforced
  * by the builder's casts ([[GraftFunctions.eurConvertBuilder]]) because
  * `ExpectsInputTypes`' type tokens are private[sql].
  */
case class EurConvert(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = DecimalType(38, 8)
  override def prettyName: String = "eur_convert"

  override protected def nullSafeEval(amount: Any, currency: Any, rate: Any): Any =
    EurConvert.convert(
      amount.asInstanceOf[Decimal],
      currency.asInstanceOf[UTF8String],
      rate.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, c, r) =>
      s"graft.ext.EurConvert.convert($a, $c, $r)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): EurConvert =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object EurConvert {
  private val EUR = UTF8String.fromString("EUR")

  /** Row kernel, shared by interpreted eval and generated code. */
  def convert(amount: Decimal, currency: UTF8String, rate: Double): Decimal =
    if (EUR.equals(currency)) {
      // identity branch: no division, no rounding (dag :106-107)
      Decimal(amount.toJavaBigDecimal.setScale(8), 38, 8)
    } else {
      // java.math.BigDecimal.valueOf(double) goes through Double.toString —
      // exactly the reference's Decimal(str(rate)) pinning (dag :108-109)
      val q = amount.toJavaBigDecimal.divide(
        java.math.BigDecimal.valueOf(rate), 2, java.math.RoundingMode.HALF_EVEN)
      Decimal(q.setScale(8), 38, 8)
    }
}
