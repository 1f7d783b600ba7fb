package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Overflow-safe 128-bit sum of a long column as a pure
  * DeclarativeAggregate: the buffer is two longs (hi, lo) updated with
  * branch-free carry arithmetic, so partial aggregation stays in
  * whole-stage codegen's primitive fast path (no BigDecimal buffer), and
  * the exact value is reconstructed as DECIMAL(38,0) only at evaluate.
  *
  * This is the cluster-scale fixed-point money sum: Qdsl's long products
  * are safe per-group up to |Σ| < 2^63 (documented boundary); a 100 TB
  * global aggregate swaps `sum` for `sum128` and keeps both exactness and
  * codegen. */
case class Sum128(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = false
  override def prettyName: String = "sum128"

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo)
  override lazy val initialValues: Seq[Expression] = Seq(Literal(0L), Literal(0L))

  /** (hi, lo) += x; carry-out of the unsigned low add via the classic
    * bit identity carry = ((a&b) | ((a|b) & ~(a+b))) >>> 63. */
  // LEGACY eval mode: these adds are *intentionally* wrapping two's-
  // complement arithmetic (ANSI mode would throw on the carries).
  private def wadd(l: Expression, r: Expression): Expression =
    Add(l, r, EvalMode.LEGACY)

  private def add128(hiE: Expression, loE: Expression,
      xHi: Expression, xLo: Expression): Seq[Expression] = {
    val newLo = wadd(loE, xLo)
    val carry = ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(loE, xLo),
        BitwiseAnd(BitwiseOr(loE, xLo), BitwiseNot(newLo))),
      Literal(63))
    Seq(wadd(wadd(hiE, xHi), carry), newLo)
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val x = Coalesce(Seq(Cast(child, LongType), Literal(0L)))
    // 128-bit sign extension: high word of x is x >> 63
    add128(hi, lo, ShiftRight(x, Literal(63)), x)
  }

  override lazy val mergeExpressions: Seq[Expression] =
    add128(hi.left, lo.left, hi.right, lo.right)

  override lazy val evaluateExpression: Expression = {
    val two64 = Literal(Decimal(BigDecimal("18446744073709551616"), 38, 0),
      DecimalType(38, 0))
    val hiDec = Cast(hi, DecimalType(38, 0))
    val loDec = Cast(lo, DecimalType(38, 0))
    val unsignedLo = If(GreaterThanOrEqual(lo, Literal(0L)),
      loDec, Cast(Add(loDec, two64), DecimalType(38, 0)))
    Cast(Add(Multiply(hiDec, two64), unsignedLo), DecimalType(38, 0))
  }

  override protected def withNewChildInternal(newChild: Expression): Sum128 =
    copy(child = newChild)
}

object Sum128 {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sum128", exprs => Sum128(exprs.head), "scala_udf")
}
