package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helper for [[RollingHash]] — called from generated code, so it
  * must be a stable public object method. */
object RollingHashUtil {
  /** Polynomial rolling hash over Unicode code points (base 1000003,
    * wrapping i64). Used for document fingerprinting: content-defined,
    * order-sensitive, cheap enough to run inline in a scan at 100 TB (no
    * shuffle, no UDF boxing — this is a codegen'd Catalyst expression).
    * Code points, not UTF-8 bytes, so any engine with a codepoint split can
    * reproduce it exactly (the DuckDB oracle folds the same sequence through
    * HUGEINT arithmetic mod 2^64). */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = h * 1000003L + cp
      i += Character.charCount(cp)
    }
    h
  }
}

/** Codegen'd document-fingerprint expression (SURVEY §7.5 beyond-parity:
  * text analysis / document fingerprinting). Prefer this over a Scala UDF:
  * it participates in whole-stage codegen (no SerDe, no boxing).
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    RollingHashUtil.hash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.RollingHashUtil.hash($c)")
  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object GraftExpressions {
  /** Column form; requires register(spark) to have run in the session. */
  def rolling_hash(c: Column): Column =
    org.apache.spark.sql.functions.call_function("rolling_hash", c)

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "scala_udf")
}
