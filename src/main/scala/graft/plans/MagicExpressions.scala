package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import graft.magic.Magic

/** Native Catalyst expressions for the BigMagic day-number codec (SURVEY §4's
  * one discretionary extension): `magic_day_to_date(n)` and
  * `date_to_magic_day(d)`.
  *
  * Functionally identical to the composed built-ins in [[graft.magic.Magic]]
  * (which remain the default), but these generate a single Java arithmetic
  * op per row (`doGenCode`), print readable names in EXPLAIN, and are
  * SQL-callable once registered. The arithmetic works because Spark's
  * DateType is a day count from 1970-01-01 and the magic encoding is a day
  * count offset from 1900-01-01: shift = 693596 + 25567 (days 1900→1970).
  */
case class MagicDayToDate(child: Expression) extends UnaryExpression {
  private val shift: Long = Magic.Offset.toLong + 25567L

  override def dataType: DataType = DateType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"magic_day_to_date needs an integral input, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any = {
    val n = v match {
      case l: Long  => l
      case i: Int   => i.toLong
      case s: Short => s.toLong
      case b: Byte  => b.toLong
    }
    (n - shift).toInt
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"(int)((long)$c - ${shift}L)")
  override protected def withNewChildInternal(c: Expression): MagicDayToDate =
    copy(child = c)
  override def prettyName: String = "magic_day_to_date"
}

case class DateToMagicDay(child: Expression) extends UnaryExpression {
  private val shift: Long = Magic.Offset.toLong + 25567L
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DateType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"date_to_magic_day needs a date input, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    v.asInstanceOf[Int].toLong + shift
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"((long)$c + ${shift}L)")
  override protected def withNewChildInternal(c: Expression): DateToMagicDay =
    copy(child = c)
  override def prettyName: String = "date_to_magic_day"
}

/** Column-level access goes through the function registry (`call_function`)
  * — the public Spark 4 route for exposing a Catalyst expression as a
  * `Column`. Call `register(spark)` once per session (or install
  * [[GraftExtensions]]). */
object MagicFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "magic_day_to_date", exprs => MagicDayToDate(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "date_to_magic_day", exprs => DateToMagicDay(exprs.head), "built-in")
  }
  def magic_day_to_date(c: Column): Column =
    call_function("magic_day_to_date", c)
  def date_to_magic_day(c: Column): Column =
    call_function("date_to_magic_day", c)
}

/** Session-extension registration:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or config
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("magic_day_to_date"),
      new ExpressionInfo(classOf[MagicDayToDate].getName, "magic_day_to_date"),
      (exprs: Seq[Expression]) => MagicDayToDate(exprs.head)))
    e.injectFunction((FunctionIdentifier("date_to_magic_day"),
      new ExpressionInfo(classOf[DateToMagicDay].getName, "date_to_magic_day"),
      (exprs: Seq[Expression]) => DateToMagicDay(exprs.head)))
    // automatic D107 stats-sidecar file pruning on filtered parquet scans
    e.injectOptimizerRule(_ => new StatsFilePrune)
  }
}
