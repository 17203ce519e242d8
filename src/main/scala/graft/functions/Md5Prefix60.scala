package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native (codegen'd) 60-bit md5-prefix hash — the engine's portable row
  * hash ([[graft.llm.Dedup.portableHash60]]) computed in ONE step.
  *
  * The Column form `conv(substring(md5(c), 1, 15), 16, 10).cast(long)`
  * allocates a 32-char hex string, re-slices it, and PARSES it back from
  * base 16 — three intermediate allocations plus a radix parse per row,
  * on the hot path of every gram/dedup/sampling operator (38 call
  * sites). The md5 digest's first 15 hex characters ARE its first 60
  * bits, so this expression folds the chain to: digest → first 8 bytes
  * as an unsigned big-endian long → `>>> 4`. Bit-identical to the
  * Column form for every input (spec-pinned against the legacy chain on
  * corpus text plus edge cases), and always in [0, 2^60), so the long
  * cast can never see a sign — every DuckDB oracle twin
  * (`CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)`) stays valid.
  *
  * Null semantics mirror the chain: NULL in → NULL out. Inputs must
  * already be strings — [[graft.llm.Dedup.portableHash60]] casts before
  * wrapping, exactly as it did around `md5`. */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"md5_prefix60 expects string input (callers cast first, as the " +
          s"legacy md5 chain did), got ${t.catalogString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix60"

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash60(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5Prefix60.hash60($c.getBytes())")

  override protected def withNewChildInternal(
      newChild: Expression): Md5Prefix60 = copy(child = newChild)
}

object Md5Prefix60 {
  // one digest instance per thread, reset by digest() itself — saves the
  // per-row MessageDigest.getInstance allocation the commons-codec path
  // inside Spark's own `md5` expression pays
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(bytes) as a non-negative long — exactly
    * `conv(substring(md5hex, 1, 15), 16, 10)`. */
  def hash60(bytes: Array[Byte]): Long = {
    val d = md.get().digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v >>> 4
  }
}
