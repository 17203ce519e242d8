package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native (codegen'd) count-min bucket row — the [[Md5Prefix60]] treatment
  * applied to [[CountMin.buckets]]' remaining hex-parse chains: the legacy
  * Column form computed, PER HASH ROW i,
  * `pmod(conv(substring(md5(key), 8i+1, 8), 16, 10), w)` — one 32-char hex
  * string allocation, a substring slice and a radix parse per row per i
  * (the md5 itself was shared by codegen subexpression elimination, the
  * hex work was not). Hex chars [8i+1, 8i+8] of the digest ARE its bytes
  * [4i, 4i+4) big-endian, so this expression folds all d rows to: one
  * digest → d unsigned-int reads → mod w — one array allocation total.
  *
  * Bit-identical to the legacy chain for every input and every i < 4
  * (spec-pinned, interpreted ≡ codegen): a 32-bit chunk is non-negative in
  * a long, so `% w` ≡ pmod and the DuckDB oracle twin
  * `CAST('0x' || substring(md5(key), 8i+1, 8) AS BIGINT) % w` stays valid.
  * Null semantics mirror the chain: NULL in → NULL out. Inputs must
  * already be strings (callers cast first, as the legacy chain did). */
case class Md5Buckets(child: Expression, d: Int, w: Int)
    extends UnaryExpression {
  require(d >= 1 && d <= 4, s"one md5 digest supplies at most 4 rows: $d")
  require(w >= 1, s"bucket width must be positive: $w")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"md5_buckets expects string input (callers cast first, as the " +
          s"legacy md5 chain did), got ${t.catalogString}")
    }
  override def dataType: DataType = ArrayType(IntegerType, false)
  override def prettyName: String = "md5_buckets"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      Md5Buckets.buckets(input.asInstanceOf[UTF8String].getBytes, d, w))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new ${classOf[GenericArrayData].getName}(" +
        s"graft.functions.Md5Buckets.buckets($c.getBytes(), $d, $w))")

  override protected def withNewChildInternal(
      newChild: Expression): Md5Buckets = copy(child = newChild)
}

object Md5Buckets {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** d buckets from one md5 digest: row i = bytes [4i, 4i+4) big-endian
    * (== hex chars [8i+1, 8i+8]) as an unsigned 32-bit value, mod w. */
  def buckets(bytes: Array[Byte], d: Int, w: Int): Array[Int] = {
    val dig = md.get().digest(bytes)
    val out = new Array[Int](d)
    var i = 0
    while (i < d) {
      var v = 0L
      var j = i * 4
      val end = j + 4
      while (j < end) { v = (v << 8) | (dig(j) & 0xFFL); j += 1 }
      out(i) = (v % w).toInt
      i += 1
    }
    out
  }
}
