package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native (codegen'd) per-character occurrence counts over a FIXED ASCII
  * alphabet — the single-pass replacement for the classic
  * `length(t) - length(translate(t, c, ''))` identity evaluated once per
  * alphabet character ([[graft.llm.TextAnalysis.charEntropy]]'s 27
  * translate passes re-scanned every string 27 times; r14 left this as
  * its #4 "not yet optimized" item).
  *
  * One scan of the UTF-8 bytes: an ASCII character is always a single
  * 0x00-0x7F byte and every byte of a multi-byte codepoint is >= 0x80, so
  * counting matching BYTES equals counting matching CODEPOINTS — exactly
  * what length-minus-translate computed (spec-pinned char-identical on
  * corpus text + unicode edges, interpreted ≡ codegen). Null semantics:
  * NULL in → NULL out (the legacy chain produced an array of NULL counts
  * whose downstream folds also nulled out; callers guard the same way
  * for both). Counts are exact longs in alphabet order. */
case class AsciiCharCounts(child: Expression, alphabet: String)
    extends UnaryExpression {
  require(alphabet.nonEmpty && alphabet.forall(_ < 128) &&
    alphabet.distinct == alphabet,
    "alphabet must be non-empty, ASCII-only and duplicate-free")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"ascii_char_counts expects string input, got ${t.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, false)
  override def prettyName: String = "ascii_char_counts"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(AsciiCharCounts.counts(
      input.asInstanceOf[UTF8String].getBytes, alphabet))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("alphabet", alphabet, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"new ${classOf[GenericArrayData].getName}(" +
        s"graft.functions.AsciiCharCounts.counts($c.getBytes(), $ref))")
  }

  override protected def withNewChildInternal(
      newChild: Expression): AsciiCharCounts = copy(child = newChild)
}

object AsciiCharCounts {
  // byte value → alphabet position (-1 = not counted), built once per
  // distinct alphabet per JVM — never per row
  private val idxCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()

  private def indexOf(alphabet: String): Array[Int] =
    idxCache.computeIfAbsent(alphabet, a => {
      val idx = Array.fill(128)(-1)
      var i = 0
      while (i < a.length) { idx(a.charAt(i)) = i; i += 1 }
      idx
    })

  /** One pass over the UTF-8 bytes → counts per alphabet position. */
  def counts(bytes: Array[Byte], alphabet: String): Array[Long] = {
    val idx = indexOf(alphabet)
    val out = new Array[Long](alphabet.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 0) { // ASCII byte; multi-byte sequence bytes are negative
        val p = idx(b)
        if (p >= 0) out(p) += 1L
      }
      i += 1
    }
    out
  }
}
