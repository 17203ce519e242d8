package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index (SURVEY §2D, D168) — the space-filling curve behind
  * Databricks liquid clustering and Iceberg's hilbert sort order. The
  * Morton/Z curve (D23) interleaves bits, which is cheap but takes long
  * diagonal jumps between quadrant boundaries; the Hilbert curve visits
  * every cell of the 2^bits × 2^bits grid through UNIT STEPS ONLY
  * (consecutive indexes are grid-adjacent — spec-pinned), so equal-size
  * index ranges cover more compact rectangles and rectangle queries touch
  * fewer files at the same file count.
  *
  * The per-row transform is the classic bit-level state machine (rotate/
  * reflect per quadrant level — Hamilton's compact algorithm, public
  * domain since Hilbert 1891): a LOOP carrying (x, y, d) state across
  * `bits` levels. That loop is deliberately a native codegen'd Expression
  * and NOT a Column-expression unroll: each level references the previous
  * level's x and y several times, so an unrolled Column tree multiplies
  * node count per level (~3^bits nodes — codegen collapse), while the
  * generated code here is the same tight Java loop the interpreted path
  * runs. The SQL oracle replays the identical unrolled recurrence as one
  * CTE stage per level (linear there, because each stage materializes
  * named columns).
  */
object Hilbert {

  /** (x, y) → Hilbert index d on the 2^bits grid. Inputs must lie in
    * [0, 2^bits); the expression NULLs out-of-range rows rather than
    * wrapping them into a wrong-but-plausible cluster. */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Column form over integral columns (cast to long internally). */
  def hValue2(x: Column, y: Column, bits: Int = 10): Column =
    Bridge.column(HilbertIndex2(
      Bridge.expression(x.cast("long")),
      Bridge.expression(y.cast("long")), bits))
}

/** Codegen'd Hilbert xy→d. NULL on NULL input or out-of-range coordinate. */
case class HilbertIndex2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hilbert_xy expects (bigint, bigint), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "hilbert_xy"

  private def side = 1L << bits

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]
    val y = b.asInstanceOf[Long]
    if (x < 0 || y < 0 || x >= side || y >= side) null
    else Hilbert.xy2d(bits, x, y)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // static forwarder on the companion — the generated class runs in
      // the same JVM/classloader that loaded this library
      s"""
         |if ($x < 0L || $y < 0L || $x >= ${side}L || $y >= ${side}L) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.Hilbert.xy2d($bits, $x, $y);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
