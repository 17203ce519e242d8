package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}

/** Native (codegen'd) float-vector dot product.
  *
  * The HOF form `aggregate(zip_with(x, y, (p, q) => p*q), 0.0, _+_)` is
  * already codegen'd, but it materializes the zipped products array per row
  * and walks two lambda layers per element. For the ANN hot path — one dot
  * per (query × corpus-row) pair, i.e. the innermost loop of `sim_topk` —
  * this expression emits the tight loop directly:
  *
  * {{{ acc += (double) x.getFloat(i) * (double) y.getFloat(i) }}}
  *
  * Accumulation is a strict left fold in DOUBLE precision, element 0 first —
  * the exact summation order of [[graft.llm.Similarity.dot]] — so the result
  * is bit-identical to the HOF form (spec-asserted on every sf0.001 vector)
  * and every existing oracle stays valid when this path is swapped in.
  *
  * Null semantics mirror the HOF form: NULL input array → NULL; length
  * mismatch or a NULL element → NULL (zip_with pads / null-propagates into
  * the fold). Inputs must already be `array<float>`: [[ExpectsInputTypes]]
  * REJECTS other element types at analysis instead of silently casting —
  * an implicit `array<double> → array<float>` coercion would change the
  * numbers, which is exactly what an oracle-gated engine must never do.
  *
  * Registered two ways:
  *  - [[GraftExtensions]] for `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (cluster deployment; `SELECT vec_dot(a, b)` in SQL), and
  *  - [[VectorOps.ensureRegistered]] for an already-built session (the
  *    driver's gate harness builds its own session).
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects (array<float>, array<float>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native (codegen'd) squared L2 distance over double arrays — the
  * inner loop of PQ encoding and the ADC distance tables (one
  * sub-distance per (row, codeword, subspace)): `Σ (x_i − y_i)²` as a
  * strict left fold, element 0 first — bit-identical to the HOF form
  * `aggregate(zip_with(a, b, (x, y) => (x−y)*(x−y)), 0.0, _+_)` it
  * replaces (spec-asserted), so every IVF-PQ oracle stays valid. Null
  * semantics mirror the HOF form (NULL array/element or length mismatch
  * → NULL). */
case class SqDistDouble(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_sqdist expects (array<double>, array<double>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sqdist"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $d = $x.getDouble($i) - $y.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorOps {

  /** Column-API form — no registry needed, usable on any session. */
  def vecDot(a: Column, b: Column): Column =
    Bridge.column(DotProductFloat(Bridge.expression(a), Bridge.expression(b)))

  /** Native squared-L2 over double arrays (Column form). */
  def vecSqDist(a: Column, b: Column): Column =
    Bridge.column(SqDistDouble(Bridge.expression(a), Bridge.expression(b)))

  private val fnId = FunctionIdentifier("vec_dot")
  private val fnInfo = new ExpressionInfo(
    classOf[DotProductFloat].getCanonicalName, null, "vec_dot",
    "_FUNC_(x, y) - double-precision dot product of two float arrays " +
      "(strict left fold; NULL on length mismatch or NULL element).", "")
  private val fnBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"vec_dot expects 2 arguments, got ${exprs.length}")
    DotProductFloat(exprs.head, exprs(1))
  }

  /** Idempotently register `vec_dot` on an existing session (the gate
    * harness builds its session before our code runs, so injection via
    * extensions is not always available). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(fnId)) reg.registerFunction(fnId, fnInfo, fnBuilder)
  }

  private[functions] val descriptor = (fnId, fnInfo, fnBuilder)
}

/** `spark.sql.extensions` entry point registering graft's native functions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(VectorOps.descriptor)
}
