package graft.transform

import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.config.ColumnMetadata
import graft.dsl.{DslContext, Transformations}

/** Result of compiling a table's column set: the per-column expressions plus
  * any compile errors (degraded to typed nulls, reference
  * light_transform.py:718-730). */
final case class CompiledTransform(
    columns: Seq[Column],
    errors: Map[String, String]) {
  def errorPct(total: Int): Double =
    if (total == 0) 0.0 else errors.size * 100.0 / total
}

/** The Spark-side transform engine: builds ONE `select` of all configured
  * column expressions ordered by COLUMN_ID, each aliased to COLUMN_NAME and
  * cast to its NEW_DATA_TYPE (reference
  * TransformationEngine.apply_transformations, light_transform.py:694-737).
  *
  * Error policy (light_transform.py:1471-1509): a column whose expression
  * fails to compile degrades to `lit(null).cast(type)`; the run FAILS when
  * >50% of columns degraded and WARNs above 10%.
  */
object TransformationEngine {
  val FailThresholdPct = 50.0
  val WarnThresholdPct = 10.0

  /** Error-tier policy (light_transform.py:1487-1509): >50% degraded
    * columns FAILED, >10% WARNING (rows still written), else SUCCESS. */
  def statusOf(errorPct: Double): String =
    if (errorPct > FailThresholdPct) "FAILED"
    else if (errorPct > WarnThresholdPct) "WARNING"
    else "SUCCESS"

  def compile(meta: Seq[ColumnMetadata], inputCols: Seq[String],
      now: Option[Timestamp] = None): CompiledTransform = {
    val sorted = meta.sortBy(_.columnId)
    val errors = Map.newBuilder[String, String]
    val cols = sorted.map { m =>
      val ctx = DslContext(inputCols.toSet, m.sparkType, now)
      try Transformations.compile(m.transformation, ctx, m.columnName)
        .cast(m.sparkType).as(m.columnName)
      catch {
        case e: Exception =>
          errors += m.columnName -> e.getMessage
          lit(null).cast(m.sparkType).as(m.columnName)
      }
    }
    CompiledTransform(cols, errors.result())
  }

  /** Apply the full configured projection as a single select, surfacing the
    * error-tier status: FAILED throws, WARNING (10–50% degraded columns)
    * returns the frame with status "WARNING" so the run log can record a
    * partially-degraded-but-written table — a config typo on a wide table
    * must surface, not proceed silently (light_transform.py:1487-1509 +
    * the WARNING run-log status, light_transform.py:227-522). */
  def applyWithStatus(df: DataFrame, meta: Seq[ColumnMetadata],
      now: Option[Timestamp] = None): (DataFrame, String) = {
    val compiled = compile(meta, df.columns.toSeq, now)
    val pct = compiled.errorPct(meta.size)
    if (pct > FailThresholdPct)
      sys.error(f"transform failed: $pct%.1f%% of columns degraded " +
        s"(${compiled.errors.keys.mkString(", ")})")
    (df.select(compiled.columns: _*), statusOf(pct))
  }

  /** Apply the full configured projection as a single select. */
  def apply(df: DataFrame, meta: Seq[ColumnMetadata],
      now: Option[Timestamp] = None): DataFrame =
    applyWithStatus(df, meta, now)._1

  /** Dedup-latest-by-key: keep the newest row per id-column group, newest
    * judged by the is_filter_date columns descending (reference
    * light_transform.py:1786-1797). `tieBreak` columns make the choice
    * deterministic when recency ties (not in the reference, which lets Spark
    * pick arbitrarily — needed for reproducible tests/oracle hashing).
    *
    * Single shuffle on the id columns; at 100 TB this is a hash-partitioned
    * window, skew-safe as long as id cardinality is high (it is — ids are
    * concatenated business keys). */
  def dedupLatest(df: DataFrame, idCols: Seq[String], dateCols: Seq[String],
      tieBreak: Seq[String] = Nil): DataFrame = {
    if (idCols.isEmpty || dateCols.isEmpty) return df
    val w = Window.partitionBy(idCols.map(col): _*)
      .orderBy((dateCols.map(col(_).desc) ++ tieBreak.map(col(_).desc)): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Output sort when IS_ORDER_BY columns are flagged
    * (light_transform.py:1799-1801). */
  def orderedOutput(df: DataFrame, meta: Seq[ColumnMetadata]): DataFrame = {
    val orderCols = meta.filter(_.isOrderBy).sortBy(_.columnId).map(_.columnName)
    if (orderCols.isEmpty) df else df.orderBy(orderCols.map(col): _*)
  }

  /** Full post-transform pipeline: transform → dedup-latest → order,
    * surfacing the error-tier status (SUCCESS / WARNING; FAILED throws). */
  def runWithStatus(df: DataFrame, meta: Seq[ColumnMetadata],
      now: Option[Timestamp] = None, tieBreak: Seq[String] = Nil)
      : (DataFrame, String) = {
    val (transformed, status) = applyWithStatus(df, meta, now)
    val ids = meta.filter(_.isId).map(_.columnName)
    val dates = meta.filter(_.isFilterDate).map(_.columnName)
    (orderedOutput(dedupLatest(transformed, ids, dates, tieBreak), meta),
      status)
  }

  /** Full post-transform pipeline: transform → dedup-latest → order. */
  def run(df: DataFrame, meta: Seq[ColumnMetadata],
      now: Option[Timestamp] = None, tieBreak: Seq[String] = Nil): DataFrame =
    runWithStatus(df, meta, now, tieBreak)._1
}
