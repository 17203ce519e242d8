package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-preserving release operators (SURVEY §2D).
  *
  * [[kAnonymize]] is the k-anonymity SUPPRESSION step (Sweeney's model —
  * public literature): a row may only be released if at least `k` rows
  * share its full quasi-identifier (QI) combination, so no released row
  * can be narrowed below a crowd of k. Complements the regex PII
  * redaction pass (D25, which scrubs direct identifiers INSIDE text):
  * redaction handles what a row says, k-anonymity handles what a row's
  * metadata combination reveals.
  *
  * Scale shape: ONE aggregation on the QI columns (map-side combinable
  * counts; QI cardinality is bounded by the release schema, orders of
  * magnitude under the row count) and a BROADCAST left-semi join of the
  * surviving QI combos back onto the data — the table itself never
  * shuffles, and no window function touches an unbounded ordering.
  */
object Privacy {

  /** Rows whose exact quasi-identifier combination occurs >= k times.
    * NULL QI values group as themselves (a null combo is released only
    * if k rows share it) — the semantics of groupBy, kept deliberately. */
  def kAnonymize(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty, "k-anonymity requires quasi-identifier columns")
    require(k >= 1, s"k must be >= 1 (got $k)")
    // null-SAFE semi-join: groupBy put all-null QI rows in one group, so
    // the release join must match them back with <=> — a plain USING join
    // would silently suppress every null-QI group regardless of size,
    // diverging from the report's verdict
    val safe = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__qi_n"))
      .filter(col("__qi_n") >= k)
      .select(qiCols.map(c => col(c).as(s"__qi_$c")): _*)
    val cond = qiCols.map(c => col(c) <=> col(s"__qi_$c")).reduce(_ && _)
    df.join(broadcast(safe), cond, "left_semi")
  }

  /** Release audit: every QI combination with its size and verdict —
    * what a data-governance review signs off on before the release.
    * Columns: the QI columns, `n`, `released` (1 iff n >= k). */
  def kAnonymityReport(df: DataFrame, qiCols: Seq[String],
      k: Long): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("released", when(col("n") >= k, 1L).otherwise(0L))
}
