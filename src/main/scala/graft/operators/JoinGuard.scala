package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join-explosion guard (SURVEY §2D, D103).
  *
  * A many-to-many equi-join's output for key k is |L_k|·|R_k| rows — one
  * unexpected hot key (a default id, an empty-string join column, a
  * crawler loop) turns a 100 TB join into a task that never finishes. The
  * reference pipeline inherits this hazard through its free-text JOIN_EXPR
  * (`extract_data.py:1048-1073` executes whatever the config joins on);
  * production guardrails cap it.
  *
  * `cappedJoin` bounds the blowup instead of dying: per-key row counts on
  * both sides (two map-side-combinable aggregations over the key DOMAIN),
  * keys whose product exceeds `maxProduct` are "offenders" (a tiny
  * broadcast set); offender keys keep only their first `capEach` rows per
  * side in a DETERMINISTIC tiebreak order, everything else joins
  * untouched. The per-key window runs only over offender rows — state is
  * bounded by capEach × offenders, never the table.
  */
object JoinGuard {

  /** Per-key sizes of both sides and the offender verdict — the audit
    * table a pipeline logs before a risky join. */
  def profile(left: DataFrame, right: DataFrame, key: String,
      maxProduct: Long): DataFrame = {
    val lc = left.groupBy(key).agg(count(lit(1)).as("n_left"))
    val rc = right.groupBy(key).agg(count(lit(1)).as("n_right"))
    lc.join(rc, Seq(key), "inner")
      .withColumn("pairs", col("n_left") * col("n_right"))
      .withColumn("offender", col("pairs") > maxProduct)
  }

  /** Inner join with hot keys capped to `capEach` rows per side, chosen
    * by each side's tiebreak order (must totally order rows within a key
    * for a deterministic result). Non-offender keys join exactly. */
  def cappedJoin(left: DataFrame, right: DataFrame, key: String,
      maxProduct: Long, capEach: Int, leftTiebreak: Seq[Column],
      rightTiebreak: Seq[Column]): DataFrame = {
    val offenders = profile(left, right, key, maxProduct)
      .filter(col("offender")).select(col(key))
    def cap(side: DataFrame, tiebreak: Seq[Column]): DataFrame = {
      // hot/cold split by two broadcast joins on the tiny offender set —
      // the rank window sees ONLY hot rows, so its state is bounded by
      // offenders × rows-per-hot-key, never the table
      val hot = side.join(broadcast(offenders), Seq(key), "left_semi")
      val cold = side.join(broadcast(offenders), Seq(key), "left_anti")
      val w = Window.partitionBy(key).orderBy(tiebreak: _*)
      cold.unionByName(hot
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= capEach)
        .drop("__rn"))
    }
    cap(left, leftTiebreak).join(cap(right, rightTiebreak), Seq(key), "inner")
  }
}
