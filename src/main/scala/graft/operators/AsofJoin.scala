package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single right row with the same key
  * and the greatest right-time ≤ left-time.
  *
  * Spark has no native as-of join; per the custom-operator preference order
  * this composes existing operators (option (a)) rather than adding a
  * SparkPlan: union-with-tag → ONE shuffle+sort per (key, time) → running
  * `last(..., ignoreNulls)` window carries the latest right row forward onto
  * each left row. Cost at any scale is exactly one hash-partition-by-key
  * sort — the same shape as a sort-merge join, with no range-explosion and
  * no skew beyond the key distribution itself.
  *
  * Right rows sort BEFORE left rows at equal timestamps, giving the
  * conventional inclusive (`right.time <= left.time`) semantics — the same
  * contract as DuckDB's ASOF JOIN (used as the oracle in the query
  * inventory).
  */
object AsofJoin {

  /** @param left       probe side
    * @param right      reference side (columns prefixed `asof_` in output)
    * @param keyCols    equality keys present on both sides
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param rightCols  right columns to carry (besides keys)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // The carried right columns travel as ONE struct through a single
    // last(ignoreNulls): a right row whose carried column is NULL still
    // contributes a non-null struct, so all output columns come from the
    // SAME matched right row (per-column carry would backfill a NULL field
    // from an older right row — diverging from ASOF JOIN semantics).
    val carryType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c)))
    val taggedLeft = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(Seq(col("__t"), col("__side")) ++
        keyCols.map(col) ++
        leftCols.filterNot(keyCols.contains).map(col) :+
        lit(null).cast(carryType).as("__carry"): _*)
    val taggedRight = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(Seq(col("__t"), col("__side")) ++
        keyCols.map(col) ++
        leftCols.filterNot(keyCols.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightCols.map(col): _*).as("__carry"): _*)
    // right sorts before left at equal time (inclusive <= semantics); the
    // struct itself is the final ordering term so two right rows with equal
    // (key, time) resolve deterministically (greatest struct value wins)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__carry").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = taggedLeft.unionByName(taggedRight)
      .withColumn("__carry", last(col("__carry"), ignoreNulls = true).over(w))
    rightCols.foldLeft(carried.filter(col("__side") === 1)) {
      case (df, c) => df.withColumn(s"asof_$c", col("__carry").getField(c))
    }.drop("__t", "__side", "__carry")
  }

  /** As-of join with a STALENESS TOLERANCE (D180): a matched right row
    * older than `maxGap` (left.time − right.time) is nulled out — the
    * sensor-fusion / market-data contract ("a quote staler than X is no
    * quote"), which a plain as-of join cannot express and a range join
    * would pay a per-key cross product for. Same single key-sort plan as
    * [[asofJoin]]; the tolerance is one post-projection over the carried
    * right timestamp, and ALL carried columns null together (the match
    * is rejected as a unit, never per-column). */
  def asofJoinTolerant(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftTime: String, rightTime: String,
      rightCols: Seq[String], maxGap: Long): DataFrame = {
    require(maxGap >= 0, s"maxGap must be >= 0, got $maxGap")
    val carryCols = (rightCols :+ rightTime).distinct
    val j = asofJoin(left, right, keyCols, leftTime, rightTime, carryCols)
    val stale = col(s"asof_$rightTime").isNull ||
      col(leftTime) - col(s"asof_$rightTime") > maxGap
    carryCols.foldLeft(j) { (d, c) =>
      d.withColumn(s"asof_$c",
        when(stale, lit(null).cast(d.schema(s"asof_$c").dataType))
          .otherwise(col(s"asof_$c")))
    }
  }
}
