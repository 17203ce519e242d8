package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed table comparison (SURVEY §2D, D178) — the data-diff tool every
  * migration/backfill/replication job ends with: given two schema-aligned
  * tables and a key, report what changed — added keys, removed keys,
  * changed rows, and PER-COLUMN change counts (which column drifted tells
  * you which upstream transform diverged). `VersionedTable.diff` answers
  * "what rows changed between versions of ONE table"; this answers "how
  * do two INDEPENDENT tables disagree" (old pipeline vs new pipeline,
  * source vs replica, vendor A vs vendor B).
  *
  * Scale shape: ONE full-outer join on the key (both sides hash-partition
  * on it; AQE picks sort-merge or broadcast), then a single
  * map-side-combinable aggregation over per-row comparison bits — never a
  * column-at-a-time loop of joins. NULL-safe comparison (`<=>`) per
  * column, so NULL → value and value → NULL both count as changes.
  */
object TableDiff {

  /** Per-row classification: (key cols..., status ∈
    * {added, removed, changed, same}, changed_cols array). */
  def rows(left: DataFrame, right: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff requires key columns")
    require(left.columns.toSet == right.columns.toSet,
      s"schemas differ: ${left.columns.toSet} vs ${right.columns.toSet}")
    val valueCols = left.columns.filterNot(keys.contains).toSeq
    val l = left.select(left.columns.map(c => col(c).as(s"l_$c")): _*)
    val r = right.select(right.columns.map(c => col(c).as(s"r_$c")): _*)
    val cond = keys.map(k => col(s"l_$k") <=> col(s"r_$k")).reduce(_ && _)
    val lKey = col(s"l_${keys.head}")
    val rKey = col(s"r_${keys.head}")
    // presence flags must not confuse a NULL key value with absence:
    // full-outer emits nulls for the ABSENT side's every column, so tag
    // each side with a literal before joining
    val lt = l.withColumn("__lp", lit(1))
    val rt = r.withColumn("__rp", lit(1))
    val j = lt.join(rt, cond, "full_outer")
    val changed = valueCols.map(c =>
      when(!(col(s"l_$c") <=> col(s"r_$c")), lit(c)))
    // changed_cols is meaningful ONLY when both sides are present — for
    // an added/removed row the absent side is all-NULL and every column
    // would spuriously count as "changed"
    val bothPresent = col("__lp").isNotNull && col("__rp").isNotNull
    val changedArr = when(bothPresent, array_compact(array(changed: _*)))
      .otherwise(array().cast("array<string>"))
    val status = when(col("__lp").isNull, lit("added"))
      .when(col("__rp").isNull, lit("removed"))
      .when(size(changedArr) > 0, lit("changed"))
      .otherwise(lit("same"))
    j.select(
      keys.map(k => coalesce(col(s"l_$k"), col(s"r_$k")).as(k)) ++ Seq(
        status.as("status"),
        changedArr.as("changed_cols")): _*)
  }

  /** One-line-per-metric summary: n_added, n_removed, n_changed, n_same,
    * plus `col:<name>` changed-row counts per value column — the
    * dashboard row a replication monitor stores per run. */
  def summary(left: DataFrame, right: DataFrame,
      keys: Seq[String]): DataFrame = {
    val d = rows(left, right, keys)
    val statuses = d.groupBy("status").agg(count(lit(1)).as("value"))
      .select(concat(lit("n_"), col("status")).as("metric"), col("value"))
    val perCol = d.select(explode(col("changed_cols")).as("c"))
      .groupBy("c").agg(count(lit(1)).as("value"))
      .select(concat(lit("col:"), col("c")).as("metric"), col("value"))
    statuses.unionByName(perCol)
  }
}
