package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 (SURVEY §2D, D109): version a
  * dimension from its change stream, and enrich facts with the version in
  * effect at each fact's event time.
  *
  * [[build]] derives the interval table — (key, valid_from, valid_to,
  * attrs), `valid_to` NULL on the open version — with ONE key-partitioned
  * lead() window over the change stream.
  *
  * [[pointInTime]] deliberately does NOT range-join facts against that
  * interval table: `fact.ts ∈ [valid_from, valid_to)` as a join predicate
  * plans a range join (per-key cross product filtered late — the classic
  * 100 TB blowup). The same semantics fall out of the as-of join
  * ([[AsofJoin]]): each fact matches the latest change at-or-before its
  * time, which IS the interval containing it. One key-partitioned sort,
  * no range explosion; the interval table remains the REPORTING artifact,
  * not the join path. */
object Scd2 {

  import org.apache.spark.sql.Column

  /** Deterministic same-timestamp resolution: of several change rows
    * sharing (keys, timeCol), keep the FIRST under the caller's `tiebreak`
    * ordering (e.g. `Seq(col("event_id").desc)` = highest id wins — the
    * "last writer" a CDC stream means). One row_number window over the
    * tied groups only; with no tiebreak the input passes through and
    * uniqueness per (keys, timeCol) stays the caller's contract. */
  def resolveTies(changes: DataFrame, keyCols: Seq[String], timeCol: String,
      tiebreak: Seq[Column]): DataFrame =
    if (tiebreak.isEmpty) changes
    else {
      val w = Window.partitionBy((keyCols :+ timeCol).map(col): _*)
        .orderBy(tiebreak: _*)
      changes.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }

  /** Change stream (keys, timeCol, attrs) → versioned dimension. Without
    * `tiebreak`, change rows must be unique per (keys, timeCol) —
    * pre-aggregate upstream; with it, ties resolve via [[resolveTies]].
    * LATE-ARRIVING changes need no special handling in a batch build: the
    * key-partitioned sort places them in event-time order wherever they
    * arrived, and a rebuilt dimension is identical whatever the arrival
    * order (the build is a pure function of the change SET). */
  def build(changes: DataFrame, keyCols: Seq[String], timeCol: String,
      attrCols: Seq[String], tiebreak: Seq[Column] = Nil): DataFrame = {
    val resolved = resolveTies(changes, keyCols, timeCol, tiebreak)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(timeCol))
    resolved.select(
      keyCols.map(col) ++
        Seq(col(timeCol).as("valid_from"),
          lead(col(timeCol), 1).over(w).as("valid_to")) ++
        attrCols.map(col): _*)
  }

  /** INCREMENTAL dimension maintenance (the IVM discipline of
    * JoinView/Rollup/KmvDistinct applied to SCD2): merge a NEW change
    * batch into an existing versioned dimension without rebuilding
    * untouched keys. Keys absent from the batch pass through UNCHANGED
    * (anti-join); each touched key's versions are reconstructed from its
    * existing rows (valid_from IS its change timestamp — the dimension is
    * a lossless encoding of its change set) unioned with the key's new
    * changes, through the same [[build]] window. Late-arriving changes
    * therefore splice correctly into history, and a change at an EXISTING
    * version timestamp REPLACES that version (new batch wins — the CDC
    * re-delivery contract).
    *
    * Cost: O(|touched keys' versions| + |batch|) rewrite work plus one
    * dim scan for the key split — never a full-dimension window. The
    * batch's key set broadcasts to both joins; at 100 TB compose with the
    * D107/D123 sidecars so the dim scan prunes to key-intersecting files. */
  def applyChanges(dim: DataFrame, changes: DataFrame, keyCols: Seq[String],
      timeCol: String, attrCols: Seq[String],
      tiebreak: Seq[Column] = Nil): DataFrame = {
    val resolved = resolveTies(changes, keyCols, timeCol, tiebreak)
      .select(keyCols.map(col) ++ (timeCol +: attrCols).map(col): _*)
    val keys = resolved.select(keyCols.map(col): _*).distinct()
    val untouched = dim.join(broadcast(keys), keyCols, "left_anti")
    val touchedOld = dim.join(broadcast(keys), keyCols, "left_semi")
      .select(keyCols.map(col) ++ (col("valid_from").as(timeCol) +:
        attrCols.map(col)): _*)
    // new-batch-wins on (keys, timeCol) collisions with existing versions
    val w = Window.partitionBy((keyCols :+ timeCol).map(col): _*)
      .orderBy(col("__src").desc)
    val merged = touchedOld.withColumn("__src", lit(0))
      .unionByName(resolved.withColumn("__src", lit(1)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__src", "__rn")
    untouched.unionByName(build(merged, keyCols, timeCol, attrCols))
  }

  /** Enrich each fact with the dimension attributes in effect at its
    * event time (NULL attrs for facts before the first change). Carried
    * columns arrive prefixed `asof_` (the AsofJoin contract). `tiebreak`
    * pre-resolves same-timestamp changes so the enrichment sees the SAME
    * winner [[build]] would version — without it, equal-(key, ts) right
    * rows fall back to AsofJoin's greatest-struct resolution, which need
    * not match a caller-intended ordering. */
  def pointInTime(facts: DataFrame, changes: DataFrame,
      keyCols: Seq[String], factTime: String, changeTime: String,
      attrCols: Seq[String], tiebreak: Seq[Column] = Nil): DataFrame =
    AsofJoin.asofJoin(facts,
      resolveTies(changes, keyCols, changeTime, tiebreak), keyCols,
      factTime, changeTime, attrCols)

  /** Duration-weighted aggregation over validity intervals (D172): the
    * reporting twin of [[pointInTime]] — not "which rate was in effect
    * at t" but "what was the TIME-WEIGHTED AVERAGE rate over the window
    * [winStart, winEnd)". Each version contributes value × overlap of
    * its validity with the window (open versions clamp at winEnd); keys
    * with zero coverage are absent, never a 0/0. ONE aggregation over
    * the dimension table (dimension-sized, orders of magnitude under the
    * fact table); the weighted sum is exact decimal so both engines
    * agree to the bit, with a SINGLE final IEEE division per key. The
    * weighted sum exceeds 2^53 (value-cents × nanoseconds), where a
    * direct decimal→double conversion is not correctly rounded in every
    * engine (1-ulp divergence observed); converting via the decimal's
    * exact STRING form pins both engines to the correctly-rounded
    * string→double parse.
    * Returns (keys..., covered_ns, twa). */
  def timeWeighted(dim: DataFrame, keyCols: Seq[String], valueCol: String,
      winStart: Long, winEnd: Long): DataFrame = {
    require(winEnd > winStart, s"empty window [$winStart, $winEnd)")
    import org.apache.spark.sql.types.DecimalType
    val from = greatest(col("valid_from"), lit(winStart))
    val to = least(coalesce(col("valid_to"), lit(winEnd)), lit(winEnd))
    val overlap = when(to > from, to - from).otherwise(lit(0L))
    dim.withColumn("__ov", overlap)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__ov")).as("covered_ns"),
        sum(col(valueCol).cast(DecimalType(18, 2)) * col("__ov")).as("__ws"))
      .filter(col("covered_ns") > 0)
      .withColumn("twa",
        col("__ws").cast("string").cast("double") / col("covered_ns"))
      .drop("__ws")
  }
}
