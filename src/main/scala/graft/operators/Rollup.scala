package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Incremental aggregate maintenance (SURVEY §2D, D104).
  *
  * A materialized rollup (count + exact-decimal sum per key) is kept
  * current by MERGING each delta's partial aggregate into it — the 100 TB
  * base is NEVER rescanned; only the delta shuffles (map-side combined to
  * its key domain) and the merge aggregates two rollup-domain-sized
  * tables. This is the additive-state discipline Spark's own partial
  * aggregation uses, lifted to cross-batch persistence — and the same
  * algebra that makes every sketch in `graft.functions` mergeable.
  *
  * State is (n, s): both add, so merge order and batch boundaries cannot
  * change the result — `maintain(base ∪ d1 ∪ d2) ≡ merge(merge(build(
  * base), d1), d2)` exactly (decimal sums, no float drift).
  */
object Rollup {

  /** Build the rollup of `df`: exact decimal(18,2) sum + count per key. */
  def build(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(col(valueCol).cast(DecimalType(18, 2))).as("s"))

  /** Merge a delta's rows into an existing rollup. */
  def merge(rollup: DataFrame, delta: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame =
    rollup.unionByName(build(delta, keys, valueCol))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"))

  /** Reader-facing projection: the exact decimal internal state surfaces
    * as a double total (the engine-wide output convention, Q.dsum). */
  def readable(rollup: DataFrame): DataFrame =
    rollup.withColumn("total", col("s").cast(DoubleType)).drop("s")

  /** Retraction-aware maintenance (D165): apply a row-level CHANGE FEED —
    * the `VersionedTable.diff` / CDC-egress convention, a `change` column
    * ∈ {insert, delete} carrying full rows — to a materialized rollup.
    * [[merge]] only ADDS (append-only feeds); under updates and deletes
    * an aggregate must SUBTRACT, and (n, s) supports exact retraction:
    * deletes contribute (−1, −v), inserts (+1, +v), an UPDATE arrives as
    * its delete+insert pair and nets to the value delta. Keys whose row
    * count reaches zero leave the rollup entirely (`n != 0` filter), so
    * a fully-retracted key is indistinguishable from one never seen —
    * maintain(diff(v1, v2)) over build(v1) ≡ build(v2) EXACTLY (decimal
    * arithmetic; the spec pins the equivalence on generated mutations).
    * Scale shape unchanged: the 100 TB base is never rescanned — the
    * feed aggregates map-side to its key domain and merges with the
    * rollup-domain-sized state. */
  def applyChanges(rollup: DataFrame, changes: DataFrame, keys: Seq[String],
      valueCol: String, changeCol: String = "change"): DataFrame = {
    val sign = when(col(changeCol) === "delete", lit(-1L)).otherwise(lit(1L))
    val v = col(valueCol).cast(DecimalType(18, 2))
    val feed = changes.groupBy(keys.map(col): _*).agg(
      sum(sign).as("n"),
      sum(when(col(changeCol) === "delete", -v).otherwise(v)).as("s"))
    rollup.unionByName(feed)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"))
      .filter(col("n") =!= 0)
  }

  /** Min/max rollup: (keys..., mn, mx) — IEEE-safe as-is (min/max never
    * accumulate, so no decimal bridge needed). */
  def buildMinMax(df: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(min(col(valueCol)).as("mn"), max(col(valueCol)).as("mx"))

  /** SEMI-incremental min/max maintenance (D184): min/max are not
    * retraction-closed — deleting the recorded minimum needs the
    * runner-up, which the state doesn't hold — so maintenance splits by
    * what the algebra allows:
    *
    *  - INSERTS fold in distributively (min/max of min/max);
    *  - a DELETE that doesn't reach its group's recorded extremum
    *    provably cannot move it — the group keeps its state untouched;
    *  - only groups where a delete TIES OR PASSES an extremum recompute,
    *    via ONE semi-join-bounded scan of `newBase` (the post-change
    *    table) — affected groups, never the table. A fully-deleted group
    *    necessarily deleted its minimum, lands in the recompute set, is
    *    absent from `newBase`, and so vanishes — correct by the same
    *    path.
    *
    * This is the classical IVM treatment of non-distributive aggregates;
    * at 100 TB the affected-keys semi-join composes with the stats/zone
    * sidecars so the recompute scan prunes to key-intersecting files. */
  def applyChangesMinMax(rollup: DataFrame, changes: DataFrame,
      keys: Seq[String], valueCol: String, newBase: DataFrame,
      changeCol: String = "change"): DataFrame = {
    val kcols = keys.map(col)
    val delExtremes = changes.filter(col(changeCol) === "delete")
      .groupBy(kcols: _*)
      .agg(min(col(valueCol)).as("__dmn"), max(col(valueCol)).as("__dmx"))
    val affected = rollup.join(delExtremes, keys)
      .filter(col("__dmn") <= col("mn") || col("__dmx") >= col("mx"))
      .select(kcols: _*)
    val recomputed = buildMinMax(
      newBase.join(affected, keys, "left_semi"), keys, valueCol)
    val insertAgg = changes.filter(col(changeCol) === "insert")
      .groupBy(kcols: _*)
      .agg(min(col(valueCol)).as("mn"), max(col(valueCol)).as("mx"))
    rollup.join(affected, keys, "left_anti")
      .unionByName(insertAgg.join(affected, keys, "left_anti"))
      .groupBy(kcols: _*)
      .agg(min(col("mn")).as("mn"), max(col("mx")).as("mx"))
      .unionByName(recomputed)
  }

  /** Top movers between two rollup states (D187): "which groups changed
    * the most since yesterday" — the first question anyone asks of a
    * maintained summary. One null-safe full-outer join of two
    * rollup-domain tables (absent side counts as zero: appeared and
    * vanished groups are movers too) + a top-k by |Δsum| with a
    * deterministic key tiebreak — TakeOrderedAndProject, never a global
    * sort. Returns (keys..., dn, ds) with ds exact-decimal inside and
    * double out. */
  def topMovers(old: DataFrame, neu: DataFrame, keys: Seq[String],
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val o = old.select(keys.map(c => col(c).as(s"o_$c")) ++
      Seq(col("n").as("n1"), col("s").as("s1")): _*)
    val n = neu.select(keys.map(c => col(c).as(s"n_$c")) ++
      Seq(col("n").as("n2"), col("s").as("s2")): _*)
    val cond = keys.map(c => col(s"o_$c") <=> col(s"n_$c")).reduce(_ && _)
    val zeroS = lit(0).cast(old.schema("s").dataType)
    val dsDec = coalesce(col("s2"), zeroS) - coalesce(col("s1"), zeroS)
    o.join(n, cond, "full_outer")
      .select(keys.map(c =>
        coalesce(col(s"o_$c"), col(s"n_$c")).as(c)) ++ Seq(
        (coalesce(col("n2"), lit(0L)) - coalesce(col("n1"), lit(0L)))
          .as("dn"),
        dsDec.as("__ds")): _*)
      .orderBy(abs(col("__ds")).desc +: keys.map(col(_).asc): _*)
      .limit(k)
      .withColumn("ds", col("__ds").cast(DoubleType)).drop("__ds")
  }

  /** Change feed BETWEEN two rollup states — (keys..., n, s, change)
    * rows in the diff convention — so maintenance CHAINS: a parent
    * rollup's own changes drive a child (D182). */
  def diffRollups(old: DataFrame, neu: DataFrame): DataFrame =
    neu.exceptAll(old).withColumn("change", lit("insert"))
      .unionByName(old.exceptAll(neu).withColumn("change", lit("delete")))

  /** Multi-level incremental view maintenance (D182): maintain a COARSER
    * rollup from a PARENT rollup's change feed. Unlike [[applyChanges]]
    * (whose feed rows are base rows, each worth (±1, ±v)), the feed here
    * carries (n, s) PARTIALS — a replaced parent group arrives as its
    * delete+insert pair and nets to the (Δn, Δs) delta. The additive
    * algebra is closed under this, so cascades of any depth stay exact,
    * and each level's maintenance cost is its PARENT's change volume —
    * at 100 TB the base is touched once and every summary above it
    * updates from deltas of deltas. Coarse keys must be derivable from
    * parent keys (project them onto the feed before calling). */
  def applyRollupChanges(coarse: DataFrame, changes: DataFrame,
      keys: Seq[String]): DataFrame = {
    val sign = when(col("change") === "delete", lit(-1L)).otherwise(lit(1L))
    val feed = changes.groupBy(keys.map(col): _*)
      .agg(sum(col("n") * sign).as("n"), sum(col("s") * sign).as("s"))
    coarse.unionByName(feed)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"))
      .filter(col("n") =!= 0)
  }
}
