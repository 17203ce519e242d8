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

  /** Change stream (keys, timeCol, attrs) → versioned dimension. Change
    * rows must be unique per (keys, timeCol) — pre-aggregate upstream if
    * a key can change twice at one timestamp. */
  def build(changes: DataFrame, keyCols: Seq[String], timeCol: String,
      attrCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(timeCol))
    changes.select(
      keyCols.map(col) ++
        Seq(col(timeCol).as("valid_from"),
          lead(col(timeCol), 1).over(w).as("valid_to")) ++
        attrCols.map(col): _*)
  }

  /** Enrich each fact with the dimension attributes in effect at its
    * event time (NULL attrs for facts before the first change). Carried
    * columns arrive prefixed `asof_` (the AsofJoin contract). */
  def pointInTime(facts: DataFrame, changes: DataFrame,
      keyCols: Seq[String], factTime: String, changeTime: String,
      attrCols: Seq[String]): DataFrame =
    AsofJoin.asofJoin(facts, changes, keyCols, factTime, changeTime,
      attrCols)
}
