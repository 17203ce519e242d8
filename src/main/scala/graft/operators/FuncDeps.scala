package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Functional-dependency and candidate-key verification (SURVEY §2D,
  * D233) — the data-profiling step schema inference, key detection and
  * MERGE-key validation rest on. Public literature frames discovery as
  * a lattice search (TANE / HyFD family); at warehouse scale the
  * workhorse is the VERIFICATION pass over declared candidate pairs —
  * config-sized, exact, and embarrassingly parallel — which is what
  * this implements: `A → B` holds iff every non-null A value maps to
  * exactly one distinct B value.
  *
  * Scale shape: per pair, ONE map-side-combinable distinct over the
  * (A, B) domain followed by a per-determinant count — the shuffle
  * carries the pair's value domain, never the table; pairs are a
  * config list, so the whole check is a handful of 2-column
  * aggregations over a 100 TB table. Complements D75 (declared DQ
  * assertions) and D174 (RELY key validation): those enforce a known
  * contract, this MEASURES whether a candidate contract holds. */
object FuncDeps {

  /** Verify each (determinant, dependent) pair on `df`. Returns one row
    * per pair: `n_keys` distinct non-null determinant values,
    * `n_violating` determinants mapping to >1 distinct dependent, and
    * `holds`. NULL determinants are skipped (SQL key semantics); NULL
    * dependents count as a distinct value (a key mapping to NULL and a
    * value is two images — the dependency is broken). */
  def check(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "declare at least one candidate pair")
    pairs.map { case (a, b) =>
      df.select(col(a).as("dv"), col(b).as("pv"))
        .where(col("dv").isNotNull)
        .distinct()
        .groupBy("dv").agg(count(lit(1)).as("ndep"))
        // coalesce: a pair whose determinant has ZERO non-null rows
        // aggregates over nothing and sum() is NULL — the contract is
        // one non-null row per pair, with the vacuous dependency
        // holding (0 keys, 0 violations), never a NULL boolean
        .agg(count(lit(1)).as("n_keys"),
          coalesce(sum(when(col("ndep") > 1, 1L).otherwise(0L)), lit(0L))
            .as("n_violating"))
        .select(lit(a).as("det"), lit(b).as("dep"), col("n_keys"),
          col("n_violating"), (col("n_violating") === 0).as("holds"))
    }.reduce(_ unionByName _)
  }

  /** Candidate-key verification: a column is a key iff it is non-null
    * everywhere and never repeats. One row per column. */
  def keyCheck(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "declare at least one candidate key")
    cols.map { c =>
      df.agg(count(lit(1)).as("n_rows"), count(col(c)).as("n_nonnull"),
        count_distinct(col(c)).as("n_distinct"))
        .select(lit(c).as("column"), col("n_rows"),
          (col("n_distinct") === col("n_rows") &&
            col("n_nonnull") === col("n_rows")).as("is_key"))
    }.reduce(_ unionByName _)
  }
}
