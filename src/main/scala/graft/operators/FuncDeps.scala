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

  /** Bounded single-column FD DISCOVERY (SURVEY §2D, D235) — the
    * candidate-generation half TANE/HyFD put in front of verification,
    * restricted to single-column determinants (the warehouse-profiling
    * workhorse; lattice levels beyond 1 explode combinatorially and are
    * out of scope by design). Every ordered pair over `cols` is a
    * candidate, pruned BEFORE any data pass by the classic NDV rule:
    * when A is null-free, A→B implies ndv(B) ≤ ndv(A) (each non-null A
    * value contributes one image; distinct non-null B values inject
    * into the images), so ndv(B) > ndv(A) refutes without verifying.
    * A determinant WITH nulls never prunes (B values on its null rows
    * are invisible to the dependency), keeping the rule sound.
    * Survivors are verified EXACTLY by [[check]] — pruning only ever
    * cuts cost, never changes the verdict set.
    *
    * The profile feeding the rule is either measured here — ONE
    * multi-aggregate pass over just `cols` — or supplied via
    * `ndvHints` (e.g. the D231 [[graft.sink.MetadataAgg.ndvEstimate]]
    * sidecar estimate: metadata-priced, zero scan). Hinted NDVs are
    * ESTIMATES, so their prunes apply `slack` (default 1.25 ≫ the KMV
    * error at battery k) — an estimate must never prune a true
    * dependency; hinted columns also need a `nullFreeHints` entry to
    * act as determinant-side pruners (null-freeness is schema
    * knowledge — NOT NULL contracts, D197 checks — not derivable from
    * a sketch). Returns [[check]]'s verdict rows for the surviving
    * candidates (empty frame, same schema, when nothing survives). */
  def mine(df: DataFrame, cols: Seq[String],
      ndvHints: Map[String, Double] = Map.empty,
      nullFreeHints: Set[String] = Set.empty,
      slack: Double = 1.25): DataFrame = {
    require(cols.size >= 2, "mining needs at least two columns")
    require(slack >= 1.0, s"slack=$slack would prune true dependencies")
    val unhinted = cols.filterNot(ndvHints.contains)
    val measured: Map[String, (Long, Long)] =
      if (unhinted.isEmpty) Map.empty
      else {
        val aggs = unhinted.flatMap(c => Seq(
          count_distinct(col(c)).as(s"__ndv_$c"),
          coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
            .as(s"__nul_$c")))
        val r = df.agg(aggs.head, aggs.tail: _*).head()
        unhinted.map(c => c -> (r.getAs[Long](s"__ndv_$c"),
          r.getAs[Long](s"__nul_$c"))).toMap
      }
    val ndv: Map[String, Double] =
      ndvHints ++ measured.map { case (c, (n, _)) => c -> n.toDouble }
    val nullFree: Set[String] = nullFreeHints ++
      measured.collect { case (c, (_, 0L)) => c }
    val estimated = ndvHints.keySet
    val survivors = for {
      a <- cols; b <- cols if a != b
      s = if (estimated(a) || estimated(b)) slack else 1.0
      if !nullFree(a) || ndv(b) <= ndv(a) * s
    } yield (a, b)
    // survivors is provably non-empty: pruning (a, b) needs
    // ndv(b) > ndv(a)·s with s ≥ 1, which makes the reverse pair
    // unprunable — check()'s nonEmpty contract always holds
    check(df, survivors)
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
