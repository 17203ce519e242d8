package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed fact keys — the join-side twin of the
  * salted two-phase aggregation (`q_salted_agg`), for the case AQE's
  * skew-join split cannot cover: a dim too large to broadcast joined on a
  * key whose hot values concentrate the fact shuffle onto a few reducers.
  *
  * Mechanics: every fact row gets a deterministic salt in [0, buckets)
  * derived from a caller-chosen high-cardinality column (xxhash64 — the
  * salt only needs spread, not portability); the dim side is replicated
  * `buckets` times with an exploded sequence so each (key, salt) pair
  * matches exactly one dim replica. The fact exchange then spreads each
  * hot key over `buckets` reducers instead of one. Result ≡ the plain
  * inner equi-join for ANY salt assignment — salting changes parallelism,
  * never semantics. Cost: the dim shuffle grows ×buckets (choose buckets
  * ≈ hot-key excess, not hundreds).
  *
  * Reference has no analogue (its joins are pushed to the source DB); this
  * is a §2D scale operator beside BloomPrune.
  */
object SkewSalt {

  /** `fact ⋈ dim` on `factKey = dimKey`, with the fact side salted by
    * `saltFrom` (a fact column with per-row variety, e.g. its primary
    * key). Returns the plain inner-join result. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, saltFrom: Column, buckets: Int): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2 (got $buckets)")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(saltFrom), lit(buckets.toLong)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    salted
      .join(replicated,
        salted(factKey) === replicated(dimKey) &&
          salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
