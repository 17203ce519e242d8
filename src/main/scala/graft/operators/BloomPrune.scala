package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join pruning — the shuffle-avoidance pattern for
  * selective fact⋈dim joins at 100 TB.
  *
  * A selective dim-side predicate means most fact rows are dropped BY THE
  * JOIN — but a plain shuffle join still pays to shuffle all of them. A
  * Bloom filter built from the dim keys (a few MB regardless of fact size)
  * filters the fact BEFORE its exchange, so the shuffle carries only
  * probable matches. False positives are harmless: the equi-join that
  * follows removes them, so `prunedJoin(fact, dim)` ≡ `fact.join(dim)` for
  * any filter size — only the pruning EFFICIENCY varies.
  *
  * Spark ships this as the (internal, plan-injected) runtime filter
  * (`InjectRuntimeFilter`); we expose the same two Catalyst expressions —
  * `BloomFilterAggregate` (partial-aggregable: executors build per-partition
  * filters, merge = bitset OR) and `BloomFilterMightContain` (codegen'd
  * probe) — as registered SQL functions so the pruning can be declared
  * explicitly where the author KNOWS the dim side is selective, instead of
  * relying on the optimizer's size heuristics.
  *
  * Reference has no analogue (its joins are pushed to the source DB as SQL
  * text, `artifacts/aws-glue/code/raw/extract_data.py:1017-1085`); this is
  * a §2D beyond-reference scale operator.
  */
object BloomPrune {

  /** Register `graft_bloom_agg(xxhash64(k), est_items, num_bits)` and
    * `graft_might_contain(bloom, xxhash64(k))` on the session, enabling the
    * scalar-subquery form — one declarative plan, bloom build and probe in
    * the same job:
    *
    * {{{
    * SELECT * FROM fact
    * WHERE graft_might_contain(
    *   (SELECT graft_bloom_agg(xxhash64(k), 100000L, 800000L) FROM dim),
    *   xxhash64(fact.k))
    * }}}
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      (exprs: Seq[Expression]) =>
        new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_might_contain",
      (exprs: Seq[Expression]) => BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
  }

  /** Column-API form: `might_contain(bloomBytes, xxhash64(key))` — a
    * codegen'd probe against a driver-built (or scalar-subquery) filter.
    * Requires `register(spark)` on the owning session. */
  def mightContain(bloom: Column, key: Column): Column =
    call_function("graft_might_contain", bloom, xxhash64(key))

  /** Build a Bloom filter over `keyCol` of `dim` as ONE aggregated row.
    * The aggregation is partial-combined (each task ORs its local bitset),
    * so only `numBits/8` bytes per partition reach the final merge — never
    * the keys themselves. */
  def buildBloom(dim: DataFrame, keyCol: String, expectedItems: Long,
      numBits: Long): Array[Byte] = {
    register(dim.sparkSession)
    dim.agg(call_function("graft_bloom_agg", xxhash64(col(keyCol)),
        lit(expectedItems), lit(numBits)).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** `fact ⋈ dim` with the fact side pre-pruned by a Bloom filter of the dim
    * keys. Result is EXACTLY the inner equi-join (false positives are
    * removed by the join); the fact exchange carries only probable matches.
    *
    * The filter travels to executors as a literal in the plan (same
    * mechanics as a broadcast hash join's build side, but ~100× smaller:
    * `numBits/8` bytes for any dim cardinality). */
  def prunedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long = 1000000L,
      numBits: Long = 8000000L): DataFrame = {
    register(fact.sparkSession)
    val bloom = buildBloom(dim, dimKey, expectedItems, numBits)
    // Resolve keys against their OWNING frames — `col(...)` would be
    // ambiguous at analysis whenever fact and dim share the key name.
    fact.filter(mightContain(lit(bloom), fact(factKey)))
      .join(dim, fact(factKey) === dim(dimKey))
  }
}
