package graft.operators

import org.apache.spark.sql.DataFrame

/** Incremental JOIN-view maintenance (SURVEY §2D, D126) — the join twin of
  * D104's rollup maintenance: a materialized equi-join view V = A ⋈ B is
  * kept current under insert-only delta batches WITHOUT ever recomputing
  * A' ⋈ B'.
  *
  * The classic delta rule: with A' = A ∪ ΔA and B' = B ∪ ΔB,
  *
  *   ΔV = ΔA ⋈ B'  ∪  A ⋈ ΔB
  *
  * Every new joined pair lands exactly once — (ΔA, B) and (ΔA, ΔB) pairs
  * in the first term, (A, ΔB) pairs in the second; putting the OLD left
  * base in the second term is what prevents the (ΔA, ΔB) double count.
  *
  * Cost is O(ΔA ⋈ B') + O(A ⋈ ΔB), never O(A' ⋈ B'). At 100 TB the two
  * base-side joins are the whole story, and the sink machinery this repo
  * already owns removes their shuffles/scans: store A and B BUCKETED on
  * the join key (`StageWriter.writeBucketed` — zero exchange on either
  * delta join, proven in BucketingSpec) or range/bloom-prune the stored
  * base to the delta's key set (`Layout.prunedRead`/`bloomPrunedRead` —
  * a delta touching 0.1% of keys reads ~0.1% of base files). The view
  * itself appends — no rewrite.
  */
object JoinView {

  /** The view rows a delta batch ADDS: `aOld`/`bOld` are the pre-batch
    * bases, `dA`/`dB` the batch's inserts (either may be empty). Append
    * the result to the stored view to complete the maintenance step. */
  def delta(aOld: DataFrame, dA: DataFrame, bOld: DataFrame, dB: DataFrame,
      keys: Seq[String]): DataFrame =
    dA.join(bOld.unionByName(dB), keys)
      .unionByName(aOld.join(dB, keys))
}
