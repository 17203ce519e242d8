package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorted-neighborhood candidate generation (Hernández & Stolfo 1995 —
  * public record-linkage literature): sort records by a dirty key, pair
  * each record with its w nearest neighbors in the sort order. The
  * complement of equality BLOCKING (q_fuzzy's (brand, size) blocks):
  * blocking misses matches whose blocking key is itself dirty; the sort
  * neighborhood catches them because near-duplicate keys usually sort
  * adjacent.
  *
  * Distributed form (the single global sort the 1995 paper assumes is
  * the one shape this codebase bans): records bucket by an
  * ORDER-CONSISTENT coarse prefix of the sort key, rank inside each
  * bucket (bounded window), and candidates are
  *   - intra-bucket: rank distance ≤ w (equi-join on bucket + filter);
  *   - boundary: each bucket's last w ranks × the NEXT non-empty
  *     bucket's first w ranks — a superset of the global-window pairs
  *     that straddle the boundary (extra pairs only widen the candidate
  *     set; verification decides).
  * The bucket index chain comes from one window over the BUCKET table
  * (|buckets| rows — metadata-sized), broadcast back to the rows; no
  * window ever spans more than one bucket of records.
  */
object SortedNeighborhood {

  /** Candidate id pairs (id1 < id2 by rank order) with both sort keys,
    * ready for a verification predicate. `bucket` must be an
    * order-consistent function of `sortKey` (e.g. a prefix). */
  def candidates(df: DataFrame, idCol: String, sortKey: Column,
      bucket: Column, w: Int): DataFrame = {
    require(w >= 1, s"window w must be >= 1 (got $w)")
    val base = df.select(col(idCol).as("id"), sortKey.as("k"),
      bucket.as("b"))
    val wRank = Window.partitionBy("b").orderBy(col("k"), col("id"))
    val ranked = base.withColumn("r", row_number().over(wRank))
    // bucket chain: (bucket, size, index) — metadata-sized window
    val wChain = Window.orderBy("b")
    val chain = ranked.groupBy("b").agg(count(lit(1)).as("n"))
      .withColumn("bi", row_number().over(wChain))
    val rows = ranked.join(broadcast(chain), "b")
    val a = rows.select(col("id").as("id1"), col("k").as("k1"),
      col("b").as("b1"), col("r").as("r1"), col("n").as("n1"),
      col("bi").as("bi1"))
    val bb = rows.select(col("id").as("id2"), col("k").as("k2"),
      col("b").as("b2"), col("r").as("r2"), col("bi").as("bi2"))
    // EQUI-join on (bucket, rank), not bucket + a late rank filter: with
    // few buckets the latter degenerates to a per-bucket cross product
    // (measured 40 s on 20k rows / 8 buckets); exploding each row into
    // its w probe ranks keeps the join key selective — O(n·w) pairs by
    // construction, a hash join at any bucket granularity
    val intra = a
      .select(col("id1"), col("k1"), col("b1"),
        explode(sequence(col("r1") + 1, col("r1") + w)).as("rp"))
      .join(bb, col("b1") === col("b2") && col("rp") === col("r2"))
      .select(col("id1"), col("id2"), col("k1"), col("k2"))
    val border = a.filter(col("r1") > col("n1") - w)
      .join(bb, col("bi2") === col("bi1") + 1 && col("r2") <= w)
      .select(col("id1"), col("id2"), col("k1"), col("k2"))
    intra.unionByName(border)
  }

  /** Candidates verified by levenshtein(k1, k2) <= maxDist — the full
    * sorted-neighborhood dedup pass. */
  def pairs(df: DataFrame, idCol: String, sortKey: Column, bucket: Column,
      w: Int, maxDist: Int): DataFrame =
    candidates(df, idCol, sortKey, bucket, w)
      .withColumn("dist", levenshtein(col("k1"), col("k2")))
      .filter(col("dist") <= maxDist)
      .select(col("id1"), col("id2"), col("dist"))
}
