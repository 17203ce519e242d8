package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Weighted PageRank (Brin & Page — public algorithm) over an aggregated
  * edge list, a fixed number of power iterations.
  *
  * Scale shape: the EXPENSIVE part of graph analytics over a 100 TB fact
  * table is building the edge list (map-side-combinable groupBy the caller
  * runs once); the iterations here then operate on the aggregated graph.
  * Each iteration is two hash joins keyed on `src` plus one aggregation
  * keyed on `dst` — all three hash-partition on node ids, so a big graph
  * co-partitions across iterations and a small one (like the 25-node trade
  * network in the gate query) collapses to broadcasts under AQE. For deep
  * iteration counts callers should localCheckpoint every ~10 rounds to cut
  * the growing lineage (the same discipline as the connected-components
  * loop in [[graft.llm.Dedup]]); the gate runs 3 rounds, where plain plan
  * nesting is cheaper.
  *
  * Determinism: ranks round to `roundDigits` decimals each iteration and
  * per-edge contributions round to 8 decimals and sum as EXACT decimals,
  * so the distributed summation order cannot perturb a rank and a
  * DuckDB oracle replays the whole power iteration bit-for-bit. Dangling
  * nodes (no out-edges) leak their rank mass — the standard simplification,
  * mirrored by the oracle. Returns (node, r) with r rounded.
  */
object PageRank {

  def run(edges: DataFrame, srcCol: String, dstCol: String, wCol: String,
      iters: Int, damping: Double = 0.85, roundDigits: Int = 6): DataFrame = {
    // Decimal subtraction: the double expression 1 - 0.85 evaluates to
    // 0.15000000000000002 (1 ulp above the literal 0.15 an oracle writes);
    // going through exact decimals lands on the same double as `0.15`.
    val teleport = (BigDecimal(1) - BigDecimal(damping)).toDouble
    // Materialize the aggregated edge list ONCE: every iteration (and the
    // outw/nodes/n derivations) re-reads it, and without the checkpoint
    // each re-read would re-execute the caller's full edge build — for the
    // gate query that is a 5-way star join over lineitem, re-run ~6 times.
    // At cluster scale this is "persist the graph, iterate on it".
    val e = edges.groupBy(col(srcCol).as("src"), col(dstCol).as("dst"))
      .agg(sum(col(wCol)).as("w"))
      .localCheckpoint()
    val outw = e.groupBy("src").agg(sum("w").as("out_w"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct()
    val n = nodes.agg(count(lit(1)).as("n_nodes"))
    var r = nodes.crossJoin(broadcast(n))
      .select(col("node"),
        round(lit(1.0) / col("n_nodes"), roundDigits).as("r"),
        col("n_nodes"))
    for (_ <- 1 to iters) {
      val contrib = e.join(outw, "src")
        .join(r.select(col("node").as("src"), col("r")), "src")
        .select(col("dst"),
          round(col("r") * col("w") / col("out_w"), 8)
            .cast(DecimalType(28, 8)).as("c8"))
      val inSum = contrib.groupBy("dst").agg(sum("c8").as("insum"))
      r = r.select(col("node"), col("n_nodes"))
        .join(inSum.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          round(lit(teleport) / col("n_nodes") + lit(damping) *
            coalesce(col("insum").cast(DoubleType), lit(0.0)),
            roundDigits).as("r"),
          col("n_nodes"))
    }
    r.select(col("node"), col("r"))
  }
}
