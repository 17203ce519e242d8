package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted label-propagation community detection (SURVEY §2D, D108) —
  * the deterministic SYNCHRONOUS variant: every round, every node adopts
  * the label carrying the maximum total edge weight among its neighbors,
  * ties broken by the SMALLEST label. Classic asynchronous LPA is
  * order-dependent (useless under an oracle); synchronous + total-order
  * tiebreak makes the result a pure function of the graph.
  *
  * Scale shape mirrors [[PageRank]]: the 100 TB work is building the
  * aggregated edge list (one star-join + one map-side-combinable count);
  * each round is then one edge⋈label join + one (node, label) aggregation
  * + one per-node rank window on the AGGREGATED graph, with
  * localCheckpoint cutting the loop lineage. Rounds are fixed (community
  * structure on a weighted graph stabilizes in a few), not run to an
  * order-dependent convergence. */
object Communities {

  /** Run `rounds` of synchronous weighted LPA over an aggregated edge list
    * (srcCol, dstCol, wCol). Self-loops are dropped and the graph is
    * symmetrized. Returns (node, community). */
  def lpa(edges: DataFrame, srcCol: String, dstCol: String, wCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1 (got $rounds)")
    val e = edges.filter(col(srcCol) =!= col(dstCol))
    val und = e.select(col(srcCol).as("a"), col(dstCol).as("b"),
        col(wCol).as("wt"))
      .unionByName(e.select(col(dstCol).as("a"), col(srcCol).as("b"),
        col(wCol).as("wt")))
      .groupBy("a", "b").agg(sum("wt").as("wt"))
      // materialize the aggregated graph ONCE: every round references it,
      // and without this the (possibly 100 TB) edge-build subtree re-runs
      // per round (PageRank.scala:44 discipline)
      .localCheckpoint()
    var labels = und.select(col("a").as("node")).distinct()
      .withColumn("lbl", col("node"))
    val rankW = Window.partitionBy("a")
      .orderBy(col("vw").desc, col("lbl").asc)
    (1 to rounds).foreach { _ =>
      labels = und.join(labels, und("b") === labels("node"))
        .groupBy(col("a"), col("lbl")).agg(sum("wt").as("vw"))
        .withColumn("rn", row_number().over(rankW))
        .filter(col("rn") === 1)
        .select(col("a").as("node"), col("lbl"))
        .localCheckpoint() // cut the per-round lineage (PageRank discipline)
    }
    labels.select(col("node"), col("lbl").as("community"))
  }
}
