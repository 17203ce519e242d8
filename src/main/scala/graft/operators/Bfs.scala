package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unweighted shortest hop distances by synchronous frontier relaxation
  * (SURVEY §2D, D114): BFS from a source set over an undirected graph,
  * `rounds` fixed iterations — after round r every node within r hops
  * carries its exact distance.
  *
  * Each round is one edge⋈distance join (keyed on node ids) + one
  * min-distance aggregation; the state is EXACTLY one (node, dist) row
  * per reached node, and `localCheckpoint` cuts the loop lineage (the
  * [[PageRank]]/[[Communities]] discipline). Rounds are fixed so the
  * result is a pure function of (graph, sources, rounds) — replayable as
  * unrolled SQL; relaxation is monotone (distances only appear, never
  * grow), so rounds ≥ the graph's eccentricity give the true BFS. */
object Bfs {

  /** Hop distances from `sources` after `rounds` relaxations. Self-loops
    * dropped, graph symmetrized. Returns (node, dist); unreached nodes
    * are absent. */
  def hops(edges: DataFrame, aCol: String, bCol: String,
      sources: DataFrame, srcCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1 (got $rounds)")
    val e = edges.filter(col(aCol) =!= col(bCol))
    val und = e.select(col(aCol).as("a"), col(bCol).as("b"))
      .unionByName(e.select(col(bCol).as("a"), col(aCol).as("b")))
      .distinct()
      .localCheckpoint() // materialize once; every round references it
    var dist = sources.select(col(srcCol).as("node")).distinct()
      .withColumn("dist", lit(0L))
    (1 to rounds).foreach { _ =>
      dist = dist.unionByName(
          und.join(dist, und("a") === dist("node"))
            .select(col("b").as("node"), (col("dist") + 1).as("dist")))
        .groupBy("node").agg(min("dist").as("dist"))
        .localCheckpoint()
    }
    dist
  }
}
