package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by synchronous peeling (SURVEY §2D, D113): the
  * k-core of a graph is the maximal subgraph where every node has degree
  * ≥ k — the standard "dense part" extractor (spam rings in a link graph,
  * high-interaction cohorts in an event graph).
  *
  * Each peel round over the SURVIVING edge set: one map-side-combinable
  * degree aggregation (key-domain sized), one filter, two semi-joins to
  * drop edges incident to peeled nodes — all shuffles carry node ids and
  * counts, never payloads, and `localCheckpoint` cuts the loop lineage
  * (the [[PageRank]]/[[Communities]] discipline). Rounds are FIXED, not
  * run to convergence, so the result is a pure function of (graph, k,
  * rounds) and exactly replayable by unrolled SQL; peeling is monotone
  * (the surviving set only shrinks), so any rounds ≥ the peel depth give
  * the true k-core.
  */
object KCore {

  /** Run `rounds` peel iterations of the k-core on an undirected edge
    * list; self-loops are dropped, parallel edges collapse. Returns the
    * surviving (node, degree) with degrees over the surviving subgraph. */
  def peel(edges: DataFrame, aCol: String, bCol: String, k: Int,
      rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    require(rounds >= 1, s"rounds must be >= 1 (got $rounds)")
    val e = edges.filter(col(aCol) =!= col(bCol))
    var und = e.select(col(aCol).as("a"), col(bCol).as("b"))
      .unionByName(e.select(col(bCol).as("a"), col(aCol).as("b")))
      .distinct()
      // materialize once: round 1 references the edge set twice (degree
      // agg + semi-joins) and would otherwise re-run the build per use
      .localCheckpoint()
    (1 to rounds).foreach { _ =>
      val keep = und.groupBy("a").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select("a")
      und = und
        .join(keep, Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("a", "b"), Seq("b"), "left_semi")
        .select("a", "b")
        .localCheckpoint()
    }
    und.groupBy(col("a").as("node")).agg(count(lit(1)).as("degree"))
  }
}
