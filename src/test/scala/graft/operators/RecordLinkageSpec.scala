package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import org.apache.spark.sql.functions.col

/** RecordLinkage.linkageWeights — weight arithmetic, blocking, u
  * estimation, null-safe agreement, cap. */
class RecordLinkageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def link(rows: Seq[(Long, String, String, String)], m: Double,
      minW: Double, cap: Int = 100) =
    RecordLinkage.linkageWeights(
      rows.toDF("id", "blk", "x", "y"), "id", "blk",
      Seq("x" -> col("x"), "y" -> col("y")), m, cap, minW)
      .select("id_a", "id_b", "ag_x", "ag_y", "weight")
      .as[(Long, Long, Boolean, Boolean, Double)]
      .collect().sortBy(r => (r._1, r._2)).toSeq

  test("weights are the exact likelihood-ratio product with data-driven u") {
    // one block of 3: ids 1,2 agree on both fields; 3 disagrees on both.
    // u_x: values (a,a,b) → agreeing pairs 2, total pairs 6 → u = 1/3
    val rows = Seq((1L, "B", "a", "p"), (2L, "B", "a", "p"),
      (3L, "B", "b", "q"))
    val out = link(rows, m = 0.9, minW = 0.0)
    assert(out.size == 3)
    val u = (1.0 * 2) / 6.0 // same for both fields by symmetry
    val agree = 0.9 / u
    val dis = (1.0 - 0.9) / (1.0 - u)
    val byPair = out.map(r => (r._1, r._2) -> r).toMap
    assert(byPair((1L, 2L))._5 == 1.0 * agree * agree)
    assert(byPair((1L, 3L))._5 == 1.0 * dis * dis)
    assert(byPair((1L, 2L))._3 && byPair((1L, 2L))._4)
    assert(!byPair((2L, 3L))._3 && !byPair((2L, 3L))._4)
  }

  test("pairs never cross blocks") {
    val rows = Seq((1L, "A", "a", "p"), (2L, "B", "a", "p"))
    assert(link(rows, 0.9, 0.0).isEmpty)
  }

  test("null fields agree null-safely (null <=> null is agreement)") {
    val rows: Seq[(Long, String, String, String)] =
      Seq((1L, "B", null, "p"), (2L, "B", null, "p"), (3L, "B", "b", "p"))
    val out = link(rows, 0.9, 0.0)
    val byPair = out.map(r => (r._1, r._2) -> r).toMap
    assert(byPair((1L, 2L))._3) // null vs null agrees
    assert(!byPair((1L, 3L))._3) // null vs "b" disagrees
  }

  test("per-block cap keeps the smallest ids and bounds the pair count") {
    val rows = (1L to 10L).map(i => (i, "B", s"v$i", "p"))
    val out = link(rows, 0.9, 0.0, cap = 4)
    assert(out.map(r => (r._1, r._2)).toSet ==
      (for (i <- 1L to 4L; j <- i + 1 to 4L) yield (i, j)).toSet)
  }

  test("minWeight filters low-scoring pairs") {
    val rows = Seq((1L, "B", "a", "p"), (2L, "B", "a", "p"),
      (3L, "B", "b", "q"))
    val out = link(rows, 0.9, minW = 2.0)
    assert(out.map(r => (r._1, r._2)) == Seq((1L, 2L)))
  }

  test("both 1-row stats joins are PLAN-GUARANTEED broadcasts: no " +
    "CartesianProduct, no shuffle feeding the stats side") {
    val rows = Seq((1L, "B", "a", "p"), (2L, "B", "a", "p"),
      (3L, "B", "b", "q"))
    val df = RecordLinkage.linkageWeights(
      rows.toDF("id", "blk", "x", "y"), "id", "blk",
      Seq("x" -> col("x"), "y" -> col("y")), 0.9, 100, 0.0)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "a 1-row cross join must never fall back to a cartesian shuffle:\n" +
        plan)
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "the explicit broadcast() hint must survive into the plan:\n" + plan)
  }
}
