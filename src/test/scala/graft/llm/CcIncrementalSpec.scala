package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Incremental CC maintenance (D119): label-star contraction preserves
  * components, bridges merge to the global minimum, new nodes join. */
class CcIncrementalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def labelsOf(pairs: Seq[(Long, Long)]) =
    Dedup.connectedComponents(pairs.toDF("id1", "id2"))

  private def toMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a bridging pair merges two old components to the global minimum") {
    val old = labelsOf(Seq((1L, 2L), (10L, 11L)))
    val out = toMap(Dedup.ccIncremental(old, Seq((2L, 10L)).toDF("id1", "id2")))
    assert(out == Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L))
  }

  test("new nodes chain through old components; untouched components keep " +
    "their labels") {
    val old = labelsOf(Seq((1L, 2L), (10L, 11L)))
    val out = toMap(Dedup.ccIncremental(old,
      Seq((100L, 11L), (100L, 101L)).toDF("id1", "id2")))
    assert(out == Map(1L -> 1L, 2L -> 1L,
      10L -> 10L, 11L -> 10L, 100L -> 10L, 101L -> 10L))
  }

  test("stored singleton components (identity rows) survive maintenance " +
    "unless the new pairs absorb them") {
    // a persisted labeling that includes identity rows for unpaired docs
    val old = Seq((1L, 1L), (2L, 1L), (7L, 7L), (9L, 9L)).toDF("id", "cluster")
    val out = toMap(Dedup.ccIncremental(old, Seq((9L, 2L)).toDF("id1", "id2")))
    // 7 stays a singleton with its own label; 9 is absorbed into cluster 1
    assert(out == Map(1L -> 1L, 2L -> 1L, 7L -> 7L, 9L -> 1L))
  }

  test("incremental equals from-scratch on a random 300-edge graph") {
    val rnd = new scala.util.Random(11)
    val all = (1 to 300).map(_ =>
      (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    val (oldE, newE) = all.splitAt(200)
    val scratch = toMap(labelsOf(all))
    val incr = toMap(Dedup.ccIncremental(labelsOf(oldE),
      newE.toDF("id1", "id2")))
    assert(incr == scratch)
  }
}
