package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Bounded-heap grouped bottom-k (TopK/D112 flipped ascending, exact
  * long keys): determinism, tie-break, merge and partitioning
  * invariance, and exactness beyond Double's 2^53 mantissa. */
class BottomKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g").agg(BottomK.bottomk(col("id"), col("v"), k).as("bot"))
      .select(col("g"), posexplode(col("bot")))
      .select(col("g"), col("pos"), col("col.id"), col("col.v"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet

  test("keeps the k smallest by (v asc, id asc), best first") {
    val df = Seq(("a", 1L, 1L), ("a", 2L, 5L), ("a", 3L, 3L),
      ("a", 4L, 4L), ("b", 5L, 9L)).toDF("g", "id", "v")
    assert(run(df, 2) == Set(("a", 0, 1L, 1L), ("a", 1, 3L, 3L),
      ("b", 0, 5L, 9L)))
  }

  test("ties on v resolve to the smaller id — the window-rank order") {
    val df = Seq(("a", 9L, 7L), ("a", 3L, 7L), ("a", 5L, 7L))
      .toDF("g", "id", "v")
    assert(run(df, 2) == Set(("a", 0, 3L, 7L), ("a", 1, 5L, 7L)))
  }

  test("group smaller than k returns the whole group, ranked") {
    val df = Seq(("a", 1L, 1L), ("a", 2L, 2L)).toDF("g", "id", "v")
    assert(run(df, 10) == Set(("a", 0, 1L, 1L), ("a", 1, 2L, 2L)))
  }

  test("60-bit keys stay exact: values adjacent beyond Double's 2^53 " +
    "mantissa order correctly (the TopK-with-negation trap)") {
    // (1<<60)+1 and (1<<60)+2 collapse to the SAME Double
    val big = 1L << 60
    val df = Seq(("a", 1L, big + 2L), ("a", 2L, big + 1L))
      .toDF("g", "id", "v")
    assert(run(df, 1) == Set(("a", 0, 2L, big + 1L)),
      "the smaller 60-bit key must win even where Double cannot tell")
  }

  test("partitioning-invariant: 1 vs 13 partitions agree with the " +
    "window-rank form on 5000 rows") {
    val base = (1 to 5000).map { i =>
      (s"g${i % 7}", i.toLong, i * 2654435761L % 997)
    }.toDF("g", "id", "v")
    val expected = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("g").orderBy(col("v").asc, col("id"))
      base.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select(col("g"), (col("rn") - 1).as("pos"), col("id"), col("v"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
          r.getLong(3))).toSet
    }
    assert(run(base.repartition(1), 5) == expected)
    assert(run(base.repartition(13, col("id")), 5) == expected)
  }
}
