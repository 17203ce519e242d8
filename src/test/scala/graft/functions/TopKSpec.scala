package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Bounded-heap grouped top-k (D112): determinism, tie-break, merge and
  * partitioning invariance. */
class TopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g").agg(TopK.topk(col("id"), col("v"), k).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("pos"), col("col.id"), col("col.v"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet

  test("keeps the k largest by (v desc, id asc), best first") {
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 5.0), ("a", 3L, 3.0),
      ("a", 4L, 4.0), ("b", 5L, 9.0)).toDF("g", "id", "v")
    assert(run(df, 2) == Set(("a", 0, 2L, 5.0), ("a", 1, 4L, 4.0),
      ("b", 0, 5L, 9.0)))
  }

  test("ties on v resolve to the smaller id — the window-rank order") {
    val df = Seq(("a", 9L, 7.0), ("a", 3L, 7.0), ("a", 5L, 7.0))
      .toDF("g", "id", "v")
    assert(run(df, 2) == Set(("a", 0, 3L, 7.0), ("a", 1, 5L, 7.0)))
  }

  test("group smaller than k returns the whole group, ranked") {
    val df = Seq(("a", 1L, 2.0), ("a", 2L, 1.0)).toDF("g", "id", "v")
    assert(run(df, 10) == Set(("a", 0, 1L, 2.0), ("a", 1, 2L, 1.0)))
  }

  test("partitioning-invariant: 1 vs 13 partitions agree with the " +
    "window-rank form on 5000 rows") {
    val base = (1 to 5000).map { i =>
      (s"g${i % 7}", i.toLong, (i * 2654435761L % 997).toDouble)
    }.toDF("g", "id", "v")
    val expected = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
      base.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select(col("g"), (col("rn") - 1).as("pos"), col("id"), col("v"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).toSet
    }
    assert(run(base.repartition(1), 5) == expected)
    assert(run(base.repartition(13, col("id")), 5) == expected)
  }
}
