package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The two safety properties the D103/D104 designs rest on:
  * a guard that never triggers is a plain join, and incremental rollup
  * maintenance equals a from-scratch rebuild whatever the batching. */
class GuardRollupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cappedJoin ≡ plain inner join when no key offends") {
    val l = Seq((1, "a1"), (1, "a2"), (2, "b")).toDF("k", "lv")
    val r = Seq((1, 10), (2, 20), (2, 21)).toDF("k", "rv")
    val guarded = JoinGuard.cappedJoin(l, r, "k", maxProduct = 100,
      capEach = 5, Seq(col("lv")), Seq(col("rv")))
    val plain = l.join(r, Seq("k"), "inner")
    assert(guarded.count() == plain.count())
    assert(guarded.exceptAll(plain).isEmpty && plain.exceptAll(guarded).isEmpty)
  }

  test("cappedJoin bounds a hot key and leaves cold keys exact") {
    val l = (1 to 50).map(i => (0, i)).toDF("k", "lv")
      .unionByName(Seq((1, 1), (1, 2)).toDF("k", "lv"))
    val r = (1 to 50).map(i => (0, i)).toDF("k", "rv")
      .unionByName(Seq((1, 9)).toDF("k", "rv"))
    val guarded = JoinGuard.cappedJoin(l, r, "k", maxProduct = 100,
      capEach = 3, Seq(col("lv")), Seq(col("rv")))
    val byKey = guarded.groupBy("k").count().as[(Int, Long)].collect().toMap
    assert(byKey(0) == 9L) // 3 × 3 capped pairs, deterministic smallest
    assert(byKey(1) == 2L) // cold key joins exactly (2 × 1)
    // the capped rows are the tiebreak-smallest, not arbitrary
    assert(guarded.filter(col("k") === 0).agg(max("lv"), max("rv"))
      .as[(Int, Int)].head() == ((3, 3)))
  }

  test("rollup merge ≡ from-scratch rebuild across any batching") {
    val rows = (1 to 300).map(i => (s"t${i % 3}", i % 7, i / 10.0))
      .toDF("typ", "d", "v")
    val full = Rollup.build(rows, Seq("typ", "d"), "v")
    val merged = Rollup.merge(
      Rollup.merge(Rollup.build(rows.filter(col("d") < 2), Seq("typ", "d"),
        "v"), rows.filter(col("d") >= 2 && col("d") < 5), Seq("typ", "d"),
        "v"),
      rows.filter(col("d") >= 5), Seq("typ", "d"), "v")
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
  }
}
