package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** D178 — keyed table compare: classification, per-column blame,
  * NULL-safe value comparison, NULL keys match each other. */
class TableDiffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("classification + per-column blame + null-safe semantics") {
    val left: Seq[(java.lang.Long, String, java.lang.Double)] = Seq(
      (1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", null),
      (null, "nk", 9.0), (5L, "gone", 5.0))
    val right: Seq[(java.lang.Long, String, java.lang.Double)] = Seq(
      (1L, "a", 1.0),        // same
      (2L, "B", 2.0),        // v changed
      (3L, "c", 3.5),        // null -> value IS a change
      (null, "nk", 9.0),     // null keys match each other
      (6L, "new", 6.0))      // added
    val l = left.toDF("k", "v", "x")
    val r = right.toDF("k", "v", "x")
    val rows = TableDiff.rows(l, r, Seq("k")).collect()
      .map(row => Option(row.get(0)).map(_.toString).getOrElse("null") ->
        ((row.getString(1), row.getSeq[String](2).toSet))).toMap
    assert(rows("1") == ("same", Set.empty[String]))
    assert(rows("2") == ("changed", Set("v")))
    assert(rows("3") == ("changed", Set("x")),
      "NULL -> value must count as a change")
    assert(rows("null") == ("same", Set.empty[String]),
      "NULL keys must match each other (null-safe join)")
    assert(rows("5") == ("removed", Set.empty[String]))
    assert(rows("6") == ("added", Set.empty[String]))
    val summary = TableDiff.summary(l, r, Seq("k")).collect()
      .map(row => row.getString(0) -> row.getLong(1)).toMap
    assert(summary == Map("n_same" -> 2L, "n_changed" -> 2L,
      "n_removed" -> 1L, "n_added" -> 1L, "col:v" -> 1L, "col:x" -> 1L))
  }

  test("schema mismatch is rejected eagerly") {
    intercept[IllegalArgumentException] {
      TableDiff.rows(Seq((1, 2)).toDF("k", "a"),
        Seq((1, 2)).toDF("k", "b"), Seq("k"))
    }
  }
}
