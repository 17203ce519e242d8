package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** D233 — FD/key verification: exact violation counts, SQL key-null
  * semantics (null determinants skipped, null dependents break the
  * dependency), and the key check's non-null + uniqueness conjunction. */
class FuncDepsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("A→B verification: holds, violated with exact counts, null " +
    "determinants skipped, a null dependent breaks the dependency") {
    val df = Seq(
      (Some(1), Some("x")), (Some(1), Some("x")), // repeat, one image
      (Some(2), Some("y")), (Some(2), Some("z")), // 2 images: violation
      (Some(3), None),      (Some(3), Some("w")), // null+value: violation
      (None, Some("q"))                           // null det: skipped
    ).toDF("a", "b")
    val r = FuncDeps.check(df, Seq(("a", "b")))
      .as[(String, String, Long, Long, Boolean)].head()
    assert(r == ("a", "b", 3L, 2L, false), s"got $r")
    val ok = FuncDeps.check(df.filter(col("a") === 1), Seq(("a", "b")))
      .as[(String, String, Long, Long, Boolean)].head()
    assert(ok == ("a", "b", 1L, 0L, true))
  }

  test("keyCheck: unique+non-null is a key; a repeat or a null " +
    "disqualifies") {
    val df = Seq((Some(1), 10, Some(5)), (Some(2), 10, None),
      (Some(3), 30, Some(7))).toDF("u", "rep", "withnull")
    val m = FuncDeps.keyCheck(df, Seq("u", "rep", "withnull"))
      .as[(String, Long, Boolean)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(m == Map("u" -> true, "rep" -> false, "withnull" -> false))
  }
}
