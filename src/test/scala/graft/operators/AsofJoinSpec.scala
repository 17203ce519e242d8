package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** As-of join semantics: latest right ≤ left, inclusive at equality,
  * null when no prior right row, per-key isolation. */
class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("picks latest right <= left, inclusive, per key, null if none") {
    val left = Seq((1L, "u1", 100L), (2L, "u1", 205L), (3L, "u2", 50L),
      (4L, "u2", 300L)).toDF("event_id", "k", "t")
    val right = Seq((10L, "u1", 100L), (11L, "u1", 200L), (12L, "u2", 60L))
      .toDF("rid", "k", "t")
    val got = AsofJoin.asofJoin(left, right, Seq("k"), "t", "t", Seq("rid"))
      .select("event_id", "asof_rid").as[(Long, Option[Long])]
      .collect().toMap
    assert(got == Map(
      1L -> Some(10L), // equality is inclusive
      2L -> Some(11L), // latest prior
      3L -> None,      // right row is later
      4L -> Some(12L)))
  }
}
