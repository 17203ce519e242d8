package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** D126 — incremental join-view maintenance: the delta rule adds every new
  * joined pair EXACTLY once (the ΔA⋈ΔB overlap is the classic double-count
  * trap), and maintenance ≡ rebuild for any batch split. */
class JoinViewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("delta-maintained view equals the from-scratch join; overlap pairs " +
      "appear exactly once") {
    val a0 = Seq((1L, "a1"), (2L, "a2")).toDF("k", "av")
    val dA = Seq((3L, "a3"), (4L, "a4")).toDF("k", "av")
    val b0 = Seq((1L, "b1"), (3L, "b3old")).toDF("k", "bv")
    // key 3 joins (dA, b0), key 4 joins (dA, dB) — the overlap term —
    // and key 2 joins (a0, dB)
    val dB = Seq((2L, "b2"), (4L, "b4")).toDF("k", "bv")
    val maintained = a0.join(b0, Seq("k"))
      .unionByName(JoinView.delta(a0, dA, b0, dB, Seq("k")))
      .as[(Long, String, String)].collect().sorted.toSeq
    val rebuilt = a0.unionByName(dA).join(b0.unionByName(dB), Seq("k"))
      .as[(Long, String, String)].collect().sorted.toSeq
    assert(maintained == rebuilt, s"$maintained vs $rebuilt")
    assert(maintained.count(_._1 == 4L) == 1,
      "the ΔA⋈ΔB pair must appear exactly once, not twice")
  }

  test("empty deltas add nothing; one-sided deltas use the right base") {
    val a0 = Seq((1L, "a")).toDF("k", "av")
    val b0 = Seq((1L, "b")).toDF("k", "bv")
    val none = a0.limit(0)
    val noneB = b0.limit(0)
    assert(JoinView.delta(a0, none, b0, noneB, Seq("k")).count() == 0)
    // right-only delta joins against the OLD left base
    val dB = Seq((1L, "b9")).toDF("k", "bv")
    val got = JoinView.delta(a0, none, b0, dB, Seq("k"))
      .as[(Long, String, String)].collect().toSeq
    assert(got == Seq((1L, "a", "b9")))
  }

  test("maintenance is split-invariant: two different batch orders land " +
      "on the same view") {
    val rows = (0L until 100L).map(i => (i % 10, s"a$i"))
    val brows = (0L until 60L).map(i => (i % 12, s"b$i"))
    def viewVia(splitA: Long => Boolean, splitB: Long => Boolean) = {
      val a0 = rows.filter(r => splitA(r._1)).toDF("k", "av")
      val dA = rows.filterNot(r => splitA(r._1)).toDF("k", "av")
      val b0 = brows.filter(r => splitB(r._1)).toDF("k", "bv")
      val dB = brows.filterNot(r => splitB(r._1)).toDF("k", "bv")
      a0.join(b0, Seq("k"))
        .unionByName(JoinView.delta(a0, dA, b0, dB, Seq("k")))
        .as[(Long, String, String)].collect().sorted.toSeq
    }
    assert(viewVia(_ < 5, _ < 6) == viewVia(_ % 2 == 0, _ % 3 == 0))
  }
}
