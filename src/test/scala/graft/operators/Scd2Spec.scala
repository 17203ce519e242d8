package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** SCD2 invariants: build's intervals tile each key's timeline (every
  * valid_to equals the next valid_from, exactly one open interval per
  * key), and pointInTime agrees with a hand-computed interval lookup. */
class Scd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val changes = Seq(
    (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
    (2L, 15L, "x")).toDF("k", "t", "attr")

  test("build tiles the timeline with one open interval per key") {
    val iv = Scd2.build(changes, Seq("k"), "t", Seq("attr"))
      .as[(Long, Long, Option[Long], String)].collect().toSeq.sorted
    assert(iv == Seq(
      (1L, 10L, Some(20L), "a"), (1L, 20L, Some(30L), "b"),
      (1L, 30L, None, "c"), (2L, 15L, None, "x")))
  }

  test("pointInTime picks the version in effect (boundary = new version)") {
    val facts = Seq((1L, 5L), (1L, 10L), (1L, 25L), (1L, 30L), (2L, 99L))
      .toDF("k", "ft")
    val got = Scd2.pointInTime(facts, changes, Seq("k"), "ft", "t",
        Seq("attr"))
      .select("k", "ft", "asof_attr")
      .as[(Long, Long, Option[String])].collect().toSeq.sorted
    assert(got == Seq(
      (1L, 5L, None),           // before any version
      (1L, 10L, Some("a")),     // boundary: the change at t=10 applies
      (1L, 25L, Some("b")),
      (1L, 30L, Some("c")),     // boundary: the newest version
      (2L, 99L, Some("x"))))
  }

  import org.apache.spark.sql.functions.col

  private val tied = Seq(
    // three changes at t=20 for key 1: seq 7 must win (highest = last writer)
    (1L, 10L, "a", 1L), (1L, 20L, "b5", 5L), (1L, 20L, "b7", 7L),
    (1L, 20L, "b3", 3L), (1L, 30L, "c", 9L)).toDF("k", "t", "attr", "seq")

  test("same-timestamp ties resolve by the caller's tiebreak in BOTH " +
    "build and pointInTime — one interval per timestamp, same winner") {
    val tb = Seq(col("seq").desc)
    val iv = Scd2.build(tied, Seq("k"), "t", Seq("attr"), tb)
      .as[(Long, Long, Option[Long], String)].collect().toSeq.sorted
    assert(iv == Seq(
      (1L, 10L, Some(20L), "a"),
      (1L, 20L, Some(30L), "b7"), // the seq=7 writer, ONE interval
      (1L, 30L, None, "c")))
    val got = Scd2.pointInTime(Seq((1L, 20L), (1L, 25L)).toDF("k", "ft"),
        tied, Seq("k"), "ft", "t", Seq("attr"), tb)
      .select("k", "ft", "asof_attr")
      .as[(Long, Long, String)].collect().toSeq.sorted
    assert(got == Seq((1L, 20L, "b7"), (1L, 25L, "b7")))
  }

  test("late arrival is a no-op for a batch build: shuffled change order " +
    "yields the identical dimension") {
    val tb = Seq(col("seq").desc)
    val reversed = tied.orderBy(col("seq").asc, col("t").desc)
    val a = Scd2.build(tied, Seq("k"), "t", Seq("attr"), tb)
      .collect().map(_.toString).sorted.toSeq
    val b = Scd2.build(reversed, Seq("k"), "t", Seq("attr"), tb)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("applyChanges splices a late batch into history ≡ full rebuild; " +
    "untouched keys pass through; a colliding timestamp is replaced by " +
    "the new batch") {
    val base = Seq((1L, 10L, "a"), (1L, 30L, "c"), (2L, 15L, "x"),
      (3L, 5L, "p")).toDF("k", "t", "attr")
    // batch: key 1 gets a LATE middle version (t=20, splices between
    // 10 and 30) AND replaces t=30; key 3 untouched; key 4 is new
    val batch = Seq((1L, 20L, "b"), (1L, 30L, "C2"), (4L, 1L, "n"))
      .toDF("k", "t", "attr")
    val incr = Scd2.applyChanges(
        Scd2.build(base, Seq("k"), "t", Seq("attr")),
        batch, Seq("k"), "t", Seq("attr"))
      .as[(Long, Long, Option[Long], String)].collect().toSeq.sorted
    val full = Scd2.build(
        base.filter(!($"k" === 1L && $"t" === 30L)).unionByName(batch),
        Seq("k"), "t", Seq("attr"))
      .as[(Long, Long, Option[Long], String)].collect().toSeq.sorted
    assert(incr == full)
    assert(incr.contains((1L, 20L, Some(30L), "b")), "late splice missing")
    assert(incr.contains((1L, 30L, None, "C2")), "collision not replaced")
    assert(incr.contains((3L, 5L, None, "p")), "untouched key lost")
  }

  test("applyChanges with an empty batch is the identity") {
    val dim = Scd2.build(changes, Seq("k"), "t", Seq("attr"))
    val out = Scd2.applyChanges(dim, changes.limit(0), Seq("k"), "t",
      Seq("attr"))
    assert(out.collect().map(_.toString).sorted.toSeq ==
      dim.collect().map(_.toString).sorted.toSeq)
  }

  test("timeWeighted: overlap clamping, open-version clamp at winEnd, " +
    "zero-coverage keys absent, hand-computed weighted average") {
    // A: rate 10 on [0, 100), rate 20 on [100, open)
    // B: single version starting AFTER the window (zero coverage)
    val changes = Seq(
      ("A", 0L, 10.0), ("A", 100L, 20.0), ("B", 1000L, 5.0))
      .toDF("k", "ts", "rate")
    val dim = Scd2.build(changes, Seq("k"), "ts", Seq("rate"))
    // window [50, 150): A covers 10.0 over 50ns and 20.0 over 50ns
    val rows = Scd2.timeWeighted(dim, Seq("k"), "rate", 50L, 150L)
      .collect()
    assert(rows.length == 1, "zero-coverage B must be absent")
    val r = rows.head
    assert(r.getString(0) == "A")
    assert(r.getAs[Long]("covered_ns") == 100L)
    assert(r.getAs[Double]("twa") == 15.0)
    // window entirely inside one version
    val inner = Scd2.timeWeighted(dim, Seq("k"), "rate", 110L, 120L)
      .collect().head
    assert(inner.getAs[Long]("covered_ns") == 10L &&
      inner.getAs[Double]("twa") == 20.0)
  }
}
