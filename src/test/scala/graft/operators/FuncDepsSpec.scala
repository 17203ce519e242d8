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

  test("mine (D235): NDV-pruned discovery equals the exhaustive check, " +
    "a nulled determinant is exempt from pruning, hints prune with " +
    "slack, and pruning a pair leaves its reverse unprunable") {
    // k: key (ndv 6); g: 3 groups, g→flag holds; flag: 2 values,
    // flag→g cannot hold (ndv 3 > 2 → pruned); n: HAS a null and only
    // 2 distinct values, but n→k must not be pruned despite
    // ndv(k) > ndv(n) (null rows hide k values from the dependency)
    val df = Seq(
      (1L, "a", "x", Some("p")), (2L, "a", "x", Some("p")),
      (3L, "b", "x", Some("q")), (4L, "b", "x", None),
      (5L, "c", "y", Some("q")), (6L, "c", "y", Some("q"))
    ).toDF("k", "g", "flag", "n")
    val cols = Seq("k", "g", "flag", "n")
    val mined = FuncDeps.mine(df, cols)
    val survivors = mined.select("det", "dep").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // pruned: every pair refuted by the NDV rule on null-free dets
    assert(!survivors.contains(("flag", "g")) &&
      !survivors.contains(("flag", "k")) &&
      !survivors.contains(("g", "k")),
      s"ndv(B) > ndv(A) with null-free A must prune (got $survivors)")
    // n has a null: (n, k) must SURVIVE to verification
    assert(survivors.contains(("n", "k")))
    // held set equals the exhaustive scan's
    val all = for { a <- cols; b <- cols if a != b } yield (a, b)
    val exhaustive = FuncDeps.check(df, all).filter(col("holds"))
      .select("det", "dep").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val held = mined.filter(col("holds")).select("det", "dep").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(held == exhaustive,
      s"pruned-then-verified must equal exhaustive ($held vs $exhaustive)")
    // hinted estimate inside slack keeps the same verdicts
    val hinted = FuncDeps.mine(df, cols,
      ndvHints = Map("g" -> 3.3), nullFreeHints = Set("g"))
      .filter(col("holds")).select("det", "dep").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(hinted == exhaustive)
    // pruning one direction leaves the reverse unprunable — survivors
    // can never be empty, so check()'s nonEmpty contract always holds
    val two = Seq((1L, "a"), (2L, "a")).toDF("u", "c")
    val rev = FuncDeps.mine(two, Seq("c", "u"))
      .select("det", "dep").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(rev == Set(("u", "c")),
      s"c->u prunes (ndv 2 > 1), u->c must survive (got $rev)")
  }
}
