package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** LPA sanity on a known structure: two dense triangles joined by one
  * weak bridge must resolve into two communities labeled by each side's
  * minimum node. */
class CommunitiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("barbell graph splits into its two triangles") {
    val edges = Seq(
      // triangle 1 (heavy)
      ("a", "b", 10L), ("b", "c", 10L), ("a", "c", 10L),
      // triangle 2 (heavy)
      ("x", "y", 10L), ("y", "z", 10L), ("x", "z", 10L),
      // weak bridge + a self-loop that must be ignored
      ("c", "x", 1L), ("a", "a", 99L))
      .toDF("src", "dst", "w")
    val out = Communities.lpa(edges, "src", "dst", "w", rounds = 3)
      .as[(String, String)].collect().toMap
    assert(out.keySet == Set("a", "b", "c", "x", "y", "z"))
    assert(Set(out("a"), out("b"), out("c")).size == 1)
    assert(Set(out("x"), out("y"), out("z")).size == 1)
    assert(out("a") != out("x"), s"bridge merged the triangles: $out")
  }
}
