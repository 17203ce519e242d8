package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Set-containment join (D115): asymmetry, threshold boundary, prefix
  * filter losslessness vs brute force. */
class ContainmentSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], t: Double = 0.8) =
    Dedup.containmentPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
        width = 3, threshold = t)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        math.rint(r.getDouble(2) * 1e4) / 1e4).toMap

  test("an excerpt is contained in its superset, not the reverse") {
    val out = run(Seq(
      (1L, "a b c d e"),                 // grams: abc bcd cde
      (2L, "x a b c d e y"),             // grams: xab abc bcd cde dey
      (3L, "totally different words entirely here")))
    assert(out == Map((1L, 2L) -> 1.0)) // 3/3 forward; 3/5 = 0.6 reverse
  }

  test("threshold is inclusive at the exact boundary") {
    // A has 5 grams, 4 shared -> containment exactly 0.8
    val a = "p q r s t u v" // grams: pqr qrs rst stu tuv
    val b = "p q r s t u zz" // shares pqr qrs rst stu (4), not tuv
    val out = run(Seq((1L, a), (2L, b)))
    assert(out((1L, 2L)) == 0.8)
    assert(out((2L, 1L)) == 0.8)
  }

  test("docs shorter than the gram width are excluded") {
    assert(run(Seq((1L, "a b"), (2L, "a b"))).isEmpty)
  }

  test("prefix filter is lossless vs brute-force on 60 random docs") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("red", "blue", "green", "fast", "slow", "cat",
      "dog", "sun", "moon", "sky")
    val docs = (1L to 60L).map { i =>
      i -> Seq.fill(5 + rnd.nextInt(10))(vocab(rnd.nextInt(10)))
        .mkString(" ")
    }
    def gramSet(s: String) =
      s.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    val brute = (for {
      (i, ti) <- docs; (j, tj) <- docs if i != j
      gi = gramSet(ti); gj = gramSet(tj)
      c = gi.intersect(gj).size.toDouble / gi.size if c >= 0.8
    } yield (i, j)).toSet
    assert(run(docs, t = 0.8).keySet == brute)
  }
}
