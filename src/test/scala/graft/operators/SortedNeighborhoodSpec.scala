package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** SortedNeighborhood — window pairing, the boundary arm, and the
  * motivating case equality blocking misses. */
class SortedNeighborhoodSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], w: Int, maxDist: Int) =
    SortedNeighborhood.pairs(rows.toDF("id", "name"), "id", col("name"),
        substring(col("name"), 1, 1), w, maxDist)
      .select("id1", "id2", "dist").as[(Long, Long, Int)]
      .collect().sortBy(r => (r._1, r._2)).toSeq

  test("rank-adjacent near-duplicates pair; distant ranks don't") {
    // bucket 'a': apple, apple!, axxxx, ayyyy — w=1 pairs only adjacent
    val out = run(Seq((1L, "apple"), (2L, "apple!"), (3L, "axxxx"),
      (4L, "ayyyy")), w = 1, maxDist = 2)
    // apple/apple! adjacent (dist 1); apple!/axxxx adjacent but dist 5;
    // axxxx/ayyyy adjacent but dist 5 — only the true pair survives
    assert(out == Seq((1L, 2L, 1)))
  }

  test("the boundary arm catches a pair straddling buckets — the match " +
    "a first-letter equality block would MISS") {
    // "azzzz" (bucket a, last rank) vs "bzzzz"-like "bzzzy" (bucket b,
    // first rank): different blocking keys, sort-adjacent globally
    val out = run(Seq((1L, "apple"), (2L, "azzzz"), (3L, "azzzy"),
      (10L, "banana")), w = 2, maxDist = 1)
    // azzzz/azzzy intra (dist 1); azzzy & azzzz are in bucket-a's tail,
    // banana in bucket-b's head — candidates generated, but dist > 1
    // filters banana; lower w on a bigger gap would drop candidates
    assert(out == Seq((2L, 3L, 1)) || out == Seq((3L, 2L, 1)))
    val out2 = run(Seq((1L, "aaaa"), (2L, "abbb"), (10L, "bbbb")),
      w = 1, maxDist = 1)
    // abbb (tail of 'a') × bbbb (head of 'b'): dist 1 — found ONLY via
    // the boundary arm
    assert(out2.contains((2L, 10L, 1)))
  }

  test("w >= 1 is enforced") {
    intercept[IllegalArgumentException](
      run(Seq((1L, "a")), w = 0, maxDist = 1))
  }
}
