package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** AssocRules.frequentPairs — Apriori prune, cap determinism, metrics. */
class AssocRulesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mine(rows: Seq[(Long, Long)], minItem: Long, minPair: Long,
      cap: Int) =
    AssocRules.frequentPairs(rows.toDF("b", "i"), "b", "i",
        minItem, minPair, cap)
      .select("item_a", "item_b", "supp_a", "supp_b", "supp_ab",
        "confidence", "lift")
      .as[(Long, Long, Long, Long, Long, Double, Double)]
      .collect().sortBy(r => (r._1, r._2)).toSeq

  test("pair support, confidence and lift on a hand-checked basket set") {
    // 4 baskets; {1,2} co-occur in 2, item 1 in 3, item 2 in 2, item 3 in 1
    val tx = Seq(1L -> 1L, 1L -> 2L, 2L -> 1L, 2L -> 2L, 3L -> 1L,
      3L -> 3L, 4L -> 4L)
    val out = mine(tx, minItem = 2, minPair = 2, cap = 10)
    assert(out == Seq((1L, 2L, 3L, 2L, 2L, 2.0 / 3.0, (2.0 * 4) / (3 * 2))))
  }

  test("Apriori prune: a pair of infrequent items never reaches the join") {
    // items 5,6 co-occur twice but each has support 2 < minItem=3
    val tx = Seq(1L -> 5L, 1L -> 6L, 2L -> 5L, 2L -> 6L)
    assert(mine(tx, minItem = 3, minPair = 1, cap = 10).isEmpty)
  }

  test("duplicate incidences collapse before support counting") {
    val tx = Seq(1L -> 1L, 1L -> 1L, 1L -> 2L, 2L -> 1L, 2L -> 2L)
    val out = mine(tx, minItem = 1, minPair = 1, cap = 10)
    assert(out.map(r => (r._1, r._2, r._5)) == Seq((1L, 2L, 2L)))
    assert(out.head._3 == 2L) // supp(1) = 2 baskets, not 3 rows
  }

  test("per-basket cap keeps the smallest item ids deterministically") {
    // one basket of 5 frequent items, cap 3 → pairs only among {1,2,3}
    val tx = (1L to 5L).map(i => 1L -> i) ++
      (1L to 5L).map(i => 2L -> i) // second basket makes them all frequent
    val out = mine(tx, minItem = 2, minPair = 1, cap = 3)
    assert(out.map(r => (r._1, r._2)).toSet ==
      Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(out.forall(_._5 == 2L)) // both baskets kept the same 3 items
  }
}
