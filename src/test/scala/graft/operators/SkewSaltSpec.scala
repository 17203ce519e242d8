package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Salted join: result ≡ plain inner join, and a degenerate all-one-key
  * fact actually spreads over the salt space. */
class SkewSaltSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("equals the plain join on a skewed fact (hot key + organic tail)") {
    val fact = ((1 to 900).map(i => (i.toLong, "hot")) ++
      (901 to 1000).map(i => (i.toLong, s"k${i % 7}")))
      .toDF("row_id", "k")
    val dim = (Seq("hot") ++ (0 until 7).map(i => s"k$i"))
      .map(k => (k, s"label-$k")).toDF("dk", "label")
    val salted = SkewSalt
      .saltedJoin(fact, dim, "k", "dk", col("row_id"), buckets = 8)
      .select("row_id", "k", "label")
      .as[(Long, String, String)].collect().sorted.toSeq
    val plain = fact.join(dim, col("k") === col("dk"))
      .select("row_id", "k", "label")
      .as[(Long, String, String)].collect().sorted.toSeq
    assert(salted == plain && salted.size == 1000)
  }

  test("the hot key spreads across the full salt space") {
    val fact = (1 to 512).map(i => (i.toLong, "hot")).toDF("row_id", "k")
    val salts = fact.select(pmod(xxhash64(col("row_id")), lit(8L)).as("s"))
      .distinct().count()
    assert(salts == 8, "512 hot rows must occupy all 8 salt buckets")
  }

  test("refuses a degenerate bucket count") {
    val df = Seq((1L, "a")).toDF("row_id", "k")
    intercept[IllegalArgumentException] {
      SkewSalt.saltedJoin(df, df.select(col("k").as("dk")), "k", "dk",
        col("row_id"), buckets = 1)
    }
  }
}
