package graft.sink

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The two idempotence legs the exactly-once JDBC sink rests on: a
  * REPLAYED batch id publishes nothing (crash between checkpoint commit
  * and the next batch re-delivers the same id), and a LATER batch
  * carrying the same keys upserts instead of duplicating. */
class JdbcExactlyOnceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val url = "jdbc:derby:memory:xoncespec;create=true"
  private def props = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("replayed batch id is a no-op; same keys in a NEW batch upsert") {
    val tbl = "spec_sink"
    val b0 = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    JdbcExactlyOnce.upsertBatch(url, tbl, b0, 0L, "k", "v")
    // replay of batch 0 with DIFFERENT rows must publish nothing — the
    // log, not the payload, decides
    JdbcExactlyOnce.upsertBatch(url, tbl,
      Seq((1L, 99.0), (3L, 3.0)).toDF("k", "v"), 0L, "k", "v")
    val after0 = spark.read.jdbc(url, tbl, props)
      .as[(Long, Double)].collect().toMap
    assert(after0 == Map(1L -> 1.0, 2L -> 2.0))
    // a NEW batch with overlapping keys replaces them, inserts the rest
    JdbcExactlyOnce.upsertBatch(url, tbl,
      Seq((2L, 20.0), (3L, 3.0)).toDF("k", "v"), 1L, "k", "v")
    val after1 = spark.read.jdbc(url, tbl, props)
      .as[(Long, Double)].collect().toMap
    assert(after1 == Map(1L -> 1.0, 2L -> 20.0, 3L -> 3.0))
    // staging is drained after each publish
    assert(spark.read.jdbc(url, s"${tbl}_stg", props).count() == 0)
  }
}
