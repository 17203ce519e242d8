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

  test("crash BETWEEN stage and publish: staged rows present, log row " +
    "absent — the restart publishes exactly once and drains staging") {
    val tbl = "spec_crash"
    JdbcExactlyOnce.ensureTables(url, tbl)
    // simulate the crashed first attempt: batch 5 fully staged, never
    // published (no log row, no sink rows)
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val s = c.createStatement()
      try {
        s.executeUpdate(s"INSERT INTO ${tbl}_stg VALUES (5, 1, 10.0)")
        s.executeUpdate(s"INSERT INTO ${tbl}_stg VALUES (5, 2, 20.0)")
      } finally s.close()
    } finally c.close()
    // restart re-delivers the same batch: re-staging hits the duplicate
    // keys (swallowed), plus a row the crashed attempt never staged
    JdbcExactlyOnce.upsertBatch(url, tbl,
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v"), 5L, "k", "v")
    val sink = spark.read.jdbc(url, tbl, props)
      .as[(Long, Double)].collect().toMap
    assert(sink == Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
    assert(spark.read.jdbc(url, s"${tbl}_stg", props).count() == 0,
      "staging must drain in the publish transaction")
    // and a SECOND replay of the now-committed batch is a full no-op
    JdbcExactlyOnce.upsertBatch(url, tbl,
      Seq((1L, 999.0)).toDF("k", "v"), 5L, "k", "v")
    assert(spark.read.jdbc(url, tbl, props)
      .as[(Long, Double)].collect().toMap == sink)
  }

  test("duplicate keys WITHIN a batch resolve deterministically to the " +
    "max value, not to whichever partition staged first") {
    val tbl = "spec_dup"
    val dup = Seq((1L, 3.0), (1L, 7.0), (1L, 5.0), (2L, 1.0))
      .toDF("k", "v").repartition(4) // spread the duplicates over partitions
    JdbcExactlyOnce.upsertBatch(url, tbl, dup, 0L, "k", "v")
    val got = spark.read.jdbc(url, tbl, props)
      .as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 7.0, 2L -> 1.0))
  }

  test("a non-identifier table name is refused before any SQL runs") {
    intercept[IllegalArgumentException] {
      JdbcExactlyOnce.upsertBatch(url, "t; DROP TABLE x--",
        Seq((1L, 1.0)).toDF("k", "v"), 0L, "k", "v")
    }
    intercept[IllegalArgumentException] {
      JdbcExactlyOnce.ensureTables(url, "\"quoted\"")
    }
  }
}
