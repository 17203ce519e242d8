package graft.sink

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** D186 — right-to-be-forgotten at REQUEST scale: the subject list is
  * joined inside the position-finding scan, never collected, so a
  * 50k-subject batch (far past isin practicality) erases in one table
  * scan; the ledger carries per-subject counts under pseudonyms. */
class ErasureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a 50k-subject batch erases through the distributed join path; " +
    "per-subject ledger counts are exact; a zero-row subject ledgers 0") {
    val tmp = Files.createTempDirectory("erasure50k")
    try {
      val p = tmp.resolve("t").toString
      val ledger = tmp.resolve("ledger").toString
      // 150k rows over 100k users: every user once, even users twice
      spark.range(0, 100000)
        .select(col("id").as("user"), lit("a").as("x"))
        .unionByName(spark.range(0, 100000).filter(col("id") % 2 === 0)
          .select(col("id").as("user"), lit("b").as("x")))
        .repartition(8).write.parquet(p)
      // 50k present subjects + one the table has never seen
      val subjects = spark.range(0, 50000).select(col("id"))
        .unionByName(Seq(1000000L).toDF("id"))
      val r = Erasure.eraseSubjects(spark, p, "user", subjects, ledger,
        ledgerKey = "key1")
      assert(r == Erasure.Erased(50001L, 75000L),
        "25k even subjects x2 + 25k odd x1")
      assert(DeletionVectors.read(spark, p).count() == 75000L)
      assert(DeletionVectors.read(spark, p)
        .filter(col("user") < 50000).count() == 0)
      // the ledger: one line per subject, per-subject row counts, raw
      // ids never stored
      val led = spark.read.parquet(ledger)
      assert(led.count() == 50001L)
      def rowsOf(id: String): Long = {
        val token = graft.llm.Privacy.pseudonymize(
          Seq(id).toDF("subject"), Seq("subject"), "key1")
          .select("subject").as[String].head()
        led.filter(col("subject") === token)
          .select("rows_erased").as[Long].head()
      }
      assert(rowsOf("6") == 2L, "an even subject had two rows")
      assert(rowsOf("7") == 1L)
      assert(rowsOf("1000000") == 0L,
        "a subject with no rows is still honored, at 0")
      assert(led.filter(col("subject") === "6").isEmpty,
        "the ledger must never carry the raw id")
      assert(Erasure.isErased(spark, ledger, "1000000", "key1"))
      assert(!Erasure.isErased(spark, ledger, "99999", "key1"))
    } finally StageWriter.deleteRecursively(tmp)
  }
}
