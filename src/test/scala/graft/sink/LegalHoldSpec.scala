package graft.sink

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** D216 — legal holds × erasure: held subjects defer (and never reach
  * the ledger), erasable ones erase, release makes the re-driven
  * request complete; multi-hold subjects stay held until every hold
  * naming them releases. */
class LegalHoldSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def table(tmp: java.nio.file.Path): String = {
    val t = tmp.resolve("vt").toString
    VersionedTable.commit(
      spark.range(0, 100)
        .select(col("id").as("user"), (col("id") * 2).as("v")), t)
    t
  }

  test("held subjects survive and stay unledgered; erasable ones erase; " +
    "release completes the re-driven request") {
    val tmp = Files.createTempDirectory("lhold")
    try {
      val t = table(tmp)
      val ledger = tmp.resolve("ledger").toString
      Erasure.declareHold(spark, t, "lit-1", Seq(3L, 5L).toDF("user"))
      val subjects = Seq(3L, 5L, 7L, 9L).toDF("user")
      val (r1, held1) = Erasure.eraseVersionedWithHolds(spark, t,
        "user", subjects, ledger, "k")
      assert(r1.subjects == 2L && held1 == 2L)
      val rows = VersionedTable.read(spark, t)
      assert(rows.filter(col("user").isin(3L, 5L)).count() == 2,
        "held subjects must survive")
      assert(rows.filter(col("user").isin(7L, 9L)).count() == 0,
        "erasable subjects must be gone")
      assert(!Erasure.isErased(spark, ledger, "3", "k"),
        "a deferred subject must not be certified erased")
      assert(Erasure.isErased(spark, ledger, "7", "k"))
      Erasure.releaseHold(spark, t, "lit-1")
      val (r2, held2) = Erasure.eraseVersionedWithHolds(spark, t,
        "user", subjects, ledger, "k")
      assert(held2 == 0L && r2.subjects == 4L)
      assert(VersionedTable.read(spark, t)
        .filter(col("user").isin(3L, 5L)).count() == 0)
      assert(Erasure.isErased(spark, ledger, "3", "k"))
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("a subject under TWO holds stays held until both release; an " +
    "all-held request erases nothing and writes no ledger") {
    val tmp = Files.createTempDirectory("lhold2")
    try {
      val t = table(tmp)
      val ledger = tmp.resolve("ledger").toString
      Erasure.declareHold(spark, t, "lit-a", Seq(11L).toDF("user"))
      Erasure.declareHold(spark, t, "lit-b", Seq(11L).toDF("user"))
      val (r1, h1) = Erasure.eraseVersionedWithHolds(spark, t, "user",
        Seq(11L).toDF("user"), ledger, "k")
      assert(r1 == Erasure.Erased(0L, 0L) && h1 == 1L)
      assert(!Files.isDirectory(java.nio.file.Paths.get(ledger)),
        "an all-held request must write NO ledger")
      Erasure.releaseHold(spark, t, "lit-a")
      val (r2, h2) = Erasure.eraseVersionedWithHolds(spark, t, "user",
        Seq(11L).toDF("user"), ledger, "k")
      assert(r2 == Erasure.Erased(0L, 0L) && h2 == 1L,
        "the second hold must still defer the subject")
      Erasure.releaseHold(spark, t, "lit-b")
      val (r3, h3) = Erasure.eraseVersionedWithHolds(spark, t, "user",
        Seq(11L).toDF("user"), ledger, "k")
      assert(r3.subjects == 1L && h3 == 0L)
      assert(VersionedTable.read(spark, t)
        .filter(col("user") === 11L).count() == 0)
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("releasing a nonexistent hold is a no-op; heldSubjects is empty " +
    "without a registry") {
    val tmp = Files.createTempDirectory("lhold3")
    try {
      val t = table(tmp)
      Erasure.releaseHold(spark, t, "never-declared")
      assert(Erasure.heldSubjects(spark, t).count() == 0L)
    } finally StageWriter.deleteRecursively(tmp)
  }
}
