package graft.sink

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** D176/D177/D186 — bundle integrity, partition TTL parsing, erasure. */
class PortableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("import refuses a bundle with a MISSING file and with an " +
    "UNEXPECTED extra file; clean import round-trips") {
    val tmp = Files.createTempDirectory("portable")
    try {
      val src = tmp.resolve("src").toString
      val bundle = tmp.resolve("b").toString
      val dst = tmp.resolve("dst").toString
      (1 to 100).map(i => (i, s"v$i")).toDF("k", "v")
        .repartition(2).write.parquet(src)
      Portable.exportTable(spark, src, bundle)
      val dataDir = Paths.get(bundle, "data")
      val victim = StageWriter.listDataFiles(dataDir).head
      val saved = Files.readAllBytes(victim)
      Files.delete(victim)
      val missing = intercept[Portable.IntegrityException] {
        Portable.importTable(spark, bundle, dst)
      }
      assert(missing.getMessage.contains("MISSING"))
      Files.write(victim, saved)
      Files.writeString(dataDir.resolve("stray.parquet"), "junk")
      val extra = intercept[Portable.IntegrityException] {
        Portable.importTable(spark, bundle, dst)
      }
      assert(extra.getMessage.contains("UNEXPECTED"))
      Files.delete(dataDir.resolve("stray.parquet"))
      Portable.importTable(spark, bundle, dst)
      assert(spark.read.parquet(dst).as[(Int, String)].collect().toSet ==
        (1 to 100).map(i => (i, s"v$i")).toSet)
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("expirePartitions drops only parsable sub-cutoff values and " +
    "never touches foreign or unparsable directories") {
    val tmp = Files.createTempDirectory("ttl")
    val path = tmp.resolve("t").toString
    try {
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "d")
        .write.partitionBy("d").parquet(path)
      Files.createDirectories(Paths.get(path, "d=notanumber"))
      Files.createDirectories(Paths.get(path, "other=5"))
      assert(StageWriter.expirePartitions(path, "d", cutoff = 25L) ==
        Seq(10L, 20L))
      assert(!Files.exists(Paths.get(path, "d=10")) &&
        !Files.exists(Paths.get(path, "d=20")))
      assert(Files.exists(Paths.get(path, "d=30")) &&
        Files.exists(Paths.get(path, "d=notanumber")) &&
        Files.exists(Paths.get(path, "other=5")))
      assert(StageWriter.expirePartitions(path, "d", cutoff = 25L).isEmpty,
        "a second enforcement run is a no-op")
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("erasure: re-erasing is effect-idempotent, ledger answers only " +
    "with the right key, empty ledger answers false") {
    val tmp = Files.createTempDirectory("erasure")
    try {
      val path = tmp.resolve("t").toString
      val ledger = tmp.resolve("ledger").toString
      (1L to 300L).map(i => (i, i % 10, i / 2.0))
        .toDF("event_id", "user_id", "value").write.parquet(path)
      assert(!Erasure.isErased(spark, ledger, "3", "k1"),
        "an empty ledger answers false")
      val subjects = Seq(3L).toDF("user_id")
      val r1 = Erasure.eraseSubjects(spark, path, "user_id", subjects,
        ledger, "k1")
      assert(r1 == Erasure.Erased(1, 30))
      assert(DeletionVectors.read(spark, path)
        .filter(col("user_id") === 3L).count() == 0)
      // re-erase: NET-NEW counting (r10) — already-tombstoned rows
      // count nothing, the ledger never overstates, and the sidecar
      // stays duplicate-free; the visible state is unchanged
      val r2 = Erasure.eraseSubjects(spark, path, "user_id", subjects,
        ledger, "k1")
      assert(r2.rows == 0, "re-erasure must report net-new rows only")
      assert(spark.read.parquet(path + "._dv").count() == 30,
        "the sidecar must not grow on re-erasure")
      assert(DeletionVectors.read(spark, path).count() == 270)
      assert(Erasure.isErased(spark, ledger, "3", "k1"))
      assert(!Erasure.isErased(spark, ledger, "3", "WRONG-KEY"),
        "the ledger must be meaningless without the key")
      assert(!Erasure.isErased(spark, ledger, "4", "k1"))
    } finally StageWriter.deleteRecursively(tmp)
  }
}
