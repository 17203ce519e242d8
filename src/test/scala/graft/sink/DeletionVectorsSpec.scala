package graft.sink

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** DeletionVectors — delete without rewrite, DV-aware reads, physical
  * fold on compaction. */
class DeletionVectorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def inv(p: String): Seq[(String, Long)] =
    StageWriter.listDataFiles(Paths.get(p))
      .map(f => (f.getFileName.toString, Files.size(f)))

  test("delete records positions without touching data files; reads " +
    "subtract; a second delete accumulates; apply folds physically") {
    val tmp = Files.createTempDirectory("dv")
    try {
      val p = tmp.resolve("t").toString
      spark.range(0, 1000).select(col("id").as("k"), (col("id") % 7).as("v"))
        .repartition(4).write.parquet(p)
      val before = inv(p)
      assert(DeletionVectors.delete(spark, p, col("k") % 10 === 0) == 100)
      assert(inv(p) == before, "delete rewrote data files")
      assert(DeletionVectors.read(spark, p).count() == 900)
      // plain readers of the path still see the superset (documented)
      assert(spark.read.parquet(p).count() == 1000)
      // second delete accumulates NET-NEW: the overlap (k=0 matched
      // both predicates) is already tombstoned and counts nothing
      assert(DeletionVectors.delete(spark, p, col("k") < 5) == 4)
      assert(DeletionVectors.read(spark, p).count() == 1000 - 100 - 4)
      val got = DeletionVectors.read(spark, p).select("k").as[Long]
        .collect().toSet
      assert(!got.exists(k => k % 10 == 0 || k < 5))
      // physical fold: data rewritten, vector gone, plain reads agree
      assert(DeletionVectors.apply(spark, p) == 896)
      assert(!Files.isDirectory(Paths.get(p + "._dv")))
      assert(spark.read.parquet(p).count() == 896)
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("deleteKeys: a distributed subject frame deletes via the join " +
    "path with per-key counts; the DV broadcast is size-gated with a " +
    "correct shuffle fallback") {
    val tmp = Files.createTempDirectory("dvk")
    try {
      val p = tmp.resolve("t").toString
      // 150 rows: k 0..99 once each, even k a second time
      spark.range(0, 100).select(col("id").as("k"))
        .unionByName(spark.range(0, 100).filter(col("id") % 2 === 0)
          .select(col("id").as("k")))
        .repartition(4).write.parquet(p)
      val keys = Seq(Option(2L), Option(3L), Option(500L), None).toDF("k")
      val kd = DeletionVectors.deleteKeys(spark, p, keys, "k")
      assert(kd.rowsDeleted == 3, "k=2 twice + k=3 once")
      val per = kd.perKey.as[(Long, Long)].collect().toMap
      assert(per == Map(2L -> 2L, 3L -> 1L),
        "per-key counts; an absent key contributes no row")
      assert(DeletionVectors.read(spark, p).count() == 147)
      // size gate: hinted under the default budget, plain join past it,
      // identical results either way (slower, never an outage)
      val hinted = DeletionVectors.read(spark, p)
      assert(hinted.queryExecution.optimizedPlan.toString
        .contains("broadcast"))
      val fallback = DeletionVectors.read(spark, p, maxBroadcastBytes = 0)
      assert(!fallback.queryExecution.optimizedPlan.toString
        .contains("broadcast"))
      assert(fallback.select("k").as[Long].collect().sorted.toSeq ==
        hinted.select("k").as[Long].collect().sorted.toSeq)
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("re-erasing a subject (or overlapping requests) is idempotent: " +
    "net-new counts, duplicate-free sidecar") {
    val tmp = Files.createTempDirectory("dvr")
    try {
      val p = tmp.resolve("t").toString
      spark.range(0, 200).select(col("id").as("k")).repartition(2)
        .write.parquet(p)
      val first = DeletionVectors.deleteKeys(spark, p,
        Seq(1L, 2L, 3L).toDF("k"), "k")
      assert(first.rowsDeleted == 3)
      // the SAME subject again: ledger must not overstate
      val again = DeletionVectors.deleteKeys(spark, p,
        Seq(2L).toDF("k"), "k")
      assert(again.rowsDeleted == 0 && again.perKey.isEmpty,
        "re-erasure reports net-new only")
      // an OVERLAPPING request counts only its new subject
      val overlap = DeletionVectors.deleteKeys(spark, p,
        Seq(3L, 4L).toDF("k"), "k")
      assert(overlap.rowsDeleted == 1)
      // sidecar stays duplicate-free: one row per tombstone
      assert(spark.read.parquet(p + "._dv").count() == 4)
      assert(DeletionVectors.read(spark, p).count() == 196)
      // predicate deletes share the discipline
      assert(DeletionVectors.delete(spark, p, col("k") <= 4) == 1,
        "only k=0 is new under k<=4")
      assert(spark.read.parquet(p + "._dv").count() == 5)
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("a no-match delete appends nothing and reads are unaffected") {
    val tmp = Files.createTempDirectory("dv2")
    try {
      val p = tmp.resolve("t").toString
      spark.range(0, 10).select(col("id").as("k")).write.parquet(p)
      assert(DeletionVectors.delete(spark, p, col("k") > 100) == 0)
      assert(!Files.isDirectory(Paths.get(p + "._dv")))
      assert(DeletionVectors.read(spark, p).count() == 10)
    } finally StageWriter.deleteRecursively(tmp)
  }
}
