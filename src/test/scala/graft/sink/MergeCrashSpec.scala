package graft.sink

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** r13 — drop-after-marker commit protocol of the targeted merge: the
  * sequence flip is THE commit point, touched files are deleted only
  * after it (replayable from the durable marker), and BOTH crash
  * windows recover exactly. The previous ordering (delete before flip)
  * could not distinguish a partial reveal from a partial delete and its
  * rollback lost rows — pinned here by fabricating the crash states at
  * the file level. */
class MergeCrashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bootstrap(): (java.nio.file.Path, String, Long, Long) = {
    val dir = Files.createTempDirectory("mcrash")
    val path = dir.resolve("t").toString
    // 100001 rows -> fileBudget = 3 files
    StageWriter.mergeInto(spark,
      spark.range(0, 100001).selectExpr("id AS k", "id * 2 AS v"),
      path, Seq("k"))
    val total = spark.read.parquet(path).count()
    (dir, path, StageWriter.committedSeq(path), total)
  }

  test("pre-flip crash (marker written, generation revealed, touched " +
    "still present): recovery rolls the attempt back byte-exactly — " +
    "no rows lost, no duplicates") {
    val (dir, path, seq, total) = bootstrap()
    try {
      val f1 = StageWriter.listDataFiles(Paths.get(path)).head
      Files.copy(f1,
        f1.getParent.resolve(s"m${seq + 1}-deadbeef-p00000.parquet"))
      Files.writeString(Paths.get(path + s".__dropafter__${seq + 1}"),
        f1.getFileName.toString + "\n")
      // the crash state double-counts f1's rows (documented transient
      // duplication); the next merge claims seq+1 and must restore the
      // exact committed snapshot BEFORE merging
      StageWriter.mergeInto(spark,
        Seq((0L, -1L)).toDF("k", "v"), path, Seq("k"))
      assert(spark.read.parquet(path).count() == total,
        "rollback must lose nothing and keep nothing duplicated")
      // (f1 itself may legitimately be rewritten by the RECOVERING
      // merge when its delta key lands in f1's range — the row-count
      // equality above is the loss pin; vacuum-path f1 preservation is
      // pinned in the third test)
      assert(!Files.exists(Paths.get(path + s".__dropafter__${seq + 1}")),
        "the rolled-back attempt's marker must not linger")
      assert(spark.read.parquet(path).filter("k = 0 AND v = -1")
        .count() == 1, "the recovering merge itself must land")
    } finally StageWriter.deleteRecursively(dir)
  }

  test("post-flip crash (sequence committed, touched deletion never " +
    "ran): the next claimant replays the marker — duplicates drop, " +
    "no rows lost") {
    val (dir, path, seq, total) = bootstrap()
    try {
      val f1 = StageWriter.listDataFiles(Paths.get(path)).head
      Files.copy(f1,
        f1.getParent.resolve(s"m${seq + 1}-deadbeef-p00000.parquet"))
      Files.writeString(Paths.get(path + s".__dropafter__${seq + 1}"),
        f1.getFileName.toString + "\n")
      Files.writeString(Paths.get(path + ".__seq__"),
        (seq + 1).toString) // the flip happened; deletion did not
      val dup = spark.read.parquet(path).count()
      assert(dup > total, "the fabricated window double-counts")
      StageWriter.mergeInto(spark,
        Seq((0L, -1L)).toDF("k", "v"), path, Seq("k"))
      assert(spark.read.parquet(path).count() == total,
        "replay must finish the deletion exactly")
      assert(!Files.exists(f1),
        "the marker-listed file must be gone after replay")
      assert(!Files.exists(Paths.get(path + s".__dropafter__${seq + 1}")))
    } finally StageWriter.deleteRecursively(dir)
  }

  test("vacuum replays committed markers immediately and reclaims an " +
    "aged uncommitted generation with its marker") {
    val (dir, path, seq, total) = bootstrap()
    try {
      val f1 = StageWriter.listDataFiles(Paths.get(path)).head
      // committed marker -> replay on vacuum
      Files.copy(f1,
        f1.getParent.resolve(s"m${seq + 1}-deadbeef-p00000.parquet"))
      Files.writeString(Paths.get(path + s".__dropafter__${seq + 1}"),
        f1.getFileName.toString + "\n")
      Files.writeString(Paths.get(path + ".__seq__"), (seq + 1).toString)
      StageWriter.vacuum(path)
      assert(spark.read.parquet(path).count() == total && !Files.exists(f1))
      // uncommitted marker + revealed generation: reclaimed only past
      // the retention (retention 0 = everything is stale)
      val f2 = StageWriter.listDataFiles(Paths.get(path)).head
      Files.copy(f2,
        f2.getParent.resolve(s"m${seq + 2}-cafecafe-p00000.parquet"))
      Files.writeString(Paths.get(path + s".__dropafter__${seq + 2}"),
        f2.getFileName.toString + "\n")
      StageWriter.vacuum(path, retentionMs = 0L)
      assert(spark.read.parquet(path).count() == total,
        "reclaiming the uncommitted generation restores the snapshot")
      assert(Files.exists(f2), "touched files of an uncommitted " +
        "attempt are never deleted")
      assert(!Files.exists(Paths.get(path + s".__dropafter__${seq + 2}")))
    } finally StageWriter.deleteRecursively(dir)
  }
}
