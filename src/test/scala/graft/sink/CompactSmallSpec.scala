package graft.sink

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** D230 — incremental small-file compaction: only the small tail
  * rewrites (multi-bin packing honors the target), content is
  * preserved exactly, the stats plane patches O(new files), and the
  * claim sequence composes with the merge path. */
class CompactSmallSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("multi-bin packing: the tail lands in ceil(bytes/target) files, " +
    "the head stays in place, content and stats survive, and a merge " +
    "composes on the advanced sequence") {
    val dir = Files.createTempDirectory("csmall")
    try {
      val t = dir.resolve("t").toString
      spark.range(0, 20000).selectExpr("id AS k", "id * 3 AS v")
        .coalesce(1).write.parquet(t)
      val big = StageWriter.listDataFiles(Paths.get(t))
      spark.range(20000, 21000).selectExpr("id AS k", "id * 3 AS v")
        .repartition(10).write.mode("append").parquet(t)
      Sidecars.declare(spark, t,
        Seq(Sidecars.Stats("k"), Sidecars.Counts))
      val before = StageWriter.listDataFiles(Paths.get(t))
      val bigNames = big.map(_.getFileName.toString).toSet
      val small = before.filterNot(p => bigNames(p.getFileName.toString))
      val smallBytes = small.map(Files.size(_)).sum
      val target = (smallBytes + 2) / 3 // force ~3 bins
      val minBytes =
        (small.map(Files.size(_)).max + big.map(Files.size(_)).min) / 2
      val rep = StageWriter.compactSmall(spark, t,
        targetFileBytes = target, minFileBytes = minBytes)
      assert(rep.rewritten == 10 && rep.bytesRewritten == smallBytes)
      assert(rep.filesAfter == big.size + 3,
        s"expected 3 bins, got $rep")
      assert(big.forall(Files.exists(_)), "the head never rewrites")
      assert(spark.read.parquet(t).count() == 21000)
      assert(spark.read.parquet(t).agg(sum("v")).head().getLong(0) ==
        (0L until 21000L).map(_ * 3).sum)
      assert(MetadataAgg.count(t).contains(21000L) &&
        MetadataAgg.minMax(t, "k").contains((0L, 20999L)),
        "stats + counts planes must patch through the compaction")
      // the compaction advanced the claim sequence; a merge composes
      val seqAfter = StageWriter.committedSeq(t)
      assert(seqAfter >= 1)
      StageWriter.mergeInto(spark,
        Seq((0L, -9L)).toDF("k", "v"), t, Seq("k"))
      assert(StageWriter.committedSeq(t) == seqAfter + 1)
      assert(spark.read.parquet(t).filter("k = 0 AND v = -9").count() == 1)
    } finally StageWriter.deleteRecursively(dir)
  }

  test("a tail of one (or zero) small files is a no-op that releases " +
    "its claim") {
    val dir = Files.createTempDirectory("csmall_noop")
    try {
      val t = dir.resolve("t").toString
      spark.range(0, 1000).selectExpr("id AS k").coalesce(2)
        .write.parquet(t)
      val rep = StageWriter.compactSmall(spark, t,
        targetFileBytes = 1L << 30, minFileBytes = 1L)
      assert(rep.rewritten == 0 && rep.filesBefore == rep.filesAfter)
      assert(StageWriter.committedSeq(t) == 0,
        "a no-op must not burn a sequence number")
      // the claim was released: a merge claims seq 1 immediately
      StageWriter.mergeInto(spark, Seq(5000L).toDF("k"), t, Seq("k"))
      assert(StageWriter.committedSeq(t) == 1)
    } finally StageWriter.deleteRecursively(dir)
  }
}
