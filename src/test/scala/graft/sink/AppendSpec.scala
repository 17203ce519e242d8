package graft.sink

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** D204 — append: O(batch) landings, byte-identical existing files,
  * staged-bytes CHECKs, flat-table guard, absent-target bootstrap. */
class AppendSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def frame(lo: Long, hi: Long) = spark.range(lo, hi)
    .select(col("id").as("k"), (col("id") % 100).as("v"))

  test("bootstrap, append, byte-identical existing files; CHECKs bind " +
    "to the staged batch; a refused append cleans its staging") {
    val tmp = Files.createTempDirectory("append")
    try {
      val p = tmp.resolve("t").toString
      StageWriter.append(frame(0, 1000).repartition(3), p) // bootstrap
      assert(spark.read.parquet(p).count() == 1000)
      def inv() = StageWriter.listDataFiles(Paths.get(p))
        .map(f => f.getFileName.toString -> Files.size(f)).toMap
      val before = inv()
      Checks.declare(p, Map("v_nn" -> "v IS NOT NULL"))
      StageWriter.append(frame(1000, 1500).repartition(2), p)
      val after = inv()
      assert(before.forall { case (f, s) => after.get(f).contains(s) },
        "existing files must stay byte-identical")
      assert(spark.read.parquet(p).count() == 1500)
      intercept[Checks.CheckViolation] {
        StageWriter.append(frame(1500, 1600)
          .withColumn("v", lit(null).cast("long")), p)
      }
      assert(!Files.isDirectory(Paths.get(p + ".__appendtmp__")))
      assert(spark.read.parquet(p).count() == 1500,
        "a refused append must land nothing")
      Checks.drop(p)
      // a partitioned layout is refused (flat-table contract)
      val q = tmp.resolve("part").toString
      frame(0, 100).write.partitionBy("v").parquet(q)
      intercept[IllegalArgumentException] {
        StageWriter.append(frame(100, 200), q)
      }
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("exactly-once sink: marker replays no-op; a partial landing " +
    "(crash before marker) sweeps on re-delivery — including batch 0") {
    val tmp = Files.createTempDirectory("apxo")
    try {
      val p = tmp.resolve("t").toString
      // crash simulation: batch 0 landed fully, marker never written
      Files.createDirectories(Paths.get(p))
      StageWriter.append(frame(0, 100), p, nonce = Some("b0"))
      assert(spark.read.parquet(p).count() == 100)
      StageWriter.appendExactlyOnce(frame(0, 100), p, 0L)
      assert(spark.read.parquet(p).count() == 100,
        "re-delivery of an unmarked batch must sweep, not duplicate")
      // marker present: replay is a no-op
      StageWriter.appendExactlyOnce(frame(500, 600), p, 0L)
      assert(spark.read.parquet(p).count() == 100)
      StageWriter.appendExactlyOnce(frame(100, 150), p, 1L)
      assert(spark.read.parquet(p).count() == 150)
      assert(StageWriter.listDataFiles(Paths.get(p)).forall(
        _.getFileName.toString.startsWith("ap-b")),
        "every exactly-once landing carries its batch-id tag")
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("exactly-once markers keep only a trailing window: old batch " +
    "markers prune, recent replays still no-op") {
    val tmp = Files.createTempDirectory("apret")
    try {
      val p = tmp.resolve("t").toString
      def markers() = {
        val d = Paths.get(p + ".__applied__")
        val s = Files.list(d)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.map(_.getFileName.toString.toLong)
            .toSeq.sorted
        } finally s.close()
      }
      for (b <- 0L to 6L)
        StageWriter.appendExactlyOnce(frame(b * 10, b * 10 + 10), p, b,
          retainMarkers = 3)
      assert(spark.read.parquet(p).count() == 70)
      assert(markers() == Seq(3L, 4L, 5L, 6L),
        s"only ids >= 6 - 3 survive, got ${markers()}")
      // a replay of a RETAINED batch is still a no-op
      StageWriter.appendExactlyOnce(frame(900, 999), p, 5L,
        retainMarkers = 3)
      assert(spark.read.parquet(p).count() == 70,
        "a retained marker must still dedupe its batch")
      // a delivery BELOW the window is undecidable (pruned-committed vs
      // new) — it must refuse loudly, never silently double-append
      val e = intercept[IllegalStateException] {
        StageWriter.appendExactlyOnce(frame(0, 10), p, 1L,
          retainMarkers = 3)
      }
      assert(e.getMessage.contains("below the retained"))
      assert(spark.read.parquet(p).count() == 70,
        "the refused delivery must not have landed anything")
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("retainMarkers <= 0 retains every marker forever: arbitrarily " +
    "old replays stay no-ops and nothing refuses") {
    val tmp = Files.createTempDirectory("apretfor")
    try {
      val p = tmp.resolve("t").toString
      for (b <- 0L to 6L)
        StageWriter.appendExactlyOnce(frame(b * 10, b * 10 + 10), p, b,
          retainMarkers = 0)
      assert(spark.read.parquet(p).count() == 70)
      // the multi-writer / checkpoint-reset escape hatch: batch 0's
      // marker survives, so its replay dedupes instead of refusing
      StageWriter.appendExactlyOnce(frame(900, 999), p, 0L,
        retainMarkers = 0)
      assert(spark.read.parquet(p).count() == 70,
        "an ancient replay must no-op when markers are retained forever")
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("a versioned commit validates the STAGED version against the " +
    "table's declared CHECKs before any pointer moves") {
    val tmp = Files.createTempDirectory("vtchk")
    try {
      val t = tmp.resolve("vt").toString
      Checks.declare(t, Map("v_small" -> "v < 1000"))
      VersionedTable.commit(frame(0, 100), t)
      val e = intercept[Checks.CheckViolation] {
        VersionedTable.commit(frame(0, 100)
          .withColumn("v", col("k") + 5000), t)
      }
      assert(e.getMessage.contains("v_small"))
      assert(VersionedTable.latestVersion(t).contains(1) &&
        VersionedTable.versions(t) == Seq(1),
        "refused commit: pointer untouched, staged dir cleaned")
      assert(VersionedTable.commit(frame(100, 150), t) == 2,
        "the claim must be released for the next clean commit")
      Checks.drop(t)
    } finally StageWriter.deleteRecursively(tmp)
  }
}
