package graft.sink

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** D190 — unified sidecar freshness: every writer path (overwrite,
  * compact, optimize, targeted merge, full-rewrite merge, DV fold)
  * leaves every DECLARED pruning plane inventory-fresh; undeclared
  * tables pay nothing. */
class SidecarsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame(n: Int) =
    spark.range(0, n).select(col("id").as("k"),
      (col("id") % 50).as("b"), (col("id") * 3 + 1).as("v")) // v unique: the bloom point-lookup key

  private def declareAll(path: String): Unit =
    Sidecars.declare(spark, path, Seq(
      Sidecars.Stats("k"), Sidecars.Zone(Seq("b")),
      Sidecars.Bloom("v", bits = 1 << 14)))

  /** Every declared plane validates against the CURRENT inventory. */
  private def assertFresh(path: String, tag: String): Unit = {
    val files = StageWriter.listDataFiles(Paths.get(path))
    val names = files.map(_.getFileName.toString).toSet
    assert(StageWriter.loadStats(path, files, "k").isDefined,
      s"$tag: range stats sidecar stale")
    assert(ZoneMap.load(path, files).isDefined,
      s"$tag: zone map stale")
    val bloomNames = spark.read.parquet(path + ".__blooms__")
      .select("file").as[String].collect()
      .map(_.split('/').last).toSet
    assert(bloomNames == names, s"$tag: bloom sidecar stale")
  }

  test("declare builds all planes; overwrite, compact, optimize and the " +
    "DV fold each leave every plane fresh") {
    val tmp = Files.createTempDirectory("sidecars")
    try {
      val p = tmp.resolve("t").toString
      frame(4000).repartitionByRange(4, col("k")).write.parquet(p)
      declareAll(p)
      assertFresh(p, "after declare")
      assert(Sidecars.declared(p) == Seq(Sidecars.Stats("k"),
        Sidecars.Zone(Seq("b")), Sidecars.Bloom("v", bits = 1 << 14)))

      StageWriter.overwrite(
        frame(5000).repartitionByRange(5, col("k")), p)
      assertFresh(p, "after overwrite")
      assert(StageWriter.listDataFiles(Paths.get(p)).size == 5)

      StageWriter.compact(spark, p, targetFileBytes = 16 * 1024,
        clusterBy = Some("k"))
      assertFresh(p, "after compact")

      StageWriter.optimize(spark, p, targetFileBytes = 8 * 1024)
      assertFresh(p, "after optimize")

      assert(DeletionVectors.delete(spark, p, col("k") < 100) == 100)
      DeletionVectors.apply(spark, p) // fold = rewrite via overwrite
      assertFresh(p, "after DV fold")
      assert(spark.read.parquet(p).count() == 4900)
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("a file-targeted merge patches planes in O(new files): untouched " +
    "files stay byte-identical AND every plane stays fresh") {
    val tmp = Files.createTempDirectory("sidecars2")
    try {
      val p = tmp.resolve("t").toString
      frame(8000).repartitionByRange(8, col("k")).write.parquet(p)
      declareAll(p)
      def inv() = StageWriter.listDataFiles(Paths.get(p))
        .map(f => f.getFileName.toString -> Files.size(f)).toMap
      val before = inv()
      // delta confined to a narrow key range: touches 1-2 of 8 files
      val delta = frame(8000)
        .filter(col("k").between(1000, 1499))
        .withColumn("v", col("v") + 100000)
      StageWriter.mergeInto(spark, delta, p, Seq("k"))
      val after = inv()
      val untouched = before.keySet.intersect(after.keySet)
      assert(untouched.nonEmpty, "targeted merge must keep some files")
      assert(untouched.forall(f => before(f) == after(f)))
      assert(after.keySet != before.keySet, "merge must add merged files")
      assertFresh(p, "after targeted merge")
      // values actually merged
      assert(spark.read.parquet(p).filter(col("k") === 1200)
        .select("v").as[Long].head() == 1200L * 3 + 1 + 100000)
      // and pruning still actually skips via the fresh blooms
      val probe = 2000L * 3 + 1 // v of k=2000 (outside the delta range)
      val (_, read, total) = Layout.bloomPrunedRead(spark, p, "v",
        Seq(probe), bits = 1 << 14,
        sidecarPath = Some(p + ".__blooms__"))
      assert(total == after.size && read < total,
        s"fresh blooms must skip ($read of $total)")
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("a full-rewrite merge (schema evolution fallback) refreshes via " +
    "the overwrite hook; undeclared tables grow no sidecars") {
    val tmp = Files.createTempDirectory("sidecars3")
    try {
      val p = tmp.resolve("t").toString
      frame(3000).repartitionByRange(3, col("k")).write.parquet(p)
      declareAll(p)
      // schema-evolving delta → targetedEligible false → full rewrite
      val delta = frame(3000).filter(col("k") < 10)
        .withColumn("extra", lit("x"))
      StageWriter.mergeInto(spark, delta, p, Seq("k"))
      assert(spark.read.parquet(p).columns.contains("extra"))
      assertFresh(p, "after full-rewrite merge")

      val q = tmp.resolve("plain").toString
      StageWriter.overwrite(frame(100), q)
      assert(!Files.exists(Paths.get(q + ".__stats__")) &&
        !Files.exists(Paths.get(q + ".__zonemap__")) &&
        !Files.isDirectory(Paths.get(q + ".__blooms__")),
        "an undeclared table must pay nothing")
      Sidecars.drop(p)
      assert(Sidecars.declared(p).isEmpty)
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("stats+zone refresh shares ONE data pass (records-read counted) " +
    "and writes byte-identical sidecars to the dedicated passes") {
    val tmp = Files.createTempDirectory("sidecars4")
    // input-records counter: schema/footer probes read 0 records, so
    // this measures exactly how many times the DATA was passed over
    val recs = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (t.taskMetrics != null)
          recs.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
        ()
      }
    }
    def measure(body: => Unit): Long = {
      recs.set(0)
      spark.sparkContext.addSparkListener(listener)
      try { body; Thread.sleep(500) /* drain listener bus */ }
      finally spark.sparkContext.removeSparkListener(listener)
      recs.get()
    }
    try {
      val p = tmp.resolve("t").toString
      // string stats column with a non-ASCII bound: the footer
      // fast-path stands down, so the dedicated pass MUST scan — the
      // combined path's saving is real, not footer-shadowed
      spark.range(0, 4000).select(col("id").as("k"),
        concat(lit("sé"), lpad(col("id").cast("string"), 6, "0")).as("s"),
        (col("id") % 50).as("b"))
        .repartitionByRange(4, col("k"))
        .write.parquet(p)
      // dedicated per-plane passes → reference bytes. The string stats
      // column scans (4000 records); the ALL-INTEGRAL zone pass is
      // footer-served since r15 (ZoneMap.footerBounds — zero records,
      // zero jobs), which this count also pins.
      val dedicated = measure {
        StageWriter.refreshStats(spark, p, "s")
        ZoneMap.write(spark, p, Seq("b", "k"))
      }
      assert(dedicated == 4000L,
        s"string stats must scan once and the all-integral zone pass " +
          s"must be footer-served (zero records), counted $dedicated")
      val statsRef = Files.readAllBytes(Paths.get(p + ".__stats__"))
      val zoneRef = Files.readAllBytes(Paths.get(p + ".__zonemap__"))
      Sidecars.declare(spark, p, Seq(
        Sidecars.Stats("s"), Sidecars.Zone(Seq("b", "k"))))
      Files.delete(Paths.get(p + ".__stats__"))
      Files.delete(Paths.get(p + ".__zonemap__"))
      val combined = measure { Sidecars.refreshAfterWrite(spark, p) }
      assert(combined == 4000L,
        s"stats+zone must share ONE data pass, counted $combined records")
      assert(java.util.Arrays.equals(statsRef,
        Files.readAllBytes(Paths.get(p + ".__stats__"))),
        "combined stats sidecar must be byte-identical")
      assert(java.util.Arrays.equals(zoneRef,
        Files.readAllBytes(Paths.get(p + ".__zonemap__"))),
        "combined zone sidecar must be byte-identical")
    } finally StageWriter.deleteRecursively(tmp)
  }
}
