package graft.sink

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** D197 — write-time CHECK constraints: SQL null semantics (TRUE/NULL
  * pass), refusal leaves the target byte-identical on BOTH writer
  * paths, quarantine split partitions exactly, drop disarms. */
class ChecksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("validate: TRUE and NULL pass, FALSE counts; declare round-trips; " +
    "bad names rejected") {
    val df = Seq(Some(5.0), Some(-1.0), None).toDF("v")
    val checks = Map("v_pos" -> "v >= 0")
    assert(Checks.validate(df, checks) == Map("v_pos" -> 1L),
      "NULL must pass (SQL CHECK semantics), only FALSE violates")
    val tmp = Files.createTempDirectory("checks")
    try {
      val p = tmp.resolve("t").toString
      Checks.declare(p, checks)
      assert(Checks.declared(p) == checks)
      intercept[IllegalArgumentException] {
        Checks.declare(p, Map("bad name!" -> "v >= 0"))
      }
      Checks.drop(p)
      assert(Checks.declared(p).isEmpty)
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("a violating overwrite AND a violating targeted merge refuse " +
    "pre-land (target byte-identical); clean writes land; drop disarms") {
    val tmp = Files.createTempDirectory("checks2")
    try {
      val p = tmp.resolve("t").toString
      def frame(bad: Boolean) = spark.range(0, 2000)
        .select(col("id").as("k"),
          (if (bad) when(col("id") % 500 === 0, -1L).otherwise(col("id") % 100)
          else col("id") % 100).as("v"))
      Checks.declare(p, Map("v_range" -> "v BETWEEN 0 AND 100"))
      StageWriter.overwrite(frame(bad = false)
        .repartitionByRange(4, col("k")), p)
      def inv() = StageWriter.listDataFiles(Paths.get(p))
        .map(f => f.getFileName.toString -> Files.size(f)).toMap
      val before = inv()
      val e = intercept[Checks.CheckViolation] {
        StageWriter.overwrite(frame(bad = true), p)
      }
      assert(e.getMessage.contains("v_range") &&
        e.getMessage.contains("4 rows"), e.getMessage)
      assert(inv() == before)
      // targeted merge: violating delta refuses, clean delta lands
      val delta = frame(bad = false).filter(col("k").between(100, 199))
      intercept[Checks.CheckViolation] {
        StageWriter.mergeInto(spark,
          delta.withColumn("v", lit(-9L)), p, Seq("k"))
      }
      assert(inv() == before, "refused merge must stage nothing visible")
      StageWriter.mergeInto(spark,
        delta.withColumn("v", lit(100L)), p, Seq("k"))
      assert(spark.read.parquet(p).filter(col("v") === 100L).count() >=
        100L)
      // disarm: the previously-violating write now lands
      Checks.drop(p)
      StageWriter.overwrite(frame(bad = true), p)
      assert(spark.read.parquet(p).filter(col("v") < 0).count() == 4L)
      // split partitions exactly
      val (ok, badRows) = Checks.split(frame(bad = true),
        Map("v_range" -> "v BETWEEN 0 AND 100"))
      assert(ok.count() == 1996L && badRows.count() == 4L)
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("a guarded overwrite evaluates the incoming plan exactly once " +
    "(validation runs on the staged bytes, not a re-evaluation)") {
    val tmp = Files.createTempDirectory("checks3")
    try {
      val p = tmp.resolve("t").toString
      Checks.declare(p, Map("v_nn" -> "v IS NOT NULL"))
      ChecksSpecEvalCounter.evals.set(0)
      val df = spark.range(0, 100, 1, 4)
        .map { v => ChecksSpecEvalCounter.evals.incrementAndGet(); v }
        .toDF("v")
      StageWriter.overwrite(df, p)
      assert(ChecksSpecEvalCounter.evals.get() == 100,
        s"guarded write must evaluate the plan once (100 row-evals), " +
          s"got ${ChecksSpecEvalCounter.evals.get()}")
      assert(spark.read.parquet(p).count() == 100L)
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("non-deterministic frames bind: a rand()-gated violating row " +
    "either refuses or zero violators land, every run") {
    val tmp = Files.createTempDirectory("checks4")
    try {
      val p = tmp.resolve("t").toString
      Checks.declare(p, Map("v_pos" -> "v >= 0"))
      // ~certain refusal: P(all 64 rows pass) = 2^-64. The staged-byte
      // validation sees exactly the rows the swap would reveal, so the
      // old plan-level gap (validate one draw, land another) is closed.
      val dirty = spark.range(0, 64).select(
        when(rand() < 0.5, lit(-1.0)).otherwise(lit(1.0)).as("v"))
      (1 to 3).foreach { _ =>
        val refusedOrClean = try {
          StageWriter.overwrite(dirty, p)
          spark.read.parquet(p).filter(col("v") < 0).count() == 0L
        } catch { case _: Checks.CheckViolation => true }
        assert(refusedOrClean,
          "whatever lands must be the validated bytes — never violators")
        assert(!Files.exists(Paths.get(p + ".__tmp__")),
          "refusal must clean its staging dir")
      }
      // non-deterministic but never-violating: accepts, landed rows all
      // satisfy the check (the accept path with rand() in the plan)
      val clean = spark.range(0, 64).select(rand().as("v"))
      StageWriter.overwrite(clean, p)
      assert(spark.read.parquet(p).filter(col("v") < 0).count() == 0L)
    } finally StageWriter.deleteRecursively(tmp)
  }
}

/** JVM-global row-evaluation counter (local-mode executors share the
  * JVM); proves the guarded write path is single-evaluation. */
object ChecksSpecEvalCounter {
  val evals = new java.util.concurrent.atomic.AtomicInteger(0)
}
