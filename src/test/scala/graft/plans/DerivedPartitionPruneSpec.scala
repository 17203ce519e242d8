package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sink.StageWriter
import org.apache.spark.sql.functions._

/** DerivedPartitionPrune — directory-level pruning from source-column
  * predicates, identical results, fail-safe stand-downs. */
class DerivedPartitionPruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeTable(tmp: java.nio.file.Path): String = {
    val p = tmp.resolve("t").toString
    // src 0..799 → 8 partitions of 100
    StageWriter.writeDerivedPartitioned(
      spark.range(0, 800).select(col("id").as("k"), (col("id") % 7).as("v")),
      p, srcCol = "k", partCol = "d", divisor = 100L)
    p
  }

  private def filesTouched(df: org.apache.spark.sql.DataFrame): Long =
    df.select(input_file_name()).distinct().count()

  test("a raw-source range filter scans only the implied partitions and " +
    "returns identical rows") {
    val tmp = java.nio.file.Files.createTempDirectory("dpp")
    try {
      val p = writeTable(tmp)
      DerivedPartitionPrune.ensureInstalled(spark)
      val q = spark.read.parquet(p)
        .filter(col("k") >= 150L && col("k") < 350L)
      val all = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
        .toArray.count(_.toString.endsWith(".parquet")).toLong
      val touched = filesTouched(q)
      assert(touched < all, s"no pruning: $touched of $all")
      val got = q.select("k").as[Long].collect().sorted.toSeq
      assert(got == (150L until 350L).toSeq)
      // equality predicate prunes to one partition's files
      val eq = spark.read.parquet(p).filter(col("k") === 420L)
      assert(filesTouched(eq) <= all / 4)
      assert(eq.count() == 1)
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("stand-downs: no sidecar, unbounded predicate, negative lower " +
    "bound — all keep full results") {
    val tmp = java.nio.file.Files.createTempDirectory("dpp2")
    try {
      val p = writeTable(tmp)
      DerivedPartitionPrune.ensureInstalled(spark)
      // no lower bound → no rewrite, still correct
      assert(spark.read.parquet(p).filter(col("k") < 100L).count() == 100)
      // negative lower bound → stand down, still correct
      assert(spark.read.parquet(p)
        .filter(col("k") >= -5L && col("k") < 100L).count() == 100)
      // sidecar removed → rule stands down entirely
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(p, "_derived_partition"))
      val q = spark.read.parquet(p).filter(col("k") >= 150L && col("k") < 350L)
      assert(q.count() == 200)
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("sidecar round-trips and a foreign/garbage sidecar parses to None") {
    val tmp = java.nio.file.Files.createTempDirectory("dpp3")
    try {
      val p = writeTable(tmp)
      assert(StageWriter.derivedPartitionSpec(p).contains(("d", "k", 100L)))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(p, "_derived_partition"), "garbage")
      assert(StageWriter.derivedPartitionSpec(p).isEmpty)
    } finally StageWriter.deleteRecursively(tmp)
  }
}
