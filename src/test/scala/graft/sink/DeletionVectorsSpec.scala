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
      // second delete accumulates; overlap (k=0 matches both) dedups
      assert(DeletionVectors.delete(spark, p, col("k") < 5) == 5)
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
