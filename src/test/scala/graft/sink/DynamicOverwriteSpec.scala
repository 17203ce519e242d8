package graft.sink

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}

/** StageWriter.overwritePartitions — touched-only rewrite, new-partition
  * creation, conf restoration, cardinality guard. */
class DynamicOverwriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def inv(p: String, part: String): Seq[(String, Long)] =
    StageWriter.listDataFiles(Paths.get(p, s"k=$part"))
      .map(f => (f.getFileName.toString, Files.size(f)))

  private def write(tmp: Path): String = {
    val p = tmp.resolve("t").toString
    StageWriter.overwrite(
      Seq(("a", 1L), ("a", 2L), ("b", 3L), ("c", 4L)).toDF("k", "v"),
      p, partitionBy = Seq("k"))
    p
  }

  test("only the batch's partitions are rewritten; a new partition value " +
    "is created; absent partitions keep their exact files") {
    val tmp = Files.createTempDirectory("dynov")
    try {
      val p = write(tmp)
      val (b0, c0) = (inv(p, "b"), inv(p, "c"))
      StageWriter.overwritePartitions(
        Seq(("a", 10L), ("d", 40L)).toDF("k", "v"), p, Seq("k"))
      assert(inv(p, "b") == b0 && inv(p, "c") == c0,
        "untouched partitions changed")
      val out = spark.read.parquet(p).as[(Long, String)].collect()
        .map(r => (r._2, r._1)).sorted.toSeq
      assert(out == Seq(("a", 10L), ("b", 3L), ("c", 4L), ("d", 40L)))
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("the partitionOverwriteMode conf is restored afterwards") {
    val tmp = Files.createTempDirectory("dynov2")
    try {
      val p = write(tmp)
      val key = "spark.sql.sources.partitionOverwriteMode"
      val before = spark.conf.get(key, "STATIC")
      StageWriter.overwritePartitions(
        Seq(("a", 9L)).toDF("k", "v"), p, Seq("k"))
      assert(spark.conf.get(key, "STATIC") == before)
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("cardinality guard refuses a batch with too many partition values") {
    val tmp = Files.createTempDirectory("dynov3")
    try {
      val p = write(tmp)
      intercept[IllegalArgumentException] {
        StageWriter.overwritePartitions(
          (1 to 50).map(i => (s"k$i", i.toLong)).toDF("k", "v"),
          p, Seq("k"), maxPartitionValues = 10)
      }
    } finally StageWriter.deleteRecursively(tmp)
  }
}
