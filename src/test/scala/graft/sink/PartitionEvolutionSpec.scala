package graft.sink

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import org.apache.spark.sql.functions._

/** PartitionEvolution — generations accumulate without rewriting,
  * per-generation schemes prune independently, reads are complete. */
class PartitionEvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("generations accumulate with their own schemes; old files are " +
    "untouched by evolution; the union read is complete and prunable") {
    val tmp = java.nio.file.Files.createTempDirectory("pevo")
    try {
      val root = tmp.resolve("t").toString
      val a = (0L until 400L).map(k => (k, k)).toDF("k", "v")
      val b = (400L until 800L).map(k => (k, k)).toDF("k", "v")
      assert(PartitionEvolution.addGeneration(a, root, "k", "p", 100L) == 0)
      val g0Files = StageWriter.listDataFiles(
        java.nio.file.Paths.get(s"$root/g=0/p=1"))
        .map(f => (f.getFileName.toString, java.nio.file.Files.size(f)))
      assert(PartitionEvolution.addGeneration(b, root, "k", "p", 200L) == 1)
      assert(PartitionEvolution.generations(root) == Seq(0, 1))
      assert(g0Files == StageWriter.listDataFiles(
        java.nio.file.Paths.get(s"$root/g=0/p=1"))
        .map(f => (f.getFileName.toString, java.nio.file.Files.size(f))),
        "evolution touched a frozen generation")
      val all = PartitionEvolution.read(spark, root, "p")
      assert(all.count() == 800)
      assert(all.columns.toSeq.sorted == Seq("k", "v"))
      // a raw-k filter crossing the boundary prunes BOTH schemes
      graft.plans.DerivedPartitionPrune.ensureInstalled(spark)
      val q = all.filter(col("k") >= 350L && col("k") < 450L)
      val touched = q.select(input_file_name()).distinct().count()
      val total = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
        .toArray.count(_.toString.endsWith(".parquet")).toLong
      assert(touched < total, s"no pruning: $touched of $total")
      assert(q.select("k").as[Long].collect().sorted.toSeq ==
        (350L until 450L).toSeq)
    } finally StageWriter.deleteRecursively(tmp)
  }
}
