package graft.llm

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** D203 — deterministic training shards: portable assignment, landed
  * order = the keyed permutation, manifest from landed bytes. */
class ShardsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(n: Int) = spark.range(0, n)
    .select(col("id").as("doc_id"),
      concat(lit("w "), col("id").cast("string")).as("text"))

  test("assignment is a pure function of (id, seed): partitioning-" +
    "independent, seed-sensitive, all shards in range") {
    val a = Shards.assigned(docs(500), "doc_id", 7, "s1")
      .select("doc_id", "shard", "ord").as[(Long, Int, Long)]
      .collect().sortBy(_._1).toSeq
    val b = Shards.assigned(docs(500).repartition(11), "doc_id", 7, "s1")
      .select("doc_id", "shard", "ord").as[(Long, Int, Long)]
      .collect().sortBy(_._1).toSeq
    assert(a == b, "repartitioning must not move a single doc")
    assert(a.forall { case (_, s, _) => s >= 0 && s < 7 })
    val c = Shards.assigned(docs(500), "doc_id", 7, "s2")
      .select("doc_id", "shard").as[(Long, Int)].collect().toMap
    assert(a.exists { case (id, s, _) => c(id) != s },
      "a different seed must reshuffle")
  }

  test("write lands one file per shard in permutation order; the " +
    "manifest sidecar matches the landed files") {
    val tmp = Files.createTempDirectory("shards")
    try {
      val p = tmp.resolve("out").toString
      val m = Shards.write(docs(400), "doc_id", lit(2L), 4, "s1", p)
      val rows = m.as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
      assert(rows.map(_._1) == Seq(0, 1, 2, 3))
      assert(rows.map(_._2).sum == 400L &&
        rows.forall(r => r._3 == 2 * r._2),
        "every doc counts 2 tokens, so n_tokens = 2 * n_docs per shard")
      assert(Shards.manifest(p) == rows, "sidecar round-trips the frame")
      (0 until 4).foreach { s =>
        assert(graft.sink.StageWriter.listDataFiles(
          Paths.get(s"$p/shard=$s")).size == 1)
      }
      // landed order is the (ord, id) permutation, per file position
      val landed = spark.read.parquet(p)
        .select(col("shard").cast("int").as("shard"), col("doc_id"),
          col("ord"), col("_metadata.row_index").as("pos"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("shard").orderBy(col("ord"), col("doc_id"))
      assert(landed.withColumn("rk", row_number().over(w) - 1)
        .filter(col("rk") =!= col("pos")).count() == 0)
    } finally graft.sink.StageWriter.deleteRecursively(tmp)
  }
}
