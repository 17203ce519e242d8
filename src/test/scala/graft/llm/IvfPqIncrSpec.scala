package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** D131 — incremental IVF-PQ maintenance: encoding a batch against a
  * stored (frozen) model is consistent with the build path, and appending
  * codes never perturbs existing ones. */
class IvfPqIncrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("re-encoding the base corpus against its own model reproduces the " +
      "build's codes exactly") {
    val base = emb.filter($"vec_id" < 60)
    val (cents, cb, built) = Similarity.ivfPqBuild(base, "vec_id",
      "embedding", dim = 64, nlist = 16, m = 8, ncodes = 32)
    val reEncoded = Similarity.ivfPqEncode(base, cents, cb, "vec_id",
      "embedding", dim = 64, m = 8)
    val a = built.select($"vec_id", $"list_id", $"codes")
      .as[(Long, Long, Seq[Long])].collect().sortBy(_._1).toSeq
    val b = reEncoded.select($"vec_id", $"list_id", $"codes")
      .as[(Long, Long, Seq[Long])].collect().sortBy(_._1).toSeq
    assert(a == b, "encode path must be bit-consistent with the build path")
  }

  test("appending a new batch leaves existing codes untouched and covers " +
      "every new vector once") {
    val base = emb.filter($"vec_id" < 60)
    val add = emb.filter($"vec_id" >= 60)
    val (cents, cb, codes0) = Similarity.ivfPqBuild(base, "vec_id",
      "embedding", dim = 64, nlist = 16, m = 8, ncodes = 32)
    val delta = Similarity.ivfPqEncode(add, cents, cb, "vec_id",
      "embedding", dim = 64, m = 8)
    val union = codes0.unionByName(delta)
    assert(delta.count() == add.count(), "one codes row per new vector")
    assert(union.select("vec_id").distinct().count() == emb.count())
    // new vectors land in valid stored lists with full code vectors
    val lists = cents.select($"cent_id").as[Long].collect().toSet
    val bad = delta.filter(!$"list_id".isin(lists.toSeq: _*) ||
      size($"codes") =!= 8).count()
    assert(bad == 0)
  }
}
