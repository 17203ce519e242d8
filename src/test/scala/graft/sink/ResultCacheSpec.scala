package graft.sink

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** D166 — result cache: hit really reads the materialized copy, key
  * captures plan AND input state, unfingerprintable leaves degrade to
  * fresh compute, vacuum ages entries out. */
class ResultCacheSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture(): (String, String) = {
    val tmp = Files.createTempDirectory("rescache")
    val base = tmp.resolve("base").toString
    (1 to 500).map(i => (i.toLong, s"g${i % 5}", i / 2.0))
      .toDF("id", "k", "v").write.parquet(base)
    (base, tmp.resolve("cache").toString)
  }

  private def q(base: String) =
    spark.read.parquet(base).groupBy("k")
      .agg(count(lit(1)).as("n"), sum("id").as("s"))

  test("a HIT is served from the materialized copy (doctored-cache proof) " +
    "and equals the original on an honest cache") {
    val (base, cache) = fixture()
    val first = ResultCache.through(q(base), cache)
    assert(!first.hit)
    val want = first.df.collect().map(_.toString).sorted.toSeq
    val second = ResultCache.through(q(base), cache)
    assert(second.hit && second.key == first.key)
    assert(second.df.collect().map(_.toString).sorted.toSeq == want)
    // doctor the cached entry: if the hit recomputed from base this would
    // be invisible; seeing the doctored rows PROVES the read came from
    // the cache files
    val entry = java.nio.file.Paths.get(cache, first.key.get)
    StageWriter.deleteRecursively(entry)
    Seq(("DOCTORED", 1L, 2L)).toDF("k", "n", "s")
      .write.parquet(entry.toString)
    val doctored = ResultCache.through(q(base), cache)
    assert(doctored.hit)
    assert(doctored.df.collect().map(_.getString(0)).toSeq == Seq("DOCTORED"))
  }

  test("the key is plan-sensitive and state-sensitive; different plans " +
    "never collide") {
    val (base, cache) = fixture()
    val k1 = ResultCache.keyFor(q(base))
    // same semantics, different spelling → same canonicalized key
    val respelled = spark.read.parquet(base).groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("id")).as("s"))
    assert(ResultCache.keyFor(respelled) == k1)
    // different plan → different key
    val other = spark.read.parquet(base).groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
    assert(ResultCache.keyFor(other) != k1)
    // input state change → different key
    Seq((9999L, "g0", 1.0)).toDF("id", "k", "v")
      .write.mode("append").parquet(base)
    assert(ResultCache.keyFor(q(base)) != k1)
    // literal relations contribute their DATA, not just their schema
    val l1 = ResultCache.keyFor(Seq((1, "a")).toDF("x", "y").groupBy("y")
      .agg(sum("x").as("s")))
    val l2 = ResultCache.keyFor(Seq((2, "a")).toDF("x", "y").groupBy("y")
      .agg(sum("x").as("s")))
    assert(l1.isDefined && l1 != l2)
  }

  test("an unfingerprintable leaf is uncacheable: computed fresh, " +
    "never stored") {
    val (base, cache) = fixture()
    // a streaming leaf cannot be fingerprinted
    val stream = spark.readStream.format("rate").load()
    assert(ResultCache.keyFor(stream.select("value")).isEmpty)
    val served = ResultCache.through(stream.select("value"), cache)
    assert(!served.hit && served.key.isEmpty)
    assert(!Files.isDirectory(java.nio.file.Paths.get(cache)) ||
      Files.list(java.nio.file.Paths.get(cache)).count() == 0)
    // sanity: the cacheable twin still works in the same cache dir
    assert(!ResultCache.through(q(base), cache).hit)
    assert(ResultCache.through(q(base), cache).hit)
  }

  test("vacuum ages entries out; a vacuumed key recomputes") {
    val (base, cache) = fixture()
    val first = ResultCache.through(q(base), cache)
    assert(!first.hit)
    assert(ResultCache.vacuum(cache, retentionMs = 3600000).isEmpty,
      "entries inside the retention window must survive")
    assert(ResultCache.through(q(base), cache).hit)
    Thread.sleep(10)
    assert(ResultCache.vacuum(cache, retentionMs = 0) ==
      Seq(first.key.get))
    assert(!ResultCache.through(q(base), cache).hit,
      "a vacuumed key must recompute")
  }
}
