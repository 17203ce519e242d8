package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Decision-rule behavior of the adaptive join chooser (D110). */
class AdaptiveJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = (1 to 5).map(i => (i, s"d$i")).toDF("k", "dv")
  private val fact = (1 to 200).map(i => (i % 5 + 1, i)).toDF("k", "fv")

  test("small side under the broadcast budget -> broadcast, smaller side " +
    "hinted, result is the plain inner join") {
    val (j, p) = AdaptiveJoin.join(fact, dim, "k", broadcastRows = 10)
    assert(p.strategy == "broadcast")
    assert(p.leftRows == 200 && p.rightRows == 5)
    assert(j.count() == 200)
  }

  test("no small side, no hot key -> shuffle") {
    val a = (1 to 100).map(i => (i, i)).toDF("k", "av")
    val b = (1 to 100).map(i => (i, i)).toDF("k", "bv")
    val p = AdaptiveJoin.choose(a, b, "k", broadcastRows = 10,
      maxProduct = 1000)
    assert(p.strategy == "shuffle")
    assert(p.maxFreqLeft == 1 && p.maxFreqRight == 1)
  }

  test("hot-key product over the cap -> capped, blowup bounded " +
    "deterministically") {
    // one key carries 50x50 pairs
    val a = ((1 to 50).map(i => (1, i)) ++ Seq((2, 0))).toDF("k", "av")
    val b = ((1 to 50).map(i => (1, -i)) ++ Seq((2, 0))).toDF("k", "bv")
    val (j, p) = AdaptiveJoin.join(a, b, "k", capEach = 3,
      leftTiebreak = Seq(col("av")), rightTiebreak = Seq(col("bv")),
      broadcastRows = 10, maxProduct = 100)
    assert(p.strategy == "capped")
    assert(p.maxFreqLeft == 50 && p.maxFreqRight == 50)
    // hot key capped to 3x3 pairs, cold key untouched
    assert(j.count() == 10)
    // deterministic tiebreak: lowest 3 per side
    assert(j.filter($"k" === 1).agg(max("av")).head().getInt(0) == 3)
  }

  test("sketch inner product upper-bounds the exact pair count and is " +
    "exact on distinct keys") {
    val p = AdaptiveJoin.choose(fact, fact, "k", broadcastRows = 1)
    // exact pairs: 5 keys x 40 x 40 = 8000; CMS only ever overestimates
    assert(p.estJoinRows >= 8000)
    assert(p.strategy == "capped" || p.strategy == "shuffle")
    val d = AdaptiveJoin.choose(dim, dim, "k", broadcastRows = 0)
    assert(d.estJoinRows >= 5)
  }

  test("profiling runs exactly ONE Spark job per side — the key-domain " +
    "aggregation carries rows, maxFreq AND the sketch") {
    // AQE re-submits query stages as separate jobs, which would make the
    // count nondeterministic — scope it off; the job SHAPE is what's under
    // test, and at scale the win is scans, not stage accounting
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    try {
      // warm both plans once so codegen/planning jobs don't pollute
      AdaptiveJoin.choose(fact, dim, "k")
      spark.sparkContext.addSparkListener(l)
      Thread.sleep(500)
      jobs.set(0)
      val p = AdaptiveJoin.choose(fact, dim, "k", broadcastRows = 10)
      Thread.sleep(1000) // listener bus is async
      assert(p.strategy == "broadcast")
      assert(jobs.get() == 2,
        s"expected one profiling job per side, saw ${jobs.get()}")
    } finally {
      spark.sparkContext.removeSparkListener(l)
      spark.conf.set("spark.sql.adaptive.enabled", prev)
    }
  }

  test("weighted sketch equals the raw-row sketch — same counters, same " +
    "estimates") {
    import graft.functions.CountMin
    val raw = CountMin.sketch(fact, col("k"), 4, 64)
      .head().getSeq[Long](0)
    val weighted = fact.groupBy(col("k")).agg(count(lit(1)).as("__n"))
      .agg(udaf(new graft.functions.CountMinWeighted(4, 64))
        .apply(CountMin.buckets(col("k"), 4, 64), col("__n")))
      .head().getSeq[Long](0)
    assert(raw == weighted)
  }

  test("empty side profiles to zero rows and broadcasts trivially") {
    val p = AdaptiveJoin.choose(fact.limit(0), dim, "k")
    assert(p.leftRows == 0 && p.estJoinRows == 0)
    assert(p.strategy == "broadcast")
  }

  test("chooseFromSidecars (D238): counts + NDV planes decide without " +
    "a scan, the uniform estimate is exact on a key-FK join, and a " +
    "stale plane stands down to None") {
    val tmp = java.nio.file.Files.createTempDirectory("cbo_sc_spec")
    try {
      val dimP = tmp.resolve("dim").toString
      val factP = tmp.resolve("fact").toString
      dim.withColumn("k", col("k").cast("long"))
        .coalesce(1).write.parquet(dimP)
      fact.withColumn("k", col("k").cast("long"))
        .coalesce(2).write.parquet(factP)
      graft.sink.Sidecars.declare(spark, dimP, Seq(
        graft.sink.Sidecars.Counts, graft.sink.Sidecars.Ndv("k", 64)))
      graft.sink.Sidecars.declare(spark, factP, Seq(
        graft.sink.Sidecars.Counts, graft.sink.Sidecars.Ndv("k", 64)))
      val p = AdaptiveJoin.chooseFromSidecars(factP, "k", dimP, "k",
        broadcastRows = 10).get
      assert(p.strategy == "broadcast" &&
        p.leftRows == 200 && p.rightRows == 5)
      // 64 ≥ both domains → KMV exact: est = 200·5/5 = 200 = |join|
      assert(p.estJoinRows == 200, s"got ${p.estJoinRows}")
      assert(p.maxFreqLeft == -1L, "metadata path reports no max-freq")
      assert(AdaptiveJoin.chooseFromSidecars(factP, "k", dimP, "k",
        broadcastRows = 2).get.strategy == "shuffle")
      assert(AdaptiveJoin.chooseFromSidecars(factP, "k", dimP, "k",
        broadcastRows = 2, maxEstRows = 100).get.strategy == "capped")
      val (joined, _) = AdaptiveJoin.joinFromSidecars(spark,
        factP, "k", dimP, "k", broadcastRows = 10).get
      assert(joined.count() == 200)
      // stale inventory on one side → the whole metadata path is None
      val f = graft.sink.StageWriter.listDataFiles(tmp.resolve("dim")).head
      java.nio.file.Files.copy(f,
        f.getParent.resolve("zz_foreign.parquet"))
      assert(AdaptiveJoin.chooseFromSidecars(factP, "k", dimP, "k")
        .isEmpty)
    } finally graft.sink.StageWriter.deleteRecursively(tmp)
  }
}
