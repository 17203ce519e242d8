package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** D125 — in-plan logistic regression: learns a separating direction on
  * linearly separable data, trains deterministically, and costs exactly
  * ONE aggregation job per GD round (the treeAggregate shape). */
class LogRegSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // y = 1 iff x1 > 0.5: cleanly separable on feature x1; x2 is noise
  private def separable() = (0 until 200).map { i =>
    val x1 = (i % 100) / 100.0
    (i.toLong, if (x1 > 0.5) 1.0 else 0.0, x1, (i % 7) / 7.0)
  }.toDF("id", "y", "x1", "x2")

  test("gradient descent moves weights toward the separating feature " +
      "and scores separate the classes") {
    val df = separable()
    val w = LogReg.train(df, Seq("x1", "x2"), "y", iters = 5)
    assert(w(1) > 0.0, s"x1 weight should be positive, got ${w.toSeq}")
    val scored = df.select(col("y"),
      LogReg.score(Seq("x1", "x2"), w).as("s"))
      .groupBy("y").agg(avg("s").as("m"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(scored(1.0) > scored(0.0) + 0.05,
      s"positive class must score higher: $scored")
  }

  test("training is deterministic (same data -> identical weights)") {
    val a = LogReg.train(separable(), Seq("x1", "x2"), "y", iters = 3)
    val b = LogReg.train(separable().repartition(7), Seq("x1", "x2"), "y",
      iters = 3)
    // decimal-exact gradient sums make the result partitioning-independent
    assert(a.toSeq == b.toSeq, s"${a.toSeq} vs ${b.toSeq}")
  }

  test("each GD round is exactly ONE Spark job") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val df = separable().cache()
    df.count() // materialize outside the window
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    try {
      LogReg.train(df, Seq("x1", "x2"), "y", iters = 1) // warm planning
      spark.sparkContext.addSparkListener(l)
      Thread.sleep(500)
      jobs.set(0)
      LogReg.train(df, Seq("x1", "x2"), "y", iters = 3)
      Thread.sleep(1000) // listener bus is async
      assert(jobs.get() == 3,
        s"expected one aggregation job per round, saw ${jobs.get()}")
    } finally {
      spark.sparkContext.removeSparkListener(l)
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      df.unpersist()
    }
  }
}
