package graft.run

import org.scalatest.funsuite.AnyFunSuite

/** Partition-sizing arithmetic: whole waves, two-wave floor, 128 MB
  * tasks, and sane numbers at both testdata and 100 TB scale. */
class ScaleConfigSpec extends AnyFunSuite {
  private val MB = 1024L * 1024

  test("small local data floors at two whole waves") {
    // sf0.1 testdata (~100 MB) on local[32]: 1 task of data, but never
    // fewer than 64 partitions (2 waves of 32)
    val s = ScaleConfig.recommend(100 * MB, totalCores = 32)
    assert(s.shufflePartitions == 64)
    assert(s.maxPartitionBytes == 128 * MB)
  }

  test("100 TB on 4000 cores: ~820k tasks in whole waves") {
    val s = ScaleConfig.recommend(100L * 1024 * 1024 * MB, totalCores = 4000)
    val tasks = (100L * 1024 * 1024 * MB + 128 * MB - 1) / (128 * MB)
    assert(s.shufflePartitions >= tasks)
    assert(s.shufflePartitions % 4000 == 0, "whole scheduling waves")
    assert(s.shufflePartitions - tasks < 4000, "no more than one extra wave")
  }

  test("partition count is capped at the sanity bound") {
    val s = ScaleConfig.recommend(Long.MaxValue / 2, totalCores = 1000)
    assert(s.shufflePartitions == ScaleConfig.MaxShufflePartitions)
  }

  test("configure lands on the session and AQE can still coalesce") {
    val spark = graft.TestSpark.spark
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      ScaleConfig.configure(spark, ScaleConfig.Settings(96, 64 * MB))
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "96")
      assert(spark.conf.get("spark.sql.files.maxPartitionBytes")
        == (64 * MB).toString)
      assert(spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum") == "96")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("dirBytes sizes the testdata tree") {
    assert(ScaleConfig.dirBytes("/root/testdata/sf0.001") > 0)
  }
}
