package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: isolate the CPU inflation seen when a small single-file
  * scan is round-robin repartitioned before the minhash pipeline. */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val raw = spark.read.parquet(s"$dir/documents.parquet")

    val cpu = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = cpu.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
      })

    def t(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      // warm
      df.write.format("noop").mode("overwrite").save()
      Thread.sleep(200)
      cpu.set(0)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[t] $label%-40s wall=$wall%6.2f s  exec=${cpu.get / 1000.0}%8.2f s")
    }

    def shingles(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id").as("id"),
        explode(graft.llm.Dedup.wordShingles(col("text"), 3)).as("s"))

    def sig(df: org.apache.spark.sql.DataFrame) = {
      val hashed = shingles(df).select(col("id"), xxhash64(col("s")).as("hb"))
      hashed.groupBy("id").agg(min(col("hb")).as("h0"),
        (1 until 32).map(j => min(col("hb") * lit(2L * j + 1)).as(s"h$j")): _*)
    }

    t("shingle explode, no repart")(shingles(raw))
    t("shingle explode, repart 32")(shingles(raw.repartition(32)))
    t("signature agg, no repart")(sig(raw))
    t("signature agg, repart 32")(sig(raw.repartition(32)))
    t("collect_set shingles, no repart")(
      shingles(raw).groupBy("id").agg(collect_set(col("s")).as("sh")))
    t("collect_set shingles, repart 32")(
      shingles(raw.repartition(32)).groupBy("id")
        .agg(collect_set(col("s")).as("sh")))
    for (n <- Seq(2, 4, 8, 16)) {
      t(s"signature agg, repart $n")(sig(raw.repartition(n)))
    }
    t("signature agg, coalesce-like repart 32 again")(sig(raw.repartition(32)))
    spark.stop()
  }
}
