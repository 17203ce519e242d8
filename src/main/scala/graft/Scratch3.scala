package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: phase-timed replica of q_sidecar_fresh to find where the
  * MERGE + OPTIMIZE + plane-refresh protocol spends its wall clock. */
object Scratch3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.queries.Q.benchLean = true
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[t] $label%-36s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    for (round <- 1 to 2) {
      println(s"== round $round ==")
      val tmp = graft.queries.Q.scratchDir("sidecar_scratch")
      try {
        val path = tmp.resolve("t").toString
        t("fixture write") {
          graft.queries.Q.load(spark, dir, "lineitem")
            .select(col("l_orderkey"), col("l_linenumber"),
              expr("l_orderkey div 1000").as("ok_bucket"),
              expr("l_orderkey * 10 + l_linenumber").as("uid"),
              col("l_partkey"), col("l_quantity"))
            .repartitionByRange(8, col("l_orderkey"))
            .sortWithinPartitions("l_orderkey")
            .write.parquet(path)
        }
        val bloomBits = t("bloom sizing count") {
          val perFile = spark.read.parquet(path).count() / 8
          var b = 1 << 16
          while (b.toLong < perFile * 8 && b < (1 << 22)) b <<= 1
          b
        }
        t("declare planes") {
          graft.sink.Sidecars.declare(spark, path, Seq(
            graft.sink.Sidecars.Stats("l_orderkey"),
            graft.sink.Sidecars.Zone(Seq("ok_bucket")),
            graft.sink.Sidecars.Bloom("uid", bits = bloomBits)))
        }
        t("probe key") {
          spark.read.parquet(path).agg(min(col("uid"))).head().getLong(0)
        }
        val kw = org.apache.spark.sql.expressions.Window
          .partitionBy("l_orderkey", "l_linenumber")
        val delta = t("delta build (lazy)") {
          spark.read.parquet(path)
            .withColumn("__kc", count(lit(1)).over(kw))
            .filter(col("__kc") === 1 &&
              col("l_orderkey").between(2000, 4999) &&
              pmod(col("l_orderkey"), lit(7)) === 0)
            .drop("__kc")
            .withColumn("l_quantity", col("l_quantity") + 100.0)
        }
        t("mergeInto") {
          graft.sink.StageWriter.mergeInto(spark, delta, path,
            Seq("l_orderkey", "l_linenumber"))
        }
        val tgt = math.max(64L * 1024, graft.sink.StageWriter.dirSize(
          java.nio.file.Paths.get(path)) / 12)
        t("optimize") {
          graft.sink.StageWriter.optimize(spark, path,
            targetFileBytes = tgt, statsColumn = Some("l_orderkey"))
        }
        t("final read") {
          spark.read.parquet(path).filter(col("l_orderkey") < 3000)
            .select(col("l_orderkey"), col("l_linenumber"),
              col("l_partkey"), col("l_quantity").as("q"))
            .orderBy("l_orderkey", "l_linenumber")
            .localCheckpoint().count()
        }
      } finally graft.sink.StageWriter.deleteRecursively(tmp)
    }
    spark.stop()
  }
}
