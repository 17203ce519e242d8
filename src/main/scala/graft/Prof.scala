package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the slowest bench queries. */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def time(label: String)(f: => Unit): Unit = {
      f // warmup
      val t0 = System.nanoTime(); f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    val docs = graft.queries.Q.load(spark, dir, "documents")
    // stage 1: portable chunks (md5 word hash + 64 bit-sums)
    time("simhash chunks only") {
      graft.llm.Dedup.simhashChunksPortable(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    // words+hash only (md5 cost isolated)
    time("explode+md5 only") {
      docs.select(col("doc_id"),
        explode(array_distinct(split(trim(lower(col("text"))), "\\s+"))).as("w"))
        .withColumn("h", graft.llm.Dedup.portableWordHash(col("w")))
        .write.format("noop").mode("overwrite").save()
    }
    // full pair mining
    time("simhash pairs full") {
      graft.llm.Dedup.simhashPairsPortable(docs, "doc_id", "text",
        maxHamming = 3, maxBucket = 256)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
