package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: where does a streaming-query LIFE's fixed cost sit?
  * Times 6 consecutive lives of a minimal file-source → memory-sink
  * query (same shape as the gate scaffolding) plus the batch twin, so
  * the per-life overhead (planning + checkpoint WAL + state init +
  * commit + stop) is measured directly rather than guessed. */
object StreamProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema

    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[sprof] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // batch twin: the floor the stream overhead sits on
    (1 to 3).foreach { i =>
      time(s"batch_agg_$i") {
        spark.read.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
          .groupBy("event_type").agg(count(lit(1))).collect()
      }
    }
    // stateless-agg stream life, memory sink (evt_stream_static shape)
    (1 to 6).foreach { i =>
      time(s"stream_agg_life_$i") {
        import org.apache.spark.sql.streaming.Trigger
        val in = spark.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
        val q = in.groupBy("event_type").agg(count(lit(1)).as("n"))
          .writeStream.format("memory").queryName(s"sprof_$i")
          .outputMode("complete").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
    }
    // zero-data stream life: pure scaffolding (plan + WAL + commit + stop)
    val empty = java.nio.file.Files.createTempDirectory("sprof_empty")
    spark.range(1).selectExpr("id AS event_id").write
      .parquet(empty.resolve("d").toString)
    (1 to 6).foreach { i =>
      time(s"stream_tiny_life_$i") {
        import org.apache.spark.sql.streaming.Trigger
        val in = spark.readStream
          .schema(spark.read.parquet(empty.resolve("d").toString).schema)
          .parquet(empty.resolve("d").toString)
        val q = in.writeStream.format("memory").queryName(s"sprof_t$i")
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
    }
    graft.sink.StageWriter.deleteRecursively(empty)
    spark.stop()
  }
}
