package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for the streaming-gate wall: phase-timed replays of the
  * three slowest protocol gates (run
  * `sbt "runMain graft.Prof <sfDir> <which>"`). Not part of the driver
  * contract — a scratch main like OneOff/Scratch. */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    // stage-level breakdown: name + executor-run time per stage
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val i = sc.stageInfo
          val ms = i.taskMetrics.executorRunTime
          if (ms > 200)
            println(f"[stage] ${i.stageId}%4d ${ms / 1000.0}%7.2f s-exec  " +
              i.name.take(90))
        }
      })
    args(1) match {
      case "neardup" => for (_ <- 1 to 2) graft.queries.Q.withStreamPartitions(spark, 4) {
        import org.apache.spark.sql.streaming.Trigger
        val tmp = java.nio.file.Files.createTempDirectory("prof_nd")
        val (raw, outp, chk) = (tmp.resolve("raw").toString,
          tmp.resolve("out").toString, tmp.resolve("chk").toString)
        val docs = graft.queries.Q.load(spark, dir, "documents")
          .select("doc_id", "text").filter(col("doc_id") % 2 === 0)
        t("write epoch1") {
          docs.filter(col("doc_id") < 250).coalesce(1).write.parquet(raw)
        }
        val schema = spark.read.parquet(raw).schema
        def run(tag: String): Unit = t(s"stream $tag") {
          val q = graft.streaming.Streams
            .nearDupStream(spark.readStream.schema(schema).parquet(raw),
              "doc_id", "text", shingleWidth = 3, k = 32, b = 8,
              threshold = 0.8)
            .toDF().writeStream.format("parquet")
            .option("path", outp).option("checkpointLocation", chk)
            .outputMode("append").trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        run("epoch1")
        t("write epoch2") {
          docs.filter(col("doc_id") >= 250).coalesce(1)
            .write.mode("append").parquet(raw)
        }
        run("epoch2")
        t("final agg") {
          spark.read.parquet(outp).groupBy("doc_id")
            .agg(max(col("is_dup")).as("is_dup")).count()
        }
        graft.sink.StageWriter.deleteRecursively(tmp)
      }
      case "jdbc" => graft.queries.Q.withStreamPartitions(spark, 4) {
        import org.apache.spark.sql.{Dataset, Row}
        val url = "jdbc:derby:memory:profx;create=true"
        val tbl = s"sink_prof${System.nanoTime() % 100000}"
        val tmp = java.nio.file.Files.createTempDirectory("prof_jdbc")
        val (raw, chk) = (tmp.resolve("raw").toString,
          tmp.resolve("chk").toString)
        val ev = graft.queries.Q.load(spark, dir, "events")
        t("write half") {
          ev.filter(col("event_id") % 2 === 0).coalesce(4).write.parquet(raw)
        }
        def run(tag: String): Unit = t(s"stream $tag") {
          val schema = spark.read.parquet(raw).schema
          val q = spark.readStream.schema(schema).parquet(raw)
            .writeStream.option("checkpointLocation", chk)
            .foreachBatch { (b: Dataset[Row], id: Long) =>
              graft.sink.JdbcExactlyOnce.upsertBatch(url, tbl, b.toDF(),
                id, "event_id", "value")
            }
            .outputMode("update").start()
          q.processAllAvailable(); q.stop()
        }
        run("life1")
        t("write redelivery") {
          ev.filter(col("event_id") % 2 === 1)
            .unionByName(ev.filter(col("event_id") % 6 === 0))
            .coalesce(4).write.mode("append").parquet(raw)
        }
        run("life2")
        t("read back") {
          val p = new java.util.Properties()
          p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
          spark.read.jdbc(url, tbl, p).count()
        }
        graft.sink.StageWriter.deleteRecursively(tmp)
      }
      case "noop" => graft.queries.Q.withStreamPartitions(spark, 4) {
        // the irreducible lifecycle floor: schema-given file stream ->
        // parquet sink, AvailableNow, 1 tiny file, no state
        import org.apache.spark.sql.streaming.Trigger
        val tmp = java.nio.file.Files.createTempDirectory("prof_noop")
        val (raw, outp, chk) = (tmp.resolve("raw").toString,
          tmp.resolve("out").toString, tmp.resolve("chk").toString)
        spark.range(100).coalesce(1).write.parquet(raw)
        val sc = spark.read.parquet(raw).schema
        for (i <- 1 to 3) t(s"noop lifecycle $i") {
          val q = spark.readStream.schema(sc).parquet(raw)
            .writeStream.format("parquet").option("path", outp)
            .option("checkpointLocation", chk)
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        // and a stateful no-op: groupByKey count via flatMapGroupsWithState
        graft.sink.StageWriter.deleteRecursively(tmp)
      }
      case "jdbcraw" => graft.queries.Q.withStreamPartitions(spark, 4) {
        // no streaming at all: the pure Derby cost of the two publishes
        val url = "jdbc:derby:memory:profy;create=true"
        val tbl = s"sink_raw${System.nanoTime % 100000}"
        val ev = graft.queries.Q.load(spark, dir, "events")
        val b1 = ev.filter(col("event_id") % 2 === 0)
        val b2 = ev.filter(col("event_id") % 2 === 1)
          .unionByName(ev.filter(col("event_id") % 6 === 0))
        b1.count(); b2.count() // materialize inputs outside the timer
        t("upsert batch0 (50k)") {
          graft.sink.JdbcExactlyOnce.upsertBatch(url, tbl, b1, 0L,
            "event_id", "value", stagingPartitions = 1)
        }
        t("upsert batch1 (66k)") {
          graft.sink.JdbcExactlyOnce.upsertBatch(url, tbl, b2, 1L,
            "event_id", "value", stagingPartitions = 1)
        }
        t("replay noop") {
          graft.sink.JdbcExactlyOnce.upsertBatch(url, tbl, b2, 1L,
            "event_id", "value", stagingPartitions = 1)
        }
      }
      case "rollup" => graft.queries.Q.withStreamPartitions(spark, 4) {
        val tmp = java.nio.file.Files.createTempDirectory("prof_ru")
        val (feed, roll, chk) = (tmp.resolve("feed").toString,
          tmp.resolve("rollup").toString, tmp.resolve("chk").toString)
        val v1 = graft.queries.Q.load(spark, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
        val v2 = v1.filter(pmod(col("o_orderkey"), lit(7)) =!= 0)
          .withColumn("o_totalprice",
            when(pmod(col("o_orderkey"), lit(11)) === 0,
              col("o_totalprice") + 100.0).otherwise(col("o_totalprice")))
        t("feed epoch1") {
          v1.withColumn("change", lit("insert")).coalesce(1)
            .write.parquet(feed)
        }
        def run(tag: String): Unit = t(s"stream $tag") {
          val q = graft.streaming.Streams.rollupMaintainStream(spark,
            feed, roll, chk, Seq("o_custkey"), "o_totalprice")
          q.processAllAvailable(); q.stop(); q.awaitTermination()
        }
        run("life1")
        t("feed epoch2 (exceptAll x2)") {
          v2.exceptAll(v1).withColumn("change", lit("insert"))
            .unionByName(v1.exceptAll(v2)
              .withColumn("change", lit("delete")))
            .coalesce(1).write.mode("append").parquet(feed)
        }
        run("life2")
        t("fence replay") {
          graft.sink.StageWriter.deleteRecursively(
            java.nio.file.Paths.get(chk))
          val q = graft.streaming.Streams.rollupMaintainStream(spark,
            feed, roll, chk, Seq("o_custkey"), "o_totalprice")
          q.processAllAvailable(); q.stop(); q.awaitTermination()
        }
        t("compare x2 + read") {
          val rebuilt = graft.operators.Rollup.build(v2,
            Seq("o_custkey"), "o_totalprice")
          val after = spark.read.parquet(roll)
          require(after.exceptAll(rebuilt).isEmpty &&
            rebuilt.exceptAll(after).isEmpty)
        }
        graft.sink.StageWriter.deleteRecursively(tmp)
      }
    }
    spark.stop()
  }
}
