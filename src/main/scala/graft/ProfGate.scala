package graft

import org.apache.spark.sql.SparkSession

/** Dev profiler: run named gates with a job/stage listener and print the
  * per-job wall clock + per-stage executor time, so optimization targets
  * the actual cost inside a gate instead of guesses. Not part of the
  * driver contract (a scratch main like OneOff/Prof).
  *
  * Usage: dev/run_main.sh graft.ProfGate <sfDir> <cpus> <gate>[,<gate>...]
  */
object ProfGate {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = args(1)
    val names = args(2).split(",").toSeq
    val b0 = SparkEntry.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
    // extra confs for A/B runs: SPARK_GRAFT_PROF_CONF="k=v;k=v"
    val b = sys.env.get("SPARK_GRAFT_PROF_CONF").fold(b0) { s =>
      s.split(";").filter(_.nonEmpty).foldLeft(b0) { (acc, kv) =>
        val Array(k, v) = kv.split("=", 2); acc.config(k, v)
      }
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.queries.Q.benchLean = true

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var collecting = false
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (collecting)
          jobs.put(j.jobId, (System.nanoTime(),
            Option(j.properties.getProperty("spark.job.description"))
              .getOrElse("")))
      override def onJobEnd(
          j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (collecting) Option(jobs.get(j.jobId)).foreach { case (t0, d) =>
          val ms = (System.nanoTime() - t0) / 1e6
          if (ms > 15) println(f"[job] ${j.jobId}%4d ${ms / 1000.0}%7.3f s  $d")
        }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (collecting) {
          val i = sc.stageInfo
          val ms = i.taskMetrics.executorRunTime
          if (ms > 150)
            println(f"[stage] ${i.stageId}%4d ${ms / 1000.0}%7.2f s-exec " +
              f"${i.numTasks}%3dt  ${i.name.take(100)}")
        }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warmup (uncollected)
      val w0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      println(f"===== $name warm=${(System.nanoTime() - w0) / 1e9}%.2f s =====")
      collecting = true
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      collecting = false
      spark.catalog.clearCache()
      Thread.sleep(300)
      println(f"===== $name total=$total%.2f s =====")
    }
    spark.stop()
  }
}
