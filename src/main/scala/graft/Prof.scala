package graft
import org.apache.spark.sql.SparkSession
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val qs = SparkEntry.queries
    for (name <- Seq("dd_minhash", "dd_ngram")) {
      for (i <- 1 to 3) {
        val df = qs(name)(spark, dir)
        val t0 = System.nanoTime()
        val plan = df.queryExecution.executedPlan // forces analysis+optimization+planning
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        println(f"$name%-18s iter$i plan=${(t1-t0)/1e9}%.2fs exec=${(t2-t1)/1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
