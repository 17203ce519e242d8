package graft
import org.apache.spark.sql.SparkSession

/** Dev scratchpad.
  *
  * No args (the /verify recipe's step 4): driver-style smoke of
  * SparkEntry.entry — a DEFAULT session (no engine configs) proves
  * entry() self-configures what it needs.
  *
  * With args `<sfDir> <gate>...`: warm-session gate timer — runs each
  * named gate twice (JIT/IO warm) and reports the second run, comparable
  * to the bench's warm numbers.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      val spark = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val df = SparkEntry.entry(spark)
      println(s"entry rows=${df.count()} cols=${df.columns.mkString(",")}")
      spark.stop()
    } else {
      val spark = SparkEntry.configure(SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val dir = args.head
      args.drop(1).foreach { name =>
        SparkEntry.queries(name)(spark, dir).count() // warm
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, dir).count()
        println(f"[scratch] $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n rows)")
      }
      spark.stop()
    }
  }
}
