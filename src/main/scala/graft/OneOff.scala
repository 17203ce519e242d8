package graft
import org.apache.spark.sql.SparkSession
object OneOff {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(args(1))(spark, args(0)).count()
    println(f"[oneoff] ${args(1)} ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
    spark.stop()
  }
}
