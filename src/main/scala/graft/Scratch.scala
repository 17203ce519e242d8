package graft
import org.apache.spark.sql.SparkSession
/** Dev scratchpad — driver-style smoke of SparkEntry.entry. */
object Scratch {
  def main(args: Array[String]): Unit = {
    // simulate the DRIVER's session (defaults, no engine configs) to prove
    // entry() self-configures what it needs
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    println(s"entry rows=${df.count()} cols=${df.columns.mkString(",")}")
    spark.stop()
  }
}
