package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** D242 — streaming PSI drift: counts survive the restart (versions
  * cumulative), an identical-to-reference window scores exactly 0, a
  * shifted window scores the closed-form value, nulls are filtered,
  * and bad configs refuse. */
class PsiStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def psiOf(counts: Seq[Long], ref: Seq[Long]): Double = {
    val k = ref.size
    val ta = counts.sum
    val tb = ref.sum
    var acc = BigDecimal(0)
    for (i <- 0 until k) {
      val pa = (counts(i) + 0.5) / (ta + 0.5 * k)
      val pr = (ref(i) + 0.5) / (tb + 0.5 * k)
      acc += BigDecimal((pa - pr) * math.log(pa / pr))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    acc.toDouble
  }

  test("restart-spanning counts, exact zero on the reference profile, " +
    "closed-form on a shifted one, null rows dropped") {
    val dir = Files.createTempDirectory("psistream").toString
    val (raw, outp, chk) = (s"$dir/raw", s"$dir/out", s"$dir/chk")
    val thresholds = Seq(10.0, 20.0)
    val ref = Seq(2L, 2L, 2L) // balanced reference
    def write(rows: Seq[(java.lang.Long, java.lang.Double)]): Unit = {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map(r => Row(r._1, r._2)), 1),
        StructType(Seq(StructField("w", LongType, true),
          StructField("v", DoubleType, true))))
        .write.mode("append").parquet(raw)
    }
    def run(): Unit = {
      val schema = spark.read.parquet(raw).schema
      val q = Streams.psiDriftStream(
          spark.readStream.schema(schema).parquet(raw), "w", "v",
          thresholds, ref)
        .toDF().writeStream.format("parquet").option("path", outp)
        .option("checkpointLocation", chk)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // epoch 1: window 1 gets half its (reference-shaped) data + a null
    write(Seq((1L, 5.0), (1L, 15.0), (1L, 25.0), (null, 9.0),
      (1L, null)))
    run()
    // epoch 2 after restart: the other half; window 2 all-low (shifted)
    write(Seq((1L, 6.0), (1L, 16.0), (1L, 26.0),
      (2L, 1.0), (2L, 2.0), (2L, 3.0)))
    run()
    val latest = spark.read.parquet(outp)
      .withColumn("rn", org.apache.spark.sql.functions.row_number()
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy("w").orderBy(col("ver").desc)))
      .filter(col("rn") === 1)
      .as[(Long, Long, Double, Int)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(latest(1L)._1 == 6L,
      s"window 1 must absorb both epochs (${latest(1L)})")
    assert(latest(1L)._2 == 0.0,
      "a window matching the reference profile scores exactly 0")
    assert(latest(2L) == ((3L, psiOf(Seq(3L, 0L, 0L), ref))),
      s"shifted window must score the closed form (${latest(2L)})")
    intercept[IllegalArgumentException] {
      Streams.psiDriftStream(spark.read.parquet(raw), "w", "v",
        thresholds, Seq(1L, 2L)) // wrong bin count
    }
  }
}
