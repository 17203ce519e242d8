package graft.plans

import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, ShuffleQueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Runtime scale behaviors, asserted on executed plans:
  *
  *  - AQE splits a skewed join partition (the engine's skew answer for
  *    JOINS — q_salted_agg is the manual answer for AGGREGATIONS);
  *  - BloomPrune measurably shrinks the fact side's shuffle (the bytes
  *    evidence behind the q_bloom_join design comment).
  */
class ScaleBehaviorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE skew-join splits the hot key's partition") {
    withConf(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // 1 hot key with 60k rows vs 99 keys with ~60 each
      val fact = spark.range(66000)
        .select(when(col("id") < 60000, 0L).otherwise(col("id") % 100)
          .as("k"), col("id").as("payload"))
      val dim = spark.range(100).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("name"))
      val joined = fact.join(dim, "k")
      // collect() drives joined's OWN QueryExecution (count() would build
      // a different one and leave this plan un-finalized under AQE)
      assert(joined.collect().length == 66000)
      val root = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      assert(root.toString.contains("skew="),
        s"no skew-join marker in executed plan:\n$root")
    }
  }

  test("bloom pruning shrinks the fact-side shuffle bytes") {
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      // selective dim whose filter is on an attribute INDEPENDENT of the
      // key (a real table column), so Catalyst constraint propagation
      // cannot rewrite it onto the fact key — the runtime-selectivity case
      // bloom pruning exists for (any key-derivable synthetic filter gets
      // statically propagated and needs no bloom)
      val fact = spark.range(200000)
        .select((col("id") % 1500 + 1).as("fk"),
          concat(lit("row"), col("id")).as("payload"))
      val dim = spark.read
        .parquet("/root/testdata/sf0.001/customer.parquet")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("dk"))

      def factShuffleBytes(df: org.apache.spark.sql.DataFrame): Long = {
        df.collect() // drive THIS QueryExecution so its metrics populate
        val root = df.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        // query stages are LEAF nodes — plain collect stops at them, so
        // recurse through QueryStageExec.plan explicitly
        def all(p: org.apache.spark.sql.execution.SparkPlan)
            : Seq[org.apache.spark.sql.execution.SparkPlan] = p +: (p match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            all(q.plan)
          case other => other.children.flatMap(all)
        })
        val exchanges = all(root).collect { case s: ShuffleExchangeLike => s }
        exchanges.map(_.metrics("dataSize").value).max // fact side is larger
      }

      val plain = factShuffleBytes(
        fact.join(dim, col("fk") === col("dk")))
      val pruned = factShuffleBytes(graft.operators.BloomPrune
        .prunedJoin(fact, dim, "fk", "dk", 1000L, 80000L))
      assert(pruned * 5 < plain,
        s"expected >5x shuffle reduction, got plain=$plain pruned=$pruned")
    }
  }
}
