package graft.sink

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Proves the bucketed-write scale story: two tables bucketed on the join
  * key produce a join plan with ZERO shuffle exchanges, and the join result
  * matches the plain (shuffled) join. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def countShuffles(df: org.apache.spark.sql.DataFrame): Int = {
    // force execution so AQE finalizes the plan, then walk it
    df.write.format("noop").mode("overwrite").save()
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[Int] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: ShuffleExchangeExec => 1 +: s.children.flatMap(walk)
      case other => other.children.flatMap(walk) ++
        other.subqueries.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan).sum
  }

  test("join on the bucket key runs with zero shuffle exchanges") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = spark.read.parquet(s"$dir/orders.parquet")
      val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
      StageWriter.writeBucketed(orders, "b_orders", Seq("o_orderkey"),
        numBuckets = 4, sortCols = Seq("o_orderkey"))
      StageWriter.writeBucketed(lineitem, "b_lineitem", Seq("l_orderkey"),
        numBuckets = 4, sortCols = Seq("l_orderkey"))
      val bo = spark.table("b_orders")
      val bl = spark.table("b_lineitem")
      val joined = bl.join(bo, bl("l_orderkey") === bo("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      // the groupBy key differs from the bucket key, so exactly ONE shuffle
      // (the aggregation) is allowed — the join itself must add none
      assert(countShuffles(joined) <= 1,
        "bucketed join must not shuffle either side")
      // and an aggregation ON the bucket key needs no shuffle at all
      val keyAgg = bl.groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      assert(countShuffles(keyAgg) == 0,
        "aggregation on the bucket key must not shuffle")
      // unbucketed twin shuffles both join sides
      val plain = lineitem.join(orders,
          lineitem("l_orderkey") === orders("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      assert(countShuffles(plain) >= 2)
      // same results
      val a = joined.orderBy("o_orderstatus").collect().map(_.toSeq)
      val b = plain.orderBy("o_orderstatus").collect().map(_.toSeq)
      assert(a.sameElements(b))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
