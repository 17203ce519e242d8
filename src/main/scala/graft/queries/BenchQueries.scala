package graft.queries

import org.apache.spark.sql.functions._
import Q._

/** Headline analytical queries (TPC-H-shaped) — the performance surface the
  * bench times. Plans verified with .explain("formatted"): filters reach the
  * parquet scan (PushedFilters), dims broadcast, aggregates partial-agg
  * before the shuffle.
  */
object BenchQueries {

  val defs: Map[String, Entry] = Map(

    // Set operations (the reference never generates them; Spark surfaces
    // them free — included so the engine's query capabilities are explicit)
    "q_setops" -> (((spark, dir) => {
      val c = load(spark, dir, "customer")
      val building = c.filter(col("c_mktsegment") === "BUILDING")
        .select("c_nationkey")
      val machinery = c.filter(col("c_mktsegment") === "MACHINERY")
        .select("c_nationkey")
      val both = building.intersect(machinery)
        .withColumn("op", lit("intersect"))
      val onlyB = building.except(machinery).withColumn("op", lit("except"))
      val all = building.union(machinery).distinct()
        .withColumn("op", lit("union"))
      both.unionByName(onlyB).unionByName(all)
        .groupBy("op").agg(count(lit(1)).as("n"))
        .orderBy("op")
    }, Some("""
      WITH b AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'),
           m AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'),
      u AS (
        SELECT 'intersect' AS op, c_nationkey FROM (SELECT * FROM b INTERSECT SELECT * FROM m)
        UNION ALL
        SELECT 'except', c_nationkey FROM (SELECT * FROM b EXCEPT SELECT * FROM m)
        UNION ALL
        SELECT 'union', c_nationkey FROM (SELECT * FROM b UNION SELECT * FROM m))
      SELECT op, count(*) AS n FROM u GROUP BY op ORDER BY op"""))),

    // ROLLUP with grouping indicators (labels via coalesce for stable hash)
    "q_rollup" -> (((spark, dir) => {
      load(spark, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("qty"))
        .orderBy("rf", "ls")
    }, Some("""
      SELECT coalesce(l_returnflag, 'ALL') AS rf,
             coalesce(l_linestatus, 'ALL') AS ls, count(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY rf, ls"""))),

    // Ranking windows (rank / dense_rank / ntile per nation by balance)
    "q_window_rank" -> (((spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      load(spark, dir, "customer")
        .select(col("c_nationkey"), col("c_custkey"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"))
        .filter(col("rnk") <= 5)
        .orderBy("c_nationkey", "rnk", "c_custkey")
    }, Some("""
      SELECT c_nationkey, c_custkey, rnk, drnk, quartile FROM (
        SELECT c_nationkey, c_custkey,
               rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
               ntile(4) OVER w AS quartile
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey
                     ORDER BY c_acctbal DESC, c_custkey ASC))
      WHERE rnk <= 5 ORDER BY c_nationkey, rnk, c_custkey"""))),

    // Q1-style pricing summary: single scan, partial-agg, 4-group output
    "q1_pricing" -> (((spark, dir) => {
      load(spark, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base"),
          sum((d18(col("l_extendedprice")) *
            (lit(1) - col("l_discount").cast("decimal(3,2)")))
            .cast("decimal(18,4)")).cast("double").as("sum_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    }, Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (1 - CAST(l_discount AS DECIMAL(3,2)))
                  AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc,
             count(*) AS n
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))),

    // Q3-style shipping priority: 3-way join, top-10 by exact decimal revenue
    "q3_topk" -> (((spark, dir) => {
      val c = load(spark, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val o = load(spark, dir, "orders")
        .filter(col("o_orderdate") < lit("1997-06-01"))
      val l = load(spark, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1997-06-01"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(sum((d18(col("l_extendedprice")) *
            (lit(1) - col("l_discount").cast("decimal(3,2)")))
            .cast("decimal(18,4)")).cast("double").as("revenue"))
        .select(col("o_orderkey"), col("o_orderdate").cast("date").as("od"),
          col("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }, Some("""
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (1 - CAST(l_discount AS DECIMAL(3,2)))
                  AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
      GROUP BY o_orderkey, o_orderdate
      ORDER BY revenue DESC, o_orderkey LIMIT 10"""))),

    // Q5-style star join: region→nation→customer→orders→lineitem with
    // broadcast dims, revenue by nation
    "q5_starjoin" -> (((spark, dir) => {
      val region = load(spark, dir, "region").filter(col("r_name") === "ASIA")
      val nation = load(spark, dir, "nation")
      val customer = load(spark, dir, "customer")
      val orders = load(spark, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01") &&
          col("o_orderdate") < lit("1997-01-01"))
      val lineitem = load(spark, dir, "lineitem")
      lineitem
        .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
        .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
        .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum((d18(col("l_extendedprice")) *
            (lit(1) - col("l_discount").cast("decimal(3,2)")))
            .cast("decimal(18,4)")).cast("double").as("revenue"),
          count(lit(1)).as("n"))
        .orderBy(col("n_name"))
    }, Some("""
      SELECT n_name,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (1 - CAST(l_discount AS DECIMAL(3,2)))
                  AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             count(*) AS n
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY n_name ORDER BY n_name""")))
  )
}
