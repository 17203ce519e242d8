package graft.queries

import java.time.{Clock, Instant, ZoneId, ZoneOffset}
import org.apache.spark.sql.functions._
import graft.config.{LoadMode, LoadType, TableConfig}
import graft.extract.{ReadPlan, Strategies}
import graft.magic.Magic
import graft.state.InMemoryWatermarkStore
import Q._

/** Extraction-plane operators (SURVEY §2A) expressed over the testdata and
  * paired with DuckDB oracles. Each query drives the REAL engine path
  * (TableConfig → Strategy → ReadPlan → DataFrame) wherever the operator has
  * one, not a hand-inlined equivalent.
  */
object ExtractionQueries {

  private def cfg(loadType: LoadType = LoadType.Full, columns: String = "*",
      partitionColumn: String = "", filterColumn: String = "",
      filterDataType: String = "", filterExp: String = "", idColumn: String = "",
      delayIni: Int = 0, delayEnd: Int = 0): TableConfig =
    TableConfig(columns, loadType, "auto", partitionColumn, delayIni, delayEnd,
      filterColumn, filterDataType, filterExp, idColumn, "", "p1", "dbo",
      "src", "m", "stage", "a", "1")

  /** Fixed logical clock: 1997-09-15 (orders span 1992-1998). */
  private val fixedClock =
    Clock.fixed(Instant.parse("1997-09-15T12:00:00Z"), ZoneOffset.UTC)
  private val utc = ZoneId.of("UTC")

  val defs: Map[String, Entry] = Map[String, Entry](

    // A1/A2 — projection-list builder with expression + implicit alias,
    // driven through Parsing.projectionList (top-level comma split)
    "a1_projection" -> (((spark, dir) => {
      // exact decimal arithmetic end-to-end: double→decimal per COLUMN first,
      // then decimal×decimal (a double product would round differently per
      // engine: Spark casts via shortest-string HALF_UP, DuckDB rounds the
      // binary value)
      val c = cfg(columns = "l_orderkey, l_linenumber, " +
        "cast(cast(cast(l_extendedprice as decimal(18,2)) * " +
        "(1 - cast(l_discount as decimal(3,2))) as decimal(18,4)) " +
        "as double) net_price")
      val plan = Strategies.plan(c, LoadMode.Normal, fixedClock, utc)
      plan.apply(load(spark, dir, "lineitem"))
        .orderBy("l_orderkey", "l_linenumber")
    }, Some("""
      SELECT l_orderkey, l_linenumber,
             CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (1 - CAST(l_discount AS DECIMAL(3,2))) AS DECIMAL(18,4))
                  AS DOUBLE) AS net_price
      FROM lineitem ORDER BY l_orderkey, l_linenumber"""))),

    // A4 — static FILTER_EXP with IN-subquery semantics → left-semi join
    "a4_filter_semijoin" -> (((spark, dir) => {
      val orders = load(spark, dir, "orders")
      val building = load(spark, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      orders.join(building, orders("o_custkey") === building("c_custkey"),
          "left_semi")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").as("total"))
        .orderBy("o_orderkey")
    }, Some("""
      SELECT o_orderkey, o_custkey, o_totalprice AS total
      FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer
                          WHERE c_mktsegment = 'BUILDING')
      ORDER BY o_orderkey"""))),

    // A5 — configured join expression (free-text JOIN_EXPR → inner equi-join)
    "a5_join" -> (((spark, dir) => {
      val o = load(spark, dir, "orders")
      val l = load(spark, dir, "lineitem")
      o.join(l, o("o_orderkey") === l("l_orderkey"), "inner")
        .groupBy(col("o_orderkey"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_lines"),
          dsum(col("l_extendedprice")).as("revenue"))
        .orderBy("o_orderkey")
    }, Some("""
      SELECT o_orderkey, o_orderstatus, count(*) AS n_lines,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY o_orderkey, o_orderstatus
      ORDER BY o_orderkey"""))),

    // A6 — range-partitioned full scan: MIN/MAX probe → ≤30 proportional
    // slices; slice histogram proves the exact-cover property on real data
    "a6_range_slices" -> (((spark, dir) => {
      val o = load(spark, dir, "orders")
      val mm = o.agg(min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
      o.crossJoin(broadcast(mm))
        .withColumn("slice",
          expr("cast(((o_orderkey - lo) * 30) div (hi - lo + 1) as int)"))
        .groupBy("slice")
        .agg(count(lit(1)).as("n"), min("o_orderkey").as("lo_key"),
          max("o_orderkey").as("hi_key"))
        .orderBy("slice")
    }, Some("""
      SELECT CAST(((o_orderkey - lo) * 30) // (hi - lo + 1) AS INT) AS slice,
             count(*) AS n, min(o_orderkey) AS lo_key, max(o_orderkey) AS hi_key
      FROM orders, (SELECT min(o_orderkey) lo, max(o_orderkey) hi FROM orders)
      GROUP BY 1 ORDER BY 1"""))),

    // A7 — between-date split scan: explicit range divided into 4 equal
    // day-deltas, per-slice coverage stats
    "a7_between_slices" -> (((spark, dir) => {
      load(spark, dir, "orders")
        .filter(expr("cast(o_orderdate as date) between date'1995-01-01' " +
          "and date'1996-12-31'"))
        .withColumn("slice", expr(
          "cast((datediff(cast(o_orderdate as date), date'1995-01-01') * 4) " +
            "div 731 as int)"))
        .groupBy("slice")
        .agg(count(lit(1)).as("n"),
          min(col("o_orderdate").cast("date")).as("lo_date"),
          max(col("o_orderdate").cast("date")).as("hi_date"))
        .orderBy("slice")
    }, Some("""
      SELECT CAST((date_diff('day', DATE '1995-01-01',
                             CAST(o_orderdate AS DATE)) * 4) // 731 AS INT) AS slice,
             count(*) AS n, min(CAST(o_orderdate AS DATE)) AS lo_date,
             max(CAST(o_orderdate AS DATE)) AS hi_date
      FROM orders
      WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
      GROUP BY 1 ORDER BY 1"""))),

    // A8 — incremental month-window scan (engine: TimeRange strategy with a
    // fixed clock; window = month-start(now-2mo) .. month-end(now))
    "a8_month_window" -> (((spark, dir) => {
      val c = cfg(loadType = LoadType.TimeRange,
        filterColumn =
          "cast(o_orderdate as date) between date'{0}' and date'{1}'",
        delayIni = -2, delayEnd = 0)
      val plan = Strategies.plan(c, LoadMode.Normal, fixedClock, utc)
      plan.apply(load(spark, dir, "orders"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy("o_orderpriority")
    }, Some("""
      SELECT o_orderpriority, count(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1997-07-01' AND DATE '1997-09-30'
      GROUP BY 1 ORDER BY 1"""))),

    // A8b — same window rendered in MAGIC DAY units (aje_date) against a
    // magic-encoded column, exercising the magic-day inverse conversion
    "a8_magic_window" -> (((spark, dir) => {
      val c = cfg(loadType = LoadType.TimeRange,
        filterColumn = "feccompvta between {0} and {1}",
        filterDataType = "aje_date", delayIni = -2, delayEnd = 0)
      val plan = Strategies.plan(c, LoadMode.Normal, fixedClock, utc)
      val src = load(spark, dir, "orders").withColumn("feccompvta",
        Magic.dateToMagicDay(col("o_orderdate").cast("date")))
      plan.apply(src)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), min("feccompvta").as("lo_magic"),
          max("feccompvta").as("hi_magic"))
        .orderBy("o_orderstatus")
    }, {
      val lo = Magic.toMagicDay(java.time.LocalDate.of(1997, 7, 1))
      val hi = Magic.toMagicDay(java.time.LocalDate.of(1997, 9, 30))
      Some(s"""
      SELECT o_orderstatus, count(*) AS n, min(m) AS lo_magic, max(m) AS hi_magic
      FROM (SELECT o_orderstatus,
              date_diff('day', DATE '1900-01-01', CAST(o_orderdate AS DATE))
                + 693596 AS m
            FROM orders)
      WHERE m BETWEEN $lo AND $hi
      GROUP BY 1 ORDER BY 1""")
    })),

    // A9 — watermark incremental scan: typed predicate col > last-confirmed
    "a9_watermark_incr" -> (((spark, dir) => {
      val store = new InMemoryWatermarkStore
      store.confirm(store.savePending("p1", "src", "o_orderdate",
        "1997-01-01 00:00:00"))
      val c = cfg(loadType = LoadType.Incremental,
        partitionColumn = "o_orderdate")
      val plan = Strategies.plan(c, LoadMode.Normal, fixedClock, utc,
        Some(store), "p1")
      plan.apply(load(spark, dir, "orders"))
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate").cast("date").as("od"))
        .orderBy("o_orderkey")
    }, Some("""
      SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS od
      FROM orders WHERE o_orderdate > TIMESTAMP '1997-01-01 00:00:00'
      ORDER BY o_orderkey"""))),

    // A10 — load-mode state machine: INITIAL full-load confirms max(ts) as
    // the watermark; the following NORMAL run extracts zero rows
    "a10_load_modes" -> (((spark, dir) => {
      import spark.implicits._
      val store = new InMemoryWatermarkStore
      val c = cfg(loadType = LoadType.Incremental,
        partitionColumn = "o_orderdate")
      val src = s"$dir/orders.parquet"
      val initial = Strategies.extract(spark, src, c, LoadMode.Initial,
        fixedClock, utc, Some(store), "p1")(_.count())
      val normal = Strategies.extract(spark, src, c, LoadMode.Normal,
        fixedClock, utc, Some(store), "p1")(_.count())
      Seq(("initial", initial), ("normal", normal)).toDF("phase", "n")
        .orderBy("phase")
    }, Some("""
      SELECT 'initial' AS phase, count(*) AS n FROM orders
      UNION ALL SELECT 'normal' AS phase, 0 AS n
      ORDER BY phase"""))),

    // A11 — keyset pagination: ORDER BY … OFFSET … FETCH NEXT
    "a11_pagination" -> (((spark, dir) => {
      load(spark, dir, "orders")
        .orderBy("o_orderkey")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice").as("total"))
        .offset(100).limit(50)
    }, Some("""
      SELECT o_orderkey, o_orderstatus, o_totalprice AS total
      FROM orders ORDER BY o_orderkey OFFSET 100 LIMIT 50"""))),

    // A13 — row dedup
    "a13_distinct" -> (((spark, dir) => {
      load(spark, dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .dropDuplicates()
        .orderBy("l_returnflag", "l_linestatus")
    }, Some("""
      SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      ORDER BY l_returnflag, l_linestatus""")))
  ) ++ DialectQueries.defs
}
