package graft.queries

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.config.ColumnMetadata
import graft.magic.Magic
import graft.transform.TransformationEngine
import Q._

/** fn_transform_* DSL operators (SURVEY §2B) driven through the REAL engine
  * path: raw DSL strings → Parser → Transformations → TransformationEngine
  * single-select — then hash-matched against DuckDB CASE/cast equivalents.
  */
object DslQueries {

  private def meta(cols: (String, String, String)*): Seq[ColumnMetadata] =
    cols.zipWithIndex.map { case ((name, typ, tr), i) =>
      ColumnMetadata(name, i + 1, isFilterDate = false, isId = false,
        isOrderBy = false, isPartition = false, typ, "q", tr)
    }

  /** Injectable audit clock for fn_transform_Datetime(). */
  val auditNow: Timestamp = Timestamp.valueOf("2024-06-25 07:00:00")

  val defs: Map[String, Entry] = Map(

    // B1 — ClearString: trim + null-marker mapping with $-literal default
    "b1_clearstring" -> (((spark, dir) => {
      val dirty = "case when c_custkey % 13 = 0 then null " +
        "when c_custkey % 7 = 0 then '  ' " +
        "when c_custkey % 11 = 0 then 'None' " +
        "else concat('  ', c_name, '  ') end"
      val src = load(spark, dir, "customer").withColumn("dirty", expr(dirty))
      TransformationEngine.apply(src, meta(
        ("c_custkey", "bigint", ""),
        ("cleaned", "string", "fn_transform_ClearString(dirty, $UNKNOWN)"),
        ("cleaned_null", "string", "fn_transform_ClearString(dirty)")))
        .orderBy("c_custkey")
    }, Some("""
      WITH src AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 13 = 0 THEN NULL
                    WHEN c_custkey % 7 = 0 THEN '  '
                    WHEN c_custkey % 11 = 0 THEN 'None'
                    ELSE concat('  ', c_name, '  ') END AS dirty
        FROM customer)
      SELECT c_custkey,
             CASE WHEN dirty IS NULL OR trim(dirty) = ''
                       OR trim(dirty) IN ('None','NULL','null')
                  THEN 'UNKNOWN' ELSE trim(dirty) END AS cleaned,
             CASE WHEN dirty IS NULL OR trim(dirty) = ''
                       OR trim(dirty) IN ('None','NULL','null')
                  THEN NULL ELSE trim(dirty) END AS cleaned_null
      FROM src ORDER BY c_custkey"""))),

    // B2/B3 — pipe-key Concatenate + Concatenate_ws with explicit separator
    "b2_concatenate" -> (((spark, dir) => {
      TransformationEngine.apply(load(spark, dir, "nation"), meta(
        ("n_nationkey", "int", ""),
        ("id_key", "string", "fn_transform_Concatenate(n_nationkey, n_name)"),
        ("id_dash", "string",
          "fn_transform_Concatenate_ws(n_regionkey, n_name, $-)")))
        .orderBy("n_nationkey")
    }, Some("""
      SELECT n_nationkey,
             concat_ws('|', coalesce(trim(CAST(n_nationkey AS VARCHAR)), ''),
                            coalesce(trim(n_name), '')) AS id_key,
             concat_ws('-', coalesce(trim(CAST(n_regionkey AS VARCHAR)), ''),
                            coalesce(trim(n_name), '')) AS id_dash
      FROM nation ORDER BY n_nationkey"""))),

    // B3 standalone — Concatenate_ws: explicit separator (last $-token),
    // three parts, a NULL part coalesces to '' and KEEPS its separator
    // (light_transform.py:937-951)
    "b3_concat_ws" -> (((spark, dir) => {
      val src = load(spark, dir, "supplier").withColumn("nat",
        when(col("s_suppkey") % 10 === 0, lit(null))
          .otherwise(col("s_nationkey").cast("string")))
      TransformationEngine.apply(src, meta(
        ("s_suppkey", "bigint", ""),
        ("key3", "string",
          "fn_transform_Concatenate_ws(s_suppkey, nat, s_name, $_)")))
        .orderBy("s_suppkey")
    }, Some("""
      SELECT s_suppkey,
             concat_ws('_', coalesce(trim(CAST(s_suppkey AS VARCHAR)), ''),
                            coalesce(CASE WHEN s_suppkey % 10 = 0 THEN NULL
                              ELSE trim(CAST(s_nationkey AS VARCHAR)) END, ''),
                            coalesce(trim(s_name), '')) AS key3
      FROM supplier ORDER BY s_suppkey"""))),

    // B11 standalone — Case: value-list rewrite, UNMATCHED keeps the
    // trimmed original (no default — that's B12's contract)
    // (light_transform.py:1215-1246)
    "b11_case" -> (((spark, dir) => {
      TransformationEngine.apply(load(spark, dir, "part"), meta(
        ("p_partkey", "bigint", ""),
        ("brand_class", "string",
          "fn_transform_Case(p_brand, Brand#11|Brand#12->tier1, Brand#55->tier5)")))
        .orderBy("p_partkey")
    }, Some("""
      SELECT p_partkey,
             CASE WHEN p_brand IN ('Brand#11','Brand#12') THEN 'tier1'
                  WHEN p_brand = 'Brand#55' THEN 'tier5'
                  ELSE trim(p_brand) END AS brand_class
      FROM part ORDER BY p_partkey"""))),

    // B14 standalone — Numeric: the cast takes precision/scale from the
    // TARGET type's numeric(p,s); null input stays typed null
    // (light_transform.py:967-971,1346-1354)
    "b14_numeric" -> (((spark, dir) => {
      val src = load(spark, dir, "part")
        .withColumn("s_price", col("p_retailprice").cast("string"))
        .withColumn("s_opt", when(col("p_partkey") % 9 === 0, lit(null))
          .otherwise(col("p_retailprice").cast("string")))
      TransformationEngine.apply(src, meta(
        ("p_partkey", "bigint", ""),
        ("price4", "numeric(18,4)", "fn_transform_Numeric(s_price)"),
        ("price2", "numeric(8,2)", "fn_transform_Numeric(s_opt)")))
        .withColumn("price4", col("price4").cast("string"))
        .withColumn("price2", col("price2").cast("string"))
        .orderBy("p_partkey")
    }, Some("""
      SELECT p_partkey,
             CAST(CAST(CAST(p_retailprice AS VARCHAR) AS DECIMAL(18,4))
               AS VARCHAR) AS price4,
             CASE WHEN p_partkey % 9 = 0 THEN NULL
                  ELSE CAST(CAST(CAST(p_retailprice AS VARCHAR)
                    AS DECIMAL(8,2)) AS VARCHAR) END AS price2
      FROM part ORDER BY p_partkey"""))),

    // B4 — DateMagic: magic day-number decode, null → default(to_null)
    "b4_datemagic" -> (((spark, dir) => {
      val src = load(spark, dir, "orders").withColumn("fec",
        when(col("o_custkey") % 13 === 0, lit(null))
          .otherwise(Magic.dateToMagicDay(col("o_orderdate").cast("date"))
            .cast("string")))
      TransformationEngine.apply(src, meta(
        ("o_orderkey", "bigint", ""),
        ("decoded", "date", "fn_transform_DateMagic(fec, yyyyMMdd, to_null)")))
        .orderBy("o_orderkey")
    }, Some("""
      SELECT o_orderkey,
             CASE WHEN o_custkey % 13 = 0 THEN NULL
                  ELSE CAST(o_orderdate AS DATE) END AS decoded
      FROM orders ORDER BY o_orderkey"""))),

    // B5 — DatetimeMagic: magic date + HHMMSS time → timestamp
    "b5_datetimemagic" -> (((spark, dir) => {
      val src = load(spark, dir, "orders")
        .withColumn("fec", Magic.dateToMagicDay(col("o_orderdate").cast("date"))
          .cast("string"))
        .withColumn("hora", expr(
          """concat(lpad(cast(o_orderkey % 24 as string), 2, '0'),
            |lpad(cast((o_orderkey div 7) % 60 as string), 2, '0'),
            |lpad(cast((o_orderkey div 11) % 60 as string), 2, '0'))"""
            .stripMargin.replaceAll("\n", " ")))
      TransformationEngine.apply(src, meta(
        ("o_orderkey", "bigint", ""),
        ("ts_out", "timestamp",
          "fn_transform_DatetimeMagic(fec, hora, yyyyMMdd)")))
        .select(col("o_orderkey"), fmtTs(col("ts_out")).as("ts_str"))
        .orderBy("o_orderkey")
    }, Some("""
      SELECT o_orderkey,
             strftime(CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP)
               + (o_orderkey % 24) * INTERVAL 1 HOUR
               + ((o_orderkey // 7) % 60) * INTERVAL 1 MINUTE
               + ((o_orderkey // 11) % 60) * INTERVAL 1 SECOND,
               '%Y-%m-%d %H:%M:%S') AS ts_str
      FROM orders ORDER BY o_orderkey"""))),

    // B6 — Datetime(): injected audit clock; Datetime(col): parse
    "b6_datetime" -> (((spark, dir) => {
      val src = load(spark, dir, "orders").withColumn("lm",
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))
      TransformationEngine.apply(src, meta(
        ("o_orderkey", "bigint", ""),
        ("processdate", "timestamp", "fn_transform_Datetime()"),
        ("lastmodifydate", "timestamp", "fn_transform_Datetime(lm)")),
        now = Some(auditNow))
        .select(col("o_orderkey"), fmtTs(col("processdate")).as("processdate"),
          fmtTs(col("lastmodifydate")).as("lastmodifydate"))
        .orderBy("o_orderkey")
    }, Some("""
      SELECT o_orderkey, '2024-06-25 07:00:00' AS processdate,
             strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS lastmodifydate
      FROM orders ORDER BY o_orderkey"""))),

    // B7 — plain Date parse with format + default
    "b7_date" -> (((spark, dir) => {
      val src = load(spark, dir, "orders")
        .withColumn("fstr", when(col("o_custkey") % 11 === 0, lit("garbage"))
          .otherwise(date_format(col("o_orderdate"), "yyyyMMdd")))
      TransformationEngine.apply(src, meta(
        ("o_orderkey", "bigint", ""),
        ("parsed", "date", "fn_transform_Date(fstr, yyyyMMdd, to_null)"),
        ("parsed_dflt", "date",
          "fn_transform_Date(fstr, yyyyMMdd, $1900-01-01)")))
        .orderBy("o_orderkey")
    }, Some("""
      SELECT o_orderkey,
             CASE WHEN o_custkey % 11 = 0 THEN NULL
                  ELSE CAST(o_orderdate AS DATE) END AS parsed,
             CASE WHEN o_custkey % 11 = 0 THEN DATE '1900-01-01'
                  ELSE CAST(o_orderdate AS DATE) END AS parsed_dflt
      FROM orders ORDER BY o_orderkey"""))),

    // B8+B9 — PeriodMagic (nulls → 190001) and nested
    // Date_to_String(DateMagic(…)) invocation
    "b9_periodmagic" -> (((spark, dir) => {
      val src = load(spark, dir, "orders")
        .withColumn("mes", when(col("o_custkey") % 13 === 0, lit(null))
          .otherwise(month(col("o_orderdate")).cast("string")))
        .withColumn("anio", when(col("o_custkey") % 13 === 0, lit(null))
          .otherwise(year(col("o_orderdate")).cast("string")))
        .withColumn("fec", Magic.dateToMagicDay(col("o_orderdate").cast("date"))
          .cast("string"))
      TransformationEngine.apply(src, meta(
        ("o_orderkey", "bigint", ""),
        ("periodo", "string", "fn_transform_PeriodMagic(mes, anio)"),
        ("periodo_nested", "string",
          "fn_transform_Date_to_String(fn_transform_DateMagic(fec, yyyyMMdd), yyyyMM)")))
        .orderBy("o_orderkey")
    }, Some("""
      SELECT o_orderkey,
             CASE WHEN o_custkey % 13 = 0 THEN '190001'
                  ELSE concat(CAST(year(o_orderdate) AS VARCHAR),
                              lpad(CAST(month(o_orderdate) AS VARCHAR), 2, '0'))
             END AS periodo,
             strftime(CAST(o_orderdate AS DATE), '%Y%m') AS periodo_nested
      FROM orders ORDER BY o_orderkey"""))),

    // B10 — ByteMagic: FoxPro T/F byte decode with $F default
    "b10_bytemagic" -> (((spark, dir) => {
      val src = load(spark, dir, "part").withColumn("flg", expr(
        "element_at(array('T','F','0x54','0x46','84','70','X', null), " +
          "cast(p_partkey % 8 as int) + 1)"))
      TransformationEngine.apply(src, meta(
        ("p_partkey", "bigint", ""),
        ("flag", "string", "fn_transform_ByteMagic(flg, $F)")))
        .orderBy("p_partkey")
    }, Some("""
      SELECT p_partkey,
             CASE WHEN (['T','F','0x54','0x46','84','70','X',NULL])[CAST(p_partkey % 8 AS INT) + 1]
                       IN ('T','0x54','84') THEN 'T' ELSE 'F' END AS flag
      FROM part ORDER BY p_partkey"""))),

    // B11+B12 — Case value-rewrite and Case_with_default incl. `&`-composite
    "b12_case_default" -> (((spark, dir) => {
      val src = load(spark, dir, "customer").withColumn("parity",
        expr("case when c_nationkey % 2 = 1 then 'odd' else 'even' end"))
      TransformationEngine.apply(src, meta(
        ("c_custkey", "bigint", ""),
        ("seg_case", "string",
          "fn_transform_Case(c_mktsegment, BUILDING|AUTOMOBILE->retail, MACHINERY->industrial)"),
        ("seg_dflt", "string",
          "fn_transform_Case_with_default(c_mktsegment, BUILDING|AUTOMOBILE->retail, MACHINERY->industrial, $other)"),
        ("seg_comp", "string",
          "fn_transform_Case_with_default(c_mktsegment&parity, BUILDING&odd->special, $normal)")))
        .orderBy("c_custkey")
    }, Some("""
      SELECT c_custkey,
             CASE WHEN c_mktsegment IN ('BUILDING','AUTOMOBILE') THEN 'retail'
                  WHEN c_mktsegment = 'MACHINERY' THEN 'industrial'
                  ELSE trim(c_mktsegment) END AS seg_case,
             CASE WHEN c_mktsegment IN ('BUILDING','AUTOMOBILE') THEN 'retail'
                  WHEN c_mktsegment = 'MACHINERY' THEN 'industrial'
                  ELSE 'other' END AS seg_dflt,
             CASE WHEN c_mktsegment = 'BUILDING' AND c_nationkey % 2 = 1
                  THEN 'special' ELSE 'normal' END AS seg_comp
      FROM customer ORDER BY c_custkey"""))),

    // B13+B14 — typed casts from stringified raw values (raw zone semantics)
    "b13_casts" -> (((spark, dir) => {
      val src = load(spark, dir, "part")
        .withColumn("s_size", col("p_size").cast("string"))
        .withColumn("s_price", col("p_retailprice").cast("string"))
        .withColumn("s_flag", expr(
          "case when p_partkey % 2 = 0 then 'true' else 'false' end"))
      TransformationEngine.apply(src, meta(
        ("p_partkey", "bigint", ""),
        ("size_i", "integer", "fn_transform_Integer(s_size)"),
        ("price_d", "double", "fn_transform_Double(s_price)"),
        ("price_n", "numeric(13,2)", "fn_transform_Numeric(s_price)"),
        ("flag_b", "boolean", "fn_transform_Boolean(s_flag)")))
        // decimal → string output: both engines render scale-2 decimals as
        // '901.00', while a decimal column would hash-mismatch at the driver
        // (pyarrow Decimal repr vs DuckDB float repr)
        .withColumn("price_n", col("price_n").cast("string"))
        .orderBy("p_partkey")
    }, Some("""
      SELECT p_partkey,
             CAST(CAST(p_size AS VARCHAR) AS INT) AS size_i,
             CAST(CAST(p_retailprice AS VARCHAR) AS DOUBLE) AS price_d,
             CAST(CAST(CAST(p_retailprice AS VARCHAR) AS DECIMAL(13,2)) AS VARCHAR) AS price_n,
             CAST(p_partkey % 2 = 0 AS BOOLEAN) AS flag_b
      FROM part ORDER BY p_partkey""")))
  )
}
