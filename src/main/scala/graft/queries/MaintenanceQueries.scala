package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import Q._

/** Round-8 maintenance plane: the lakehouse features that keep DERIVED
  * state (materialized rollups, cached results) correct while the base
  * tables move — answering from precomputed aggregates when exactly
  * equivalent, maintaining them under retractions, and never serving
  * stale derived data. Exact-arithmetic discipline throughout so the
  * DuckDB oracle replays bit-for-bit.
  */
object MaintenanceQueries {

  val defs: Map[String, Entry] = Map(

    // D164 — materialized-view auto-rewrite (plans.MvRewrite): a query
    // aggregating the BASE path is transparently answered from its
    // KB-scale rollup when the MV subsumes it (grouping ⊆ keys, exact
    // decimal sum / count(1)), with inventory-fingerprint staleness:
    // after an un-caught-up base write the rule STANDS DOWN and the base
    // answers. The gate require()s both plan shapes (MV scan first,
    // base scan after the append) AND that the MV-era answer equals the
    // fresh answer minus exactly the appended group.
    "q_mv_rewrite" -> (((spark, dir) => {
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
        LogicalRelation}
      val tmp = java.nio.file.Files.createTempDirectory("mv_gate")
      try {
        val base = tmp.resolve("base").toString
        val mvp = tmp.resolve("mv").toString
        load(spark, dir, "lineitem")
          .select(col("l_returnflag").as("rf"),
            col("l_linestatus").as("ls"), col("l_quantity").as("qty"))
          .repartition(4).write.parquet(base)
        graft.sink.StageWriter.overwrite(
          graft.operators.Rollup.build(
            spark.read.parquet(base), Seq("rf", "ls"), "qty"), mvp)
        graft.plans.MvRewrite.register(base, mvp, Seq("rf", "ls"), "qty")
        graft.plans.MvRewrite.ensureInstalled(spark)
        def q() = spark.read.parquet(base).groupBy("rf")
          .agg(sum(col("qty").cast(DecimalType(18, 2))).as("s"),
            count(lit(1)).as("n"))
          .select(col("rf"), col("s").cast("double").as("s"), col("n"))
        def scans(df: org.apache.spark.sql.DataFrame) =
          df.queryExecution.optimizedPlan.collect {
            case lr: LogicalRelation =>
              lr.relation.asInstanceOf[HadoopFsRelation]
                .location.rootPaths.map(_.toUri.getPath)
          }.flatten
        val served = q()
        require(scans(served).exists(_.endsWith("/mv")) &&
          !scans(served).exists(_.endsWith("/base")),
          "the subsuming aggregate must be answered from the MV")
        val fromMv = served.collect().map(r =>
          (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
        // base moves; the MV hasn't caught up — the rule must stand down
        import spark.implicits._
        Seq(("Z", "Z", 7.5)).toDF("rf", "ls", "qty")
          .write.mode("append").parquet(base)
        val fresh = q()
        require(scans(fresh).forall(!_.endsWith("/mv")),
          "a stale MV must never answer")
        val fromBase = fresh.collect().map(r =>
          (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
        require(fromBase - (("Z", 7.5, 1L)) == fromMv,
          "MV answer must equal the base answer on the shared groups")
        fresh.orderBy("rf").localCheckpoint()
      } finally graft.sink.StageWriter.deleteRecursively(tmp)
    }, Some("""
      WITH base AS (SELECT l_returnflag AS rf, l_quantity AS qty
                    FROM lineitem
                    UNION ALL SELECT 'Z', CAST(7.5 AS DOUBLE))
      SELECT rf, CAST(SUM(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM base GROUP BY rf ORDER BY rf"""))),

    // D165 — retraction-aware rollup maintenance (Rollup.applyChanges):
    // a REAL change feed (VersionedTable.diff between two committed
    // versions: deletes every orderkey%7=0 row, +100 on every %11=0
    // survivor — updates arrive as delete+insert pairs) maintains the
    // v1 rollup to EXACTLY the v2 rebuild (require()d via two-sided
    // exceptAll) without rescanning the base. Keys fully retracted
    // leave the rollup entirely.
    "q_rollup_cdc" -> (((spark, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("rollcdc_gate")
      try {
        val vt = tmp.resolve("orders").toString
        val orders = load(spark, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
        val v2 = orders.filter(pmod(col("o_orderkey"), lit(7)) =!= 0)
          .withColumn("o_totalprice",
            when(pmod(col("o_orderkey"), lit(11)) === 0,
              col("o_totalprice") + 100.0).otherwise(col("o_totalprice")))
        graft.sink.VersionedTable.commit(orders, vt)
        graft.sink.VersionedTable.commit(v2, vt)
        val changes = graft.sink.VersionedTable.diff(spark, vt, 1, 2)
        val r1 = graft.operators.Rollup.build(
          graft.sink.VersionedTable.read(spark, vt, Some(1)),
          Seq("o_custkey"), "o_totalprice")
        val maintained = graft.operators.Rollup.applyChanges(
          r1, changes, Seq("o_custkey"), "o_totalprice")
        val rebuilt = graft.operators.Rollup.build(
          graft.sink.VersionedTable.read(spark, vt, Some(2)),
          Seq("o_custkey"), "o_totalprice")
        require(maintained.exceptAll(rebuilt).isEmpty &&
          rebuilt.exceptAll(maintained).isEmpty,
          "maintain(diff) over build(v1) must equal build(v2) exactly")
        graft.operators.Rollup.readable(maintained)
          .orderBy("o_custkey").localCheckpoint()
      } finally graft.sink.StageWriter.deleteRecursively(tmp)
    }, Some("""
      WITH v2 AS (SELECT o_custkey,
                    CASE WHEN o_orderkey % 11 = 0
                         THEN o_totalprice + 100.0
                         ELSE o_totalprice END AS p
                  FROM orders WHERE o_orderkey % 7 <> 0)
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM v2 GROUP BY o_custkey ORDER BY o_custkey""")))
  )
}
