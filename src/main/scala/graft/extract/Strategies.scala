package graft.extract

import java.time.{Clock, ZoneId}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.{LoadMode, LoadType, TableConfig}
import graft.state.WatermarkStore

/** A declarative read plan: what to scan, project, filter, and how to
  * partition the scan. Strategies are PURE functions
  * `TableConfig × LoadMode × Clock × Option[watermark] → ReadPlan`
  * (SURVEY §7.2.3); the plan is then applied to a local DataFrame source or
  * rendered to dialect SQL for JDBC pushdown (SqlRender).
  */
final case class ReadPlan(
    projection: Seq[String],           // select-list expressions (may alias)
    filters: Seq[String],              // WHERE conjuncts (Spark SQL syntax)
    partitionColumn: Option[String],   // range-partitioned scan column
    numPartitions: Int,                // target parallelism for the scan
    saveWatermarkFrom: Option[String]) // column whose max becomes the new wm
{
  /** Apply to a DataFrame source (local mode). Projection and filters go
    * through `expr` so Catalyst pushes them into the scan. */
  def apply(df: DataFrame): DataFrame = {
    val filtered = filters.foldLeft(df)((d, f) => d.filter(expr(f)))
    if (projection.isEmpty || projection == Seq("*")) filtered
    else filtered.selectExpr(projection: _*)
  }

  /** SQL-mode application: registers the source (and any tables referenced
    * by correlated `IN (SELECT …)` FILTER_EXP fragments) as temp views and
    * runs one generated SELECT — the path that supports subquery filters,
    * which `Dataset.filter(expr(...))` cannot resolve (SURVEY §7.3 "the one
    * parsing wrinkle"). Catalyst rewrites the IN-subquery to a semi-join. */
  def applySql(spark: SparkSession, df: DataFrame, viewName: String,
      extraViews: Map[String, DataFrame] = Map.empty): DataFrame = {
    df.createOrReplaceTempView(viewName)
    extraViews.foreach { case (n, d) => d.createOrReplaceTempView(n) }
    val proj = if (projection.isEmpty) "*" else projection.mkString(", ")
    val where = if (filters.isEmpty) ""
      else " WHERE " + filters.map(f => s"($f)").mkString(" AND ")
    spark.sql(s"SELECT $proj FROM $viewName$where")
  }
}

/** Load-strategy factory (SURVEY A6–A10).
  *
  * Mirrors utils/extract_data_v2/strategies (implementations dir) and
  * artifacts/aws-glue/code/raw/extract_data.py:1117-1204:
  *  - Full          → plain scan (optionally range-partitioned via min/max probe)
  *  - TimeRange     → month window from clock + delays → FILTER_COLUMN template
  *  - Incremental   → watermark predicate `pcol > last` (fallback to TimeRange
  *                    month window when no watermark exists,
  *                    incremental.py:257-344)
  *  - BetweenDate   → explicit [start, end] range split into N slices
  *  - LoadMode      → INITIAL (full + save) / NORMAL (incremental) /
  *                    RESET (clear wm + full + save) / REPROCESS (re-run window)
  */
object Strategies {

  def plan(cfg: TableConfig, mode: LoadMode, clock: Clock, zone: ZoneId,
      store: Option[WatermarkStore] = None, project: String = "default")
      : ReadPlan = {
    val projection = Parsing.projectionList(cfg)
    val static = if (cfg.filterExp.trim.isEmpty) Nil else Seq(cfg.filterExp)
    val wmCol = Option(cfg.partitionColumn).map(_.trim).filter(_.nonEmpty)

    def fullPlan(save: Boolean) = ReadPlan(projection, static, wmCol,
      RangeSlicer.DefaultMaxPartitions,
      if (save) wmCol else None)

    def windowFilter(): Seq[String] = {
      val w = Windows.monthWindow(clock, zone, cfg.delayIncrementalIni,
        cfg.delayIncrementalEnd)
      val (lo, hi) = w.render(cfg.filterDataType)
      if (cfg.filterColumn.trim.isEmpty) Nil
      else Seq(Windows.substitute(cfg.filterColumn, lo, hi))
    }

    (cfg.loadType, mode) match {
      case (_, LoadMode.Initial) => fullPlan(save = true)
      case (_, LoadMode.Reset) =>
        store.foreach(_.delete(project, cfg.sourceTable,
          cfg.partitionColumn))
        fullPlan(save = true)
      case (LoadType.Full, _) => fullPlan(save = false)
      case (LoadType.TimeRange, _) | (_, LoadMode.Reprocess) =>
        ReadPlan(projection, static ++ windowFilter(), wmCol,
          RangeSlicer.DefaultMaxPartitions, wmCol)
      case (LoadType.Incremental, _) =>
        val last = for {
          s <- store; c <- wmCol
          v <- s.lastConfirmed(project, cfg.sourceTable, c)
        } yield v
        last match {
          case Some(v) =>
            // typed predicate `pcol > last` (incremental.py:331-344).
            // Only genuinely numeric literals render unquoted: a DATE
            // watermark like 2024-01-05 must be quoted or the predicate
            // becomes integer subtraction (2024-1-5 = 2018).
            val lit = if (v.matches("-?[0-9]+(\\.[0-9]+)?")) v
                      else s"'$v'"
            ReadPlan(projection, static :+ s"${wmCol.get} > $lit", wmCol,
              RangeSlicer.DefaultMaxPartitions, wmCol)
          case None => // no watermark yet → month-window fallback
            ReadPlan(projection, static ++ windowFilter(), wmCol,
              RangeSlicer.DefaultMaxPartitions, wmCol)
        }
      case (LoadType.BetweenDate, _) =>
        ReadPlan(projection, static ++ windowFilter(), wmCol,
          RangeSlicer.DefaultMaxPartitions, wmCol)
    }
  }

  /** Execute a plan against a local parquet "source" table, hand the
    * extracted frame to `deliver` (the load step — raw-zone write, count,
    * …), and advance the watermark only AFTER delivery succeeds (reference
    * orchestrator.py:579-607 confirms only once all chunks are loaded;
    * confirming before the data lands would make a failed write silently
    * skip that batch on the next NORMAL run).
    *
    * The new watermark (max of the partition column) is collected with
    * `observe` DURING delivery's action — the reference tracks a running
    * max while chunks stream through (orchestrator.py:559-565); a separate
    * `df.agg(max)` action would scan the 100 TB source a second time.
    * `deliver` must therefore run exactly one Spark action on the frame it
    * is given (a write or a count — both call sites do). If delivery
    * throws, no PENDING entry was ever written, which is equivalent to a
    * rollback. */
  def extract[T](spark: SparkSession, sourcePath: String, cfg: TableConfig,
      mode: LoadMode, clock: Clock, zone: ZoneId,
      store: Option[WatermarkStore], project: String = "default")
      (deliver: DataFrame => T): T = {
    val p = plan(cfg, mode, clock, zone, store, project)
    val df = p.apply(spark.read.parquet(sourcePath))
    (for { s <- store; c <- p.saveWatermarkFrom } yield (s, c)) match {
      case None => deliver(df)
      case Some((s, c)) =>
        val obs = org.apache.spark.sql.Observation(
          s"wm_${java.util.UUID.randomUUID()}")
        val out = deliver(df.observe(obs, max(expr(c)).cast("string").as("mx")))
        obs.get.get("mx").flatMap(Option(_)).map(_.toString).foreach { mx =>
          s.confirm(s.savePending(project, cfg.sourceTable, c, mx))
        }
        out
    }
  }
}

/** Projection-list parsing (SURVEY A1/A2): split COLUMNS on top-level commas
  * (paren/quote-aware — config strings contain function calls with commas),
  * prepend `ID_COLUMN as id` when configured, and de-dup the id expression
  * (reference extraction_strategy.py:77-114). */
object Parsing {
  def projectionList(cfg: TableConfig): Seq[String] = {
    val cols =
      if (cfg.columns.trim.isEmpty || cfg.columns.trim == "*") Seq("*")
      else graft.dsl.Parser.splitTopLevel(cfg.columns)
    val id = cfg.idColumn.trim
    if (id.isEmpty) cols
    else s"$id as id" +: cols.filterNot(_.equalsIgnoreCase(id))
  }
}
