package graft.run

import java.sql.Timestamp
import java.time.{Clock, ZoneId}
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._
import scala.util.{Failure, Success, Try}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import graft.config.{ColumnMetadata, LoadMode, LoadType, TableConfig}
import graft.extract.Strategies
import graft.sink.StageWriter
import graft.state.WatermarkStore
import graft.transform.TransformationEngine

/** Per-table raw→stage pipeline + process-group scheduler (SURVEY C12, E1/E2).
  *
  * The reference's Step-Functions DAG (Map extract ≤15 ∥, Map transform
  * ≤60 ∥, 30 s polling) maps to driver-side bounded-parallel futures: Spark's
  * scheduler parallelizes WITHIN a table's job; the group scheduler overlaps
  * small tables' jobs the way the SF Map state does.
  */
final case class RunRecord(table: String, status: String, rows: Long,
    durationMs: Long, error: String = "")

object TablePipeline {

  /** Raw zone semantics: every column stringified before landing
    * (reference extract_data.py:694). */
  def toRawZone(df: DataFrame): DataFrame =
    df.select(df.columns.toSeq.map(c => col(c).cast(StringType).as(c)): _*)

  /** Extract one table's source to the raw zone (E1): strategy plan →
    * read → stringify → date-partitioned path write. The watermark is
    * confirmed by Strategies.extract only after the raw write succeeds
    * (rolled back on failure), so a failed write never skips a batch.
    * Returns row count, collected by `observe` DURING the write action —
    * re-reading the raw zone just to count it would scan the source a
    * second time (at 100 TB, a second full pass); this is the same
    * single-action discipline the watermark max already uses
    * (Strategies.extract). */
  def extract(spark: SparkSession, sourcePath: String, rawPath: String,
      cfg: TableConfig, mode: LoadMode, clock: Clock, zone: ZoneId,
      store: Option[WatermarkStore], project: String = "default"): Long = {
    val obs = org.apache.spark.sql.Observation(
      s"rows_${java.util.UUID.randomUUID()}")
    Strategies.extract(spark, sourcePath, cfg, mode, clock, zone,
      store, project) { df =>
      ScanBudget.enforce(df) // ambient budget rail (refuses pre-task)
      StageWriter.overwrite(
        toRawZone(df).observe(obs, count(lit(1)).as("n")), rawPath)
    }
    obs.get.get("n").flatMap(Option(_)).fold(0L)(_.toString.toLong)
  }

  /** Transform one table raw→stage (E2): read raw (cache + count-validate,
    * C1), DSL transform, dedup-latest, then MERGE for incremental loads into
    * an existing stage table or partitioned overwrite otherwise
    * (light_transform.py:1553-1564). Empty raw input bootstraps a typed
    * empty stage table with WARNING-not-fail semantics (C8). */
  def transform(spark: SparkSession, rawPath: String, stagePath: String,
      cfg: TableConfig, meta: Seq[ColumnMetadata],
      now: Option[Timestamp] = None): Long =
    transformWithStatus(spark, rawPath, stagePath, cfg, meta, now)._1

  /** As `transform`, but also surfaces the error-tier status: "WARNING"
    * when 10–50% of columns degraded to typed nulls (rows still written —
    * light_transform.py:1487-1509), "SUCCESS" otherwise; >50% throws.
    * Empty raw input is the C8 warn-not-fail bootstrap → WARNING. */
  def transformWithStatus(spark: SparkSession, rawPath: String,
      stagePath: String, cfg: TableConfig, meta: Seq[ColumnMetadata],
      now: Option[Timestamp] = None): (Long, String) = {
    // budget rail BEFORE cache(): the cache manager substitutes an
    // InMemoryRelation for a registered plan, hiding the file scan the
    // guard must price
    ScanBudget.enforce(spark.read.parquet(rawPath))
    val raw = spark.read.parquet(rawPath).cache()
    try {
      val n = raw.count()
      if (n == 0) {
        val schema = org.apache.spark.sql.types.StructType(
          meta.sortBy(_.columnId).map(m =>
            org.apache.spark.sql.types.StructField(m.columnName, m.sparkType)))
        StageWriter.writeEmpty(spark, schema, stagePath)
        return (0L, "WARNING")
      }
      val (staged, status) = TransformationEngine.runWithStatus(raw, meta, now)
      val ids = meta.filter(_.isId).map(_.columnName)
      val partitions = meta.filter(_.isPartition).map(_.columnName)
      val incremental = cfg.loadType == LoadType.Incremental ||
        cfg.loadType == LoadType.BetweenDate
      // governance PRE-FLIGHT (fail-closed, BEFORE any write): a raw
      // row policy (D193) propagates to the stage table when every
      // column its predicate references passes through a pure 1:1
      // rename — the predicate rewrites through the rename map with its
      // meaning intact (the reference's LF data-cell filters attach per
      // crawled stage table, crawler_stage.py:385-414). A policy
      // touching an EXPRESSION-DERIVED column (trimmed, re-typed,
      // case-mapped) stands down, and the transform REFUSES unless the
      // operator declared an EXPLICIT stage policy covering that
      // profile: silently dropping a raw row restriction on the stage
      // twin is the one failure governance must not have. Propagated
      // predicates land on the separate AUTO plane (provenance!):
      // REPLACED wholesale each run, so a changed raw policy can never
      // leave last run's derivation behind, and the cover check above
      // consults only genuine operator declarations — a previously
      // auto-propagated predicate cannot masquerade as explicit cover
      // for a policy that now stands down. Read-time the explicit and
      // auto planes AND (most restrictive wins), mirroring the
      // tag-merge rule below.
      val policyPlan: Option[Map[String, String]] = {
        val rawPolicies = graft.sources.AccessTags.rowPoliciesOf(rawPath)
        if (rawPolicies.isEmpty) None
        else {
          val (prop, stood) =
            graft.sources.AccessTags.rewriteRowPolicies(staged, rawPath)
          val explicitP = graft.sources.AccessTags.rowPoliciesOf(stagePath)
          val uncovered = stood.keySet -- explicitP.keySet
          require(uncovered.isEmpty,
            s"row policies for profile(s) ${uncovered.toSeq.sorted
              .mkString(", ")} on $rawPath reference expression-derived " +
              "columns and cannot rewrite through the rename map; declare " +
              "stage row policies for these profiles explicitly " +
              "(AccessTags.tagRows on the stage path) before transforming")
          Some(prop)
        }
      }
      // two-phase policy flip: the derived auto plane is STAGED before
      // the data write and promoted live atomically only after the
      // write succeeds. Neither single-step order is crash-safe on a
      // governance plane (tag-then-write leaves OLD data under NEW —
      // possibly loosened — policies; write-then-tag leaves NEW data
      // under OLD ones), so reads that find a leftover staged sidecar
      // AND both planes — fail-closed in both directions — until the
      // next successful run repairs the window (AccessTags.stageAutoRows
      // scaladoc carries the full argument). An empty plan stages an
      // empty plane, whose promotion clears the live plane: unpolicied
      // source, or every policy stood down behind explicit cover — a
      // stale derivation must not linger.
      graft.sources.AccessTags.stageAutoRows(stagePath,
        policyPlan.getOrElse(Map.empty))
      if (incremental && ids.nonEmpty &&
          java.nio.file.Files.exists(java.nio.file.Paths.get(stagePath)))
        StageWriter.mergeInto(spark, staged, stagePath, ids, partitions)
      else
        StageWriter.overwrite(staged, stagePath, partitions)
      graft.sources.AccessTags.promoteAutoRows(stagePath)
      // automatic governance inheritance (r10): a TAGGED raw source
      // propagates its plane to the stage table without a manual call —
      // the reference attaches LF-Tags to every crawled stage table
      // (crawler_stage.py:385-414). Value lineage of the TRANSFORMED
      // frame decides which stage columns inherit which tags; a
      // transform that drops every governed column inherits nothing
      // (the stage table stays default-closed for governed reads).
      if (graft.sources.AccessTags.tagsOf(rawPath).nonEmpty) {
        val inherited = graft.sources.AccessTags.inheritedTags(staged)
        if (inherited.nonEmpty) {
          // MERGE with any explicitly declared stage tags, never replace:
          // an operator who tagged a stage column stricter than lineage
          // implies (e.g. 'pii' where inheritance carries only 'meta')
          // must keep that tag across re-runs — per column the tag sets
          // union, and at read time the MOST RESTRICTIVE earned action
          // wins, so union = most-restrictive-wins.
          val explicit = graft.sources.AccessTags.tagsOf(stagePath)
          val merged = (explicit.keySet ++ inherited.keySet).map { c =>
            c -> (explicit.getOrElse(c, Set.empty[String]) ++
              inherited.getOrElse(c, Set.empty[String]))
          }.toMap
          graft.sources.AccessTags.tagColumns(stagePath, merged)
        }
      }
      (spark.read.parquet(stagePath).count(), status)
    } finally raw.unpersist()
  }
}

/** Bounded-parallel process-group scheduler with a structured run log
  * (SURVEY C11/C12 — DynamoDB status records + SNS become a run-log table;
  * RUNNING→SUCCESS/WARNING/FAILED transitions preserved — WARNING is the
  * partially-degraded-but-written tier, light_transform.py:227-522). */
object GroupScheduler {

  /** Jobs that report (rows, status): status flows into the run log, so a
    * WARNING transform (10–50% degraded columns) is visible, not silent. */
  def runDetailed(tables: Seq[(String, () => (Long, String))],
      maxConcurrency: Int = 15): Seq[RunRecord] = {
    val pool = Executors.newFixedThreadPool(math.max(1, maxConcurrency))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = tables.map { case (name, job) =>
        Future {
          val t0 = System.nanoTime()
          Try(job()) match {
            case Success((rows, status)) =>
              RunRecord(name, status, rows, (System.nanoTime() - t0) / 1000000)
            case Failure(e) =>
              RunRecord(name, "FAILED", -1, (System.nanoTime() - t0) / 1000000,
                String.valueOf(e.getMessage))
          }
        }
      }
      Await.result(Future.sequence(futures), Duration.Inf)
    } finally pool.shutdown()
  }

  def run(tables: Seq[(String, () => Long)], maxConcurrency: Int = 15)
      : Seq[RunRecord] =
    runDetailed(tables.map { case (name, job) =>
      (name, () => (job(), "SUCCESS"))
    }, maxConcurrency)

  /** Submit one ad-hoc frame through the pipeline's budget rail
    * ([[ScanBudget]]): refuses — naming the offending scan — BEFORE any
    * task launches; runs `action` otherwise. The notebook-harness shape
    * of the same rail the scheduled jobs get implicitly. */
  def submit[T](df: org.apache.spark.sql.DataFrame)(
      action: org.apache.spark.sql.DataFrame => T): T = {
    ScanBudget.enforce(df)
    action(df)
  }

  /** Persist the run log as a queryable table (C11). */
  def writeLog(spark: SparkSession, records: Seq[RunRecord],
      path: String): Unit = {
    import spark.implicits._
    StageWriter.overwrite(records.toDF(), path)
  }
}
