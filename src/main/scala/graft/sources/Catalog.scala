package graft.sources

import org.apache.spark.sql.SparkSession

/** Catalog registration (SURVEY C10): the Spark-native equivalent of the
  * reference's Glue-crawler phase — each stage table is registered as an
  * external table over its Parquet location so downstream SQL sees
  * `db.table` (reference crawler_stage.py:176-179, 416-519; naming
  * `team_datasource_endpoint_stage` → one database per zone). */
object Catalog {

  def databaseName(team: String, dataSource: String, endpoint: String,
      zone: String): String =
    s"${team}_${dataSource}_${endpoint}_$zone".toLowerCase
      .replaceAll("[^a-z0-9_]", "_")

  def ensureDatabase(spark: SparkSession, db: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")

  /** Register (or refresh) one stage table over a Parquet path. Partition
    * columns are discovered from the directory layout; MSCK repairs the
    * partition metadata after each write (the crawler's job). */
  def registerStageTable(spark: SparkSession, db: String, table: String,
      location: String, partitionCols: Seq[String] = Nil): Unit = {
    ensureDatabase(spark, db)
    spark.sql(s"DROP TABLE IF EXISTS `$db`.`$table`")
    val schema = spark.read.parquet(location).schema
    val partSet = partitionCols.toSet
    val dataCols = schema.fields.filterNot(f => partSet.contains(f.name))
      .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
    val partClause =
      if (partitionCols.isEmpty) ""
      else {
        val cols = schema.fields.filter(f => partSet.contains(f.name))
          .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
        s" PARTITIONED BY ($cols)"
      }
    spark.sql(s"CREATE TABLE `$db`.`$table` ($dataCols) USING parquet" +
      partClause + s" LOCATION '$location'")
    if (partitionCols.nonEmpty)
      spark.sql(s"MSCK REPAIR TABLE `$db`.`$table`")
  }

  /** What changed between the registered schema and the files' schema. */
  final case class SchemaDrift(added: Seq[String], dropped: Seq[String],
      retyped: Seq[String]) {
    def isEmpty: Boolean = added.isEmpty && dropped.isEmpty && retyped.isEmpty
  }

  /** Schema-drift re-sync — the crawler's re-crawl duty (reference
    * crawler_stage.py:416-519 re-runs the crawler after each write so the
    * catalog tracks schema evolution). Compares the REGISTERED schema with
    * the CURRENT parquet footer schema at the location; on drift (added /
    * dropped / retyped columns) re-registers the table and returns the
    * report. Matching schemas are a no-op — catalog churn invalidates
    * downstream metadata caches, so re-registration happens only on real
    * drift. An unregistered table registers fresh (drift = all columns
    * added). */
  def syncStageTable(spark: SparkSession, db: String, table: String,
      location: String, partitionCols: Seq[String] = Nil)
      : Option[SchemaDrift] = {
    val current = spark.read.parquet(location).schema
    val registered =
      if (spark.catalog.databaseExists(db) &&
          spark.catalog.tableExists(s"`$db`.`$table`"))
        Some(spark.table(s"`$db`.`$table`").schema)
      else None
    def m(s: org.apache.spark.sql.types.StructType): Map[String, String] =
      s.fields.map(f => f.name.toLowerCase -> f.dataType.sql).toMap
    val (cur, reg) = (m(current), registered.map(m).getOrElse(Map.empty))
    val drift = SchemaDrift(
      added = (cur.keySet -- reg.keySet).toSeq.sorted,
      dropped = (reg.keySet -- cur.keySet).toSeq.sorted,
      retyped = cur.keySet.intersect(reg.keySet)
        .filter(k => cur(k) != reg(k)).toSeq.sorted)
    if (drift.isEmpty) None
    else {
      registerStageTable(spark, db, table, location, partitionCols)
      Some(drift)
    }
  }

  /** Batched catalog sync — the crawler groups ~10 tables per crawler run
    * (reference crawler_stage.py:886-953 batches ×10); here each batch's
    * parquet-footer reads + re-registrations run CONCURRENTLY on a pool of
    * `batchSize` threads (SparkSession is thread-safe for metadata ops),
    * so a whole-zone re-sync overlaps its driver-side footer I/O while the
    * pool bound keeps at most `batchSize` reads in flight. Batches
    * themselves are sequential — the crawler's pacing. Returns the
    * per-table drift (None = no change). */
  def syncAll(spark: SparkSession, db: String,
      tables: Seq[(String, String)], batchSize: Int = 10)
      : Map[String, Option[SchemaDrift]] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, batchSize))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      ensureDatabase(spark, db) // once, not racing inside the pool
      tables.grouped(math.max(1, batchSize)).flatMap { batch =>
        Await.result(Future.sequence(batch.map { case (table, location) =>
          Future(table -> syncStageTable(spark, db, table, location))
        }), Duration.Inf)
      }.toMap
    } finally pool.shutdown()
  }
}
