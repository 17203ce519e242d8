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
}
