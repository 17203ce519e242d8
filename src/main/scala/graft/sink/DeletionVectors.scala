package graft.sink

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DELETE without rewriting data files — Delta's deletion vectors on the
  * parquet fallback. A delete scans only to find matching (file, row
  * position) pairs and records them in a tiny sidecar table; the data
  * files stay byte-identical. Readers subtract the vector with one
  * BROADCAST anti-join on the file-source `_metadata.row_index` (exact
  * per-file row positions, no synthetic ids); compaction ([[apply]] →
  * rewrite) folds vectors into data physically when they accumulate.
  *
  * At 100 TB this is the difference between a GDPR erasure request
  * costing a table rewrite and costing a sidecar append: deletes are
  * O(matched-file scan) to locate positions (composable with the stats/
  * bloom sidecars to prune that scan) plus a KB-sized write.
  *
  * The vector lives at `<path>._dv` as parquet (file name, row_index) —
  * OUTSIDE the data directory, so plain readers of the path see the
  * undeleted superset rather than mistaking the sidecar for data; DV-
  * aware readers go through [[read]]. */
object DeletionVectors {

  private def dvPath(path: String) = path + "._dv"

  /** NET-NEW tombstones only (r10): re-running a delete (or overlapping
    * erasure requests) must neither re-count already-tombstoned rows —
    * the erasure ledger's `rows_erased` would overstate — nor append
    * duplicate (file, row_index) pairs that grow the sidecar and its
    * broadcast-size gate forever. Anti-join the found positions against
    * the existing vector, with the same size gate as [[read]]. */
  private def netNew(spark: SparkSession, path: String, found: DataFrame,
      maxBroadcastBytes: Long = 64L << 20): DataFrame = {
    if (!Files.isDirectory(Paths.get(dvPath(path)))) return found
    val dv = spark.read.parquet(dvPath(path))
      .select(col("file"), col("row_index")).distinct()
    val dvBytes = StageWriter.listDataFiles(Paths.get(dvPath(path)))
      .map(Files.size(_)).sum
    val right = if (dvBytes <= maxBroadcastBytes) broadcast(dv) else dv
    found.join(right, Seq("file", "row_index"), "left_anti")
  }

  /** Record `predicate`-matching rows as deleted. Returns how many row
    * positions were appended to the vector (net of already-deleted). */
  def delete(spark: SparkSession, path: String,
      predicate: org.apache.spark.sql.Column): Long = {
    val hits = netNew(spark, path, spark.read.parquet(path)
      .select(col("_metadata.file_path").as("file"),
        col("_metadata.row_index").as("row_index"),
        predicate.as("__hit"))
      .filter(col("__hit"))
      .select(element_at(split(col("file"), "/"), -1).as("file"),
        col("row_index")))
    val cached = hits.cache()
    try {
      val n = cached.count()
      if (n > 0) cached.write.mode("append").parquet(dvPath(path))
      n
    } finally cached.unpersist()
  }

  /** Rows deleted for a FRAME of subject keys, and the per-key counts. */
  final case class KeyDelete(rowsDeleted: Long, perKey: DataFrame)

  /** Record every row whose `keyCol` matches `keys` (a one-column frame)
    * as deleted, via a semi-join INSIDE the position-finding scan — the
    * subject frame never touches the driver, so a right-to-be-forgotten
    * batch of 10⁷ ids costs one join, never a 10⁷-term `In` expression.
    * The join side is the REQUEST (orders under the table); Catalyst/AQE
    * broadcasts it while it fits and falls back to a shuffle join past
    * that — both shapes scan the table once. Returns the total appended
    * plus per-key counts (`keyCol`, `rows_deleted`; keys with no rows
    * are absent), materialized so consumers don't re-run the scan.
    * Counts are NET-NEW ([[netNew]]): re-erasing a subject reports 0
    * and appends nothing — the ledger never overstates. */
  def deleteKeys(spark: SparkSession, path: String, keys: DataFrame,
      keyCol: String): KeyDelete = {
    require(keys.columns.length == 1,
      s"keys must be a one-column frame, got ${keys.columns.mkString(",")}")
    val subj = keys.select(col(keys.columns.head).as(keyCol))
      .na.drop().distinct()
    val hits = netNew(spark, path, spark.read.parquet(path)
      .select(col(keyCol),
        element_at(split(col("_metadata.file_path"), "/"), -1).as("file"),
        col("_metadata.row_index").as("row_index"))
      .join(subj, Seq(keyCol), "left_semi"))
    val cached = hits.cache()
    try {
      val n = cached.count()
      if (n > 0) cached.select("file", "row_index")
        .write.mode("append").parquet(dvPath(path))
      val perKey = cached.groupBy(keyCol)
        .agg(count(lit(1)).as("rows_deleted"))
        .localCheckpoint()
      KeyDelete(n, perKey)
    } finally cached.unpersist()
  }

  /** DV-aware read: data minus the deletion vector. Each deleted batch
    * is KB-sized, but vectors ACCUMULATE until [[apply]] folds them —
    * so the anti-join side is broadcast only while the sidecar's listed
    * bytes fit `maxBroadcastBytes`, and past that the read falls back
    * to a shuffle anti-join: slower, never an outage. */
  def read(spark: SparkSession, path: String,
      maxBroadcastBytes: Long = 64L << 20): DataFrame = {
    val data = spark.read.parquet(path)
      .withColumn("__file",
        element_at(split(col("_metadata.file_path"), "/"), -1))
      .withColumn("__pos", col("_metadata.row_index"))
    if (!Files.isDirectory(Paths.get(dvPath(path)))) {
      data.drop("__file", "__pos")
    } else {
      val dv = spark.read.parquet(dvPath(path))
        .select(col("file").as("__file"), col("row_index").as("__pos"))
        .distinct()
      val dvBytes = StageWriter.listDataFiles(Paths.get(dvPath(path)))
        .map(Files.size(_)).sum
      val right = if (dvBytes <= maxBroadcastBytes) broadcast(dv) else dv
      data.join(right, Seq("__file", "__pos"), "left_anti")
        .drop("__file", "__pos")
    }
  }

  /** Fold accumulated vectors into the data physically (the compaction
    * moment): rewrite survivors, drop the vector. Uses the same tmp+swap
    * as every other rewrite. Returns surviving row count. */
  def apply(spark: SparkSession, path: String): Long = {
    val survivors = read(spark, path).cache()
    try {
      val n = survivors.count()
      StageWriter.overwrite(survivors, path)
      StageWriter.deleteRecursively(Paths.get(dvPath(path)))
      n
    } finally survivors.unpersist()
  }
}
