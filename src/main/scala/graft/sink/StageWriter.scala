package graft.sink

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Stage-zone writer (SURVEY C5–C9).
  *
  * The reference writes Delta (overwrite or MERGE upsert,
  * light_transform.py:1363-1409); Delta isn't on this classpath, so the
  * idiomatic fallback is partitioned Parquet with an atomic temp-dir swap
  * for overwrite and an anti-join ∪ new for MERGE (semantically
  * whenMatchedUpdateAll + whenNotMatchedInsertAll — new rows win).
  * The atomicity gap vs Delta's log-based commit is documented here: the
  * swap is atomic per-directory rename; a crash between delete and move can
  * lose the target (Delta's transaction log cannot) — acceptable for the
  * idempotent re-run model of this pipeline (re-extract rebuilds).
  */
object StageWriter {

  /** Partitioned overwrite with temp-write + atomic-ish swap
    * (light_transform.py:1363-1380). Guards partition cardinality at scale
    * (SURVEY §7.4.7): refuses > maxPartitionValues distinct values. */
  def overwrite(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
      maxPartitionValues: Long = 10000): Unit = {
    if (partitionBy.nonEmpty) {
      val n = df.select(partitionBy.map(col): _*).distinct().limit(
        (maxPartitionValues + 1).toInt).count()
      require(n <= maxPartitionValues,
        s"partition columns ${partitionBy.mkString(",")} have >" +
          s"$maxPartitionValues distinct values — refusing high-cardinality " +
          "partitioning at scale")
    }
    val tmp = path + ".__tmp__"
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(tmp)
    val target = Paths.get(path)
    val old = Paths.get(path + ".__old__")
    deleteRecursively(old)
    if (Files.exists(target)) Files.move(target, old)
    Files.move(Paths.get(tmp), target, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(old)
  }

  /** MERGE upsert: existing rows matched on id-columns are replaced by new
    * rows; unmatched new rows are inserted
    * (light_transform.py:1382-1392 — dropDuplicates → merge →
    * whenMatchedUpdateAll.whenNotMatchedInsertAll).
    *
    * Pure-Spark MERGE: old ⟕anti new (on keys) ∪ new. One shuffle on the
    * key columns; at 100 TB both sides hash-partition on the same keys so
    * AQE can pick a sort-merge or (small delta) broadcast anti-join.
    *
    * Schema evolution matches Delta's autoMerge (the reference enables
    * `spark.databricks.delta.schema.autoMerge.enabled`,
    * light_transform.py:2013): a column added to the delta (a new
    * columns.csv entry on an incremental table) appends to the output
    * schema with old rows null-filled; a column the delta dropped is kept
    * with new rows null-filled — `unionByName(allowMissingColumns = true)`
    * is exactly that contract. */
  def merge(old: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "MERGE requires id columns")
    require(keys.forall(old.columns.contains) &&
      keys.forall(delta.columns.contains),
      s"MERGE keys ${keys.mkString(",")} must exist on both sides")
    val newRows = delta.dropDuplicates(keys)
    old.join(newRows, keys, "left_anti")
      .unionByName(newRows, allowMissingColumns = true)
  }

  /** CDC MERGE: delta rows carry an op column — 'D' deletes the matched
    * key (tombstone), anything else upserts (the Delta
    * whenMatchedDelete / whenMatchedUpdateAll / whenNotMatchedInsertAll
    * triple as one Spark plan). One shuffle on the key columns: the
    * anti-join removes EVERY delta key (deleted or replaced) from the old
    * side, then the surviving upserts append. A key carrying both a
    * delete and an upsert in one batch resolves to the upsert (the row
    * exists after the batch) — dropDuplicates keeps the upsert row. */
  def mergeCdc(old: DataFrame, delta: DataFrame, keys: Seq[String],
      opCol: String = "op"): DataFrame = {
    require(keys.nonEmpty, "CDC MERGE requires id columns")
    require(delta.columns.contains(opCol),
      s"CDC delta must carry the '$opCol' op column")
    // null-safe comparison: a NULL/absent op means "anything else" =
    // upsert — a plain =!= would drop the row from upserts while its key
    // still anti-joins old away, silently deleting it
    val upserts = delta.filter(!(col(opCol) <=> "D")).drop(opCol)
      .dropDuplicates(keys)
    old.join(delta.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(upserts, allowMissingColumns = true)
  }

  /** MERGE into a Parquet path (reads existing, merges, swaps).
    *
    * SINGLE-WRITER: the read-merge-swap has no conflict check, so two
    * concurrent mergers into the same path can lose one side's rows. A
    * multi-job deployment (the reference runs 60 concurrent transforms)
    * must merge through [[graft.sink.VersionedTable.mergeCommit]], whose
    * optimistic CAS commit re-merges the loser on the winner's head. */
  def mergeInto(spark: SparkSession, df: DataFrame, path: String,
      keys: Seq[String], partitionBy: Seq[String] = Nil): Unit = {
    if (!Files.exists(Paths.get(path))) overwrite(df, path, partitionBy)
    else {
      val old = spark.read.parquet(path)
      // materialize the merge before the swap so we never read-while-overwrite
      val merged = merge(old, df, keys).cache()
      merged.count()
      overwrite(merged, path, partitionBy)
      merged.unpersist()
    }
  }

  /** Empty-table bootstrap: typed empty output, warn-not-fail
    * (light_transform.py:1444-1462, 1805-1813). */
  def writeEmpty(spark: SparkSession, schema: StructType, path: String): Unit = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    overwrite(empty, path)
  }

  /** Raw-zone CSV fallback format (SURVEY A14; reference
    * extract_data.py:739-741 — pipe-delimited, every field quoted). Used
    * when the Parquet write path is exhausted; also a valid standalone
    * export format. */
  def writeCsvRaw(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("delimiter", "|")
      .option("quoteAll", "true")
      .option("header", "true")
      .csv(path)

  /** Retry-then-fallback write (SURVEY A14; extract_data.py:897-921 —
    * 10 Parquet attempts 2 s apart, then the CSV fallback, then fail). */
  def overwriteWithRetry(df: DataFrame, path: String, retries: Int = 10,
      delayMs: Long = 2000, csvFallbackPath: Option[String] = None): Unit = {
    require(retries >= 1, s"retries must be >= 1 (got $retries)")
    var attempt = 0
    var done = false
    var lastError: Throwable = null
    while (!done && attempt < retries) {
      try { overwrite(df, path); done = true }
      catch {
        case scala.util.control.NonFatal(e) =>
          lastError = e; attempt += 1
          if (attempt < retries) Thread.sleep(delayMs)
      }
    }
    if (!done) csvFallbackPath match {
      case Some(p) =>
        // a fallback failure must not MASK the original parquet failure:
        // attach it as suppressed so both stack traces surface
        try writeCsvRaw(df, p)
        catch {
          case scala.util.control.NonFatal(fb) =>
            fb.addSuppressed(lastError); throw fb
        }
        throw new RuntimeException(
          s"parquet write failed after $retries attempts; CSV fallback " +
            s"written to $p", lastError)
      case None => throw lastError
    }
  }

  /** Bucketed co-located write (SURVEY §2 "partitioning & shuffle"): hash-
    * partition the table into `numBuckets` files per partition ONCE at write
    * time so every later join or aggregation on the bucket key runs with
    * ZERO exchange — the pre-shuffle that pays for itself on the first
    * reuse. At 100 TB this is the difference between re-shuffling 100 TB
    * per join and never shuffling the fact table again. Buckets live in the
    * session catalog (`saveAsTable`) because Spark resolves bucket metadata
    * through the metastore, mirroring the reference's Glue-catalog
    * registration (crawler phase, SURVEY C10). */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int = 32, sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "bucketed write requires bucket columns")
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Small-file compaction — the Parquet-fallback equivalent of Delta
    * OPTIMIZE (light_transform.py:1394-1409): coalesce to
    * ceil(bytes / targetFileBytes) files and swap. */
  def compact(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    val df = spark.read.parquet(path)
    val bytes = dirSize(Paths.get(path))
    val files = math.max(1, (bytes + targetFileBytes - 1) / targetFileBytes)
    val compacted = df.coalesce(files.toInt).cache()
    compacted.count()
    overwrite(compacted, path)
    compacted.unpersist()
  }

  /** Symlink-format manifest — the engine-neutral file inventory Delta
    * generates for Presto/Athena (light_transform.py:1394-1409 runs
    * manifest generation after every write): one line per data file under
    * `_symlink_format_manifest/manifest`. External engines (and humans)
    * can then read the table without listing the directory. */
  def writeManifest(path: String): Unit = {
    val dir = Paths.get(path)
    val files = {
      val s = Files.list(dir)
      try s.toArray.map(_.toString).filter(_.endsWith(".parquet")).sorted
      finally s.close()
    }
    val mdir = dir.resolve("_symlink_format_manifest")
    Files.createDirectories(mdir)
    val tmp = Files.createTempFile(mdir, "manifest", ".tmp")
    Files.writeString(tmp, files.map(f => s"file://$f").mkString("", "\n", "\n"))
    Files.move(tmp, mdir.resolve("manifest"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  /** VACUUM for the Parquet fallback (Delta VACUUM(168h) twin,
    * light_transform.py:1394-1409): removes swap leftovers (`.__tmp__`,
    * `.__old__`) older than `retentionMs` — the directories a crash
    * between overwrite's write and move can strand. Current data is never
    * touched; the default retention mirrors Delta's 168 h. */
  def vacuum(path: String, retentionMs: Long = 168L * 3600 * 1000): Unit = {
    val cutoff = System.currentTimeMillis() - retentionMs
    Seq(path + ".__tmp__", path + ".__old__").foreach { p =>
      val d = Paths.get(p)
      if (Files.exists(d) &&
          Files.getLastModifiedTime(d).toMillis < cutoff)
        deleteRecursively(d)
    }
  }

  private def dirSize(p: java.nio.file.Path): Long =
    if (!Files.exists(p)) 0L
    else {
      val s = Files.walk(p)
      try s.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum()
      finally s.close()
    }

  private[graft] def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => { Files.delete(f); () })
      finally s.close()
    }
}
