package graft.sink

import java.sql.{Connection, DriverManager, SQLException}

import org.apache.spark.sql.{DataFrame, Row}

/** Exactly-once streaming upsert into a JDBC endpoint (SURVEY §2D, D106).
  *
  * Spark's file/Delta sinks get exactly-once from the checkpoint + an
  * idempotent commit; a relational sink needs the idempotence built from
  * the database's own transactions. This is the two-phase shape production
  * pipelines use (the reference lands stage data next to RDBMS sources,
  * `extract_data.py:267-277` — the write-back direction needs this):
  *
  *  1. STAGE (parallel, executors): each partition inserts its rows into a
  *     staging table keyed (batch_id, key) — duplicate-key errors are
  *     swallowed, so partition retries within an attempt are idempotent
  *     and nothing here is visible to readers.
  *  2. PUBLISH (atomic, driver): ONE transaction checks the batch log,
  *     and if the batch is new: deletes the sink rows being replaced,
  *     inserts the staged rows, records the batch id, clears the staging
  *     slice, commits. A replayed batch (foreachBatch re-delivery after a
  *     crash) finds its id in the log and publishes nothing.
  *
  * The publish is set-based SQL (no rows through the driver); only batch
  * METADATA (the id check) is driver-side. Readers see each batch's rows
  * exactly once, whatever crashes between stage and publish. */
object JdbcExactlyOnce {

  // embedded Derby self-registers on class load; tolerate its absence so
  // merely referencing this object never throws off-classpath
  scala.util.Try(Class.forName("org.apache.derby.jdbc.EmbeddedDriver"))

  /** The table name is interpolated into DDL/DML — restrict it to a plain
    * SQL identifier so a config-sourced name can never smuggle SQL. */
  private def validIdent(table: String): String = {
    require(table.matches("[A-Za-z][A-Za-z0-9_]{0,110}"),
      s"'$table' is not a plain SQL identifier ([A-Za-z][A-Za-z0-9_]*)")
    table
  }

  /** Create the sink/staging/log tables if absent (Derby-flavored DDL). */
  def ensureTables(url: String, table0: String): Unit = {
    val table = validIdent(table0)
    withConn(url) { c =>
      val existing = {
        val md = c.getMetaData.getTables(null, null, null,
          Array("TABLE"))
        val names = scala.collection.mutable.Set.empty[String]
        while (md.next()) names += md.getString("TABLE_NAME").toUpperCase
        names
      }
      val s = c.createStatement()
      try {
        if (!existing(table.toUpperCase))
          s.executeUpdate(s"CREATE TABLE $table " +
            "(k BIGINT PRIMARY KEY, v DOUBLE)")
        if (!existing(s"${table}_STG".toUpperCase))
          s.executeUpdate(s"CREATE TABLE ${table}_stg " +
            "(batch_id BIGINT, k BIGINT, v DOUBLE, " +
            s"PRIMARY KEY (batch_id, k))")
        if (!existing(s"${table}_LOG".toUpperCase))
          s.executeUpdate(s"CREATE TABLE ${table}_log " +
            "(batch_id BIGINT PRIMARY KEY)")
      } finally s.close()
    }
  }

  /** foreachBatch body: stage `batch` (keyCol, valueCol) then publish it
    * under `batchId`. Executors write staging in parallel (tunable via
    * `stagingPartitions` — embedded endpoints prefer 1); the publish
    * transaction is the only serialized step.
    *
    * Duplicate keys WITHIN one batch resolve deterministically to the MAX
    * value before staging: a DataFrame is a set, so "last row wins" is
    * undefined — without the pre-aggregation whichever partition staged
    * first would win the (batch_id, k) primary key, a run-to-run
    * nondeterminism. Across batches the log order still rules. */
  def upsertBatch(url: String, table0: String, batch: DataFrame,
      batchId: Long, keyCol: String, valueCol: String,
      stagingPartitions: Int = 0): Unit = {
    val table = validIdent(table0)
    ensureTables(url, table)
    // fast replay exit: a batch already in the log must not re-stage
    // (its staging slice was cleared by the publish)
    if (withConn(url)(committed(_, table, batchId))) return
    import org.apache.spark.sql.functions.{col, max}
    val rows = batch.select(col(keyCol).cast("long").as("__k"),
        col(valueCol).cast("double").as("__v"))
      .groupBy(col("__k")).agg(max(col("__v")).as("__v"))
    // stagingPartitions: a REMOTE endpoint wants parallel staging
    // connections (0 = keep the batch's partitioning); an EMBEDDED
    // endpoint wants 1 — concurrent inserts from one JVM just fight the
    // same page latches (measured on the restart gate)
    val staged = if (stagingPartitions > 0) rows.coalesce(stagingPartitions)
      else rows
    staged.foreachPartition { it: Iterator[Row] =>
      if (it.nonEmpty) withConn(url) { c =>
        // ONE transaction per partition: staging rows are invisible until
        // the publish step anyway, and per-chunk autocommit makes the
        // database fsync every 1000 rows — the measured wall of the
        // streaming-restart gate. A failed partition rolls back whole and
        // retries idempotently (dup-key swallow below).
        c.setAutoCommit(false)
        try {
          // multi-row VALUES inserts (400 rows per statement): an
          // embedded driver executes addBatch elements one by one, so
          // real batching must happen in the STATEMENT — one parse/
          // execute per 400 rows instead of per row (1200 parameter
          // markers — far under Derby's 32k limit). Duplicate
          // (batch_id, k) rows — a retried partition re-inserting — are
          // idempotent by design: a duplicate-key failure re-drives that
          // chunk row-by-row, swallowing ONLY the dup-key state so its
          // non-duplicate rows still land.
          val n = 400
          val wide = c.prepareStatement(
            s"INSERT INTO ${table}_stg (batch_id, k, v) VALUES " +
              Seq.fill(n)("(?, ?, ?)").mkString(", "))
          val one = c.prepareStatement(
            s"INSERT INTO ${table}_stg (batch_id, k, v) VALUES (?, ?, ?)")
          def rowByRow(chunk: Seq[Row]): Unit =
            chunk.foreach { r =>
              one.setLong(1, batchId)
              one.setLong(2, r.getLong(0))
              one.setDouble(3, r.getDouble(1))
              try { one.executeUpdate(); () }
              catch { case d: SQLException if dupKey(d) => () }
            }
          try it.grouped(n).foreach { chunk =>
            if (chunk.size == n) {
              chunk.zipWithIndex.foreach { case (r, i) =>
                wide.setLong(i * 3 + 1, batchId)
                wide.setLong(i * 3 + 2, r.getLong(0))
                wide.setDouble(i * 3 + 3, r.getDouble(1))
              }
              try { wide.executeUpdate(); () }
              catch { case e: SQLException if dupKey(e) => rowByRow(chunk) }
            } else rowByRow(chunk) // short tail (or post-dup re-drive)
          } finally { wide.close(); one.close() }
          c.commit()
        } catch {
          case e: Throwable => scala.util.Try(c.rollback()); throw e
        } finally c.setAutoCommit(true)
      }
    }
    withConn(url) { c =>
      c.setAutoCommit(false)
      try {
        if (!committed(c, table, batchId)) {
          val s = c.createStatement()
          try {
            // one index-driven MERGE instead of DELETE-subquery +
            // INSERT-SELECT: same upsert semantics, one pass over the
            // staged slice (standard SQL:2003 MERGE — Derby, MSSQL,
            // Oracle and Postgres 15+ all speak it)
            s.executeUpdate(
              s"MERGE INTO $table t USING ${table}_stg s " +
                s"ON t.k = s.k AND s.batch_id = $batchId " +
                "WHEN MATCHED THEN UPDATE SET v = s.v " +
                "WHEN NOT MATCHED AND s.batch_id = " + batchId +
                " THEN INSERT (k, v) VALUES (s.k, s.v)")
            s.executeUpdate(
              s"INSERT INTO ${table}_log VALUES ($batchId)")
            s.executeUpdate(
              s"DELETE FROM ${table}_stg WHERE batch_id = $batchId")
          } finally s.close()
          c.commit()
        } else c.rollback()
      } catch {
        case e: Throwable =>
          scala.util.Try(c.rollback())
          throw e
      } finally c.setAutoCommit(true)
    }
  }

  /** Duplicate-key SQLSTATE anywhere in the exception chain (Derby wraps
    * the per-row state inside BatchUpdateException's next chain). */
  private def dupKey(e: SQLException): Boolean =
    Iterator.iterate(e)(_.getNextException)
      .takeWhile(_ != null).take(8)
      .exists(x => x.getSQLState == "23505")

  private def committed(c: Connection, table: String, batchId: Long)
      : Boolean = {
    val ps = c.prepareStatement(
      s"SELECT 1 FROM ${table}_log WHERE batch_id = ?")
    try {
      ps.setLong(1, batchId)
      val rs = ps.executeQuery()
      try rs.next() finally rs.close()
    } finally ps.close()
  }

  private def withConn[A](url: String)(body: Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try body(c) finally c.close()
  }
}
