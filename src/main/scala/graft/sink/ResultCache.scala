package graft.sink

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}

/** Plan-fingerprint result cache (SURVEY §2D, D166) — the warehouse
  * result-cache feature (Snowflake's query result reuse, BigQuery cached
  * results) built on the primitives this lake already trusts: a query's
  * identity is (canonicalized logical plan, exact input state), and a
  * repeat ask within the same input state reads the materialized result
  * instead of recomputing the 100 TB scan.
  *
  * Key derivation:
  *  - the CANONICALIZED analyzed plan (exprIds normalized, so two
  *    syntactic spellings of the same plan share a key);
  *  - per input: file-backed scans contribute their directory's file
  *    inventory (names + sizes — the log-size-class listing, never a
  *    data scan; the same freshness token [[graft.plans.MvRewrite]]
  *    trusts); literal in-memory relations contribute their row data.
  *    ANY other leaf (a stream, a JDBC relation whose state the driver
  *    cannot fingerprint) makes the plan UNCACHEABLE — computed fresh,
  *    never stored: serving a result the key can't prove current would
  *    be a stale-read bug, so ineligibility degrades to correctness.
  *
  * Any base write changes the inventory → new key → miss → fresh
  * compute; the stale entry is never served and ages out via [[vacuum]].
  * Concurrent writers of one key land via write-to-tmp + atomic dir
  * rename, loser defers to the winner's copy — the same claim-free
  * last-write-wins that is safe here BECAUSE the content under a key is
  * deterministic (same plan, same inputs ⇒ same rows). */
object ResultCache {

  final case class Served(df: DataFrame, hit: Boolean, key: Option[String])

  /** Inventory fingerprint of one input dir (names + sizes). */
  private def inventory(dir: String): String =
    StageWriter.listDataFiles(Paths.get(dir))
      .map(p => s"${p.getFileName}:${Files.size(p)}").mkString(",")

  /** The cache key for `df` now, or None when a leaf is unfingerprintable. */
  def keyFor(df: DataFrame): Option[String] = {
    val plan = df.queryExecution.analyzed
    val leaves = plan.collectLeaves()
    val stamps = leaves.map {
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
        val roots = lr.relation.asInstanceOf[HadoopFsRelation]
          .location.rootPaths
        roots.map(r => r.toUri.getPath + "=" +
          inventory(r.toUri.getPath)).mkString(";")
      case l: LocalRelation => "local:" + l.data.mkString("|")
      case _ => return None
    }
    val material = plan.canonicalized.toString + "\n@@\n" +
      stamps.sorted.mkString("\n")
    val md = java.security.MessageDigest.getInstance("SHA-256")
    Some(md.digest(material.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(32))
  }

  /** Serve `df` through the cache at `cacheDir`. */
  def through(df: DataFrame, cacheDir: String): Served = {
    val spark = df.sparkSession
    val key = keyFor(df) match {
      case None => return Served(df, hit = false, None) // uncacheable
      case Some(k) => k
    }
    Files.createDirectories(Paths.get(cacheDir))
    val target = Paths.get(cacheDir, key)
    if (Files.exists(target.resolve("_SUCCESS")))
      return Served(spark.read.parquet(target.toString), hit = true,
        Some(key))
    val tmp = Paths.get(cacheDir,
      s".$key.tmp${java.util.UUID.randomUUID().toString.take(8)}")
    df.write.parquet(tmp.toString)
    try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case scala.util.control.NonFatal(_) =>
        // a concurrent writer won the rename — defer to its (identical)
        // copy and drop ours
        StageWriter.deleteRecursively(tmp)
    }
    Served(spark.read.parquet(target.toString), hit = false, Some(key))
  }

  /** Age-gated sweep of cache entries (stale keys are never SERVED —
    * they are simply unreachable — but they hold disk until vacuumed). */
  def vacuum(cacheDir: String, retentionMs: Long): Seq[String] = {
    val dir = Paths.get(cacheDir)
    if (!Files.isDirectory(dir)) return Seq.empty
    val cutoff = System.currentTimeMillis() - retentionMs
    val s = Files.list(dir)
    val dropped = try s.toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(p => Files.isDirectory(p) &&
        scala.util.Try(Files.getLastModifiedTime(p).toMillis < cutoff)
          .getOrElse(false))
      .map { p =>
        StageWriter.deleteRecursively(p); p.getFileName.toString
      }.toSeq
    finally s.close()
    dropped.sorted
  }
}
