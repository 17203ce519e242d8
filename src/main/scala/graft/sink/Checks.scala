package graft.sink

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CHECK-constraint enforcement on write (SURVEY §2D, D197) — Delta's
  * `ALTER TABLE ADD CONSTRAINT ... CHECK` on the parquet fallback: a
  * table DECLARES boolean SQL invariants, and every writer in this sink
  * validates the incoming rows BEFORE anything lands — a violating
  * write REFUSES, naming each failed constraint and its violation
  * count, with the target untouched. Write-time contracts are the
  * half of data quality D75's read-time assertions can't give you: by
  * the time a reader checks, the corrupt rows are already published.
  *
  * SQL-standard semantics: a CHECK passes when its expression is TRUE
  * or NULL (unknown never fails a constraint — declare `x IS NOT NULL`
  * explicitly when null itself is the violation).
  *
  * Cost shape: ONE codegen'd aggregation pass over the incoming frame
  * evaluating every declared check together (sum of violation flags) —
  * the same validate-on-write trade Delta makes; tables that declared
  * nothing pay a file-existence probe. The declaration lives in
  * `path.__checks__` (atomic tab file), so enforcement survives
  * restarts and applies to every writer process, like the D190 sidecar
  * manifest. */
object Checks {

  private def checksFile(path: String): Path =
    Paths.get(path + ".__checks__")

  /** Declare (replace) the named CHECK constraints for `path`. */
  def declare(path: String, checks: Map[String, String]): Unit = {
    require(checks.nonEmpty, "declare at least one check")
    require(checks.keys.forall(_.matches("[A-Za-z][A-Za-z0-9_]*")),
      "check names must be plain identifiers")
    val target = checksFile(path)
    val tmp = Files.createTempFile(
      target.toAbsolutePath.getParent, ".checks", ".tmp")
    Files.writeString(tmp, checks.toSeq.sortBy(_._1)
      .map { case (n, sql) => s"$n\t$sql" }.mkString("", "\n", "\n"))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def declared(path: String): Map[String, String] = {
    val f = checksFile(path)
    if (!Files.isRegularFile(f)) return Map.empty
    import scala.jdk.CollectionConverters._
    Files.readAllLines(f).asScala.toSeq.filter(_.nonEmpty).flatMap { l =>
      l.split("\t", 2) match {
        case Array(n, sql) => Some(n -> sql)
        case _ => None
      }
    }.toMap
  }

  def drop(path: String): Unit = {
    Files.deleteIfExists(checksFile(path)); ()
  }

  /** Violation count per check — ONE aggregation pass evaluating every
    * check together. TRUE and NULL pass; only FALSE violates. */
  def validate(df: DataFrame,
      checks: Map[String, String]): Map[String, Long] = {
    if (checks.isEmpty) return Map.empty
    val names = checks.keys.toSeq.sorted
    val aggs = names.map(n => sum(
      when(!coalesce(expr(checks(n)), lit(true)), 1L).otherwise(0L))
      .as(n))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    names.zipWithIndex
      .map { case (n, i) => n -> (if (row.isNullAt(i)) 0L
        else row.getLong(i)) }.toMap
  }

  /** The (passing, violating) halves — the quarantine split when a
    * pipeline prefers routing bad rows aside over refusing the batch
    * (the D148 PERMISSIVE-ingest posture applied to contracts). */
  def split(df: DataFrame, checks: Map[String, String])
      : (DataFrame, DataFrame) = {
    require(checks.nonEmpty, "split needs at least one check")
    val ok = checks.values.map(c => coalesce(expr(c), lit(true)))
      .reduce(_ && _)
    (df.filter(ok), df.filter(!ok))
  }

  final class CheckViolation(msg: String) extends RuntimeException(msg)

  /** Refuse `df` when any check declared for `path` is violated, naming
    * every failed constraint and its count; no-op for undeclared
    * tables. Writers call this BEFORE staging anything. */
  def enforce(df: DataFrame, path: String): Unit = {
    val checks = declared(path)
    if (checks.isEmpty) return
    refuseIfViolated(df, checks, path)
  }

  /** Validate the STAGED parquet bytes at `stagedDir` against the
    * checks declared for `declaredPath` — the WAP discipline applied
    * to contracts: the bytes validated ARE the bytes a passing swap
    * reveals, so a non-deterministic incoming frame (rand()-derived
    * column, unseeded sample, limit-without-order) can never pass
    * validation and then land different, violating rows, and the
    * guarded write pays ONE evaluation of the incoming plan (the
    * write) plus one cheap columnar read of the staged files pruned
    * to the checked columns — never a second full upstream pass.
    * `schema` covers the zero-part-file empty-write case and pins
    * partition-column types. No-op for undeclared tables; the CALLER
    * deletes the staging dir on refusal (target untouched). */
  def enforceStaged(spark: org.apache.spark.sql.SparkSession,
      stagedDir: String, declaredPath: String,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    val checks = declared(declaredPath)
    if (checks.isEmpty) return
    refuseIfViolated(spark.read.schema(schema).parquet(stagedDir),
      checks, declaredPath)
  }

  private def refuseIfViolated(df: DataFrame,
      checks: Map[String, String], path: String): Unit = {
    val bad = validate(df, checks).filter(_._2 > 0)
    if (bad.nonEmpty)
      throw new CheckViolation(
        s"write to $path violates declared constraints: " +
          bad.toSeq.sorted.map { case (n, c) =>
            s"$n (${checks(n)}): $c rows" }.mkString("; "))
  }
}
