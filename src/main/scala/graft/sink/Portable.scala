package graft.sink

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Portable table bundle with integrity manifest (SURVEY §2D, D176) —
  * the backup / disaster-recovery / cross-cluster-copy surface: EXPORT a
  * table as (data files + a manifest of per-file name, size, sha256);
  * IMPORT verifies every file against the manifest BEFORE installing, so
  * silent corruption in transit (the classic object-store copy hazard)
  * is caught at restore time, never discovered by a reader.
  *
  * Scale shape: the hashes are computed IN SPARK over the `binaryFile`
  * source — one distributed pass at export and one at verify, parallel
  * over files, the driver only handling the manifest (file-count rows).
  * The byte COPY here is local `Files.copy` as the stand-in for the
  * storage-level transfer (distcp / object-store copy) a deployment
  * would use; verification is the part that must be an engine job.
  */
object Portable {

  private def sha256All(spark: SparkSession, dir: String)
      : Map[String, (Long, String)] =
    spark.read.format("binaryFile").load(
      StageWriter.listDataFiles(Paths.get(dir)).map(_.toString): _*)
      .select(col("path"), col("length"),
        sha2(col("content"), 256).as("sha"))
      .collect()
      .map(r => (r.getString(0).split('/').last,
        (r.getLong(1), r.getString(2)))).toMap

  /** Export `srcPath`'s visible data files + integrity manifest into
    * `bundleDir`. Returns the number of files bundled. */
  def exportTable(spark: SparkSession, srcPath: String,
      bundleDir: String): Int = {
    val files = StageWriter.listDataFiles(Paths.get(srcPath))
    require(files.nonEmpty, s"$srcPath has no data files to export")
    Files.createDirectories(Paths.get(bundleDir, "data"))
    files.foreach(f => Files.copy(f,
      Paths.get(bundleDir, "data", f.getFileName.toString),
      StandardCopyOption.REPLACE_EXISTING))
    val hashes = sha256All(spark, srcPath)
    val manifest = files.map(_.getFileName.toString).sorted.map { n =>
      val (len, sha) = hashes(n)
      s"$n\t$len\t$sha"
    }
    Files.writeString(Paths.get(bundleDir, "MANIFEST"),
      manifest.mkString("", "\n", "\n"))
    files.size
  }

  /** A bundle file failed verification — nothing was installed. */
  final class IntegrityException(msg: String) extends RuntimeException(msg)

  /** Verify the bundle against its manifest (names, sizes, sha256 — one
    * distributed pass) and install it at `dstPath` via the atomic tmp
    * swap. Throws [[IntegrityException]] NAMING the bad files before any
    * install step; a half-copied or bit-flipped bundle can never become
    * a readable table. */
  def importTable(spark: SparkSession, bundleDir: String,
      dstPath: String): Int = {
    val mf = Paths.get(bundleDir, "MANIFEST")
    require(Files.isRegularFile(mf), s"$bundleDir: no MANIFEST")
    import scala.jdk.CollectionConverters._
    val expected = Files.readAllLines(mf).asScala.filter(_.nonEmpty)
      .map { l =>
        val Array(n, len, sha) = l.split("\t", 3)
        n -> ((len.toLong, sha))
      }.toMap
    val dataDir = Paths.get(bundleDir, "data").toString
    val actual = sha256All(spark, dataDir)
    val bad =
      (expected.keySet -- actual.keySet).map(n => s"$n: MISSING") ++
        (actual.keySet -- expected.keySet).map(n => s"$n: UNEXPECTED") ++
        expected.collect {
          case (n, e) if actual.get(n).exists(_ != e) =>
            s"$n: size/sha mismatch (expected $e, got ${actual(n)})"
        }
    if (bad.nonEmpty)
      throw new IntegrityException(
        s"$bundleDir failed verification:\n  ${bad.toSeq.sorted.mkString("\n  ")}")
    val tmp = dstPath + ".__tmp__"
    StageWriter.deleteRecursively(Paths.get(tmp))
    Files.createDirectories(Paths.get(tmp))
    expected.keySet.toSeq.sorted.foreach(n => Files.copy(
      Paths.get(dataDir, n), Paths.get(tmp, n),
      StandardCopyOption.REPLACE_EXISTING))
    StageWriter.swapTmp(dstPath)
    expected.size
  }
}
