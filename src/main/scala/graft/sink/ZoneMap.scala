package graft.sink

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType,
  ShortType, StringType}

/** Multi-column zone map (SURVEY §2D, D183) — the Delta-log data-skipping
  * shape completed: the single-column stats sidecar (D107/D163) serves
  * the MERGE key, but queries filter on OTHER columns too, and with a
  * Hilbert/Z layout (D23/D168) SEVERAL columns are simultaneously
  * clustered — each deserves per-file (min, max). One write-time scan
  * records them all; [[graft.plans.ZoneMapPrune]] then skips files for a
  * predicate on ANY mapped column, no reader opt-in.
  *
  * Format (`path.__zonemap__`): a header row per column (`#col name
  * kind`), then one line per (file, column) with an explicit presence
  * flag and URL-encoded bounds (string keys can contain anything).
  * Validity contract is inventory-exact like every sidecar here: any
  * file added/removed/rewritten invalidates the map, and consumers stand
  * down rather than guess. Long and string kinds only — same dialects,
  * same ASCII caution for strings as the single-column plane. */
object ZoneMap {

  private def mapFile(path: String) = Paths.get(path + ".__zonemap__")
  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")

  private[graft] def kindOf(dt: DataType): Option[String] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some("long")
    case StringType => Some("string")
    case _ => None
  }

  /** Loaded map: column → kind, and (file, column) → bounds (None = no
    * non-null values of that column in that file). */
  final case class Zones(kinds: Map[String, String],
      bounds: Map[(String, String), Option[(String, String)]])

  /** ONE scan over the visible data files → per-(file, column) bounds
    * for every requested column (each must be integral or string).
    * Overwrites the previous map atomically. */
  private def scanBounds(spark: SparkSession, files: Seq[Path],
      kinds: Seq[(String, String)],
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      : Map[String, Map[String, Option[(String, String)]]] = {
    if (files.isEmpty) return Map.empty
    // ALL-integral column sets read their bounds from parquet FOOTER
    // row-group statistics — zero Spark jobs, driver-side metadata only
    // (opt guide §6: the writer just wrote these min/max down; a data
    // scan re-deriving them is a whole job per refresh, and at 100 TB a
    // scan of everything just written). Integral stats are exact in the
    // footer; STRING stats can be truncated by writers, so any string
    // column keeps the scan path. Falls back on any missing/odd footer.
    if (kinds.forall(_._2 == "long"))
      footerBounds(files, kinds.map(_._1)) match {
        case Some(b) => return b
        case None => ()
      }
    // aggregate in the column's OWN order, stringify the result — a
    // min/max over the string CAST of a long column is lexicographic
    // ("99" > "100") and records inverted bounds that mis-prune
    val aggs = kinds.flatMap { case (c, kind) =>
      val v = if (kind == "long") col(c).cast("long") else col(c)
      Seq(min(v).cast("string").as(s"mn_$c"),
        max(v).cast("string").as(s"mx_$c"))
    }
    // a caller that already read the schema passes it down — skips the
    // footer-inference job Spark would otherwise run per read
    schema.map(spark.read.schema(_)).getOrElse(spark.read)
      .parquet(files.map(_.toString): _*)
      .groupBy(input_file_name().as("f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map { r =>
        val name = r.getAs[String]("f").split('/').last
        name -> kinds.map { case (c, _) =>
          val mn = r.getAs[String](s"mn_$c")
          c -> (if (mn == null) None
            else Some((mn, r.getAs[String](s"mx_$c"))))
        }.toMap
      }.toMap
  }

  /** Per-(file, column) bounds of INTEGRAL columns from parquet footer
    * statistics — the zero-job twin of the scan above, stringified from
    * the exact long values so the sidecar bytes are identical to a scan's
    * (a long's min/max stringify the same whether read from a footer or
    * aggregated by Spark). None on ANY file whose footer lacks usable
    * integral stats for a requested column — never guesses, the caller
    * falls back to the scan. Files with zero non-null values (or zero row
    * groups) record no-bounds, matching the scan's "never emitted a row"
    * rule. */
  private def footerBounds(files: Seq[Path], cols: Seq[String])
      : Option[Map[String, Map[String, Option[(String, String)]]]] = {
    import org.apache.parquet.column.statistics.{IntStatistics,
      LongStatistics}
    val conf = new org.apache.hadoop.conf.Configuration()
    try {
      Some(files.map { p =>
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(p.toUri), conf))
        try {
          val mn = scala.collection.mutable.Map.empty[String, Long]
          val mx = scala.collection.mutable.Map.empty[String, Long]
          val want = cols.toSet
          reader.getFooter.getBlocks.forEach { b =>
            b.getColumns.forEach { c =>
              val name = c.getPath.toDotString
              if (want(name)) {
                val st = c.getStatistics
                if (st == null) throw new IllegalStateException("no stats")
                if (st.hasNonNullValue) {
                  val (lo, hi) = st match {
                    case l: LongStatistics => (l.getMin, l.getMax)
                    case i: IntStatistics =>
                      (i.getMin.toLong, i.getMax.toLong)
                    case _ => throw new IllegalStateException(
                      s"non-integral stats: ${st.getClass.getSimpleName}")
                  }
                  mn(name) = math.min(mn.getOrElse(name, Long.MaxValue), lo)
                  mx(name) = math.max(mx.getOrElse(name, Long.MinValue), hi)
                }
              }
            }
          }
          p.getFileName.toString -> cols.map { c =>
            c -> mn.get(c).map(lo => (lo.toString, mx(c).toString))
          }.toMap
        } finally reader.close()
      }.toMap)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def writeLines(path: String, kinds: Seq[(String, String)],
      names: Seq[String],
      bounds: Map[String, Map[String, Option[(String, String)]]]): Unit = {
    val lines =
      kinds.map { case (c, k) => s"#col\t${enc(c)}\t$k" } ++
        names.sorted.flatMap { n =>
          kinds.map { case (c, _) =>
            bounds.getOrElse(n, Map.empty).getOrElse(c, None) match {
              case Some((mn, mx)) =>
                s"$n\t${enc(c)}\t1\t${enc(mn)}\t${enc(mx)}"
              case None => s"$n\t${enc(c)}\t0"
            }
          }
        }
    val tmp = Files.createTempFile(
      Paths.get(path).toAbsolutePath.getParent, ".zonemap", ".tmp")
    Files.writeString(tmp, lines.mkString("", "\n", "\n"))
    Files.move(tmp, mapFile(path), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** ONE scan over the visible data files → per-(file, column) bounds
    * for every requested column (each must be integral or string).
    * Overwrites the previous map atomically. */
  def write(spark: SparkSession, path: String, cols: Seq[String]): Unit = {
    val _ = writeAndReport(spark, path, cols, Nil)
  }

  /** As [[write]], but the SAME scan also gathers bounds for `extra`
    * columns and returns everything — the D190 combined refresh feeds
    * the stats plane from this, so a table declaring stats AND zone
    * pays one scan, not one per plane. Extra columns are not recorded
    * in the map (unless also in `cols`); both dialects share the
    * min/max-in-own-order-then-stringify discipline, so the stats
    * sidecar derived from the report is byte-identical to a dedicated
    * stats scan. */
  private[sink] def writeAndReport(spark: SparkSession, path: String,
      cols: Seq[String], extra: Seq[String])
      : (Map[String, Map[String, Option[(String, String)]]],
        Map[String, String]) = {
    require(cols.nonEmpty, "zone map needs at least one column")
    val files = StageWriter.listDataFiles(Paths.get(path))
    require(files.nonEmpty, s"$path has no data files")
    val schema = spark.read.parquet(path).schema
    def kindsOf(cs: Seq[String]) = cs.map { c =>
      val dt = schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"$path: no column $c")).dataType
      c -> kindOf(dt).getOrElse(throw new IllegalArgumentException(
        s"$path: column $c (${dt.simpleString}) has no zone-map dialect"))
    }
    val zoneKinds = kindsOf(cols)
    val allKinds = zoneKinds ++ kindsOf(extra.filterNot(cols.contains))
    val bounds = scanBounds(spark, files, allKinds, Some(schema))
    writeLines(path, zoneKinds, files.map(_.getFileName.toString), bounds)
    (bounds, allKinds.toMap)
  }

  /** Incremental maintenance after a FILE-TARGETED rewrite (D163's
    * merge): drop the replaced files' rows, scan ONLY the new files, and
    * republish — O(new files), so automatic pruning SURVIVES merges
    * instead of silently standing down at the first inventory change.
    * `preNames` is the inventory the old map must describe (the caller
    * holds the merge claim and knows it exactly); a map that doesn't
    * match it is DELETED rather than patched (never half-true). No-op
    * without a map. */
  def maintainAfterRewrite(spark: SparkSession, path: String,
      preNames: Seq[String], removed: Set[String],
      added: Seq[Path]): Unit = {
    val f = mapFile(path)
    if (!Files.exists(f)) return
    loadByNames(path, preNames.toSet) match {
      case None => Files.deleteIfExists(f); ()
      case Some(z) =>
        val kinds = z.kinds.toSeq.sortBy(_._1)
        val fresh = scanBounds(spark, added, kinds)
        val keptNames = preNames.filterNot(removed) ++
          added.map(_.getFileName.toString)
        val kept = z.bounds.collect {
          case ((n, c), b) if !removed(n) => (n, c) -> b
        }.groupBy(_._1._1).map { case (n, m) =>
          n -> m.map { case ((_, c), b) => c -> b }
        }
        writeLines(path, kinds, keptNames, kept ++ fresh)
    }
  }

  /** Load iff the map's file inventory matches `files` EXACTLY. */
  private[graft] def load(path: String, files: Seq[Path]): Option[Zones] =
    loadByNames(path, files.map(_.getFileName.toString).toSet)

  private[graft] def loadByNames(path: String,
      names: Set[String]): Option[Zones] = {
    val f = mapFile(path)
    if (!Files.exists(f)) return None
    import scala.jdk.CollectionConverters._
    val lines = Files.readAllLines(f).asScala.toSeq.filter(_.nonEmpty)
    val (header, rows) = lines.partition(_.startsWith("#col\t"))
    if (header.isEmpty) return None
    val kinds = header.map { l =>
      val a = l.split("\t", 3)
      dec(a(1)) -> a(2)
    }.toMap
    val bounds = rows.map { l =>
      val a = l.split("\t", 5)
      (a(0), dec(a(1))) -> (if (a(2) == "0") None
        else Some((dec(a(3)), dec(a(4)))))
    }.toMap
    if (bounds.keySet.map(_._1) == names) Some(Zones(kinds, bounds))
    else None
  }
}
