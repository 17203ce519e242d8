package graft.sink

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** Unified sidecar freshness under ONE per-table manifest (SURVEY §2D,
  * D190) — the Delta-log discipline for the parquet fallback's pruning
  * planes. Three inventory-keyed sidecars accumulated over rounds, each
  * with its own dialect, staleness rule and refresh path:
  *
  *  - D107/D163 key-range stats (`__stats__`) — drives StatsFilePrune
  *    and file-targeted MERGE;
  *  - D123 per-file blooms (`__blooms__`) — point-lookup skipping;
  *  - D183 multi-column zone maps (`__zonemap__`) — range skipping on
  *    every mapped column.
  *
  * Each consumer validates its sidecar against the EXACT file inventory
  * and stands down on any mismatch — safe, but before this manifest only
  * zone maps survived a targeted merge and only `optimize(statsColumn)`
  * refreshed ranges: after any other rewrite the remaining planes
  * quietly degraded to full scans. Correct-but-slower; at 100 TB
  * "quietly stopped pruning" is a real bill.
  *
  * The manifest (`path.__sidecars__`, an atomically-replaced tab file)
  * DECLARES the planes a table carries. Every full-rewrite writer in
  * this sink ([[StageWriter.overwrite]], hence compact / optimize /
  * full-rewrite merges / DV folds) finishes through [[refreshAfterWrite]],
  * and the file-targeted merge commit finishes through
  * [[afterTargetedRewrite]] (O(new files) incremental maintenance), so a
  * declared plane is fresh after EVERY write path — no consumer ever
  * silently stands down. The consumers' inventory checks STAY: the
  * manifest makes them pass, it never bypasses them, so a foreign writer
  * that ignores this sink still degrades safely and never mis-prunes.
  *
  * D155's `_derived_partition` sidecar is deliberately NOT here: it
  * records a column DERIVATION (valid for any file inventory), not
  * inventory-keyed state, and its one writer rewrites it with the data.
  *
  * Refresh cost: stats+zone share ONE combined per-file min/max scan
  * (r10 — see [[refreshAfterWrite]]); blooms scan the key column once —
  * the stats-on-write trade every Delta writer makes, paid at write
  * cadence, never per query. */
object Sidecars {

  sealed trait Plane
  /** D107 per-file key range (long or string dialect by column type). */
  final case class Stats(column: String) extends Plane
  /** D183 multi-column zone map. */
  final case class Zone(columns: Seq[String]) extends Plane
  /** D123 per-file Bloom filter (bits/k are part of the declaration —
    * probe and build must agree). */
  final case class Bloom(column: String, bits: Int = 8192, k: Int = 3)
    extends Plane
  /** D227 per-file row counts ([[MetadataAgg]]) — metadata-only
    * count(*) / per-partition counts. */
  case object Counts extends Plane
  /** D231 per-file KMV distinct sketches ([[MetadataAgg.ndvEstimate]])
    * — metadata-only NDV, the CBO statistic, deterministic and
    * SQL-replayable by the KMV contract. */
  final case class Ndv(column: String, k: Int = 256) extends Plane
  /** D232 per-file KMH quantile samples ([[MetadataAgg.kmhQuantiles]])
    * — metadata-only percentiles over the deterministic D44 sample. */
  final case class Kmh(valueColumn: String, key1: String, key2: String,
    k: Int = 1024) extends Plane
  /** D236 per-file categorical value histogram
    * ([[MetadataAgg.histCounts]]) — metadata-only GROUP BY /
    * filtered counts on one declared low-cardinality column. */
  final case class Hist(column: String, maxDistinct: Int = 64)
    extends Plane

  private def manifestFile(path: String): Path =
    Paths.get(path + ".__sidecars__")

  /** Declare the pruning planes `path` carries and build them all now.
    * Re-declaring replaces the manifest (and rebuilds). */
  def declare(spark: SparkSession, path: String,
      planes: Seq[Plane]): Unit = {
    require(planes.nonEmpty, "declare at least one plane")
    // the listDataFiles-keyed planes cover flat layouts only: on a
    // partitioned table their (empty) inventory check would pass
    // vacuously — refuse at declare time rather than write a sidecar
    // whose freshness contract cannot bind
    require(!planes.exists(p => p.isInstanceOf[Ndv] ||
        p.isInstanceOf[Kmh] || p.isInstanceOf[Hist]) ||
      MetadataAgg.flatLayout(path),
      s"Ndv/Kmh/Hist planes cover flat layouts only; $path is " +
        "partitioned")
    val lines = planes.map {
      case Stats(c) => s"stats\t$c"
      case Zone(cs) => s"zone\t${cs.mkString(",")}"
      case Bloom(c, bits, k) => s"bloom\t$c\t$bits\t$k"
      case Counts => "counts"
      case Ndv(c, k) => s"ndv\t$c\t$k"
      case Kmh(vc, c1, c2, k) => s"kmh\t$vc\t$c1\t$c2\t$k"
      case Hist(c, k) => s"hist\t$c\t$k"
    }
    val target = manifestFile(path)
    val tmp = Files.createTempFile(
      target.toAbsolutePath.getParent, ".sidecars", ".tmp")
    Files.writeString(tmp, lines.mkString("", "\n", "\n"))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    refreshAfterWrite(spark, path)
  }

  /** The declared planes (empty when no manifest — every hook below is
    * then a no-op, so undeclared tables pay nothing). */
  def declared(path: String): Seq[Plane] = {
    val f = manifestFile(path)
    if (!Files.isRegularFile(f)) return Seq.empty
    import scala.jdk.CollectionConverters._
    Files.readAllLines(f).asScala.toSeq.filter(_.nonEmpty).flatMap { l =>
      l.split("\t").toList match {
        case "stats" :: c :: Nil => Some(Stats(c))
        case "zone" :: cs :: Nil => Some(Zone(cs.split(',').toSeq))
        case "bloom" :: c :: b :: k :: Nil =>
          scala.util.Try(Bloom(c, b.toInt, k.toInt)).toOption
        case "counts" :: Nil => Some(Counts)
        case "ndv" :: c :: k :: Nil =>
          scala.util.Try(Ndv(c, k.toInt)).toOption
        case "kmh" :: vc :: c1 :: c2 :: k :: Nil =>
          scala.util.Try(Kmh(vc, c1, c2, k.toInt)).toOption
        case "hist" :: c :: k :: Nil =>
          scala.util.Try(Hist(c, k.toInt)).toOption
        case _ => None // unknown plane line: ignore, never guess
      }
    }
  }

  def drop(path: String): Unit = {
    Files.deleteIfExists(manifestFile(path)); ()
  }

  /** Rebuild every declared plane against the table's CURRENT inventory
    * — the full-rewrite hook ([[StageWriter.overwrite]] calls this after
    * its swap). No manifest → no-op.
    *
    * COMBINED stats+zone refresh (r10): a table declaring one Stats and
    * one Zone plane pays ONE per-file min/max scan covering both
    * dialects (zone's scan also reports the stats column; the stats
    * sidecar derived from it is byte-identical to a dedicated pass) —
    * at write cadence that halves refresh cost whenever the stats
    * column's footer fast-path can't serve. Any other plane mix keeps
    * the per-plane paths. */
  def refreshAfterWrite(spark: SparkSession, path: String): Unit = {
    val planes = declared(path)
    if (planes.isEmpty) return
    val statsPlanes = planes.collect { case s: Stats => s }
    val zonePlanes = planes.collect { case z: Zone => z }
    val combine = statsPlanes.size == 1 && zonePlanes.size == 1
    val combined: Seq[() => Unit] =
      if (!combine) Nil
      else Seq(() => {
        val (bounds, kinds) = ZoneMap.writeAndReport(spark, path,
          zonePlanes.head.columns, Seq(statsPlanes.head.column))
        StageWriter.writeStatsFromBounds(path, statsPlanes.head.column,
          kinds(statsPlanes.head.column), bounds)
      })
    val rest: Seq[() => Unit] = planes.collect {
      case Stats(c) if !combine =>
        () => StageWriter.refreshStats(spark, path, c)
      case Zone(cs) if !combine =>
        () => ZoneMap.write(spark, path, cs)
      case Bloom(c, bits, k) =>
        () => { Layout.writeBlooms(spark, path, c, bits, k); () }
      case Counts => () => MetadataAgg.writeCounts(spark, path)
      case Ndv(c, k) => () => MetadataAgg.writeNdv(spark, path, c, k)
      case Kmh(vc, c1, c2, k) =>
        () => MetadataAgg.writeKmh(spark, path, vc, c1, c2, k)
      case Hist(c, k) => () => MetadataAgg.writeHist(spark, path, c, k)
    }
    // each rebuild is an independent action writing its OWN sidecar
    // atomically — overlap them through the shared bounded pool
    // (guide §2.6) instead of paying each scan's task tail serially
    Par.map(combined ++ rest)(_.apply()); ()
  }

  /** Incremental maintenance after a FILE-TARGETED rewrite: zone maps
    * patch via [[ZoneMap.maintainAfterRewrite]] (declared or not — the
    * map itself is the declaration there), declared blooms re-filter
    * only the new files, and the range stats were already re-derived
    * inline by the merge commit (it owns the per-file ranges it wrote).
    * O(new files) per plane — the targeted merge's cost shape holds. */
  def afterTargetedRewrite(spark: SparkSession, path: String,
      preNames: Seq[String], removed: Set[String],
      added: Seq[Path]): Unit = {
    val zone: Seq[() => Unit] = Seq(() =>
      ZoneMap.maintainAfterRewrite(spark, path, preNames, removed, added))
    // stats: maintained inline by targetedCommit; zone: unconditional
    // (the map itself is the declaration there)
    val rest: Seq[() => Unit] = declared(path).collect {
      case Bloom(c, bits, k) =>
        () => Layout.maintainBloomsAfterRewrite(spark, path, removed,
          added, c, bits, k)
      case Counts =>
        () => MetadataAgg.maintainCountsAfterRewrite(path, removed, added)
      case Ndv(c, k) =>
        () => MetadataAgg.maintainNdvAfterRewrite(spark, path, removed,
          added, c, k)
      case Kmh(vc, c1, c2, k) =>
        () => MetadataAgg.maintainKmhAfterRewrite(spark, path, removed,
          added, vc, c1, c2, k)
      case Hist(c, k) =>
        () => MetadataAgg.maintainHistAfterRewrite(spark, path, removed,
          added, c, k)
    }
    // independent O(new files) patches of distinct sidecars — overlapped
    // like the full-rewrite hook (guide §2.6)
    Par.map(zone ++ rest)(_.apply()); ()
  }
}
