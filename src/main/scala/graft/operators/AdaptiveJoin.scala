package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.CountMin

/** Adaptive equi-join chooser (SURVEY §2D, D110) — the planner-side
  * consumer of the D105 join-size sketches: decide broadcast vs plain
  * shuffle vs [[JoinGuard]]-capped BEFORE running the join, from bounded
  * profiling state.
  *
  * Per side, ONE aggregation job replaces the blind join: the map-side-
  * combinable `groupBy(key).count` key-domain aggregation feeds a single
  * global `agg` computing total rows, EXACT max per-key count, AND the
  * 2 KB count-min sketch (via [[graft.functions.CountMinWeighted]] — the
  * per-key counts increment the counters by n, so the sketch is identical
  * to a raw-row scan without re-reading the data). The shuffle carries
  * only the key domain, never the data; the sketches' inner product
  * estimates the join's output rows without touching the other side
  * (AGMS upper bound; collisions only inflate).
  *
  * Decision (all thresholds explicit, the audit row records every input):
  *  1. smaller side fits the broadcast budget → `broadcast` (no shuffle of
  *     the big side — at 100 TB the difference between moving 100 TB and
  *     moving 100 MB);
  *  2. exact max-frequency product exceeds `maxProduct`, or the sketch
  *     estimate exceeds `maxEstRows` → `capped` ([[JoinGuard.cappedJoin]]
  *     bounds the blowup deterministically instead of dying);
  *  3. otherwise → plain `shuffle` join and AQE takes it from there.
  *
  * The reference pipeline executes whatever free-text JOIN_EXPR its config
  * carries (`extract_data.py:1048-1073`) — this is the guardrail a
  * 100 TB deployment puts in front of that. */
object AdaptiveJoin {

  /** Everything the decision saw — log it next to the join (the D103
    * `profile` discipline applied to strategy choice). */
  final case class Profile(leftRows: Long, rightRows: Long,
      maxFreqLeft: Long, maxFreqRight: Long, estJoinRows: Long,
      strategy: String)

  private def sideStats(df: DataFrame, key: String, d: Int, w: Int)
      : (Long, Long, Array[Long]) = {
    // ONE job: key-domain partial agg, then a single global row carrying
    // (rows, maxFreq, sketch) — the weighted sketch consumes (buckets, n)
    // so no second scan of the side is ever needed
    val r = df.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .agg(sum(col("__n")), max(col("__n")),
        udaf(new graft.functions.CountMinWeighted(d, w))
          .apply(CountMin.buckets(col(key), d, w), col("__n")))
      .head()
    val (rows, maxFreq) =
      if (r.isNullAt(0)) (0L, 0L) else (r.getLong(0), r.getLong(1))
    val cms =
      if (rows == 0) new Array[Long](d * w) else r.getSeq[Long](2).toArray
    (rows, maxFreq, cms)
  }

  /** Driver-side AGMS inner product of two flattened d×w counter arrays:
    * min over hash rows of Σ_bucket a·b — the same estimator as
    * [[CountMin.innerProduct]], on collected sketches. */
  private[operators] def innerProduct(a: Array[Long], b: Array[Long],
      d: Int, w: Int): Long =
    (0 until d).map { i =>
      var s = 0L
      var j = 0
      while (j < w) { s += a(i * w + j) * b(i * w + j); j += 1 }
      s
    }.min

  /** Profile both sides and pick the strategy. Bounded driver state: two
    * single-row aggregates + two d·w·8-byte sketches. */
  def choose(left: DataFrame, right: DataFrame, key: String,
      broadcastRows: Long = 1L << 20, maxProduct: Long = 1L << 22,
      maxEstRows: Long = Long.MaxValue, d: Int = 4, w: Int = 1024)
      : Profile = {
    val (ln, lmax, lcms) = sideStats(left, key, d, w)
    val (rn, rmax, rcms) = sideStats(right, key, d, w)
    val est = innerProduct(lcms, rcms, d, w)
    val strategy =
      if (math.min(ln, rn) <= broadcastRows) "broadcast"
      else if (lmax * rmax > maxProduct || est > maxEstRows) "capped"
      else "shuffle"
    Profile(ln, rn, lmax, rmax, est, strategy)
  }

  /** Metadata-priced strategy choice (SURVEY §2D, D238) — the D110
    * decision served from the D227/D231 sidecar planes with ZERO Spark
    * jobs: row counts from the counts plane, join cardinality from the
    * classic uniform-frequency estimate |L ⋈ R| ≈ |L|·|R| / max(ndv_L,
    * ndv_R) (the System R formula every CBO ships) over the KMV NDV
    * planes — the "join planner consumes the catalog statistics" path a
    * lakehouse CBO runs, here against the engine's own sidecars. The
    * exact max-frequency skew guard is not derivable from metadata, so
    * `maxFreq*` report -1 (not measured) and the capped arm keys off
    * the estimate alone. `None` = any plane missing/stale on either
    * side — fall back to the measured [[choose]], the stand-down
    * discipline of every metadata consumer. */
  def chooseFromSidecars(leftPath: String, leftKey: String,
      rightPath: String, rightKey: String,
      broadcastRows: Long = 1L << 20,
      maxEstRows: Long = Long.MaxValue): Option[Profile] =
    for {
      ln <- graft.sink.MetadataAgg.count(leftPath)
      rn <- graft.sink.MetadataAgg.count(rightPath)
      lndv <- graft.sink.MetadataAgg.ndvEstimate(leftPath, leftKey)
      rndv <- graft.sink.MetadataAgg.ndvEstimate(rightPath, rightKey)
    } yield {
      val maxNdv = math.max(lndv, rndv)
      val est =
        if (maxNdv <= 0.0) 0L
        else {
          val e = ln.toDouble * rn.toDouble / maxNdv
          if (e >= Long.MaxValue.toDouble) Long.MaxValue else e.toLong
        }
      val strategy =
        if (math.min(ln, rn) <= broadcastRows) "broadcast"
        else if (est > maxEstRows) "capped"
        else "shuffle"
      Profile(ln, rn, -1L, -1L, est, strategy)
    }

  /** [[chooseFromSidecars]], then execute against the two table paths
    * (right key renamed to the left's for the equi-join). `None` = a
    * plane stood down — the caller falls back to the measured
    * [[join]]. The capped arm passes `maxProduct` — the PER-KEY
    * frequency-product offender threshold [[JoinGuard.cappedJoin]]
    * profiles against (maxEstRows is a TOTAL-output budget; feeding it
    * to the per-key guard would find zero offenders and cap nothing) —
    * and therefore necessarily runs JoinGuard's measured offender
    * profiling: metadata prices the DECISION, the cap itself needs the
    * per-key view metadata cannot carry. */
  def joinFromSidecars(spark: org.apache.spark.sql.SparkSession,
      leftPath: String, leftKey: String, rightPath: String,
      rightKey: String, capEach: Int = 10000,
      broadcastRows: Long = 1L << 20,
      maxEstRows: Long = Long.MaxValue,
      maxProduct: Long = 1L << 22): Option[(DataFrame, Profile)] =
    chooseFromSidecars(leftPath, leftKey, rightPath, rightKey,
        broadcastRows, maxEstRows).map { p =>
      val left = spark.read.parquet(leftPath)
      val right = spark.read.parquet(rightPath)
        .withColumnRenamed(rightKey, leftKey)
      val joined = p.strategy match {
        case "broadcast" =>
          if (p.leftRows <= p.rightRows)
            broadcast(left).join(right, Seq(leftKey), "inner")
          else left.join(broadcast(right), Seq(leftKey), "inner")
        case "capped" =>
          JoinGuard.cappedJoin(left, right, leftKey, maxProduct, capEach,
            Nil, Nil)
        case _ => left.join(right, Seq(leftKey), "inner")
      }
      (joined, p)
    }

  /** Choose, then execute: broadcast hints the smaller side; capped runs
    * [[JoinGuard.cappedJoin]] (tiebreaks make the cap deterministic);
    * shuffle leaves the plan to Catalyst + AQE. Returns the joined frame
    * and the audit profile. */
  def join(left: DataFrame, right: DataFrame, key: String,
      capEach: Int = 10000, leftTiebreak: Seq[Column] = Nil,
      rightTiebreak: Seq[Column] = Nil, broadcastRows: Long = 1L << 20,
      maxProduct: Long = 1L << 22, maxEstRows: Long = Long.MaxValue,
      d: Int = 4, w: Int = 1024): (DataFrame, Profile) = {
    val p = choose(left, right, key, broadcastRows, maxProduct, maxEstRows,
      d, w)
    val joined = p.strategy match {
      case "broadcast" =>
        if (p.leftRows <= p.rightRows)
          broadcast(left).join(right, Seq(key), "inner")
        else left.join(broadcast(right), Seq(key), "inner")
      case "capped" =>
        JoinGuard.cappedJoin(left, right, key, maxProduct, capEach,
          leftTiebreak, rightTiebreak)
      case _ => left.join(right, Seq(key), "inner")
    }
    (joined, p)
  }
}
