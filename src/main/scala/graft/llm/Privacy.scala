package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-preserving release operators (SURVEY §2D).
  *
  * [[kAnonymize]] is the k-anonymity SUPPRESSION step (Sweeney's model —
  * public literature): a row may only be released if at least `k` rows
  * share its full quasi-identifier (QI) combination, so no released row
  * can be narrowed below a crowd of k. Complements the regex PII
  * redaction pass (D25, which scrubs direct identifiers INSIDE text):
  * redaction handles what a row says, k-anonymity handles what a row's
  * metadata combination reveals.
  *
  * Scale shape: ONE aggregation on the QI columns (map-side combinable
  * counts; QI cardinality is bounded by the release schema, orders of
  * magnitude under the row count) and a left-semi join of the surviving
  * QI combos back onto the data, broadcast WHEN AQE's runtime size of
  * the group table clears the threshold and shuffle-joined past it (a
  * near-key QI set degrades, never OOMs the driver) — the table itself
  * never shuffles in the broadcast regime, and no window function
  * touches an unbounded ordering.
  */
object Privacy {

  /** Rows whose exact quasi-identifier combination occurs >= k times.
    * NULL QI values group as themselves (a null combo is released only
    * if k rows share it) — the semantics of groupBy, kept deliberately. */
  def kAnonymize(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty, "k-anonymity requires quasi-identifier columns")
    require(k >= 1, s"k must be >= 1 (got $k)")
    // null-SAFE semi-join: groupBy put all-null QI rows in one group, so
    // the release join must match them back with <=> — a plain USING join
    // would silently suppress every null-QI group regardless of size,
    // diverging from the report's verdict
    val safe = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__qi_n"))
      .filter(col("__qi_n") >= k)
      .select(qiCols.map(c => col(c).as(s"__qi_$c")): _*)
    val cond = qiCols.map(c => col(c) <=> col(s"__qi_$c")).reduce(_ && _)
    // size-gated build side (r10): NO unconditional broadcast() hint — a
    // caller passing a near-key QI set makes `safe` table-sized, and a
    // hint would OOM the driver where governance wants degradation. AQE
    // reads the agg shuffle's ACTUAL output size at runtime and converts
    // to a broadcast semi-join only under autoBroadcastJoinThreshold,
    // falling back to a shuffle semi-join past it — the
    // DeletionVectors.read gate discipline, with runtime stats instead
    // of file sizes (and zero extra passes, where a cardinality probe
    // would re-run the aggregation).
    df.join(safe, cond, "left_semi")
  }

  /** Release audit: every QI combination with its size and verdict —
    * what a data-governance review signs off on before the release.
    * Columns: the QI columns, `n`, `released` (1 iff n >= k). */
  def kAnonymityReport(df: DataFrame, qiCols: Seq[String],
      k: Long): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("released", when(col("n") >= k, 1L).otherwise(0L))

  /** Distinct-l-diversity release gating (D194, Machanavajjhala et al.
    * 2007): k-anonymity alone leaks when a large-enough QI group is
    * HOMOGENEOUS in the sensitive attribute — everyone in the group
    * shares the secret, so group size protects nothing. A group
    * releases only when it is big enough (n ≥ k) AND carries at least
    * `l` DISTINCT sensitive values. One map-side-combinable aggregation
    * (count + count distinct per QI group — the distinct dedups on the
    * (QI, sensitive) key domain first, never the table); the release
    * filter is the same null-safe semi-join as [[suppressRare]]. NULL
    * sensitive values do not count toward diversity (an absent secret
    * diversifies nothing). */
  def lDiversityReport(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, k: Long, l: Long): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        count_distinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("released",
        when(col("n") >= k && col("n_sensitive") >= l, 1L).otherwise(0L))

  /** Rows of the QI groups [[lDiversityReport]] releases — the
    * publishable subset. */
  def suppressLowDiversity(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, k: Long, l: Long): DataFrame = {
    val safe = lDiversityReport(df, qiCols, sensitiveCol, k, l)
      .filter(col("released") === 1L)
      .select(qiCols.map(c => col(c).as(s"__qi_$c")): _*)
    val cond = qiCols.map(c => col(c) <=> col(s"__qi_$c")).reduce(_ && _)
    // same AQE size gate as [[kAnonymize]] — never an unconditional hint
    df.join(safe, cond, "left_semi")
  }

  /** Inverse-CDF breakpoints of the TRUNCATED two-sided geometric
    * (discrete Laplace) distribution P(K = k) ∝ α^|k| with α = e^(−ε),
    * the integer-valued ε-DP mechanism for counting queries (Ghosh,
    * Roughgarden & Sundararajan 2009 — the universally-optimal discrete
    * analogue of Laplace noise). Computed ONCE on the driver and
    * embedded as literal doubles in BOTH engines (the portable-constants
    * discipline of the LSH planes): at query time neither engine
    * evaluates a transcendental, so releases replay bit-for-bit in SQL
    * where `exp`/`ln` would ulp-drift. Tail mass beyond ±maxNoise folds
    * into the extremes (the standard bounded-geometric variant; at
    * ε = 0.5, maxNoise = 39 leaves < 3·10⁻⁹ folded). */
  def geometricBreakpoints(eps: Double,
      maxNoise: Int = 39): Seq[(Int, Double)] = {
    require(eps > 0 && maxNoise >= 1)
    val alpha = math.exp(-eps)
    val p0 = (1 - alpha) / (1 + alpha)
    val ks = (-maxNoise to maxNoise).toSeq
    val cums = ks.map(k => p0 * math.pow(alpha, math.abs(k)))
      .scanLeft(0.0)(_ + _).tail
    ks.zip(cums.updated(cums.size - 1, 1.0))
  }

  /** Deterministic keyed pseudonymization: replaces identifier columns
    * with keyed SHA-256 tokens (hex), so datasets released at different
    * times still JOIN on the pseudonym without ever carrying the raw id
    * — the tokenization half of a privacy program (D25 scrubs free text,
    * D132 suppresses rare metadata combos, this removes the identifier
    * itself while preserving linkability). Same key + same value ⇒ same
    * token across tables and releases; rotate the key to break
    * linkability between release generations. Pure per-row projection:
    * zero shuffles, codegen'd sha2. For an adversarial setting use a
    * true HMAC through the same call shape; the keyed-hash form here is
    * the standard warehouse tokenizer and replays in any engine with a
    * sha256 function. */
  def pseudonymize(df: DataFrame, cols: Seq[String],
      key: String): DataFrame = {
    require(cols.nonEmpty)
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c, pseudonymizeCol(col(c), key))
    }
  }

  /** The ONE keyed-token expression every pseudonymizing surface shares
    * (this frame API, the D186 erasure ledger, the D191 tag views) — so
    * tokens from any of them JOIN, and the DuckDB twin is always
    * `sha256(key || '|' || CAST(x AS VARCHAR))`. */
  def pseudonymizeCol(c: Column, key: String): Column =
    sha2(concat(lit(key + "|"), c.cast("string")), 256)

  /** The two-sided geometric noise column for a group row: inverse-CDF
    * lookup of a uniform drawn from the portable 60-bit hash of
    * (group key, seed, epoch). Deterministic per (seed, epoch) so a
    * release replays bit-for-bit in SQL; the EPOCH is part of the
    * derivation by construction — two releases over evolving data with
    * the same long seed but different epochs draw INDEPENDENT noise, so
    * their difference never exposes an exact count delta (the reuse
    * hazard a merely-documented "fresh seed per release" leaves open). */
  private def geometricNoise(groupCols: Seq[String], eps: Double,
      seed: Long, epoch: String, maxNoise: Int): Column = {
    val bps = geometricBreakpoints(eps, maxNoise)
    val u = Dedup.portableHash60(
      concat_ws("|", groupCols.map(col) :+ lit(s"$seed|$epoch"): _*))
      .cast("double") / lit(1152921504606846976.0) // 2^60
    // FLAT inverse-CDF: k = -maxNoise + #{cum_i <= u} — a shallow sum of
    // comparisons instead of a 2·maxNoise-level nested CASE chain, which
    // janino refuses to compile (observed: whole-stage codegen fallback
    // at maxNoise = 39). Equivalent to "smallest k with u < cum(k)"
    // including exact-tie behavior, and the SQL oracle keeps its CASE
    // form (DuckDB compiles it fine; both pick the same k for the same
    // double u).
    bps.dropRight(1).map { case (_, cum) =>
      when(u >= lit(cum), lit(1L)).otherwise(lit(0L)) }
      .reduce(_ + _) + lit(bps.head._1.toLong)
  }

  /** ε-DP noisy group counts over a caller-supplied PUBLIC domain.
    *
    * The domain must come from public knowledge (a reference enum, a
    * calendar spine, a released schema) — NOT from the data: a release
    * keyed to data-derived groups leaks through its support, because a
    * group's mere PRESENCE in the output deterministically reveals its
    * true count is >= 1 regardless of the noise (the unknown-domain
    * histogram problem). Here every domain row is released — absent
    * groups as noise(0) — and groups outside the domain are withheld, so
    * the output's key set is a constant of the release, independent of
    * the data. For domains you cannot enumerate, use [[dpCountsStable]].
    *
    * Output carries the released (noisy) count and the ε spent, NEVER
    * the true count; sequential releases compose by summing ε (basic
    * composition). One map-side-combinable aggregation + one join onto
    * the domain table (broadcast when small); noise is a per-row
    * projection over the bounded group table. */
  def dpCounts(df: DataFrame, groupCols: Seq[String], domain: DataFrame,
      eps: Double, seed: Long, epoch: String,
      maxNoise: Int = 39): DataFrame = {
    require(groupCols.nonEmpty)
    require(groupCols.forall(domain.columns.contains),
      s"public domain must carry the group columns ${groupCols.mkString(",")}")
    val noise = geometricNoise(groupCols, eps, seed, epoch, maxNoise)
    val counts = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .select(groupCols.map(c => col(c).as(s"__d_$c")) :+ col("__n"): _*)
    val cond = groupCols.map(c => col(c) <=> col(s"__d_$c")).reduce(_ && _)
    domain.select(groupCols.map(col): _*).dropDuplicates(groupCols)
      .join(counts, cond, "left")
      .select(groupCols.map(col) ++ Seq(
        (coalesce(col("__n"), lit(0L)) + noise).as("released"),
        lit(eps).as("eps")): _*)
  }

  /** Release threshold τ of the stability histogram: a group is released
    * only if its noisy count >= τ, with τ the smallest value such that a
    * group a single row could remove entirely (true count 1) clears it
    * with probability <= δ — P(1 + K >= τ) = P(K >= τ-1) = α^(τ-1)/(1+α)
    * <= δ under the two-sided geometric. Driver-side closed form, embedded
    * as a literal in both engines. */
  def stabilityThreshold(eps: Double, delta: Double,
      maxNoise: Int = 39): Long = {
    require(eps > 0 && delta > 0 && delta < 1)
    val alpha = math.exp(-eps)
    val t = math.ceil(math.log(delta * (1 + alpha)) / math.log(alpha)).toLong
    require(t <= maxNoise,
      s"delta=$delta needs noise tail $t beyond maxNoise=$maxNoise — " +
        "raise maxNoise or delta")
    1L + math.max(t, 1L)
  }

  /** (ε,δ)-DP noisy group counts over an UNKNOWN (data-derived) domain —
    * the stability histogram (Korolova et al. 2009; the mechanism behind
    * "differentially private SQL with bounded user contribution", Wilson
    * et al. 2020): count present groups, add two-sided geometric noise,
    * and release ONLY groups whose noisy count clears
    * [[stabilityThreshold]]. Presence in the output no longer certifies
    * presence in the data at any particular count: a group one row could
    * delete survives the threshold with probability <= δ, which is
    * exactly the δ of the (ε,δ) guarantee. Use when the group domain
    * cannot be enumerated publicly; prefer [[dpCounts]] with a public
    * domain when it can (pure ε-DP, no suppressed small groups). */
  def dpCountsStable(df: DataFrame, groupCols: Seq[String], eps: Double,
      delta: Double, seed: Long, epoch: String,
      maxNoise: Int = 39): DataFrame = {
    require(groupCols.nonEmpty)
    val tau = stabilityThreshold(eps, delta, maxNoise)
    val noise = geometricNoise(groupCols, eps, seed, epoch, maxNoise)
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .select(groupCols.map(col) ++ Seq(
        (col("__n") + noise).as("released"), lit(eps).as("eps"),
        lit(delta).as("delta")): _*)
      .filter(col("released") >= tau)
  }
}
