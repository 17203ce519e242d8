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
  * magnitude under the row count) and a BROADCAST left-semi join of the
  * surviving QI combos back onto the data — the table itself never
  * shuffles, and no window function touches an unbounded ordering.
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
    df.join(broadcast(safe), cond, "left_semi")
  }

  /** Release audit: every QI combination with its size and verdict —
    * what a data-governance review signs off on before the release.
    * Columns: the QI columns, `n`, `released` (1 iff n >= k). */
  def kAnonymityReport(df: DataFrame, qiCols: Seq[String],
      k: Long): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("released", when(col("n") >= k, 1L).otherwise(0L))

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
      d.withColumn(c, sha2(concat(lit(key + "|"),
        col(c).cast("string")), 256))
    }
  }

  /** ε-DP noisy group counts: count per group + two-sided geometric
    * noise, sampled by inverse-CDF lookup of a uniform drawn from the
    * portable 60-bit hash of (group key, seed) — deterministic per
    * (release, seed), a fresh seed per release epoch. Output carries the
    * released (noisy) count and the ε spent, NEVER the true count —
    * sequential releases compose by summing the ε column (basic
    * composition). One map-side-combinable aggregation; the noise is a
    * per-group projection over the bounded group table. */
  def dpCounts(df: DataFrame, groupCols: Seq[String], eps: Double,
      seed: Long, maxNoise: Int = 39): DataFrame = {
    require(groupCols.nonEmpty)
    val bps = geometricBreakpoints(eps, maxNoise)
    val u = Dedup.portableHash60(
      concat_ws("|", groupCols.map(col) :+ lit(seed.toString): _*))
      .cast("double") / lit(1152921504606846976.0) // 2^60
    val noise = bps.dropRight(1).foldRight(
      lit(bps.last._1.toLong): Column) { case ((k, cum), rest) =>
      when(u < lit(cum), lit(k.toLong)).otherwise(rest)
    }
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .select(groupCols.map(col) ++ Seq(
        (col("__n") + noise).as("released"), lit(eps).as("eps")): _*)
  }
}
