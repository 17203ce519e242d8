package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Distributed batch-gradient logistic regression (D125) — train a quality
  * classifier IN-PLAN over weakly-labeled documents, the MLlib
  * `treeAggregate` shape re-expressed as declarative aggregations:
  *
  *  - one map-side-combinable aggregation job per iteration computes the
  *    full-batch gradient (d+1 decimal-exact sums — the shuffle carries
  *    d+1 decimals per partition, never rows);
  *  - the driver holds only the (d+1)-vector of weights between rounds
  *    (the same bounded-collect class as the BPE merge list);
  *  - at 100 TB each round is one scan of the (cached) feature frame —
  *    cache or checkpoint features once, iterate on columns.
  *
  * Cross-engine exactness (the repo's oracle discipline): the sigmoid is
  * the ALGEBRAIC rational σ(z) = 0.5 + 0.5·z/(1+|z|) — plus, times and
  * divide are IEEE-exact in any engine, where exp() differs in final ulps
  * across libm implementations and would break hash-matching. Per-row
  * gradient terms are round(·, 8) then DECIMAL(28,8)-summed (order-
  * independent), weight updates round(·, 8), scores round(·, 6) — the
  * PageRank-iteration exactness pattern, so a DuckDB CTE chain replays
  * training bit-for-bit. */
object LogReg {

  /** Rational sigmoid: same monotone S-shape as the logistic function,
    * exactly reproducible in any IEEE engine (no transcendentals). */
  def sigma(z: Column): Column =
    lit(0.5) + lit(0.5) * z / (lit(1.0) + abs(z))

  /** round(x, 8) exactly as SQL round(HALF_UP) computes it — the driver-
    * side twin of the in-plan rounding, so weight recurrences match the
    * oracle's CTE arithmetic. */
  private def round8(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(8, java.math.RoundingMode.HALF_UP).doubleValue

  /** The linear term w·(1, x) with a FIXED left-to-right association —
    * written identically in the oracle SQL. */
  def linear(w: Seq[Double], xCols: Seq[String]): Column =
    xCols.zipWithIndex.foldLeft(lit(w.head): Column) { case (acc, (c, j)) =>
      acc + lit(w(j + 1)) * col(c) }

  /** Train `iters` rounds of full-batch gradient descent from zero weights.
    * `features` must already carry the (rounded) feature columns `xCols`
    * and a 0/1 double label `yCol`. Returns the weight vector
    * (bias +: xCols). ONE aggregation job per round; the row count rides
    * along in the first round's job. */
  def train(features: DataFrame, xCols: Seq[String], yCol: String,
      iters: Int = 3, lr: Double = 1.0): Array[Double] = {
    var w = Array.fill(xCols.length + 1)(0.0)
    var n = -1L
    for (_ <- 0 until iters) {
      val p = round(sigma(linear(w.toSeq, xCols)), 8)
      val gTerms = (lit(1.0) +: xCols.map(col)).zipWithIndex.map {
        case (x, j) =>
          sum(round((p - col(yCol)) * x, 8).cast(DecimalType(28, 8)))
            .as(s"g$j") }
      val agg = features.agg(gTerms.head,
        gTerms.tail :+ count(lit(1)).as("n"): _*).head()
      if (n < 0) n = agg.getLong(w.length)
      w = w.indices.map(j =>
        round8(w(j) - lr * agg.getDecimal(j).doubleValue() / n)).toArray
    }
    w
  }

  /** Score with trained weights: round(σ(w·x), `digits`). */
  def score(xCols: Seq[String], w: Seq[Double], digits: Int = 6): Column =
    round(sigma(linear(w, xCols)), digits).cast(DoubleType)
}
