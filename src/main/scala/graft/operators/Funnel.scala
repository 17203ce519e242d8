package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** N-step ordered-sequence funnel over an event stream — the general form
  * of the 2-step view→purchase conversion (queries `evt_funnel`): step 1's
  * anchor is the user's earliest `firstType` event; step i's anchor is the
  * earliest `type_i` event inside `[t_{i-1}, t_{i-1} + window_i)` — the
  * greedy first-qualifying chain an event-analytics funnel means by
  * "view, then cart within a day of that, then purchase within a day of
  * THAT".
  *
  * Scale shape: ONE events scan and ONE user-keyed exchange. Each step is
  * a `min(when(...)) over (partition by user)` whose predicate reads the
  * PREVIOUS step's anchor column; all the windows share the same
  * partitioning (and need no ordering), so Catalyst stacks them over a
  * single hash exchange instead of N join-backs (N scans, N shuffles).
  * Anchor columns are per-user constants, so the follow-up per-user
  * rollup reuses the same partitioning.
  *
  * Beyond-reference operator (§2D): the reference pipeline has no event
  * analytics; the shape is the standard funnel definition from product
  * analytics engines.
  */
object Funnel {

  /** Per-user anchor timestamps (`t1..tN`, nanosecond longs, null where
    * the user never completed that step) for the funnel
    * `firstType → rest(0) → rest(1) → …`, where `rest(i) = (eventType,
    * windowNs)` must occur within `windowNs` of the previous anchor.
    * Output: one row per user with any step-1 event: (user, t1..tN). */
  def anchors(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, firstType: String, rest: Seq[(String, Long)])
      : DataFrame = {
    val w = Window.partitionBy(userCol)
    val base = events.select(col(userCol), col(typeCol), col(tsCol))
      .withColumn("t1",
        min(when(col(typeCol) === firstType, col(tsCol))).over(w))
    val withAnchors = rest.zipWithIndex.foldLeft(base) {
      case (df, ((tpe, windowNs), i)) =>
        val prev = col(s"t${i + 1}")
        df.withColumn(s"t${i + 2}",
          min(when(col(typeCol) === tpe &&
            col(tsCol) >= prev && col(tsCol) < prev + lit(windowNs),
            col(tsCol))).over(w))
    }
    val anchorCols: Seq[Column] =
      (1 to rest.length + 1).map(i => min(s"t$i").as(s"t$i"))
    withAnchors.filter(col("t1").isNotNull)
      .groupBy(userCol) // anchors are per-user constants; min() just picks them
      .agg(anchorCols.head, anchorCols.tail: _*)
  }

  /** Funnel summary: how many users reached each step. One row,
    * `step1_users >= step2_users >= … >= stepN_users`. */
  def counts(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, firstType: String, rest: Seq[(String, Long)])
      : DataFrame = {
    val n = rest.length + 1
    anchors(events, userCol, typeCol, tsCol, firstType, rest)
      .agg(count(col("t1")).as("step1_users"),
        (2 to n).map(i => count(col(s"t$i")).as(s"step${i}_users")): _*)
  }
}
