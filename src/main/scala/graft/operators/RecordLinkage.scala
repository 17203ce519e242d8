package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Probabilistic record linkage (Fellegi & Sunter 1969) with data-driven
  * chance-agreement probabilities — the classic match scorer entity
  * resolution runs where no shared key exists (the reference lands the
  * same customer/supplier entities from ~30 source tables with no
  * global id, `/root/reference/artifacts/aws-glue/code/stage/
  * light_transform.py` stage zone; linking them is the downstream step).
  *
  * Per candidate pair and comparison field, the agreement likelihood
  * ratio is m/u on agreement and (1−m)/(1−u) on disagreement, where
  *  - m (match-given-true-match agreement rate) is the caller's prior;
  *  - u (chance agreement) is ESTIMATED FROM THE DATA as the exact
  *    random-pair agreement probability Σ_v c_v(c_v−1) / N(N−1) — rare
  *    values earn large weights automatically (the frequency-based
  *    refinement of Winkler).
  * The pair score is the likelihood-ratio PRODUCT in a fixed left-fold
  * order of IEEE doubles over exact int64 counts — no logs, so any SQL
  * engine replays scores bit-for-bit (log-weights would ulp-drift).
  *
  * Scale discipline: candidate pairs come from equality blocking plus a
  * deterministic per-block cap (smallest ids) BEFORE the self-join, so a
  * hot block contributes C(cap,2) pairs, never O(|block|²); the u-stats
  * are ONE exploded (field,value) count pass — map-side combinable,
  * catalog-sized, broadcast back as a single stats row.
  */
object RecordLinkage {

  /** Candidate pairs with per-field agreement flags and the
    * likelihood-ratio weight, filtered to `weight >= minWeight`.
    *
    * @param df       records (one row per id)
    * @param idCol    unique record id
    * @param blockCol blocking key (candidate pairs share it)
    * @param fields   (name, expression) comparison fields; flags surface
    *                 as `ag_<name>`; null-safe equality
    * @param m        prior agreement rate among true matches (e.g. 0.9)
    * @param maxBlock per-block record cap (smallest ids win)
    * @param minWeight emission threshold on the weight product
    */
  def linkageWeights(df: DataFrame, idCol: String, blockCol: String,
      fields: Seq[(String, Column)], m: Double, maxBlock: Int,
      minWeight: Double): DataFrame = {
    val base0 = df.select(
      F.col(idCol).as("id") +: F.col(blockCol).as("blk") +:
        fields.map { case (n, c) => c.as(s"f_$n") }: _*)
    val w = Window.partitionBy("blk").orderBy("id")
    val base = base0.withColumn("rn", F.row_number().over(w))
      .filter(F.col("rn") <= maxBlock).drop("rn")

    // ONE (field, value) count pass for every u — values stringified so
    // heterogeneous field types share the shuffle key space
    val exploded = base.select(F.explode(F.array(fields.map { case (n, _) =>
      F.struct(F.lit(n).as("f"), F.col(s"f_$n").cast("string").as("v"))
    }: _*)).as("fv")).select(F.col("fv.f"), F.col("fv.v"))
    val agreePairs = exploded.groupBy("f", "v")
      .agg(F.count(F.lit(1)).as("c"))
      .groupBy("f").agg(F.sum(F.col("c") * (F.col("c") - 1)).as("ap"))
    val n = base.agg(F.count(F.lit(1)).as("n"))
    // single stats row: u_<field> = agreeing pairs / all pairs; the
    // 1-row count frame broadcasts EXPLICITLY — plan-guaranteed, not
    // left to AQE's runtime size estimate
    val uRow = agreePairs.crossJoin(F.broadcast(n))
      .select(F.col("f"),
        (F.col("ap").cast("double") /
          (F.col("n") * (F.col("n") - 1)).cast("double")).as("u"))
      .groupBy().pivot("f", fields.map(_._1)).agg(F.first("u"))
      .select(fields.map { case (fn, _) => F.col(fn).as(s"u_$fn") }: _*)

    val pairs = base.as("a").join(base.as("b"),
        F.col("a.blk") === F.col("b.blk") && F.col("a.id") < F.col("b.id"))
      .select(Seq(F.col("a.id").as("id_a"), F.col("b.id").as("id_b")) ++
        fields.map { case (fn, _) =>
          (F.col(s"a.f_$fn") <=> F.col(s"b.f_$fn")).as(s"ag_$fn") }: _*)

    val weight = fields.map { case (fn, _) =>
      F.when(F.col(s"ag_$fn"), F.lit(m) / F.col(s"u_$fn"))
        .otherwise((F.lit(1.0) - F.lit(m)) /
          (F.lit(1.0) - F.col(s"u_$fn")))
    }.foldLeft(F.lit(1.0))(_ * _)

    pairs.crossJoin(F.broadcast(uRow))
      .withColumn("weight", weight)
      .filter(F.col("weight") >= minWeight)
      .select(F.col("id_a") +: F.col("id_b") +:
        fields.map { case (fn, _) => F.col(s"ag_$fn") } :+
        F.col("weight"): _*)
  }
}
