package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Frequent-pair association-rule mining (the Apriori pair pass of
  * Agrawal & Srikant, VLDB'94) shaped for a 100 TB transaction log.
  *
  * Reference analogy: the ingest framework materializes order/line fact
  * tables (`/root/reference/artifacts/aws-glue/code/stage/
  * light_transform.py` stage outputs) but has no mining pass; this is the
  * first analysis a merchandising team runs on them.
  *
  * Scale discipline — the pair explosion is bounded BEFORE it happens:
  *  1. item supports come from one map-side-combinable count;
  *  2. Apriori monotonicity prunes baskets to FREQUENT items only (a pair
  *     can only be frequent if both members are), via broadcast semi-join
  *     — infrequent long-tail items (most of a real catalog) never reach
  *     the pair stage;
  *  3. a deterministic per-basket cap (`maxPerBasket`, smallest item ids
  *     win) bounds per-basket pair work at C(cap,2) — a pathological
  *     mega-basket contributes a constant, never O(|basket|²);
  *  4. pairs come from a self-equi-join on the basket key over the pruned,
  *     capped baskets — shuffle keyed on basket id, never a cross join.
  *
  * Confidence and lift are single IEEE double divisions over exact int64
  * counts (`supp_ab/supp_a`, `supp_ab·N/(supp_a·supp_b)`), so any engine
  * replays them bit-for-bit — no decimal division scale rules involved.
  */
object AssocRules {

  /** Frequent item pairs with support, confidence (a→b) and lift.
    *
    * @param tx           transaction rows (one row per basket-item incidence;
    *                     duplicates collapse)
    * @param basketCol      basket key column name
    * @param itemCol        item column name
    * @param minItemSupport absolute minimum basket count for an item to
    *                       enter the pair stage (the Apriori prune knob —
    *                       at 100 TB this is what keeps the catalog tail
    *                       out of the self-join)
    * @param minPairSupport absolute minimum basket count for an emitted
    *                       pair (≤ minItemSupport by monotonicity; a
    *                       separate knob because pair supports sit orders
    *                       of magnitude below item supports on a wide
    *                       catalog)
    * @param maxPerBasket   deterministic per-basket item cap (smallest ids)
    */
  def frequentPairs(tx: DataFrame, basketCol: String, itemCol: String,
      minItemSupport: Long, minPairSupport: Long,
      maxPerBasket: Int): DataFrame = {
    // NOTE (r14): persisting this deduped basket table (it feeds three
    // consumers) was A/B'd and REGRESSED the gate 2.9→4.1 s — the cache
    // materialization costs more than the re-run dedups at this shape;
    // the three consumers' exchanges already overlap under AQE.
    val baskets = tx.select(F.col(basketCol).as("basket"),
      F.col(itemCol).as("item")).distinct()
    val nBaskets = baskets.agg(
      F.count_distinct(F.col("basket")).as("n_baskets"))

    val support = baskets.groupBy("item")
      .agg(F.count(F.lit(1)).as("supp"))
    val frequent = support.filter(F.col("supp") >= minItemSupport)

    // Apriori prune + deterministic cap. The frequent-item table is small
    // by construction (heavy hitters of the catalog) — broadcast it.
    val w = Window.partitionBy("basket").orderBy("item")
    val pruned = baskets
      .join(F.broadcast(frequent), Seq("item"))
      .withColumn("rn", F.row_number().over(w))
      .filter(F.col("rn") <= maxPerBasket)
      .select("basket", "item", "supp")

    val pairs = pruned.as("a").join(pruned.as("b"),
        F.col("a.basket") === F.col("b.basket") &&
          F.col("a.item") < F.col("b.item"))
      .groupBy(F.col("a.item").as("item_a"), F.col("b.item").as("item_b"),
        F.col("a.supp").as("supp_a"), F.col("b.supp").as("supp_b"))
      .agg(F.count(F.lit(1)).as("supp_ab"))
      .filter(F.col("supp_ab") >= minPairSupport)

    pairs.crossJoin(F.broadcast(nBaskets))
      .select(F.col("item_a"), F.col("item_b"),
        F.col("supp_a"), F.col("supp_b"), F.col("supp_ab"),
        (F.col("supp_ab").cast("double") / F.col("supp_a").cast("double"))
          .as("confidence"),
        ((F.col("supp_ab") * F.col("n_baskets")).cast("double") /
          (F.col("supp_a") * F.col("supp_b")).cast("double")).as("lift"))
  }
}
