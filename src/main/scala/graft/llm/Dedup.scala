package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** Large-scale document deduplication operators (BASELINE north star —
  * beyond the reference surface, designed for 100 TB).
  *
  * All operators are pure DataFrame compositions: shingling/minhashing runs
  * inside whole-stage codegen via higher-order array functions (no UDFs, no
  * explode for signature computation), candidate generation is a hash-
  * partitioned groupBy on band signatures (NOT an O(n²) self-join), and only
  * verified candidate PAIRS are materialized. At 1000 executors the only
  * shuffles are the band groupBy and the pair verification join, both keyed
  * on high-cardinality hashes — no skew hot-spots, no driver collect.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per identical value of `textCol`.
    * Single map-side-combinable groupBy on a 128-bit content hash —
    * at 100 TB this is the cheapest possible exact dedup (hash, not raw
    * text, is the shuffle key). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Word-level w-shingles as a distinct array column. The split is
    * LET-BOUND (TextAnalysis.bindOnce): a plain Column reference inside the
    * transform lambda would re-tokenize the document per shingle position
    * (quadratic per doc); the bound array is tokenized once and sliced. */
  def wordShingles(textCol: Column, w: Int): Column =
    TextAnalysis.bindOnce(split(trim(textCol), "\\s+")) { words =>
      val n = size(words)
      when(n >= w,
        array_distinct(transform(sequence(lit(0), n - lit(w)),
          i => concat_ws(" ", slice(words, i + 1, lit(w))))))
        .otherwise(array(concat_ws(" ", words)))
    }

  /** Distinct character n-grams of a string column. */
  def charNgrams(t: Column, n: Int): Column =
    when(length(t) >= n,
      array_distinct(transform(sequence(lit(1), length(t) - lit(n - 1)),
        i => t.substr(i, lit(n)))))
      .otherwise(array(t))

  /** MinHash signature: k minimums of per-seed xxhash64 over the shingle
    * array. Computed entirely with higher-order functions — one pass over
    * the shingles per row, zero shuffles. */
  def minhashSignature(shingles: Column, k: Int): Column =
    array((0 until k).map(j =>
      array_min(transform(shingles, s => xxhash64(s, lit(j))))): _*)

  /** LSH banding: split a k-signature into b bands of r rows, hash each band.
    * Output: array of b band-hash structs (band index + hash). */
  def bands(signature: Column, b: Int, r: Int): Column =
    array((0 until b).map(i =>
      struct(lit(i).as("band"),
        xxhash64(slice(signature, i * r + 1, r).cast(ArrayType(StringType))
          .cast(StringType)).as("bh"))): _*)

  /** Bucket membership capped BEFORE aggregation: a row_number window over
    * the bucket key keeps only the `maxBucket` smallest rows by `orderCol`,
    * so the collect_list buffer is provably bounded even for a degenerate
    * bucket holding the whole corpus (every doc sharing one band hash). The
    * previous slice-after-collect_list shape produced identical RESULTS but
    * materialized the uncapped bucket in one aggregation buffer first — the
    * memory blow-up that matters at 100 TB. The window's sort is external
    * (spillable) and the following groupBy reuses the window's hash
    * partitioning, so the cap costs a sort, not a second shuffle.
    * Output: one row per bucket with `m` = the sorted capped member list
    * (sort_array of the N smallest-by-orderCol rows ≡ the old
    * slice(sort_array(...), 1, N) because orderCol leads the struct and is
    * unique), buckets of size 1 dropped. */
  private def cappedBuckets(df: DataFrame, bucketKeys: Seq[String],
      rec: Column, orderCol: String, maxBucket: Int): DataFrame = {
    val w = Window.partitionBy(bucketKeys.map(col): _*).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxBucket)
      .groupBy(bucketKeys.map(col): _*)
      .agg(sort_array(collect_list(rec)).as("m"))
      .filter(size(col("m")) > 1)
  }

  /** Exact Jaccard between two array columns. The intersection size is
    * let-bound (TextAnalysis.bindOnce) so the O(|a|+|b|) array_intersect
    * runs once per row — referencing it via a plain Column in both the
    * union term and the ratio would re-evaluate it three times. */
  def jaccard(a: Column, b: Column): Column =
    TextAnalysis.bindOnce(size(array_intersect(a, b)).cast(DoubleType)) {
      inter =>
        val union = (size(a) + size(b)).cast(DoubleType) - inter
        when(union === 0d, lit(1d)).otherwise(inter / union)
    }

  /** MinHash + LSH near-duplicate pairs.
    *
    * shingle-explode → k per-seed hashes → map-side-combined MIN aggregation
    * (the signature) → b band hashes → groupBy(band, bandHash) buckets →
    * intra-bucket pairs (id1 < id2) → exact-Jaccard verification ≥ threshold.
    *
    * Scale shape: the signature is ONE shuffle keyed by doc id with partial
    * min-aggregation (so the shuffle carries k longs per doc, not the
    * shingles); buckets carry only ids; the shingle sets are joined back just
    * for the verified candidate pairs. `maxBucket` caps pathological buckets
    * (boilerplate-heavy corpora) so a hot band hash can never go quadratic —
    * the skew guard that matters at 100 TB.
    *
    * Returns (id1, id2, jaccard) with id1 < id2, deduplicated across bands.
    */
  /** Shingle rows (id, s): the let-bound HOF shingler + a narrow explode —
    * tokenizes once per doc and adds ZERO shuffles. */
  private def shingleRows(df: DataFrame, idCol: String, textCol: String,
      shingleWidth: Int): DataFrame =
    df.select(col(idCol).as("id"),
      explode(wordShingles(col(textCol), shingleWidth)).as("s"))

  /** Banded MinHash table (band, bh, id): hash each shingle ONCE, derive
    * the k per-seed values as affine permutations h_j = base·A_j + B_j over
    * the wrapping 2^64 ring (odd A_j ⇒ bijective) — k multiply-adds per
    * row, not k string hashes — then ONE doc-id shuffle with map-side-
    * combined mins, then b band hashes per doc. */
  private def bandTable(shingles: DataFrame, k: Int, b: Int): DataFrame = {
    require(k % b == 0, s"k=$k must be divisible by b=$b")
    val r = k / b
    def permute(base: Column, j: Int): Column =
      base * lit(2L * j * 0x9E3779B97F4A7C15L + 1L) +
        lit(j * 0xC2B2AE3D27D4EB4FL)
    val hashed = shingles.select(col("id"), xxhash64(col("s")).as("hb"))
    val sig = hashed
      .groupBy("id")
      .agg(min(permute(col("hb"), 0)).as("h0"),
        (1 until k).map(j => min(permute(col("hb"), j)).as(s"h$j")): _*)
    sig.select(col("id"), array((0 until b).map(i =>
      struct(lit(i).as("band"),
        xxhash64((i * r until (i + 1) * r).map(j => col(s"h$j")): _*)
          .as("bh"))): _*).as("bnd"))
      .select(col("id"), explode(col("bnd")).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bh").as("bh"), col("id"))
  }

  /** Resolve a cap parameter: explicit values pass through; the
    * [[ScaleConfig.Auto]] default measures the bucketed frame's OWN
    * histogram (one count aggregation) and derives the largest cap
    * whose candidate cost fits the default pair budget. The frame is
    * localCheckpoint'd in the auto path — the histogram materializes
    * it anyway, and the pair stage then reuses it instead of
    * recomputing the banding. */
  private def resolveCap(bucketed: DataFrame, keys: Seq[String],
      cap: Int): (DataFrame, Int) =
    if (cap != ScaleConfig.Auto) (bucketed, cap)
    else {
      val mat = bucketed.localCheckpoint()
      (mat, ScaleConfig.deriveCap(mat, keys))
    }

  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      shingleWidth: Int = 3, k: Int = 32, b: Int = 8,
      threshold: Double = 0.8,
      maxBucket: Int = ScaleConfig.Auto): DataFrame = {
    val shingles = shingleRows(df, idCol, textCol, shingleWidth)
    val (banded, cap) = resolveCap(bandTable(shingles, k, b),
      Seq("band", "bh"), maxBucket)
    // intra-bucket pair generation via bounded sorted id list (skew-guarded
    // BEFORE the aggregation buffer fills — see cappedBuckets)
    val pairs = cappedBuckets(banded, Seq("band", "bh"), col("id"), "id",
        cap)
      .select(explode(expr(
        """flatten(transform(m, (x, i) ->
          |  transform(slice(m, i + 2, size(m)), y ->
          |    struct(x as id1, y as id2))))""".stripMargin)).as("p"))
      .select(col("p.id1"), col("p.id2"))
      .dropDuplicates("id1", "id2")
    // verify only the candidates: join the shingle SETS back by id (built
    // from the same shingle rows — collect_set dedups, jaccard is
    // order-independent)
    val shingleSets = shingles.groupBy("id")
      .agg(collect_set(col("s")).as("sh"))
    pairs
      .join(shingleSets.select(col("id").as("id1"), col("sh").as("sh1")), "id1")
      .join(shingleSets.select(col("id").as("id2"), col("sh").as("sh2")), "id2")
      .withColumn("jaccard", jaccard(col("sh1"), col("sh2")))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** Incremental MinHash+LSH: near-duplicates of a NEW batch against an
    * EXISTING corpus — the production ingest path (dedup arriving documents
    * without re-mining the corpus). Both sides are banded with the same
    * signature constants; candidates come from joining the batch's band
    * table against the corpus's (at scale the corpus band table is
    * PRECOMPUTED and stored bucketed on (band, bh), so each ingest batch
    * joins without reshuffling the corpus). The corpus side of each bucket
    * is capped pre-join by the same row_number guard as the intra-corpus
    * miners. `maxBucket` here deliberately keeps a FIXED default (no
    * [[ScaleConfig.Auto]], unlike the one-shot miners): the incremental
    * contract — batch-vs-stored ≡ from-scratch, and increments splice —
    * only holds when every call caps with the SAME value, which an Auto
    * re-derivation over a grown corpus would silently change. Derive
    * once ([[ScaleConfig.bucketCapFor]]) and thread it through.
    * Returns (batch_id, corpus_id, jaccard). */
  def minhashLshNewVsCorpus(corpus: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, shingleWidth: Int = 3, k: Int = 32,
      b: Int = 8, threshold: Double = 0.8, maxBucket: Int = 256): DataFrame = {
    val corpusShingles = shingleRows(corpus, idCol, textCol, shingleWidth)
    val batchShingles = shingleRows(batch, idCol, textCol, shingleWidth)
    val w = Window.partitionBy("band", "bh").orderBy("id")
    val corpusBands = bandTable(corpusShingles, k, b)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxBucket).drop("__rn")
      .select(col("band"), col("bh"), col("id").as("corpus_id"))
    val batchBands = bandTable(batchShingles, k, b)
      .select(col("band"), col("bh"), col("id").as("batch_id"))
    val pairs = batchBands.join(corpusBands, Seq("band", "bh"))
      .select(col("batch_id"), col("corpus_id"))
      .dropDuplicates("batch_id", "corpus_id")
    // NOTE (r14): semi-join-pruning these set builds to candidate ids
    // (the minhashLshBatchVsStoredBands discipline) was A/B'd here and
    // REGRESSED the gates (+0.5-1.0 s): the prune needs the pair frame
    // materialized (or re-mined per branch), which costs more than the
    // unpruned collect_set at this shape. The production ingest loop
    // (stored bands) already prunes; this from-scratch variant keeps
    // the single-pass shape.
    val corpusSets = corpusShingles.groupBy("id")
      .agg(collect_set(col("s")).as("sh_c"))
      .withColumnRenamed("id", "corpus_id")
    val batchSets = batchShingles.groupBy("id")
      .agg(collect_set(col("s")).as("sh_b"))
      .withColumnRenamed("id", "batch_id")
    pairs.join(batchSets, "batch_id").join(corpusSets, "corpus_id")
      .withColumn("jaccard", jaccard(col("sh_b"), col("sh_c")))
      .filter(col("jaccard") >= threshold)
      .select(col("batch_id"), col("corpus_id"), col("jaccard"))
  }

  /** Public band-table builder for PERSISTED corpus LSH state: (band, bh,
    * id) rows ready to write bucketed on (band, bh). Ingest maintenance is
    * then an APPEND of each accepted batch's bands — the corpus is never
    * re-mined (the materialized twin of [[minhashLshNewVsCorpus]]'s
    * inline corpus banding). */
  def bandTableFor(df: DataFrame, idCol: String, textCol: String,
      shingleWidth: Int = 3, k: Int = 32, b: Int = 8): DataFrame =
    bandTable(shingleRows(df, idCol, textCol, shingleWidth), k, b)

  /** Incremental MinHash+LSH against a STORED band table (the production
    * ingest loop: read the persisted bands, join the batch's bands, verify
    * candidates). Verification recomputes shingles ONLY for corpus docs
    * that appear in a candidate pair — a semi-join-pruned point lookup
    * into the corpus text table, never a corpus re-mine. Must produce
    * EXACTLY what [[minhashLshNewVsCorpus]] computes from scratch (the
    * dd_incremental_update gate pins that equivalence through a
    * write → append → read round-trip). */
  def minhashLshBatchVsStoredBands(corpusText: DataFrame,
      corpusBands: DataFrame, batch: DataFrame, idCol: String,
      textCol: String, shingleWidth: Int = 3, k: Int = 32, b: Int = 8,
      threshold: Double = 0.8, maxBucket: Int = 256): DataFrame = {
    val w = Window.partitionBy("band", "bh").orderBy("id")
    val cb = corpusBands
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxBucket).drop("__rn")
      .select(col("band"), col("bh"), col("id").as("corpus_id"))
    val batchShingles = shingleRows(batch, idCol, textCol, shingleWidth)
    val batchBands = bandTable(batchShingles, k, b)
      .select(col("band"), col("bh"), col("id").as("batch_id"))
    val pairs = batchBands.join(cb, Seq("band", "bh"))
      .select(col("batch_id"), col("corpus_id"))
      .dropDuplicates("batch_id", "corpus_id")
    val candCorpus = corpusText.join(
      pairs.select(col("corpus_id").as(idCol)).distinct(),
      Seq(idCol), "left_semi")
    val corpusSets = shingleRows(candCorpus, idCol, textCol, shingleWidth)
      .groupBy("id").agg(collect_set(col("s")).as("sh_c"))
      .withColumnRenamed("id", "corpus_id")
    val batchSets = batchShingles.groupBy("id")
      .agg(collect_set(col("s")).as("sh_b"))
      .withColumnRenamed("id", "batch_id")
    pairs.join(batchSets, "batch_id").join(corpusSets, "corpus_id")
      .withColumn("jaccard", jaccard(col("sh_b"), col("sh_c")))
      .filter(col("jaccard") >= threshold)
      .select(col("batch_id"), col("corpus_id"), col("jaccard"))
  }

  /** Connected components over a near-duplicate pair graph — the step that
    * turns PAIRS into duplicate CLUSTERS so one canonical doc per cluster
    * survives (pairwise keep-the-smaller is wrong for chains A~B~C).
    *
    * Alternating large-star / small-star rounds (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14): each round
    * rewires every node toward its neighborhood minimum —
    *
    *  - LARGE-STAR (centered at every node u over BOTH edge orientations):
    *    attach each neighbor bigger than u to m = min(Γ(u) ∪ u);
    *  - SMALL-STAR (edges oriented big→small, centered at the big end):
    *    attach u and all its smaller neighbors to m = min(Γ(u)).
    *
    * The edge set contracts toward stars rooted at each component minimum
    * in O(log n) rounds — vs O(diameter) for min-label propagation, the
    * difference between 4 and 1000 rounds on a 1000-link near-dup chain.
    * The driver loop stays CONTROL only (one fixpoint count per round);
    * each star step is ONE window aggregation over a node-keyed exchange
    * (no join-backs), and `localCheckpoint` truncates lineage per round.
    * maxIter (default 20 ⇒ components up to ~2^20 nodes) bounds runaway
    * graphs.
    *
    * Returns (id, cluster) for every node that appears in `pairs`, where
    * cluster = the smallest id in the component. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame =
    ccWithRounds(pairs, maxIter)._1

  /** Incremental connected-components maintenance (SURVEY §2D, D119):
    * fold NEW near-dup pairs into an EXISTING (id, cluster) labeling
    * without re-running CC over the historical pair graph. Each old
    * component contracts to its label star (id → cluster edges —
    * connectivity-preserving and rooted at the component minimum), so the
    * star rounds run on |V_old| + |new pairs| edges instead of every pair
    * ever mined — the labeling IS the compressed graph. Labels are
    * component minima on both paths, so incremental ≡ from-scratch
    * exactly (dd_cluster_incr pins it against the full-graph oracle). */
  def ccIncremental(labels: DataFrame, newPairs: DataFrame,
      maxIter: Int = 20): DataFrame = {
    val labelEdges = labels.filter(col("id") =!= col("cluster"))
      .select(col("id").as("id1"), col("cluster").as("id2"))
    val recomputed = connectedComponents(
      labelEdges.unionByName(newPairs.select(col("id1"), col("id2"))),
      maxIter)
    // A stored labeling may carry SINGLETON components (id == cluster with
    // no other member — e.g. identity rows persisted for never-paired
    // docs). Those nodes reach the star rounds through no edge, so the
    // recomputed labeling omits them; re-attach every labeled node the new
    // pairs didn't pull into a component. Pair-graph labelings have no
    // singletons and the anti-join is empty — zero behavior change there.
    recomputed.unionByName(
      labels.select(col("id"), col("cluster"))
        .join(recomputed.select(col("id")), Seq("id"), "left_anti"))
  }

  /** `connectedComponents` plus the number of star rounds it took —
    * exposed so the scale smoke can assert O(log n) convergence. */
  private[graft] def ccWithRounds(pairs: DataFrame, maxIter: Int = 20)
      : (DataFrame, Int) = {
    val wU = Window.partitionBy("u")
    // materialize the INPUT pair frame once: `nodes` and `edges` below
    // are two separate actions over `pairs`, so an expensive upstream
    // miner (minhash band + jaccard verification) would be evaluated
    // twice — measured as two full pipeline re-runs under dd_cluster.
    // The pair frame is the SMALL end of the funnel (ids + score, post-
    // banding/cap), so materializing it is cheap at any scale (opt
    // guide §5: cache only reused-and-expensive intermediates).
    val p = pairs.select(col("id1"), col("id2")).localCheckpoint()
    // no checkpoint: `nodes` is consumed exactly once (the final label
    // join) and reads from p's checkpoint — materializing it was a whole
    // extra job per CC invocation for nothing (r15, guide §5)
    val nodes = p.select(col("id1").as("id"))
      .unionByName(p.select(col("id2").as("id")))
      .distinct()
    // fixpoint detection by (count, hash-sum) fingerprint of the edge SET,
    // collected by observe() DURING the per-round checkpoint
    // materialization — zero extra jobs, vs a full-shuffle set-difference
    // per round (a collision would need two different edge sets with equal
    // count AND equal 64-bit hash sum — the same uniform-hash assumption
    // the sketch family already rests on)
    def obsFp(row: Map[String, Any]): (Long, Long) =
      (row("n").asInstanceOf[Long],
        Option(row("h")).fold(0L)(_.asInstanceOf[Long]))
    // canonical big→small orientation; self-loops carry no connectivity.
    // The initial fingerprint rides this checkpoint's materialization
    // (observe), not a separate aggregation job (r15).
    val obs0 = org.apache.spark.sql.Observation("cc_fp_init")
    var edges = p
      .select(greatest(col("id1"), col("id2")).as("u"),
        least(col("id1"), col("id2")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .observe(obs0, count(lit(1)).as("n"),
        sum(xxhash64(col("u"), col("v"))).as("h"))
      .localCheckpoint()
    var fp = obsFp(obs0.get)
    var converged = fp._1 == 0
    var rounds = 0
    while (!converged && rounds < maxIter) {
      // large-star: center at BOTH endpoints (dual orientation), then one
      // unordered window min per center — no aggregate-join-back. Row count
      // is CONSERVED (each undirected edge survives as exactly one of its
      // two orientations), so no dedup is needed before the next window.
      val dual = edges.unionByName(
        edges.select(col("v").as("u"), col("u").as("v")))
      val large = dual
        .withColumn("m", least(min("v").over(wU), col("u")))
        .filter(col("v") > col("u")) // bigger neighbors re-attach to m
        .select(col("v").as("u"), col("m").as("v"))
      // small-star: neighbors are all < u here; u and every non-min
      // neighbor attach to the minimum — orientation stays big→small.
      // Both output rows of a star edge — (u, m) always, (v, m) when
      // v ≠ m — are emitted by ONE explode over the window output: the
      // previous self-UNION shape put two copies of the whole window
      // subtree in the plan, and only the exchange is runtime-reused, so
      // the post-shuffle sort + window exec ran TWICE per round (r15,
      // guide §2.4: share the exchange — and the operator above it).
      // Row multiset is identical to the union (distinct follows).
      val withMin = large.withColumn("m", min("v").over(wU))
      val obs = org.apache.spark.sql.Observation(s"cc_fp_$rounds")
      val small = withMin
        .select(explode(when(col("v") =!= col("m"),
            array(struct(col("u").as("u"), col("m").as("v")),
              struct(col("v").as("u"), col("m").as("v"))))
          .otherwise(array(struct(col("u").as("u"), col("m").as("v")))))
          .as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .distinct()
        .observe(obs, count(lit(1)).as("n"),
          sum(xxhash64(col("u"), col("v"))).as("h"))
        .localCheckpoint() // the action that fills the observation
      val fpNext = obsFp(obs.get)
      converged = fpNext == fp
      edges = small
      fp = fpNext
      rounds += 1
    }
    // fixpoint edges are stars (node → component min). Mid-algorithm a
    // node can legitimately carry edges to TWO different minima, so a
    // maxIter exit would fan the label join out — reduce to one label per
    // node first (min = the best-known component min; a no-op once
    // converged). Roots and isolated nodes label themselves.
    val stars = edges.groupBy("u").agg(min("v").as("v"))
    val labels = nodes
      .join(stars, nodes("id") === stars("u"), "left")
      .select(col("id"), coalesce(col("v"), col("id")).as("cluster"))
    (labels, rounds)
  }

  /** 64-bit SimHash from word hashes: per bit, sign of the sum of ±1
    * contributions. Explode-free single-pass form (64 folds over the word
    * array) — fine for one-off scoring; `simhashTable` below is the
    * aggregation-shaped form used for corpus-scale pair mining. */
  def simhash(textCol: Column): Column = {
    val words = array_distinct(split(trim(lower(textCol)), "\\s+"))
    val hashes = transform(words, w => xxhash64(w))
    val bits = (0 until 64).map { j =>
      val contrib = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L,
          lit(1L)).otherwise(lit(-1L)))
      when(contrib > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Corpus-scale SimHash: explode words → one map-side-combined SUM per bit
    * keyed by doc id (the shuffle carries 64 longs per doc), then assemble
    * the 64-bit hash from the signs. Same result as `simhash`. */
  def simhashTable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = df.select(col(idCol).as("id"),
      explode(array_distinct(split(trim(lower(col(textCol))), "\\s+"))).as("w"))
      .withColumn("h", xxhash64(col("w")))
    // four 16-bit COUNT-ONES lanes per aggregate: 16 packed sums + one
    // count instead of 64 sums — quarter the aggregation state and the
    // shuffle carries 17 longs per doc, not 64. Lane bound: distinct
    // words per doc < 2^15 (the top lane's n·2^48 must stay under 2^63) —
    // far beyond any real document's distinct vocabulary.
    // sign recovery: Σ(±1) > 0  ⇔  2·count_ones > n.
    def lane(j: Int) = shiftright(col("h"), j).bitwiseAND(lit(1L))
    def packedSum(k: Int) = sum(lane(4 * k) +
      shiftleft(lane(4 * k + 1), 16) + shiftleft(lane(4 * k + 2), 32) +
      shiftleft(lane(4 * k + 3), 48)).as(s"p$k")
    val sums = words.groupBy("id").agg(count(lit(1)).as("n"),
      (0 until 16).map(packedSum): _*)
    def ones(j: Int) = shiftright(col(s"p${j / 4}"), 16 * (j % 4))
      .bitwiseAND(lit(0xFFFFL))
    val hash = (0 until 64).map(j =>
      when(ones(j) * 2 > col("n"), shiftleft(lit(1L), j)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    sums.select(col("id"), hash.as("simhash"))
  }

  /** SimHash near-duplicate pairs via pigeonhole banding on 4×16-bit chunks
    * (hamming distance ≤ 3 ⇒ at least one chunk equal). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = ScaleConfig.Auto): DataFrame = {
    // 4 chunks pigeonhole at most 3 differing bits: maxHamming = 4 would
    // need 5 chunks or recall silently drops (1 differing bit per chunk
    // means NO chunk matches and the pair is never a candidate)
    require(maxHamming <= 3,
      s"maxHamming=$maxHamming exceeds the 4-chunk pigeonhole bound (3)")
    val sh = simhashTable(df, idCol, textCol)
    val chunked0 = sh.select(col("id"), col("simhash"),
      explode(array((0 until 4).map(i => struct(lit(i).as("chunk"),
        shiftright(col("simhash"), i * 16).bitwiseAND(lit(0xFFFFL))
          .as("ch"))): _*)).as("c"))
      .select(col("c.chunk").as("chunk"), col("c.ch").as("ch"),
        col("id"), col("simhash"))
    val (chunked, cap) = resolveCap(chunked0, Seq("chunk", "ch"),
      maxBucket)
    val pairs = cappedBuckets(chunked, Seq("chunk", "ch"),
        struct(col("id"), col("simhash")), "id", cap)
      .select(explode(expr(
        """flatten(transform(m, (x, i) ->
          |  transform(slice(m, i + 2, size(m)), y ->
          |    struct(x.id as id1, x.simhash as h1, y.id as id2, y.simhash as h2))))"""
          .stripMargin)).as("p"))
      .select(col("p.id1"), col("p.id2"), col("p.h1"), col("p.h2"))
      .dropDuplicates("id1", "id2")
    pairs
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id1"), col("id2"), col("hamming"))
  }

  // ---- portable (cross-engine verifiable) SimHash variant ----
  //
  // The production path above hashes words with xxhash64, which has no SQL
  // twin. This variant derives the 64 bit contributions from a polynomial-31
  // word hash mod 1e9+7 via 64 affine permutations — every step stays below
  // 2^63 so the EXACT same arithmetic runs in DuckDB SQL as the oracle. The
  // 64-bit simhash is materialized as four 16-bit chunks (the pigeonhole
  // banding unit; also avoids 1<<63 overflow on the SQL side).

  val PortableP = 1000000007L
  def portableA(j: Int): Long = (2654435761L * (j + 1)) % PortableP
  def portableB(j: Int): Long =
    (2246822519L * (j.toLong * j + 1) + 3266489917L * j) % PortableP

  /** THE portable 60-bit hash core — first 15 hex chars of md5 as a
    * positive long. md5 digests are byte-identical across engines (UTF-8
    * input, lowercase hex); DuckDB twin:
    * `CAST('0x' || substring(md5(CAST(x AS VARCHAR)), 1, 15) AS BIGINT)`.
    * Every portable-hash recipe in the engine derives from THIS ONE
    * definition (word hashes here, row-sampling hashes in queries.Q) so a
    * change lands everywhere at once. */
  def portableHash60(c: Column): Column =
    // native single-step twin of
    // conv(substring(md5(c), 1, 15), 16, 10).cast(long) — bit-identical
    // (Md5Prefix60Spec pins it against this exact legacy chain), one
    // digest instead of hex-encode + substring + radix parse per row
    // (r14 same-subset A/B: 20.5 → 19.0 s over 17 hash-heavy gates)
    org.apache.spark.sql.graftx.Bridge.column(
      graft.functions.Md5Prefix60(
        org.apache.spark.sql.graftx.Bridge.expression(
          c.cast(StringType))))

  /** Portable word hash: the 60-bit core mod 1e9+7 (keeps every later
    * affine-permutation step below 2^63 for the SQL twin). */
  def portableWordHash(w: Column): Column = portableHash60(w) % PortableP

  /** ±1 contribution of word-hash `h` to simhash bit `j`. */
  private def portableSign(h: Column, j: Int): Column =
    when(((h * portableA(j) + portableB(j)) % PortableP) * 2 < PortableP,
      lit(1)).otherwise(lit(-1))

  /** Per-doc portable simhash as four 16-bit chunks (c0..c3): explode
    * distinct words → one map-side-combined SUM per bit keyed by doc id →
    * chunk assembly from the signs. Same aggregation shape (and scale
    * behavior) as simhashTable. */
  def simhashChunksPortable(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val words = df.select(col(idCol).as("id"),
      explode(array_distinct(split(trim(lower(col(textCol))), "\\s+"))).as("w"))
      .withColumn("h", portableWordHash(col("w")))
    // same 4-lane packing as simhashTable: 16 packed count-ones sums + a
    // count replace 64 ±1 sums (Σ(±1) > 0 ⇔ 2·ones > n — chunk values
    // are bit-identical, so the SQL oracle, which recomputes its own
    // sums, is untouched). Lane bound: < 2^15 distinct words per doc.
    def bit(j: Int) = when(
      ((col("h") * portableA(j) + portableB(j)) % PortableP) * 2 < PortableP,
      lit(1L)).otherwise(lit(0L))
    def packedSum(k: Int) = sum(bit(4 * k) +
      shiftleft(bit(4 * k + 1), 16) + shiftleft(bit(4 * k + 2), 32) +
      shiftleft(bit(4 * k + 3), 48)).as(s"p$k")
    val sums = words.groupBy("id").agg(count(lit(1)).as("n"),
      (0 until 16).map(packedSum): _*)
    def ones(j: Int) = shiftright(col(s"p${j / 4}"), 16 * (j % 4))
      .bitwiseAND(lit(0xFFFFL))
    val chunks = (0 until 4).map { i =>
      (0 until 16).map(t =>
        when(ones(16 * i + t) * 2 > col("n"), lit(1 << t)).otherwise(lit(0)))
        .reduce(_ + _).as(s"c$i")
    }
    sums.select(col("id") +: chunks: _*)
  }

  /** Portable-simhash near-duplicate pairs (pigeonhole banding on the four
    * 16-bit chunks; hamming ≤ maxHamming ⇒ at least one chunk equal). */
  def simhashPairsPortable(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = ScaleConfig.Auto): DataFrame = {
    require(maxHamming <= 3,
      s"maxHamming=$maxHamming exceeds the 4-chunk pigeonhole bound (3)")
    val sh = simhashChunksPortable(df, idCol, textCol)
    val chunked0 = sh.select(col("id"), col("c0"), col("c1"), col("c2"),
      col("c3"),
      explode(array((0 until 4).map(i => struct(lit(i).as("chunk"),
        col(s"c$i").as("ch"))): _*)).as("cc"))
      .select(col("cc.chunk").as("chunk"), col("cc.ch").as("ch"),
        col("id"), col("c0"), col("c1"), col("c2"), col("c3"))
    val (chunked, cap) = resolveCap(chunked0, Seq("chunk", "ch"),
      maxBucket)
    val rec = struct(col("id"), col("c0"), col("c1"), col("c2"), col("c3"))
    val pairs = cappedBuckets(chunked, Seq("chunk", "ch"), rec, "id",
        cap)
      .select(explode(expr(
        """flatten(transform(m, (x, i) ->
          |  transform(slice(m, i + 2, size(m)), y ->
          |    struct(x as a, y as b))))""".stripMargin)).as("p"))
      .select(Seq(col("p.a.id").as("id1"), col("p.b.id").as("id2")) ++
        (0 until 4).map(i => bit_count(col(s"p.a.c$i")
          .bitwiseXOR(col(s"p.b.c$i"))).as(s"x$i")): _*)
      .dropDuplicates("id1", "id2")
    pairs
      .withColumn("hamming",
        (0 until 4).map(i => col(s"x$i")).reduce(_ + _))
      .filter(col("hamming") <= maxHamming)
      .select(col("id1"), col("id2"), col("hamming"))
  }

  /** Character-n-gram Jaccard similarity for explicit candidate pairs
    * (id1, id2). Joins the corpus twice on its id; BOTH join branches keep
    * the gram frame as the identical un-renamed subtree (renames applied
    * after each join), so Spark's exchange reuse materializes the gram
    * arrays and their shuffle ONCE instead of per branch. */
  def ngramJaccardPairs(docs: DataFrame, pairs: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    val grams = docs.select(col(idCol).as("_id"),
      ngramArray(col(textCol), n).as("_g"))
    val j1 = pairs.join(grams, pairs("id1") === grams("_id"))
      .select(pairs("id1"), pairs("id2"), col("_g").as("g1"))
    val j2 = j1.join(grams, j1("id2") === grams("_id"))
      .select(j1("id1"), j1("id2"), col("g1"), col("_g").as("g2"))
    j2.withColumn("jaccard", jaccard(col("g1"), col("g2")))
      .drop("g1", "g2")
  }

  /** Alias kept for call-site readability in pair verification. */
  def ngramArray(t: Column, n: Int): Column = charNgrams(t, n)

  /** Deterministic ±1 hyperplane coefficients from a fixed LCG — plain
    * CONSTANTS, so the identical plane matrix can be inlined into oracle
    * SQL (the portable twin of Similarity.signBucket's xxhash stream). */
  def portablePlanes(planes: Int, dim: Int): Seq[Seq[Double]] = {
    var state = 42L
    def next(): Long = {
      state = state * 6364136223846793005L + 1442695040888963407L; state
    }
    Seq.fill(planes)(Seq.fill(dim)(
      if (((next() >>> 32) & 1L) == 1L) 1.0 else -1.0))
  }

  /** Embedding near-dup with an explicit plane matrix and ROUNDED-cosine
    * threshold — same bucket/pair machinery as embeddingNearDup, but every
    * arithmetic step (sign projections, cosine formula, round-4 threshold)
    * has an exact DuckDB twin, so the full pipeline is oracle-verifiable.
    * Returns (id1, id2, c4). */
  def embeddingNearDupPortable(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Seq[Seq[Double]],
      maxBucket: Int = 256): DataFrame = {
    def dot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) =>
        x.cast(DoubleType) * y.cast(DoubleType)), lit(0.0), (acc, v) => acc + v)
    val v = col("v")
    val bucket = planes.zipWithIndex.map { case (cs, p) =>
      when(dot(v, typedLit(cs)) > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)
    val withBucket = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", bucket)
    val pairs = cappedBuckets(withBucket, Seq("bucket"),
        struct(col("id"), col("v")), "id", maxBucket)
      .select(explode(expr(
        """flatten(transform(m, (x, i) ->
          |  transform(slice(m, i + 2, size(m)), y ->
          |    struct(x.id as id1, x.v as v1, y.id as id2, y.v as v2))))"""
          .stripMargin)).as("p"))
      // score BEFORE the cross-bucket dedup so the dedup exchange
      // carries (id1, id2, c4) — three scalars — instead of both
      // vectors (the knn pairsFrom discipline); duplicate occurrences
      // produce identical rows since c4 is a pure function of the pair
      .select(col("p.id1"), col("p.id2"),
        round(dot(col("p.v1"), col("p.v2")) /
          (sqrt(dot(col("p.v1"), col("p.v1"))) *
            sqrt(dot(col("p.v2"), col("p.v2")))), 4).as("c4"))
      .dropDuplicates("id1", "id2")
    pairs
      .filter(col("c4") >= threshold)
      .select(col("id1"), col("id2"), col("c4"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, LSH-bucketed by
    * random-hyperplane signs so candidate generation is a groupBy, not a
    * cross join (Similarity.signBuckets). */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, planes: Int = 8,
      maxBucket: Int = 256): DataFrame = {
    val withBucket = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", Similarity.signBucket(col("v"), planes))
    val pairs = cappedBuckets(withBucket, Seq("bucket"),
        struct(col("id"), col("v")), "id", maxBucket)
      .select(explode(expr(
        """flatten(transform(m, (x, i) ->
          |  transform(slice(m, i + 2, size(m)), y ->
          |    struct(x.id as id1, x.v as v1, y.id as id2, y.v as v2))))"""
          .stripMargin)).as("p"))
      // score before the dedup exchange (knn pairsFrom discipline):
      // shuffle three scalars, not two vectors; duplicates identical
      .select(col("p.id1"), col("p.id2"),
        Similarity.cosine(col("p.v1"), col("p.v2")).as("cosine"))
      .dropDuplicates("id1", "id2")
    pairs
      .filter(col("cosine") >= threshold)
      .select(col("id1"), col("id2"), col("cosine"))
  }

  /** EXACT set-similarity self-join via prefix filtering (Chaudhuri et al.
    * SSJoin / Bayardo et al. "Scaling Up All Pairs" / PPJoin family) — the
    * exact complement to the probabilistic LSH miners: returns EVERY pair
    * with token-set Jaccard ≥ threshold, no false negatives.
    *
    * Theorem: order every set by one GLOBAL total order (here ascending
    * token frequency, rarest first, ties by token) — if J(x,y) ≥ t then
    * |x∩y| ≥ ⌈t·|x|⌉, so the first |x| − ⌈t·|x|⌉ + 1 tokens of x (its
    * PREFIX) must intersect y's prefix. Candidate generation is therefore
    * an equi-join on prefix tokens only — and because the global order
    * puts the RAREST tokens in prefixes, candidate lists are naturally
    * short (the frequency skew works FOR us, unlike a join on raw tokens).
    *
    * Scale shape: token-frequency join keyed by token; per-doc ordering is
    * one collect_list bounded by document length; candidates carry only
    * (id1, id2); the token arrays are joined back ONLY for verified
    * candidates (the minhashLshPairs discipline). */
  def prefixJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"bad threshold $threshold")
    val toks = df.select(col(idCol).as("id"),
      array_distinct(split(trim(lower(col(textCol))), "\\s+")).as("ts"))
    val tokenRows = toks.select(col("id"), explode(col("ts")).as("tok"))
    val freq = tokenRows.groupBy("tok").agg(count(lit(1)).as("f"))
    val ordered = tokenRows.join(freq, "tok")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("f"), col("tok")))).as("st"))
      .select(col("id"),
        transform(col("st"), _.getField("tok")).as("ots"))
      .withColumn("plen",
        size(col("ots")) - ceil(size(col("ots")) * threshold).cast("int")
          + 1)
    val prefixRows = ordered.select(col("id"),
      explode(slice(col("ots"), lit(1), col("plen"))).as("ptok"))
    val cands = prefixRows.select(col("id").as("id1"), col("ptok"))
      .join(prefixRows.select(col("id").as("id2"), col("ptok")), "ptok")
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
    val sets = ordered.select(col("id"), col("ots"))
    cands
      .join(sets.select(col("id").as("id1"), col("ots").as("ts1")), "id1")
      .join(sets.select(col("id").as("id2"), col("ots").as("ts2")), "id2")
      .withColumn("jaccard", jaccard(col("ts1"), col("ts2")))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** Cross-document duplicated-span rate (the exact-substring duplication
    * metric of Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better" — public paper): per document, the fraction
    * of its word-`width`-gram positions whose gram also occurs in at
    * least one OTHER document.
    *
    * Scale shape: grams are hashed to 60-bit longs immediately after the
    * per-row transform, so every shuffle (per-hash distinct-doc count, the
    * hash join back, the per-doc rollup) carries longs and ids, never
    * text. Documents shorter than `width` words contribute no grams and
    * report a 0.0 rate. Returns (id, n_grams, n_dup, dup_frac). */
  def dupSpanStats(df: DataFrame, idCol: String, textCol: String,
      width: Int = 8): DataFrame = {
    // positional grams (NOT distinct — the metric counts positions, so a
    // doc repeating its own duplicated span counts each occurrence)
    val grams = TextAnalysis.bindOnce(
      split(lower(trim(col(textCol))), "\\s+")) { ws =>
      when(size(ws) >= width,
        transform(sequence(lit(1), size(ws) - lit(width - 1)),
          i => concat_ws(" ", slice(ws, i, lit(width)))))
        .otherwise(array().cast("array<string>"))
    }
    val g = df.select(col(idCol).as("id"), explode(grams).as("gram"))
      .select(col("id"), portableHash60(col("gram")).as("h"))
    // distinct-doc count per hash over PRE-REDUCED (h, id) rows — one
    // evaluation of `g` (the md5 gram scan; the old groupBy + join-back
    // evaluated it twice) AND map-side reduction of occurrence
    // multiplicity (r15 de-skew): the r14 single-window shape routed
    // EVERY occurrence row of a hot gram hash to one task — gram
    // frequencies are Zipfian, so at corpus scale a stop-word shingle's
    // hash was a straggler partition. groupBy(h, id) partial-aggregates
    // the positions map-side (guide §2.3 "aggregate before you
    // shuffle"), so the h-keyed window that counts distinct docs sees at
    // most one row per (gram, doc) — the same bound the two-phase
    // countDistinct had. count(*) over distinct (h, id) rows ≡
    // countDistinct(id), minus one when a NULL id group is present
    // (countDistinct excludes nulls).
    val wH = Window.partitionBy("h")
    val perDoc = g
      .groupBy("h", "id").agg(count(lit(1)).as("cnt"))
      .withColumn("nd", count(lit(1)).over(wH) -
        max(when(col("id").isNull, 1).otherwise(0)).over(wH))
      .groupBy("id")
      .agg(sum(col("cnt")).as("n_grams"),
        sum(when(col("nd") >= 2, col("cnt")).otherwise(lit(0L)))
          .as("n_dup"))
    df.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        when(coalesce(col("n_grams"), lit(0L)) === 0, lit(0.0))
          .otherwise(round(col("n_dup").cast("double") / col("n_grams"), 4))
          .as("dup_frac"))
  }

  /** Set-containment join (SURVEY §2D, D115) — near-SUPERSET detection:
    * pairs (A, B) where C(A→B) = |grams(A) ∩ grams(B)| / |grams(A)| ≥
    * `threshold`, i.e. A's content is mostly inside B (quotes, excerpts,
    * page-in-page inclusions — the asymmetric relation Jaccard dilutes
    * when |B| ≫ |A|). Set elements are distinct word-`width`-grams.
    *
    * Candidate generation is the asymmetric PREFIX filter (PPJoin family,
    * public literature): each doc's grams sort rarest-first by global
    * frequency; if C(A→B) ≥ t then by pigeonhole at least one of A's
    * first ⌊(1−t)·|A|⌋+1 rarest grams is in B, so candidates =
    * A.prefix ⋈ B.all — LOSSLESS, and the join keys are each doc's
    * globally-rarest grams, so per-key fan-out is small by construction.
    * Only candidate pairs materialize gram arrays for exact verification.
    * Docs with fewer than `width` words have no gram set and are
    * excluded. Returns (id1, id2, containment) with id1 the contained
    * side — asymmetric, both directions reported when both qualify. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      width: Int = 3, threshold: Double = 0.8): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"bad threshold $threshold")
    val grams = TextAnalysis.bindOnce(
      split(trim(lower(col(textCol))), "\\s+")) { ws =>
      when(size(ws) >= width, array_distinct(
        transform(sequence(lit(1), size(ws) - lit(width - 1)),
          i => concat_ws(" ", slice(ws, i, lit(width))))))
        .otherwise(array().cast("array<string>"))
    }
    val toks = df.select(col(idCol).as("id"), grams.as("ts"))
      .filter(size(col("ts")) > 0)
    val tokenRows = toks.select(col("id"), explode(col("ts")).as("tok"))
    val freq = tokenRows.groupBy("tok").agg(count(lit(1)).as("f"))
    val ordered = tokenRows.join(freq, "tok")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("f"), col("tok")))).as("st"))
      .select(col("id"), transform(col("st"), _.getField("tok")).as("ots"))
    val prefixed = ordered.withColumn("plen",
      size(col("ots")) - ceil(size(col("ots")) * threshold).cast("int") + 1)
    val prefixRows = prefixed.select(col("id"),
      explode(slice(col("ots"), lit(1), col("plen"))).as("tok"))
    val cands = prefixRows.select(col("id").as("id1"), col("tok"))
      .join(tokenRows.select(col("id").as("id2"), col("tok")), "tok")
      .filter(col("id1") =!= col("id2"))
      .select("id1", "id2").distinct()
    val sets = ordered.select(col("id"), col("ots"))
    cands
      .join(sets.select(col("id").as("id1"), col("ots").as("ts1")), "id1")
      .join(sets.select(col("id").as("id2"), col("ots").as("ts2")), "id2")
      .withColumn("containment",
        size(array_intersect(col("ts1"), col("ts2"))).cast("double") /
          size(col("ts1")))
      .filter(col("containment") >= threshold)
      .select(col("id1"), col("id2"), col("containment"))
  }

  /** Exact duplicated-span REMOVAL (SURVEY §2D, D111) — the rewrite twin
    * of [[dupSpanStats]], after Lee et al. 2022 ("Deduplicating Training
    * Data Makes Language Models Better", public paper): drop every word
    * position covered by a `width`-gram that occurs in ≥ `minDocs`
    * DISTINCT documents, and rejoin the survivors (single-space
    * normalized) as the cleaned text.
    *
    * A position p is covered iff some duplicated gram STARTS in
    * (p-width, p] — computed with one per-doc window max over the start
    * flags, so no position is ever exploded `width` ways. Scale shape:
    * gram shuffles carry 60-bit hashes and (id, pos) pairs, never text;
    * the one corpus-sized exchange is the final per-doc reassembly (any
    * rewrite pays it), and its state is bounded by the document length.
    * Returns (id, clean_text, n_words, n_removed). */
  def removeDupSpans(df: DataFrame, idCol: String, textCol: String,
      width: Int = 8, minDocs: Int = 2): DataFrame = {
    // words with 1-based positions, ORIGINAL case for reconstruction
    val words = df
      .select(col(idCol).as("id"),
        posexplode(split(trim(col(textCol)), "\\s+")))
      .select(col("id"), (col("pos") + 1).as("p"), col("col").as("w"))
    // positional grams on the lowercased words (same construction as
    // dupSpanStats, start position kept)
    val grams = TextAnalysis.bindOnce(
      split(lower(trim(col(textCol))), "\\s+")) { ws =>
      when(size(ws) >= width,
        transform(sequence(lit(1), size(ws) - lit(width - 1)),
          i => concat_ws(" ", slice(ws, i, lit(width)))))
        .otherwise(array().cast("array<string>"))
    }
    val g = df.select(col(idCol).as("id"), posexplode(grams))
      .select(col("id"), (col("pos") + 1).as("s"),
        portableHash60(col("col")).as("h"))
    // same single-evaluation + pre-reduced shape as [[dupSpanStats]]
    // (r15 de-skew): start positions ride the (h, id) partial aggregate
    // as a collect_set — bounded by the document's gram count — so the
    // h-keyed window sees one row per (gram, doc), never per occurrence.
    // A position has exactly ONE gram (hence one h), so exploding the
    // per-(h, id) position sets yields distinct (id, s) pairs directly —
    // the old .distinct() exchange is structurally redundant now.
    val wH = Window.partitionBy("h")
    val dupStarts = g
      .groupBy("h", "id").agg(collect_set(col("s")).as("ss"))
      .withColumn("__nd", count(lit(1)).over(wH) -
        max(when(col("id").isNull, 1).otherwise(0)).over(wH))
      .filter(col("__nd") >= minDocs)
      .select(col("id"), explode(col("ss")).as("s"))
      .withColumn("flag", lit(1))
    val covW = Window.partitionBy("id").orderBy("p")
      .rowsBetween(-(width - 1), Window.currentRow)
    val covered = words
      .join(dupStarts, words("id") === dupStarts("id") &&
        words("p") === dupStarts("s"), "left")
      .select(words("id"), col("p"), col("w"),
        coalesce(col("flag"), lit(0)).as("flag"))
      .withColumn("c", max(col("flag")).over(covW))
    covered.groupBy("id").agg(
      array_join(transform(
        array_sort(collect_list(when(col("c") === 0,
          struct(col("p"), col("w"))))),
        s => s.getField("w")), " ").as("clean_text"),
      count(lit(1)).as("n_words"),
      sum(col("c")).cast(LongType).as("n_removed"))
  }

  /** Cross-source duplication matrix (SURVEY §2D, D219) — the source-
    * overlap analysis a mixture designer runs BEFORE setting mixing
    * weights (D32/D48): which sources duplicate INTO which? Takes a
    * mined near-dup pair frame (id1, id2 — [[minhashLshPairs]] or any
    * exact miner) and the corpus's (id, source) projection; each pair
    * contributes one count to its UNORDERED source pair (source_a ≤
    * source_b, so web~books and books~web land in one cell; the
    * diagonal is within-source duplication). Scale shape: two id-keyed
    * joins against a two-column projection + one map-side-combinable
    * count — the pair frame is already bounded by the miner's banding/
    * caps, and text never moves. */
  def sourceDupMatrix(pairs: DataFrame, docs: DataFrame, idCol: String,
      srcCol: String): DataFrame = {
    val s = docs.select(col(idCol).as("__id"), col(srcCol).as("__src"))
    pairs
      .join(s.select(col("__id").as("id1"), col("__src").as("s1")),
        "id1")
      .join(s.select(col("__id").as("id2"), col("__src").as("s2")),
        "id2")
      .select(least(col("s1"), col("s2")).as("source_a"),
        greatest(col("s1"), col("s2")).as("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_dup_pairs"))
  }

  /** Eval-overlap contamination REPORT (SURVEY §2D, D220) — D19's
    * binary decontamination upgraded to the overlap FRACTION the
    * contamination literature actually reports (what share of the eval
    * item's n-grams appear in the training doc): for every (corpus doc,
    * eval doc) pair, `n_shared` distinct word-`width`-gram hashes and
    * `frac4 = n_shared / |eval grams|` rounded to 4, emitted when the
    * rounded fraction clears `minFrac`. Scale shape: grams hash to the
    * portable space BEFORE any exchange (shuffles carry longs + ids,
    * never text), the EVAL side — small by nature — broadcasts twice
    * (gram memberships and per-item totals), so the corpus scan joins
    * without shuffling itself. The hash space is the same
    * oracle-replayable [[portableWordHash]] contract the dedup plane
    * uses throughout. */
  def overlapFractions(corpus: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, width: Int, minFrac: Double): DataFrame = {
    def grams(df: DataFrame, as: String) =
      df.select(col(idCol).as(as),
          explode(wordShingles(col(textCol), width)).as("__g"))
        .select(col(as), portableWordHash(col("__g")).as("gh"))
        .distinct()
    val eg = grams(eval, "eval_id")
    val en = eg.groupBy("eval_id").agg(count(lit(1)).as("__en"))
    grams(corpus, "doc_id")
      .join(broadcast(eg), "gh")
      .groupBy("doc_id", "eval_id")
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(en), "eval_id")
      .withColumn("frac4",
        round(col("n_shared").cast("double") / col("__en"), 4))
      .filter(col("frac4") >= minFrac)
      .select(col("doc_id"), col("eval_id"), col("n_shared"),
        col("frac4"))
  }
}
