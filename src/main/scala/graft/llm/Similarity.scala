package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`) — BASELINE north star.
  *
  * Two paths:
  *  - brute-force cosine top-k: the CORRECTNESS baseline. Query set is
  *    broadcast (it is small by construction); the corpus is scanned once;
  *    dot products run inside codegen via zip_with/aggregate; top-k is a
  *    per-query window. At 100 TB corpus this is one full scan per batch of
  *    queries — the right plan when recall must be 1.0.
  *  - IVF (inverted-file) top-k: the SCALE path. Corpus is bucketed once by
  *    nearest coarse centroid (computed deterministically from a sample);
  *    queries probe only the `nprobe` nearest buckets, cutting the scan by
  *    ~nlist/nprobe. Recall < 1.0, tunable.
  */
object Similarity {

  /** Strict left-fold dot product of two float-array columns in double
    * precision — the summation order every oracle replicates.
    *
    * Dispatches to the native codegen'd expression
    * [[graft.functions.DotProductFloat]] (a tight `acc += x[i]*y[i]` loop,
    * no per-row products array); [[dotHof]] is the HOF twin whose fold order
    * the native loop reproduces BIT-IDENTICALLY (spec-asserted), so every
    * oracle derived from the fold semantics stays valid. */
  def dot(x: Column, y: Column): Column =
    graft.functions.VectorOps.vecDot(x, y)

  /** Higher-order-function twin of [[dot]] — `aggregate(zip_with(...))` —
    * kept as the executable specification of the summation order (and the
    * shape the DuckDB oracles mirror via `list_reduce`). */
  def dotHof(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) =>
      p.cast(DoubleType) * q.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity between two float-array columns, computed in double
    * precision (codegen'd higher-order functions, no UDF). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Cosine from a precomputed-norm pair: one array fold per PAIR instead
    * of three (the per-row norms are factored out and computed once per
    * row). Same operations in the same order, so the resulting double is
    * bit-identical to `cosine` — oracle parity is preserved. */
  def cosineWithNorms(a: Column, na: Column, b: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** L2 norm of a float-array column (double precision). */
  def l2norm(v: Column): Column =
    sqrt(aggregate(transform(v, x => x.cast(DoubleType) * x.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x))

  /** Max absolute component of a float-array column — a strict left fold
    * (max is exact and associative, so the fold order is moot, but the
    * shape stays oracle-replayable). */
  def maxAbs(v: Column): Column =
    aggregate(transform(v, x => abs(x.cast(DoubleType))),
      lit(0.0), (acc, x) => greatest(acc, x))

  /** Scalar int8 quantization against a per-vector scale (max-abs / 127):
    * the 4× storage compression every embedding store applies before
    * serving. round() half-away-from-zero matches the oracle engine. */
  def quantizeInt8(v: Column, scale: Column): Column =
    transform(v, x => round(x.cast(DoubleType) / scale).cast(IntegerType))

  /** Random-hyperplane sign bucket: `planes` pseudo-random hyperplanes whose
    * coefficients are derived deterministically from xxhash64(plane, dim) —
    * no stored model, same bucket function on any cluster. Returns a compact
    * integer bucket id in [0, 2^planes). */
  def signBucket(v: Column, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      // deterministic ±1 coefficient stream per (plane, dimension)
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, i) =>
          x.cast(DoubleType) *
            when(xxhash64(lit(p), i).bitwiseAND(lit(1L)) === 1L, lit(1.0))
              .otherwise(lit(-1.0))),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, shiftleft(lit(1), p)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** Multi-probe sign-LSH top-k (Lv et al., VLDB 2007 — public result):
    * the query-TIME recall knob for hyperplane LSH. Each corpus vector
    * lives in exactly ONE sign bucket (the [[Dedup.portablePlanes]]
    * deterministic matrix, so the oracle replays it); a query probes its
    * own bucket PLUS the `nflip` buckets reached by flipping its
    * least-confident plane bits (smallest |projection| — the planes the
    * query sits closest to, where its true neighbors most likely fell on
    * the other side). Recall grows with nflip at zero index cost: same
    * one-bucket-per-vector table that a single-probe scan uses, no extra
    * hash tables (the multi-TABLE LSH alternative multiplies index state).
    *
    * Scale shape: the corpus is bucketed once (per-row projection — no
    * shuffle); the probe list ((nflip+1)·|queries| rows) BROADCASTS to
    * the bucket join, so the corpus never exchanges; exact rounded cosine
    * then ranks only the probed members. Returns (query_id, neighbor_id,
    * cosine4, rank), rank 1..k. */
  def multiProbeTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, planes: Seq[Seq[Double]], nflip: Int, k: Int,
      roundDigits: Int = 4, pairDepth: Int = 0): DataFrame = {
    require(nflip >= 0 && nflip <= planes.size,
      s"nflip=$nflip must be in [0, ${planes.size}]")
    require(pairDepth >= 0 && pairDepth <= nflip,
      s"pairDepth=$pairDepth must be in [0, nflip=$nflip]")
    def dotLit(v: Column, cs: Seq[Double]): Column =
      aggregate(zip_with(v, typedLit(cs), (x, y) => x.cast(DoubleType) * y),
        lit(0.0), (acc, x) => acc + x)
    def bucketOf(v: Column): Column = planes.zipWithIndex.map {
      case (cs, p) => when(dotLit(v, cs) > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("bucket", bucketOf(col("cv")))
    val projCols = planes.zipWithIndex.map { case (cs, p) =>
      dotLit(col("qv"), cs).as(s"pr$p") }
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .select(col("query_id") +: col("qv") +: projCols: _*)
      .withColumn("bucket0", planes.indices.map(p =>
        when(col(s"pr$p") > 0, lit(1 << p)).otherwise(lit(0)))
        .reduce(_ + _))
    // flip candidates ordered by |projection| asc (ties: plane asc via
    // the mask field — both engines sort the struct lexicographically)
    val sortedFlips = array_sort(array(planes.indices.map(p =>
      struct(abs(col(s"pr$p")).as("a"), lit(1 << p).as("m"))): _*))
    val flips = slice(sortedFlips, 1, nflip)
    // Hamming-2 shell: pairwise flips among the pairDepth least-confident
    // planes — the next ring of Lv et al.'s perturbation sequence. Masks
    // are distinct powers of two, so m_i + m_j == m_i | m_j and every
    // probe value is distinct (no candidate double-counting).
    val pairProbes = for {
      i <- 0 until pairDepth; j <- i + 1 until pairDepth
    } yield col("bucket0").bitwiseXOR(
      element_at(sortedFlips, i + 1).getField("m") +
        element_at(sortedFlips, j + 1).getField("m"))
    val singleProbes = concat(array(col("bucket0")),
      transform(flips, f => col("bucket0").bitwiseXOR(f.getField("m"))))
    val probes = if (pairProbes.isEmpty) singleProbes
      else concat(singleProbes, array(pairProbes: _*))
    val probed = q.withColumn("probe", explode(probes))
      .select(col("query_id"), col("qv"), col("probe"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine4").desc, col("neighbor_id").asc)
    c.join(broadcast(probed), col("bucket") === col("probe"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine4", round(cosine(col("qv"), col("cv")),
        roundDigits))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine4"),
        col("rank"))
  }

  /** Bounded candidate-pair generation for [[knnGraph]] (SURVEY §2D,
    * D202) — NEVER all-pairs: each vector lands in exactly ONE sign-LSH
    * bucket per plane TABLE (independent tables raise recall the way
    * extra hash tables do in classic LSH; the plane matrices are
    * explicit literals so the oracle replays them), each (table,
    * bucket) keeps at most `bucketCap` members chosen DETERMINISTICALLY
    * by id (the Dedup banding discipline — skew in embedding space
    * cannot mint a quadratic clique), pairs form by a shuffle self-join
    * WITHIN (table, bucket) only, then dedup across tables. Candidate
    * count is bounded by tables · 2^planes · cap·(cap−1) regardless of
    * the data — the boundedness invariant ScaleSmoke asserts. */
  /** (tbl, bucket, id, v): every vector's capped sign-LSH bucket
    * memberships — the shared core of [[knnCandidates]] and the D206
    * incremental maintenance. Cap selection is DETERMINISTIC by id
    * (smallest ids win a full bucket), which is also what makes
    * append-style increments exact: growing ids never displace an
    * admitted member. */
  /** The UN-capped (tbl, bucket, id, v) sign-LSH membership frame — the
    * shared bucketing expressions of [[cappedBuckets]] and the
    * [[ScaleConfig]] histogram measurement. */
  private[llm] def signBuckets(df: DataFrame, idCol: String,
      vecCol: String, tables: Seq[Seq[Seq[Double]]]): DataFrame = {
    require(tables.nonEmpty && tables.forall(_.nonEmpty),
      "at least one table of at least one plane")
    def dotLit(v: Column, cs: Seq[Double]): Column =
      aggregate(zip_with(v, typedLit(cs), (x, y) => x.cast(DoubleType) * y),
        lit(0.0), (acc, x) => acc + x)
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    tables.zipWithIndex.map { case (planes, t) =>
      val bucket = planes.zipWithIndex.map { case (cs, p) =>
        when(dotLit(col("v"), cs) > 0, lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _)
      base.select(lit(t).as("tbl"), bucket.as("bucket"), col("id"),
        col("v"))
    }.reduce(_ unionByName _)
  }

  private def cappedBuckets(df: DataFrame, idCol: String, vecCol: String,
      tables: Seq[Seq[Seq[Double]]], bucketCap: Int): DataFrame = {
    // ScaleConfig.Auto (the cap-less default): measure this call's own
    // (tbl, bucket) histogram — one count aggregation over the
    // localCheckpoint'd membership frame, which the pair stage then
    // reuses — and derive the largest cap fitting the default pair
    // budget. Explicit caps stay the override.
    val (src, cap) =
      if (bucketCap != ScaleConfig.Auto)
        (signBuckets(df, idCol, vecCol, tables), bucketCap)
      else {
        val mat = signBuckets(df, idCol, vecCol, tables).localCheckpoint()
        (mat, ScaleConfig.deriveCap(mat, Seq("tbl", "bucket")))
      }
    require(cap >= 2, s"bucketCap=$cap cannot pair")
    val w = Window.partitionBy(col("tbl"), col("bucket"))
      .orderBy(col("id"))
    src.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap).drop("__rn")
  }

  /** Within-bucket pairs of `srcSide` × `capped`, deduped across
    * tables, scored with the exact rounded cosine. The cosine is
    * computed BEFORE the cross-table dedup so the dedup exchange
    * carries (src_id, dst_id, cosine4) — three scalars — instead of
    * both embedding vectors (opt guide §2.3/§8: shuffle keys and
    * scores, never payloads). A pair surfacing in several tables
    * recomputes its cosine once per occurrence — a bounded, cheap
    * per-row fold — and the duplicates are identical rows (the cosine
    * is a pure function of the pair), so the deduped frame is exactly
    * what score-after-dedup produced. */
  private def pairsFrom(srcSide: DataFrame, capped: DataFrame,
      roundDigits: Int = 4): DataFrame =
    srcSide.as("a").join(capped.as("b"),
        col("a.tbl") === col("b.tbl") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.id") =!= col("b.id"))
      .select(col("a.id").as("src_id"), col("b.id").as("dst_id"),
        round(cosine(col("a.v"), col("b.v")), roundDigits).as("cosine4"))
      .dropDuplicates("src_id", "dst_id")

  def knnCandidates(df: DataFrame, idCol: String, vecCol: String,
      tables: Seq[Seq[Seq[Double]]],
      bucketCap: Int = ScaleConfig.Auto,
      roundDigits: Int = 4): DataFrame = {
    val capped = cappedBuckets(df, idCol, vecCol, tables, bucketCap)
    pairsFrom(capped, capped, roundDigits)
  }

  /** The capped bucket-membership frame (tbl, bucket, id, v) — exposed
    * so a caller deriving SEVERAL graphs from nested corpora can pay
    * the bucketing pass ONCE. Because cap admission is deterministic
    * by smallest id, the membership of an id-PREFIX sub-corpus is
    * exactly this frame filtered to those ids (growing ids never
    * displace an admitted member — the same append contract D206
    * rests on): `membership(corpus) = membership(corpus ∪ batch)
    * WHERE id ∈ corpus` whenever batch ids exceed corpus ids. */
  def bucketMembership(df: DataFrame, idCol: String, vecCol: String,
      tables: Seq[Seq[Seq[Double]]],
      bucketCap: Int = ScaleConfig.Auto): DataFrame =
    cappedBuckets(df, idCol, vecCol, tables, bucketCap)

  /** [[knnGraph]] from an already-computed [[bucketMembership]] frame
    * (or an id-prefix filter of one) — the graph without re-running
    * the bucketing pass. */
  def knnGraphFromMembership(capped: DataFrame, k: Int,
      roundDigits: Int = 4): DataFrame = {
    require(k >= 1)
    topK(pairsFrom(capped, capped, roundDigits), k)
  }

  /** Per-src top-k over an already-scored (src_id, dst_id, cosine4)
    * frame. Callers whose pair frames still carry vectors score them
    * first ([[scorePairs]]). */
  private def topK(pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("src_id"))
      .orderBy(col("cosine4").desc, col("dst_id").asc)
    pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("src_id"), col("dst_id"), col("cosine4"), col("rank"))
  }

  /** Exact rounded cosine for a (…, sv, dv) pair frame; drops the
    * vectors. */
  private def scorePairs(pairs: DataFrame, roundDigits: Int): DataFrame =
    pairs.withColumn("cosine4",
        round(cosine(col("sv"), col("dv")), roundDigits))
      .drop("sv", "dv")

  /** Incremental kNN-graph maintenance (SURVEY §2D, D206) — the D27/
    * D131 incremental discipline applied to the D202 graph: when a
    * BATCH of new vectors arrives (append contract: batch ids are new
    * and larger than every corpus id, the layout every ingest pipeline
    * already has), only the nodes sharing a capped bucket with an
    * ADMITTED batch member can change — their candidate set grew;
    * everyone else's buckets are untouched because cap selection is
    * deterministic-by-id and growing ids never displace an admitted
    * member. Recompute edges for exactly that affected set (src side
    * of the bucket join is affected-only — O(affected × bucket
    * members), never a corpus rebuild) and splice: old edges for
    * unaffected sources carry over byte-identical. The result EQUALS
    * the full rebuild over corpus ∪ batch (gate-require()d). All
    * driver-free: the affected set stays a frame in semi/anti joins. */
  def knnGraphIncrement(corpus: DataFrame, batch: DataFrame,
      oldEdges: DataFrame, idCol: String, vecCol: String,
      tables: Seq[Seq[Seq[Double]]], k: Int, bucketCap: Int,
      roundDigits: Int = 4): DataFrame = {
    // bucketCap is deliberately REQUIRED here (no Auto default): the
    // splice identity `increment == rebuild` only holds under the SAME
    // cap the old edges were built with — an Auto re-derivation over
    // the union histogram could derive a smaller cap once the budget
    // binds and silently break it. Derive once (ScaleConfig) and
    // thread the cap through both calls.
    val union = corpus.select(col(idCol), col(vecCol))
      .unionByName(batch.select(col(idCol), col(vecCol)))
    val capped = cappedBuckets(union, idCol, vecCol, tables, bucketCap)
    val batchIds = batch.select(col(idCol).as("id"))
    // buckets where a batch member was ADMITTED (full buckets ignore it)
    val affectedBuckets = capped.join(batchIds, Seq("id"), "left_semi")
      .select("tbl", "bucket").distinct()
    val affectedSrc = capped.join(affectedBuckets, Seq("tbl", "bucket"),
      "left_semi").select("id").distinct()
    // an affected src's candidates come from ALL its buckets, so the
    // src side is its full capped membership — the dst side is global
    val srcSide = capped.join(affectedSrc, Seq("id"), "left_semi")
    val fresh = topK(pairsFrom(srcSide, capped, roundDigits), k)
    oldEdges.join(affectedSrc.select(col("id").as("src_id")),
        Seq("src_id"), "left_anti")
      .unionByName(fresh)
  }

  /** Bounded k-nearest-neighbor GRAPH over the corpus (SURVEY §2D,
    * D202) — the all-nodes neighbor structure that graph-based dedup /
    * clustering (D30/D108) and NN-Descent-style refinement build on,
    * where top-k ANN (D6/D7/D121) serves QUERIES. Candidates from
    * [[knnCandidates]] (LSH-bucketed, per-bucket-capped — never
    * all-pairs), exact rounded cosine on the candidates only, per-node
    * top-k by `row_number` (ties broken by neighbor id — deterministic,
    * oracle-replayable). Returns (src_id, dst_id, cosine4, rank),
    * rank 1..k per src; nodes whose buckets yielded no candidate are
    * absent (the approximate-graph contract). */
  def knnGraph(df: DataFrame, idCol: String, vecCol: String,
      tables: Seq[Seq[Seq[Double]]], k: Int,
      bucketCap: Int = ScaleConfig.Auto,
      roundDigits: Int = 4): DataFrame = {
    require(k >= 1)
    topK(knnCandidates(df, idCol, vecCol, tables, bucketCap,
      roundDigits), k)
  }

  /** [[knnGraph]] from an already-materialized candidate frame — a
    * caller that inspected the candidates (the gate's cap-bound check,
    * an NN-Descent round) finishes the graph without re-running the
    * bucket self-join. Accepts EITHER the pre-scored
    * (src_id, dst_id, cosine4) shape [[knnCandidates]] emits since the
    * score-before-dedup rewrite (roundDigits is then unused) or a
    * legacy vector-carrying (src_id, dst_id, sv, dv) frame, which is
    * scored here at `roundDigits` first. */
  def knnGraphFromCandidates(candidates: DataFrame, k: Int,
      roundDigits: Int = 4): DataFrame = {
    require(k >= 1)
    val scored =
      if (candidates.columns.contains("sv") &&
        candidates.columns.contains("dv"))
        scorePairs(candidates, roundDigits)
      else candidates
    topK(scored, k)
  }

  /** One NN-Descent refinement round over a kNN graph (SURVEY §2D,
    * D210 — Dong, Moses & Li, WWW 2011: "a neighbor of a neighbor is
    * likely a neighbor"): each node's candidates become its UNDIRECTED
    * neighborhood's neighborhoods (forward ∪ reverse edges — reverse
    * neighbors are the paper's key trick: a node many others point AT
    * sees their neighborhoods too) plus its current edges, re-ranked by
    * exact rounded cosine, keep top-k. Candidates are O(n·(2k)²) —
    * never all-pairs, no LSH needed — and recall is MONOTONE by
    * construction (current edges are in the candidate set, so the new
    * top-k is at least as close). Iterate to convergence at the cost of
    * one bounded self-join per round; the LSH graph (D202) is the
    * standard cheap initializer. */
  def nnDescentRound(graph: DataFrame, vectors: DataFrame, idCol: String,
      vecCol: String, k: Int, roundDigits: Int = 4): DataFrame = {
    require(k >= 1)
    val fwd = graph.select(col("src_id"), col("dst_id"))
    val und = fwd.unionByName(fwd.select(col("dst_id").as("src_id"),
      col("src_id").as("dst_id"))).distinct()
    val cand = und.as("a").join(und.as("b"),
        col("a.dst_id") === col("b.src_id"))
      .select(col("a.src_id").as("src_id"), col("b.dst_id").as("dst_id"))
      .filter(col("src_id") =!= col("dst_id"))
      .unionByName(fwd)
      .distinct()
    val v = vectors.select(col(idCol).as("id"), col(vecCol).as("v"))
    topK(scorePairs(cand
      .join(v.select(col("id").as("src_id"), col("v").as("sv")),
        Seq("src_id"))
      .join(v.select(col("id").as("dst_id"), col("v").as("dv")),
        Seq("dst_id")), roundDigits), k)
  }

  /** NN-Descent iterated to its FIXED POINT (SURVEY §2D, D210+ —
    * Dong et al. 2011 run to termination, where [[nnDescentRound]] is
    * one sweep): repeats the round until the edge list stops changing
    * or `maxRounds` is hit. Each round's graph localCheckpoints before
    * feeding the next — the candidate self-join must consume a
    * MATERIALIZED edge list, not re-derive the whole lineage chain
    * (round r would otherwise replay rounds 1..r-1 inside its own
    * plan, exponentially). Convergence is natural for this recurrence:
    * each node's rank-wise cosine vector is monotone non-decreasing
    * (current edges always sit in the candidate set) and bounded, and
    * the deterministic tiebreak (cosine desc, dst asc) keeps equal-
    * score candidate sets from oscillating; `maxRounds` bounds the
    * tail regardless. Returns (graph, roundsRun) where roundsRun
    * counts executed rounds INCLUDING the final no-change
    * confirmation round. */
  def nnDescentConverge(graph: DataFrame, vectors: DataFrame,
      idCol: String, vecCol: String, k: Int, maxRounds: Int,
      roundDigits: Int = 4): (DataFrame, Int) = {
    require(maxRounds >= 1)
    var cur = graph
    var rounds = 0
    var changed = true
    while (changed && rounds < maxRounds) {
      val next = nnDescentRound(cur, vectors, idCol, vecCol, k,
        roundDigits).localCheckpoint()
      rounds += 1
      // multiset equality in ONE action: signed-count union — every row
      // carries +1 from `next` and -1 from `cur`, grouped sums are all
      // zero iff the edge multisets match (both inputs are materialized
      // edge lists, so this reads checkpoints, not lineage)
      val cs = next.columns
      changed = !next.withColumn("__s", lit(1L))
        .unionByName(cur.withColumn("__s", lit(-1L)))
        .groupBy(cs.head, cs.tail: _*)
        .agg(sum(col("__s")).as("__d"))
        .filter(col("__d") =!= 0L)
        .isEmpty
      cur = next
    }
    (cur, rounds)
  }

  /** Embedding-space eval-set decontamination (SURVEY §2D, D207) —
    * D19's n-gram decontamination catches VERBATIM leakage; paraphrased
    * or template-rewritten eval items need the embedding space (the
    * SemDeDup observation applied to eval hygiene). The EVAL side is
    * small by nature (benchmarks are thousands of items), so its
    * per-table bucket memberships BROADCAST; the corpus side is
    * bucketed by a pure projection (never shuffles on anything but the
    * bucket join), candidates are bucket collisions across the plane
    * tables, and a corpus doc whose best rounded cosine against any
    * eval vector clears `threshold` is contaminated. Returns one row
    * per contaminated corpus id: (id, eval_id, cosine4) of its BEST
    * eval match (ties: smallest eval id) — the removal list and the
    * audit trail in one frame. */
  def semanticContamination(corpus: DataFrame, eval: DataFrame,
      idCol: String, vecCol: String, tables: Seq[Seq[Seq[Double]]],
      threshold: Double, roundDigits: Int = 4): DataFrame = {
    require(tables.nonEmpty && tables.forall(_.nonEmpty))
    def dotLit(v: Column, cs: Seq[Double]): Column =
      aggregate(zip_with(v, typedLit(cs), (x, y) => x.cast(DoubleType) * y),
        lit(0.0), (acc, x) => acc + x)
    def buckets(df: DataFrame, as: String): DataFrame =
      tables.zipWithIndex.map { case (planes, t) =>
        val bucket = planes.zipWithIndex.map { case (cs, p) =>
          when(dotLit(col(vecCol), cs) > 0, lit(1 << p)).otherwise(lit(0))
        }.reduce(_ + _)
        df.select(lit(t).as("tbl"), bucket.as("bucket"),
          col(idCol).as(as), col(vecCol).as(s"${as}_v"))
      }.reduce(_ unionByName _)
    val c = buckets(corpus, "id")
    val e = buckets(eval, "eval_id")
    val w = Window.partitionBy(col("id"))
      .orderBy(col("cosine4").desc, col("eval_id").asc)
    c.join(broadcast(e), Seq("tbl", "bucket"))
      .select(col("id"), col("eval_id"),
        round(cosine(col("id_v"), col("eval_id_v")), roundDigits)
          .as("cosine4"))
      .filter(col("cosine4") >= threshold)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("id"), col("eval_id"), col("cosine4"))
  }

  /** Brute-force cosine top-k. `queries` must be small (broadcast side).
    * Returns (query_id, neighbor_id, cosine, rank), rank 1..k per query,
    * self-matches excluded. Ties broken by neighbor id for determinism.
    * `roundDigits` ranks on a rounded cosine (and outputs it) so
    * cross-engine fp noise cannot reorder results — the oracle-stable mode. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, roundDigits: Option[Int] = None): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("_qn", sqrt(dot(col("qv"), col("qv"))))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("_cn", sqrt(dot(col("cv"), col("cv"))))
    val raw = cosineWithNorms(col("qv"), col("_qn"), col("cv"), col("_cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", roundDigits.fold(raw)(d => round(raw, d)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  private val NormCol = "_vnorm"

  /** IVF coarse centroid set: the `nlist` corpus rows with the smallest ids
    * (a seed-free, reproducible choice) with precomputed norms — the small
    * "model" every other IVF step broadcasts. A TakeOrdered over two pruned
    * columns: no shuffle, no collect. */
  def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int): DataFrame =
    corpus.select(col(idCol).as("cent_id"), col(vecCol).as("cent_v"))
      .orderBy(col("cent_id")).limit(nlist)
      .withColumn("cent_n", sqrt(dot(col("cent_v"), col("cent_v"))))

  /** IVF coarse quantizer: assign every vector to its nearest centroid.
    * Returns (id, vec, norm, list_id).
    *
    * The nearest centroid is picked with `min(struct(dist, cent_id))`
    * grouped by vector id — a map-side-combinable aggregation, so the
    * shuffle carries ONE row per vector per map partition. (The previous
    * row_number-window form shuffled nlist× the corpus just to keep rank 1 —
    * the index-build scale-killer.) Struct ordering is lexicographic, so
    * min ≡ ORDER BY dist ASC, cent_id ASC LIMIT 1 — tie on distance falls
    * to the smallest centroid id, the same contract the oracle replays. */
  def ivfAssign(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int): DataFrame = {
    // norms once per row/centroid: assignment then costs ONE fold per
    // (vector, centroid) pair instead of three
    val normed = corpus.select(col(idCol), col(vecCol)).withColumn(NormCol,
      sqrt(dot(col(vecCol), col(vecCol))))
    val centroids = ivfCentroids(corpus, idCol, vecCol, nlist)
    val assigned = normed.crossJoin(broadcast(centroids))
      .withColumn("dist", -cosineWithNorms(col(vecCol), col(NormCol),
        col("cent_v"), col("cent_n")))
    assigned.groupBy(col(idCol))
      .agg(min(struct(col("dist"), col("cent_id"))).as("_best"),
        first(col(vecCol)).as("_v"), first(col(NormCol)).as("_n"))
      .select(col(idCol), col("_v").as(vecCol), col("_n").as(NormCol),
        col("_best.cent_id").as("list_id"))
  }

  /** IVF top-k: probe the `nprobe` nearest inverted lists per query, then
    * exact cosine within the probed lists only. At scale the probed fraction
    * (~nprobe/nlist of the corpus) bounds the scan.
    *
    * Probe centroids come from ivfCentroids — the true nlist-row model, NOT
    * recovered from the assignment (self-filtering `id === list_id` loses a
    * centroid whenever a duplicate vector ties its assignment to a smaller
    * cent_id). The assignment subtree is referenced exactly once (the probe
    * join), so nothing needs caching and no persisted index can leak. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 64, nprobe: Int = 8,
      roundDigits: Option[Int] = None): DataFrame = {
    val indexed = ivfAssign(corpus, idCol, vecCol, nlist)
    val centroids = ivfCentroids(corpus, idCol, vecCol, nlist)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("_qn", sqrt(dot(col("qv"), col("qv"))))
    // nprobe nearest centroids per query (broadcast: nlist is small)
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("cdist").asc, col("cent_id").asc)
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("cdist", -cosineWithNorms(col("qv"), col("_qn"),
        col("cent_v"), col("cent_n")))
      .withColumn("rn", row_number().over(wq)).filter(col("rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("_qn"),
        col("cent_id").as("list_id"))
    // scan only the probed lists
    val raw = cosineWithNorms(col("qv"), col("_qn"), col(vecCol), col(NormCol))
    val scored = indexed.join(probes, "list_id")
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("cosine", roundDigits.fold(raw)(d => round(raw, d)))
    // rounded-rank mode (`roundDigits`): rank on the rounded score with an
    // id tiebreak so cross-engine fp noise cannot reorder — oracle-stable,
    // same contract as bruteForceTopK
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        col("cosine"), col("rank"))
  }

  /** IVF-PQ: the memory-bounded ANN SERVING composition (coarse quantize →
    * per-list scan of PQ-encoded residuals with asymmetric distances) —
    * what a 100 TB embedding corpus actually keeps hot.
    *
    * Memory argument (the point of the composition): the per-list scan
    * touches ONLY (id, list_id, m codes) — m small ints per vector — plus
    * one shared `ncodes × dim` residual codebook. At dim=64/m=4 that is
    * ~64× less state than full-precision vectors; the float vectors are
    * read exactly twice at INDEX BUILD (assignment + encoding) and never
    * at query time.
    *
    * Pipeline (all seed-free and rounded so a SQL oracle replays it):
    *  1. coarse lists: [[ivfAssign]] (smallest-id centroids, fold-ordered
    *     cosine, min(struct) tiebreak);
    *  2. residuals r = v − centroid(list) — zip_with, pure map;
    *  3. global residual codebook: the `ncodes` LARGEST-id residual rows
    *     (largest, not smallest: the smallest ids ARE the centroids, whose
    *     residuals are all-zero — a degenerate codebook);
    *  4. encode: per subspace j, argmin over the broadcast codebook of the
    *     ROUNDED sub-distance (the [[pqEncode]] pattern on residuals) — one
    *     map-side-combinable aggregation for all m subspaces;
    *  5. query: probe `nprobe` nearest lists, build the per-(query, list)
    *     asymmetric distance TABLE d[j][code] = ‖qr_sub − cr_sub‖² over
    *     the broadcast codebook (nprobe·ncodes·m doubles per query — KBs),
    *     then ONE join from exploded candidate codes to the table and a
    *     decimal-exact Σ_j lookup sum. No full-precision vector is touched.
    *
    * Unit-norm corpora rank by ADC L2 ≈ cosine (‖q−v‖² = 2 − 2cosθ);
    * distances are rounded and summed as DECIMAL(18,4), and the final
    * step REFINES: exact cosine on the k·`rerank` PQ-shortlisted
    * candidates only (full vectors point-read for the shortlist — the
    * standard IVF-PQ serving shape, recall limited by the probes, not the
    * codes). Everything replays exactly cross-engine. Returns
    * (query_id, neighbor_id, cosine4, rank), rank 1..k. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int, nlist: Int = 16, nprobe: Int = 4,
      m: Int = 4, ncodes: Int = 16, rerank: Int = 8,
      roundDigits: Int = 4): DataFrame = {
    val (cents, codebook, codes) =
      ivfPqBuild(corpus, idCol, vecCol, dim, nlist, m, ncodes, roundDigits)
    ivfPqQuery(queries, cents, codebook, codes, corpus, idCol, vecCol,
      dim, k, nprobe, m, rerank, roundDigits)
  }

  /** Rounded squared L2 between subvectors `j` of two `dim`-arrays split
    * into `m` subspaces — the one sub-distance both the encoder and the
    * query-side distance tables use (and the SQL oracle replays). */
  private def pqSubDist(dim: Int, m: Int, roundDigits: Int)(
      a: Column, b: Column, j: Int): Column = {
    val sub = dim / m
    pqSubDistPre(roundDigits)(slice(a, j * sub + 1, sub),
      slice(b, j * sub + 1, sub))
  }

  /** Same rounded squared L2, over ALREADY-SLICED subvectors — the
    * codegen'd [[graft.functions.SqDistDouble]] loop (bit-identical to
    * the HOF `aggregate(zip_with(...))` fold it replaced, spec-pinned),
    * because this runs once per (row, codeword, subspace): the IVF-PQ
    * encode/ADC hot loop. */
  private def pqSubDistPre(roundDigits: Int)(a: Column, b: Column): Column =
    round(graft.functions.VectorOps.vecSqDist(a, b), roundDigits)

  /** Build the PERSISTABLE IVF-PQ index — three plain DataFrames that
    * write to parquet once and serve queries forever (the offline half of
    * the serving lifecycle; `sim_ivfpq_stored` proves the round-trip is
    * bit-exact):
    *
    *  - centroids `(cent_id, cent_v, cent_n)` — nlist rows;
    *  - codebook `(code_id, cr)` — ncodes residual rows (LARGEST-id
    *    residuals: the smallest ids ARE the centroids, whose residuals
    *    are all-zero — a degenerate codebook);
    *  - codes `(id, list_id, codes)` — m small ints per corpus vector,
    *    the ONLY per-vector state the query scan ever touches.
    *
    * The full-precision vectors are read exactly twice here (assignment +
    * encoding) and never again at query time. Encoding is one
    * map-side-combinable aggregation for all m subspaces ([[pqEncode]]
    * pattern on residuals), distances rounded so the argmin replays in
    * SQL. */
  def ivfPqBuild(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, nlist: Int = 16, m: Int = 4, ncodes: Int = 16,
      roundDigits: Int = 4): (DataFrame, DataFrame, DataFrame) = {
    require(dim % m == 0, s"dim=$dim must divide into m=$m subvectors")
    val cents = ivfCentroids(corpus, idCol, vecCol, nlist)
    // the assignment+residual pass is referenced by BOTH the codebook
    // top-k and the encode cross join (and again when the caller writes
    // codes to parquet) — materialize it ONCE; without the checkpoint the
    // whole ivfAssign subtree re-executes per consumer (no common-subtree
    // reuse across joins in Catalyst), tripling the build's scan cost
    val resid = ivfAssign(corpus, idCol, vecCol, nlist)
      .join(broadcast(cents.select(col("cent_id").as("list_id"),
        col("cent_v"))), "list_id")
      .select(col(idCol), col("list_id"),
        zip_with(col(vecCol), col("cent_v"),
          (x, c) => x.cast(DoubleType) - c.cast(DoubleType)).as("r"))
      .localCheckpoint()
    val codebook = resid.orderBy(col(idCol).desc).limit(ncodes)
      .select(col(idCol).as("code_id"), col("r").as("cr"))
    (cents, codebook, encodeResid(resid, codebook, idCol, dim, m, roundDigits))
  }

  /** Encode residual rows `(id, list_id, r)` against a codebook — the
    * shared encode stage of [[ivfPqBuild]] and [[ivfPqEncode]]. Both
    * sides pre-split into their m subvectors BEFORE the pair join:
    * slicing happens once per row/codeword, not once per (row, codeword,
    * subspace) — the zip_with over pre-sliced arrays computes the exact
    * same rounded distances (slice-then-zip ≡ zip-of-slices). */
  private def encodeResid(resid: DataFrame, codebook: DataFrame,
      idCol: String, dim: Int, m: Int, roundDigits: Int): DataFrame = {
    val sub = dim / m
    val subD = pqSubDistPre(roundDigits) _
    val residS = resid.select(col(idCol) +: col("list_id") +:
      (0 until m).map(j => slice(col("r"), j * sub + 1, sub).as(s"r$j")): _*)
    val cbS = codebook.select(col("code_id") +:
      (0 until m).map(j =>
        slice(col("cr"), j * sub + 1, sub).as(s"c$j")): _*)
    residS.crossJoin(broadcast(cbS))
      .groupBy(col(idCol), col("list_id"))
      .agg(min(struct(subD(col("r0"), col("c0")).as("d"),
          col("code_id").as("c"))).as("b0"),
        (1 until m).map(j => min(struct(subD(col(s"r$j"), col(s"c$j")).as("d"),
          col("code_id").as("c"))).as(s"b$j")): _*)
      .select(col(idCol), col("list_id"),
        array((0 until m).map(j => col(s"b$j.c")): _*).as("codes"))
  }

  /** Incremental index MAINTENANCE (D131): encode a NEW vector batch
    * against a STORED index's centroids and codebook — assign to the
    * frozen coarse quantizer, residual, per-subspace argmin — and return
    * its codes rows to APPEND to the stored codes table. The index model
    * (centroids + codebook) is pinned at training time, exactly how a
    * served ANN index ingests: growing vectors re-train nothing, and
    * queries see the union immediately. Cost is O(batch · nlist + batch ·
    * ncodes) — the stored corpus is never touched. */
  def ivfPqEncode(batch: DataFrame, cents: DataFrame, codebook: DataFrame,
      idCol: String, vecCol: String, dim: Int, m: Int = 4,
      roundDigits: Int = 4): DataFrame = {
    require(dim % m == 0, s"dim=$dim must divide into m=$m subvectors")
    val c = broadcast(cents)
    val normed = batch.select(col(idCol), col(vecCol))
      .withColumn("_n", sqrt(dot(col(vecCol), col(vecCol))))
    val assigned = normed.crossJoin(c)
      .withColumn("dist", -cosineWithNorms(col(vecCol), col("_n"),
        col("cent_v"), col("cent_n")))
      .groupBy(col(idCol))
      .agg(min(struct(col("dist"), col("cent_id"))).as("_best"),
        first(col(vecCol)).as("_v"))
      .select(col(idCol), col("_v").as(vecCol),
        col("_best.cent_id").as("list_id"))
    val resid = assigned
      .join(broadcast(cents.select(col("cent_id").as("list_id"),
        col("cent_v"))), "list_id")
      .select(col(idCol), col("list_id"),
        zip_with(col(vecCol), col("cent_v"),
          (x, cc) => x.cast(DoubleType) - cc.cast(DoubleType)).as("r"))
    encodeResid(resid, codebook, idCol, dim, m, roundDigits)
  }

  /** Serve top-k from a (possibly stored) IVF-PQ index — the online half:
    * probe `nprobe` nearest lists, build the per-(query, list) asymmetric
    * distance TABLE d[j][code] = ‖qr_sub − cr_sub‖² over the broadcast
    * codebook (nprobe·ncodes·m doubles per query — KBs), ONE join from
    * exploded candidate codes to the table with a decimal-exact Σ_j
    * lookup sum, then REFINE: exact cosine on the k·`rerank` shortlisted
    * candidates only — full vectors (`corpus`) are point-read for the
    * shortlist, never scanned. PQ decides WHO gets re-ranked; the exact
    * distance decides the order, so recall is limited by the probes, not
    * the codes. Unit-norm corpora rank by ADC L2 ≈ cosine
    * (‖q−v‖² = 2 − 2cosθ). Returns (query_id, neighbor_id, cosine4,
    * rank), rank 1..k. */
  def ivfPqQuery(queries: DataFrame, cents: DataFrame, codebook: DataFrame,
      codes: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int, nprobe: Int = 4, m: Int = 4, rerank: Int = 8,
      roundDigits: Int = 4): DataFrame = {
    val subD = pqSubDist(dim, m, roundDigits) _
    val codeRows = codes.select(col(idCol), col("list_id"),
      posexplode(col("codes")).as(Seq("j", "code")))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("cdist").asc, col("cent_id").asc)
    val qresid = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("_qn", sqrt(dot(col("qv"), col("qv"))))
      .crossJoin(broadcast(cents))
      .withColumn("cdist", -cosineWithNorms(col("qv"), col("_qn"),
        col("cent_v"), col("cent_n")))
      .withColumn("rn", row_number().over(wq)).filter(col("rn") <= nprobe)
      .select(col("query_id"), col("cent_id").as("list_id"),
        zip_with(col("qv"), col("cent_v"),
          (x, c) => x.cast(DoubleType) - c.cast(DoubleType)).as("qr"))
    val dtab = qresid.crossJoin(broadcast(codebook))
      .select(col("query_id"), col("list_id"), col("code_id"),
        posexplode(array((0 until m).map(j =>
          subD(col("qr"), col("cr"), j)): _*)).as(Seq("j", "dj")))
    // the distance table is queries·nprobe·ncodes·m rows (KBs per query) —
    // BROADCAST it so the corpus-sized codes table never shuffles: the
    // hash join doubles as the list prune (codes outside every probed
    // list match nothing). Without the hint Catalyst sees an unestimable
    // window+crossJoin subtree and shuffles BOTH sides on the join key —
    // at 100 TB that is a full exchange of the codes table per query batch.
    val joined = codeRows.alias("c").join(broadcast(dtab.alias("d")),
        col("c.list_id") === col("d.list_id") &&
          col("c.j") === col("d.j") && col("c.code") === col("d.code_id"))
      .filter(col(s"c.$idCol") =!= col("d.query_id"))
      .groupBy(col("d.query_id").as("query_id"),
        col(s"c.$idCol").as("neighbor_id"))
      .agg(sum(col("d.dj").cast(DecimalType(18, 4))).cast(DoubleType)
        .as("adist4"))
    val wPq = Window.partitionBy(col("query_id"))
      .orderBy(col("adist4").asc, col("neighbor_id").asc)
    val shortlist = joined.withColumn("prank", row_number().over(wPq))
      .filter(col("prank") <= k * rerank)
      .select(col("query_id"), col("neighbor_id"))
    // k·rerank rows per query: broadcast the shortlist so the refine step
    // is a semi-join POINT-READ of the full-precision corpus (scan pruned
    // by the broadcast hash table), never a corpus shuffle
    val cand = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("cv"))
      .join(broadcast(shortlist), "neighbor_id")
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("qv"))), "query_id")
    val cos4 = round(dot(col("qv"), col("cv")) /
      (sqrt(dot(col("qv"), col("qv"))) * sqrt(dot(col("cv"), col("cv")))), 4)
    val wEx = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine4").desc, col("neighbor_id").asc)
    cand.withColumn("cosine4", cos4)
      .withColumn("rank", row_number().over(wEx)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine4"),
        col("rank"))
  }

  /** Product-quantization encoding — the compressed-index rung of the ANN
    * family (brute force → IVF lists → int8 scalar → PQ codes): split each
    * `dim`-vector into `m` subvectors and store, per subspace, only the id
    * of the nearest codebook entry — `m` small ints instead of `dim`
    * floats (here 4 bytes vs 256: a 64× memory cut for list scanning).
    *
    * The codebook is seed-free like ivfCentroids (the `ncodes`
    * smallest-id corpus rows, subvector j of row r = code (j, r)) and the
    * per-subspace assignment is a `min(struct(dist, code_id))` over a
    * broadcast codebook — ONE map-side-combinable aggregation for all m
    * subspaces, no window, no shuffle of the vectors beyond their own
    * groupBy. Distances are rounded before the argmin (`roundDigits`) so
    * the ordering — and therefore the codes and the reconstruction
    * error — replays exactly in the SQL oracle.
    *
    * Output: (id, code_0..code_{m-1} as csv string, recon = Σ_j best
    * subspace distance) — recon is the ADC self-distance, the quantization
    * error a PQ search would see. */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
      m: Int, ncodes: Int, roundDigits: Int = 4): DataFrame = {
    require(dim % m == 0, s"dim=$dim must divide into m=$m subvectors")
    val sub = dim / m
    val codebook = corpus.select(col(idCol).as("code_id"),
      col(vecCol).as("cv")).orderBy(col("code_id")).limit(ncodes)
    def subDist(j: Int): Column = {
      val a = slice(col(vecCol), j * sub + 1, sub)
      val b = slice(col("cv"), j * sub + 1, sub)
      round(sqrt(aggregate(zip_with(a, b, (x, y) =>
        (x.cast(DoubleType) - y.cast(DoubleType)) *
          (x.cast(DoubleType) - y.cast(DoubleType))),
        lit(0.0), (acc, v) => acc + v)), roundDigits)
    }
    val best = corpus.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(codebook))
      .groupBy(col(idCol))
      .agg(min(struct(subDist(0).as("d"), col("code_id").as("c"))).as("b0"),
        (1 until m).map(j =>
          min(struct(subDist(j).as("d"), col("code_id").as("c")))
            .as(s"b$j")): _*)
    best.select(col(idCol),
      concat_ws(",", (0 until m).map(j =>
        col(s"b$j").getField("c").cast(StringType)): _*).as("codes"),
      round((0 until m).map(j => col(s"b$j").getField("d"))
        .reduce(_ + _), roundDigits).as("recon"))
  }

  /** K-means Lloyd iterations (the IVF coarse-quantizer TRAINER the
    * `ivfAssign` seed centroids stand in for): `iters` rounds of
    * assign-to-nearest (rounded cosine, the ivf tiebreak) then
    * recompute-centroid. Centroid means are DECIMAL-exact per component
    * (sum of 8dp decimals, then one rounded division), so the distributed
    * summation order cannot move a centroid and a SQL oracle replays the
    * whole training run. Scale shape per round: one broadcast of k
    * centroids, one id-keyed window for the argmax, one (cid, pos)-keyed
    * mean aggregation — all map-side-combinable; the points never
    * shuffle by anything but their own id. Returns per-cluster
    * (cid, n, csum6) after the final assignment. */
  /** Lloyd training core: (points, trained centroids, final assign fn).
    * Shared by the [[kmeans]] summary and the per-point surfaces
    * ([[kmeansAssignments]], [[clusterBalancedSample]]). */
  private def lloydTrain(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): (DataFrame, DataFrame => DataFrame) = {
    val pts = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    def assign(cents: DataFrame): DataFrame = {
      val w = Window.partitionBy("id")
        .orderBy(col("cos4").desc, col("cid").asc)
      pts.crossJoin(broadcast(cents))
        .withColumn("cos4", round(dotHof(col("v"), col("cv")) /
          (sqrt(dotHof(col("v"), col("v"))) *
           sqrt(dotHof(col("cv"), col("cv")))), 4))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("id"), col("v"), col("cid"))
    }
    var cents = pts.orderBy("id").limit(k)
      .select(col("id").as("cid"), col("v").as("cv"))
    for (_ <- 1 to iters) {
      // localCheckpoint per round (k rows): the next assign references
      // cents inside a broadcast AND the final summary joins it again —
      // without the cut each round re-embeds and re-executes every
      // earlier round's assignment (the PageRank/BPE loop discipline)
      cents = assign(cents)
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos")
        .agg(round(sum(col("x").cast(DecimalType(18, 8)))
          .cast(DoubleType) / count(lit(1)), 6).as("m"))
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("pos"),
          col("m")))), s => s.getField("m")).as("cv"))
        .localCheckpoint()
    }
    (cents, assign)
  }

  def kmeans(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int): DataFrame = {
    val (cents, assign) = lloydTrain(df, idCol, vecCol, k, iters)
    assign(cents).groupBy("cid").agg(count(lit(1)).as("n"))
      .join(cents.select(col("cid"),
        round(aggregate(col("cv"), lit(0.0), (a, x) => a + x), 6)
          .as("csum6")), Seq("cid"))
      .orderBy("cid")
  }

  /** Every point's cluster under the trained centroids: (id, cid). */
  def kmeansAssignments(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val (cents, assign) = lloydTrain(df, idCol, vecCol, k, iters)
    assign(cents).select(col("id"), col("cid"))
  }

  /** The trained centroids themselves: (cid, cv) — pin these to assign
    * LATER batches without retraining (retraining re-shuffles every
    * cluster; the D131 incremental contract). */
  def kmeansCentroids(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame =
    lloydTrain(df, idCol, vecCol, k, iters)._1

  /** Nearest-centroid assignment of `df` under PINNED centroids
    * (cid, cv): (id, cid), same rounded-cosine + smallest-cid tiebreak
    * as training-time assignment. */
  def assignToCentroids(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy("id")
      .orderBy(col("cos4").desc, col("cid").asc)
    df.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .crossJoin(broadcast(centroids))
      .withColumn("cos4", round(dotHof(col("v"), col("cv")) /
        (sqrt(dotHof(col("v"), col("v"))) *
         sqrt(dotHof(col("cv"), col("cv")))), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("cid"))
  }

  /** Cluster-balanced diversity sampling (SURVEY §2D, D213 — the
    * DataComp-era curation move): train k-means over the embedding
    * space, then keep at most `perCluster` members PER CLUSTER, chosen
    * by a portable hash order of ids (deterministic "random" — unbiased
    * by id magnitude, bit-replayable by the SQL oracle). Dominant
    * embedding modes (boilerplate templates, one over-crawled domain)
    * stop flooding the corpus because the QUOTA caps them, while rare
    * clusters keep everything they have — the quota, not a proportion,
    * is the diversity knob. Cost shape: one broadcast-assignment pass
    * over the corpus per Lloyd round + ONE per-cluster window — the
    * shuffle carries (id, cid, hash), never vectors. Returns
    * (id, cid, rank), rank 1..perCluster by the hash order. */
  def clusterBalancedSample(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, perCluster: Int): DataFrame = {
    require(perCluster >= 1)
    quotaRank(kmeansAssignments(df, idCol, vecCol, k, iters), perCluster)
  }

  /** [[clusterBalancedSample]] under PINNED centroids — the serving
    * shape the incremental maintenance composes against. */
  def clusterBalancedFromCentroids(df: DataFrame, idCol: String,
      vecCol: String, centroids: DataFrame, perCluster: Int): DataFrame = {
    require(perCluster >= 1)
    quotaRank(assignToCentroids(df, idCol, vecCol, centroids), perCluster)
  }

  /** The D213 quota over an (id, cid) assignment frame — TWO-STAGE so a
    * dominant cluster never lands whole in one task:
    *
    *  1. heap pre-filter ([[graft.functions.BottomK]], the D112
    *     discipline): `groupBy(cid)` with map-side partial heaps keeps
    *     the `perCluster` smallest (hash, id) rows per cluster; the
    *     shuffle carries ≤ perCluster rows per (map partition, cid) and
    *     the reduce merge touches ≤ perCluster·partitions rows per cid —
    *     never the cluster. The naive single window would sort a
    *     boilerplate-flooded cluster (a double-digit percent of a
    *     100 TB corpus) in ONE task.
    *  2. the exact `row_number` window — now over ≤ perCluster rows per
    *     cid (the completed heap's survivors), so its sort is trivially
    *     bounded.
    *
    * Provably hash-identical to the single-window form: (hash, id) is a
    * TOTAL order, so the global bottom-perCluster per cid is a pure
    * function of the data set and both plans keep exactly those rows
    * with the same dense ranks (ClusterBalanceSpec pins equality under
    * a 90%-dominant cluster; ScaleSmoke bounds the window input).
    *
    * The heap path needs integral ids (BottomK's primitive-long heap —
    * the same contract as D112); non-integral id frames fall back to
    * the exact single window, documented as not skew-hardened. */
  private def quotaRank(assign: DataFrame, perCluster: Int): DataFrame = {
    val hashed = assign
      .withColumn("__h", graft.llm.Dedup.portableWordHash(col("id")))
    val survivors = quotaSurvivors(hashed, perCluster)
    val w = Window.partitionBy("cid")
      .orderBy(col("__h").asc, col("id").asc)
    survivors
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= perCluster)
      .select(col("id"), col("cid"), col("rank"))
  }

  /** Stage 1 of [[quotaRank]]: the heap-pre-filtered (id, cid, __h)
    * survivor frame (≤ perCluster rows per cid for integral ids; the
    * unfiltered frame on the non-integral fallback). `private[graft]`
    * so ScaleSmoke can assert the final window's input bound. */
  private[graft] def quotaSurvivors(hashed: DataFrame,
      perCluster: Int): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType,
      ShortType}
    val integralId = hashed.schema("id").dataType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    if (!integralId) hashed
    else
      hashed.groupBy("cid")
        .agg(graft.functions.BottomK.bottomk(col("id").cast(LongType),
          col("__h"), perCluster).as("__keep"))
        .select(col("cid"), explode(col("__keep")).as("__r"))
        .select(col("__r.id").cast(hashed.schema("id").dataType)
            .as("id"),
          col("cid"), col("__r.v").as("__h"))
  }

  /** INCREMENTAL cluster-balanced sample maintenance (SURVEY §2D,
    * D215 — the D27/D131/D206 discipline applied to D213): a new batch
    * arrives, the trained centroids are PINNED (retraining would
    * re-shuffle every cluster), and only clusters that RECEIVE batch
    * members can change. Within an affected cluster the quota re-ranks
    * over `oldSample ∪ batch members` ONLY — exact, because the hash
    * order is static and the old sample is the cluster's top-quota: a
    * corpus member already outranked by quota survivors can never
    * re-enter when members are only ADDED. Cost is O(sample + batch);
    * the corpus is never rescanned. Unaffected clusters' rows carry
    * over byte-identical; require()d EQUAL to the from-scratch sample
    * over corpus ∪ batch under the same centroids (gate). */
  def clusterBalancedIncrement(oldSample: DataFrame, batch: DataFrame,
      idCol: String, vecCol: String, centroids: DataFrame,
      perCluster: Int): DataFrame = {
    require(perCluster >= 1)
    val batchAssign = assignToCentroids(batch, idCol, vecCol, centroids)
    val affected = batchAssign.select("cid").distinct()
    val rerank = quotaRank(
      oldSample.join(affected, Seq("cid"), "left_semi")
        .select(col("id"), col("cid"))
        .unionByName(batchAssign), perCluster)
    oldSample.join(affected, Seq("cid"), "left_anti")
      .unionByName(rerank)
      .select(col("id"), col("cid"), col("rank")) // stable column order
  }

  /** Triplet mining for contrastive/metric training (FaceNet's online
    * selection, public literature): per anchor, the HARD POSITIVE (the
    * least-similar same-label vector — the pair the model most needs to
    * pull together) and the HARD NEGATIVE (the most-similar
    * different-label vector — the imposter it most needs to push away),
    * plus the `active` flag (pos_cos − neg_cos < margin: the triplet
    * violates the margin and contributes gradient).
    *
    * Scale shape: anchors broadcast (a training batch — small by
    * construction), the corpus is scanned ONCE, and both extremes come
    * from a single map-side-combinable `min(struct(...))` aggregation
    * keyed by anchor — no window over the |corpus|·|anchors| score table,
    * no second scan for the negative side. Ties break to the smallest
    * neighbor id; cosines are rounded so the SQL oracle replays the
    * selection exactly. Anchors whose label has no other member (or no
    * other label) carry nulls on that side and an inactive flag. */
  def mineTriplets(anchors: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, labelCol: String, margin: Double = 0.2,
      roundDigits: Int = 4): DataFrame = {
    val a = anchors.select(col(idCol).as("anchor_id"),
        col(vecCol).as("qv"), col(labelCol).as("alabel"))
      .withColumn("_qn", sqrt(dot(col("qv"), col("qv"))))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("cv"),
        col(labelCol).as("nlabel"))
      .withColumn("_cn", sqrt(dot(col("cv"), col("cv"))))
    c.crossJoin(broadcast(a))
      .filter(col("nid") =!= col("anchor_id"))
      .withColumn("cos4", round(cosineWithNorms(col("cv"), col("_cn"),
        col("qv"), col("_qn")), roundDigits))
      .groupBy(col("anchor_id"))
      .agg(
        // min(struct) ≡ ORDER BY cos ASC, id ASC LIMIT 1 (hard positive);
        // negating the cosine turns the same min into the DESC extreme
        min(when(col("nlabel") === col("alabel"),
          struct(col("cos4").as("c"), col("nid").as("i")))).as("_p"),
        min(when(col("nlabel") =!= col("alabel"),
          struct((-col("cos4")).as("c"), col("nid").as("i")))).as("_n"))
      .select(col("anchor_id"),
        col("_p.i").as("pos_id"), col("_p.c").as("pos_cos4"),
        col("_n.i").as("neg_id"), (-col("_n.c")).as("neg_cos4"))
      .withColumn("active",
        when(col("pos_cos4") - col("neg_cos4") < margin, 1L).otherwise(0L))
  }

  /** Nearest-centroid (Rocchio) classification — the cheapest useful
    * embedding classifier, and the standard first probe of whether a
    * label is linearly recoverable from an embedding space: one centroid
    * per label (DECIMAL-exact component means, the [[kmeans]] discipline,
    * so distributed summation order cannot move a centroid and a SQL
    * oracle replays training), every vector assigned to the label of its
    * nearest centroid by rounded cosine. Returns the confusion matrix
    * (label, pred, n) — the evaluation artifact, data-size-independent.
    *
    * Scale shape: one (label, pos)-keyed mean aggregation (map-side
    * combinable, |labels|·dim groups), one broadcast of |labels|
    * centroids, one id-keyed window for the argmax, one confusion
    * aggregation — vectors shuffle only on their own id. */
  def nearestCentroidClassify(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val pts = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"), col(labelCol).as("label"))
    val cents = pts
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(round(sum(col("x").cast(DecimalType(18, 8)))
        .cast(DoubleType) / count(lit(1)), 6).as("m"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"),
        col("m")))), s => s.getField("m")).as("cv"))
      .select(col("label").as("clabel"), col("cv"))
    val w = Window.partitionBy("id")
      .orderBy(col("cos4").desc, col("clabel").asc)
    pts.crossJoin(broadcast(cents))
      .withColumn("cos4", round(dotHof(col("v"), col("cv")) /
        (sqrt(dotHof(col("v"), col("v"))) *
         sqrt(dotHof(col("cv"), col("cv")))), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("label"), col("clabel").as("pred"))
      .agg(count(lit(1)).as("n"))
  }

  /** Johnson-Lindenstrauss random projection (Achlioptas ±1 construction —
    * public result): project `dim`-d float vectors to `outDim` components,
    * `p_j = dot(v, s_j) / sqrt(outDim)`, with the deterministic ±1 sign
    * matrix from [[graft.llm.Dedup.portablePlanes]] (the same LCG family
    * the sign-LSH path uses, so both engines can replay it exactly).
    *
    * Scale shape: the sign matrix is a driver-side literal broadcast into
    * the plan (outDim×dim doubles — bytes, not data); the projection is a
    * pure per-row map inside codegen, zero shuffles at any corpus size.
    * This is the standard pre-step that cuts ANN/clustering cost by
    * dim/outDim while approximately preserving pairwise distances.
    * Returns one row per (id, proj_id) with the ROUNDED component. */
  def jlProject(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, outDim: Int, roundDigits: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val signs = Dedup.portablePlanes(outDim, dim).zipWithIndex
      .map { case (s, j) => (j, s.map(_.toFloat)) }.toDF("proj_id", "s")
    df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(signs))
      .select(col("id"), col("proj_id"),
        round(dot(col("v"), col("s")) / math.sqrt(outDim.toDouble),
          roundDigits).as("p4"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023 — public
    * paper): cluster the corpus by the IVF coarse quantizer, then drop,
    * within each cluster, every vector that has a ≥ `tau` cosine neighbor
    * with a smaller id (greedy keep-first — a deterministic stand-in for
    * the paper's keep-one-per-dup-group choice).
    *
    * Scale shape: the pairwise step runs WITHIN clusters only — one
    * shuffle keyed by `list_id`, cost O(Σ sᵢ²) bounded by the largest
    * cluster, the same bucket-bound discipline as the sign-LSH near-dup
    * path ([[graft.llm.Dedup.embeddingNearDup]]). At 100 TB raise `nlist`
    * (clusters shrink linearly) or cap cluster size with
    * `Dedup.cappedBuckets` before pairing; norms are computed once per
    * vector and reused for every pair. Cosines compare on `roundDigits`
    * decimals so cross-engine fp noise cannot flip a drop decision.
    * Returns (id, list_id, dropped). */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int = ScaleConfig.Auto, tau: Double = 0.9,
      roundDigits: Int = 4): DataFrame = {
    // nlist-less default: size the IVF grid from the corpus count and
    // the default pair budget (ScaleConfig's uniform-shard model) —
    // the one count() job only runs in the auto path
    val nl = if (nlist != ScaleConfig.Auto) nlist
      else ScaleConfig.nlistFor(df.count(), ScaleConfig.DefaultPairBudget)
    val assigned = ivfAssign(df, idCol, vecCol, nl)
    val a = assigned.select(col("list_id"), col(idCol).as("id1"),
      col(vecCol).as("v1"), col(NormCol).as("n1"))
    val b = assigned.select(col("list_id"), col(idCol).as("id2"),
      col(vecCol).as("v2"), col(NormCol).as("n2"))
    val dropped = a.join(b, "list_id")
      .filter(col("id1") < col("id2"))
      .withColumn("cos", round(cosineWithNorms(col("v1"), col("n1"),
        col("v2"), col("n2")), roundDigits))
      .filter(col("cos") >= tau)
      .select(col("id2").as("id")).distinct()
    assigned.select(col(idCol).as("id"), col("list_id"))
      .join(dropped.withColumn("dropped", lit(1)), Seq("id"), "left")
      .select(col("id"), col("list_id"),
        coalesce(col("dropped"), lit(0)).as("dropped"))
  }

  /** One reranker candidate: relevance already scored and rounded. */
  final case class MmrCand(query_id: Long, id: Long, rel4: Double,
      v: Seq[Double])
  /** One MMR pick: position `rank`'s selection and its objective —
    * emitted at roundDigits+1 decimals: with λ = 0.5 the objective is
    * 0.5·(a − b) over roundDigits-decimal inputs, which carries EXACTLY
    * one more decimal digit, so the +1 rounding is the identity — a
    * 4-digit emit would round a guaranteed .5 tie, where engines'
    * double-rounding algorithms legitimately diverge. */
  final case class MmrPick(query_id: Long, id: Long, rank: Int,
      mmr5: Double)

  /** Maximal-marginal-relevance reranking (SURVEY §2D, D222 —
    * Carbonell & Goldstein, SIGIR 1998): from each query's candidate
    * list, greedily select k items maximizing
    * `λ·rel − (1−λ)·max_{s∈selected} cos(v, v_s)` — relevance traded
    * against redundancy with what is already picked, the standard
    * diversity pass between retrieval and a context window. Ties break
    * to the smaller id; rank 1 (empty selected set) scores `λ·rel`.
    *
    * Scale shape: the greedy is inherently sequential PER QUERY, so it
    * runs inside `flatMapGroups` over query-keyed groups — the
    * sanctioned per-partition-imperative case: each group is a
    * RETRIEVER OUTPUT (tens of candidates by construction, never the
    * corpus), so the O(k·n·|selected|) loop touches k·n bounded rows
    * per query and queries parallelize freely. Cosines round to
    * `roundDigits` (HALF_UP — Spark's own round semantics) before the
    * objective, and the dot/norm folds run left-to-right, so the SQL
    * oracle replays every selection bit-for-bit. */
  def mmrRerank(candidates: DataFrame, queryCol: String, idCol: String,
      relCol: String, vecCol: String, k: Int, lambda: Double,
      roundDigits: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda in [0,1], got $lambda")
    val spark = candidates.sparkSession
    import spark.implicits._
    val typed = candidates.select(
      col(queryCol).cast(LongType).as("query_id"),
      col(idCol).cast(LongType).as("id"),
      col(relCol).cast(DoubleType).as("rel4"),
      col(vecCol).cast("array<double>").as("v")).as[MmrCand]
    val mu = 1.0 - lambda // the exact double the oracle must replay
    typed.groupByKey(_.query_id).flatMapGroups { (qid, it) =>
      def r4(x: Double): Double = BigDecimal(x)
        .setScale(roundDigits, BigDecimal.RoundingMode.HALF_UP).toDouble
      def cos4(a: Seq[Double], b: Seq[Double]): Double = {
        var i = 0; var d = 0.0; var na = 0.0; var nb = 0.0
        while (i < a.length) {
          d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
        }
        r4(d / (math.sqrt(na) * math.sqrt(nb)))
      }
      val remaining = scala.collection.mutable.ArrayBuffer(
        it.toArray.sortBy(c => (c.id)): _*)
      // validate on entry so the failure NAMES the bad input: a
      // zero-norm vector makes cos = 0/0 = NaN and a NaN relevance
      // poisons every score — both would otherwise die opaquely deep
      // inside the greedy loop (BigDecimal(NaN) / remove(-1))
      remaining.foreach { c =>
        require(!c.rel4.isNaN,
          s"mmrRerank: NaN relevance for query=$qid id=${c.id}")
        require(!c.v.exists(_.isNaN),
          s"mmrRerank: NaN vector component for query=$qid id=${c.id}")
        require(c.v.exists(_ != 0.0),
          s"mmrRerank: zero-norm vector for query=$qid id=${c.id}")
      }
      val selected = scala.collection.mutable.ArrayBuffer.empty[MmrCand]
      val out = scala.collection.mutable.ArrayBuffer.empty[MmrPick]
      var rank = 1
      while (rank <= k && remaining.nonEmpty) {
        var bi = -1; var bScore = Double.NegativeInfinity
        var bId = Long.MaxValue
        var i = 0
        while (i < remaining.length) {
          val c = remaining(i)
          var ms = if (selected.isEmpty) 0.0 else Double.NegativeInfinity
          selected.foreach { s =>
            val cs = cos4(c.v, s.v); if (cs > ms) ms = cs
          }
          val score = lambda * c.rel4 - mu * ms
          if (score > bScore || (score == bScore && c.id < bId)) {
            bi = i; bScore = score; bId = c.id
          }
          i += 1
        }
        val pick = remaining.remove(bi)
        selected += pick
        out += MmrPick(qid, pick.id, rank, BigDecimal(bScore)
          .setScale(roundDigits + 1, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
        rank += 1
      }
      out.iterator
    }.toDF()
  }
}
