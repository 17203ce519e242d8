package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.llm.{Dedup, Similarity, TextAnalysis}
import Q._

/** Round-4 retrieval / tokenizer-training / sampling additions: BM25
  * scoring, inverted-index postings, BPE merge-pair statistics, JL random
  * projection, and exact stratified sampling — each paired with a DuckDB
  * oracle and shaped for 100 TB (vocabulary-pruned shuffles, capped
  * aggregation state, broadcast sign matrices, per-stratum windows).
  */
object RetrievalQueries {


  /** Fixed BM25 query set over the synthetic corpus vocabulary. */
  private val Bm25Queries = Seq(
    1 -> Seq("hash", "join"),
    2 -> Seq("scan", "filter", "column"),
    3 -> Seq("stream", "window"))

  /** JL sign matrix shared by the Spark plan and the oracle (8×64 ±1). */
  private val JlPlanes = Dedup.portablePlanes(8, 64)

  /** Multi-probe bucket planes: 6 planes = 64 buckets — coarse enough
    * that a 3-flip probe set covers a useful candidate fraction at the
    * gate corpus size (recall floor require()d in the gate). */
  private val MpPlanes = Dedup.portablePlanes(6, 64)

  /** kNN-graph plane tables: FOUR independent 5-plane matrices (32
    * buckets each) — drawn from one portable stream, split per table,
    * so both engines replay them as literals. Four coarse tables beat
    * two fine ones for GRAPH recall: every node needs candidates, so
    * coverage (union of its buckets) is the knob, and the per-bucket
    * cap keeps the pair count bounded as the corpus grows. */
  private val KnnTables: Seq[Seq[Seq[Double]]] =
    Dedup.portablePlanes(20, 64).grouped(5).toSeq

  /** The shared D202 CTE chain: the full capped-LSH kNN graph replayed
    * in SQL from the pinned plane tables, ending at `ranked`. */
  private def knnGraphCtes: String = {
    def dotLit(v: String, cs: Seq[Double]): String =
      dotSql(v, cs.mkString("[", ", ", "]"))
    def bucket(planes: Seq[Seq[Double]]): String =
      planes.zipWithIndex.map { case (cs, p) =>
        s"(CASE WHEN ${dotLit("v", cs)} > 0 THEN ${1 << p} ELSE 0 END)"
      }.mkString(" + ")
    val bSql = KnnTables.zipWithIndex.map { case (planes, t) =>
      s"SELECT $t AS tbl, ${bucket(planes)} AS bucket, id, v FROM e"
    }.mkString("\n            UNION ALL\n            ")
    s"""
      WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
                 FROM embeddings),
      b AS ($bSql),
      capped AS (
        SELECT tbl, bucket, id FROM (
          SELECT tbl, bucket, id,
                 row_number() OVER (PARTITION BY tbl, bucket
                   ORDER BY id) AS rn
          FROM b) WHERE rn <= 64),
      cand AS (
        SELECT DISTINCT a.id AS src_id, c.id AS dst_id
        FROM capped a JOIN capped c
          ON a.tbl = c.tbl AND a.bucket = c.bucket AND a.id <> c.id),
      scored AS (
        SELECT cand.src_id, cand.dst_id,
               round(${dotSql("s.v", "d.v")} /
                 (sqrt(${dotSql("s.v", "s.v")}) *
                  sqrt(${dotSql("d.v", "d.v")})), 4) AS cosine4
        FROM cand JOIN e s ON s.id = cand.src_id
                  JOIN e d ON d.id = cand.dst_id),
      ranked AS (
        SELECT src_id, dst_id, cosine4,
               row_number() OVER (PARTITION BY src_id
                 ORDER BY cosine4 DESC, dst_id ASC) AS rank
        FROM scored)"""
  }

  /** D222 oracle: the MMR greedy UNROLLED — stage i scores every
    * unselected candidate against sel_{i-1} (max cosine over the
    * selected set) and picks the per-query arg-max under (score DESC,
    * id ASC); λ = 1−λ = 0.5 are exact doubles, dot/norm folds run the
    * engine-shared left-to-right shape, so every pick and score
    * replays bit-for-bit. */
  private def mmrOracle(k: Int): String = {
    def cos(a: String, b: String) =
      s"round(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * " +
        s"sqrt(${dotSql(b, b)})), 4)"
    val stages = (2 to k).map { i =>
      s""",
      p$i AS (
        SELECT c.query_id, c.id, c.rel4,
               0.5 * c.rel4 - 0.5 * max(s.s4) AS score
        FROM cands c
        JOIN sim s ON s.query_id = c.query_id AND s.ia = c.id
        JOIN sel${i - 1} t ON t.query_id = s.query_id AND t.id = s.ib
        WHERE NOT EXISTS (SELECT 1 FROM sel${i - 1} x
                          WHERE x.query_id = c.query_id
                            AND x.id = c.id)
        GROUP BY c.query_id, c.id, c.rel4),
      pick$i AS (SELECT query_id, id, score FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY score DESC, id) AS rn FROM p$i) WHERE rn = 1),
      sel$i AS (SELECT query_id, id FROM sel${i - 1}
                UNION ALL SELECT query_id, id FROM pick$i)"""
    }.mkString
    val union = (1 to k).map(i =>
      s"SELECT query_id, id, $i AS rank, round(score, 5) AS mmr5 " +
        s"FROM pick$i").mkString("\n        UNION ALL\n        ")
    s"""
      WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                 FROM embeddings WHERE vec_id % 100 = 0),
      c0 AS (SELECT q.query_id, e.vec_id AS id,
               ${cos("q.qv", "e.embedding")} AS rel4,
               e.embedding AS v
             FROM q JOIN embeddings e ON e.vec_id <> q.query_id),
      cands AS (SELECT query_id, id, rel4, v FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY rel4 DESC, id) AS rn FROM c0) WHERE rn <= 20),
      sim AS (SELECT a.query_id, a.id AS ia, b.id AS ib,
                ${cos("a.v", "b.v")} AS s4
              FROM cands a JOIN cands b
                ON a.query_id = b.query_id AND a.id <> b.id),
      p1 AS (SELECT query_id, id, 0.5 * rel4 AS score FROM cands),
      pick1 AS (SELECT query_id, id, score FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY score DESC, id) AS rn FROM p1) WHERE rn = 1),
      sel1 AS (SELECT query_id, id FROM pick1)$stages
      SELECT * FROM (
        $union)
      ORDER BY query_id, rank"""
  }

  /** D202/D206 oracle: the graph's edge list, optionally sliced. */
  private def knnGraphOracle(extraWhere: String): String =
    s"""$knnGraphCtes
      SELECT src_id, dst_id, cosine4, CAST(rank AS INT) AS rank
      FROM ranked WHERE rank <= 5 $extraWhere ORDER BY src_id, rank"""

  /** D210/D210+ oracle: `rounds` UNROLLED NN-Descent rounds over the
    * D202 graph — per round: undirected neighborhoods, neighbor-of-
    * neighbor candidates ∪ current edges, exact re-rank, same
    * tiebreak. Safe as a CONVERGENCE oracle: once the recurrence hits
    * its fixed point, further unrolled rounds are no-ops, so replaying
    * exactly `maxRounds` rounds equals the operator whether it stopped
    * early (converged) or ran the full budget. */
  private def knnRoundsOracle(rounds: Int): String = {
    val sb = new StringBuilder(knnGraphCtes)
    sb.append(""",
      g0 AS (SELECT src_id, dst_id, cosine4, rank
             FROM ranked WHERE rank <= 5)""")
    for (r <- 1 to rounds) {
      val p = s"g${r - 1}"
      sb.append(s""",
      und$r AS (SELECT src_id, dst_id FROM $p
                UNION SELECT dst_id, src_id FROM $p),
      cand$r AS (
        SELECT a.src_id, b.dst_id
        FROM und$r a JOIN und$r b ON a.dst_id = b.src_id
        WHERE a.src_id <> b.dst_id
        UNION SELECT src_id, dst_id FROM $p),
      scored$r AS (
        SELECT cand$r.src_id, cand$r.dst_id,
               round(${dotSql("s.v", "d.v")} /
                 (sqrt(${dotSql("s.v", "s.v")}) *
                  sqrt(${dotSql("d.v", "d.v")})), 4) AS cosine4
        FROM cand$r JOIN e s ON s.id = cand$r.src_id
                    JOIN e d ON d.id = cand$r.dst_id),
      g$r AS (
        SELECT src_id, dst_id, cosine4, rank FROM (
          SELECT src_id, dst_id, cosine4,
                 row_number() OVER (PARTITION BY src_id
                   ORDER BY cosine4 DESC, dst_id ASC) AS rank
          FROM scored$r) WHERE rank <= 5)""")
    }
    sb.append(s"""
      SELECT src_id, dst_id, cosine4, CAST(rank AS INT) AS rank
      FROM g$rounds ORDER BY src_id, rank""")
    sb.toString
  }

  private def knnRefineOracle: String = knnRoundsOracle(1)

  /** Shared D83 Lloyd CTE chain (2 rounds, k=8 over `embeddings`):
    * ends at `af` (final assignment) and `c2` (trained centroids) —
    * sim_kmeans and llm_cluster_balance both replay it. The
    * `trainWhere` form trains on a SUB-corpus (`et`) but assigns the
    * WHOLE table in `af` — the pinned-centroid shape the incremental
    * gate replays. */
  private def kmeansCtes: String = kmeansCtesWhere("")

  private def kmeansCtesWhere(trainWhere: String): String = {
    def assignSql(src: String, cents: String): String = s"""
        SELECT id, v, cid FROM (
          SELECT e.id, e.v, c.cid,
                 row_number() OVER (PARTITION BY e.id ORDER BY
                   round(${dotSql("e.v", "c.cv")} /
                     (sqrt(${dotSql("e.v", "e.v")}) *
                      sqrt(${dotSql("c.cv", "c.cv")})), 4) DESC,
                   c.cid) AS rn
          FROM $src e CROSS JOIN $cents c) WHERE rn = 1"""
    def meanSql(assigned: String): String = s"""
        SELECT cid, list(m ORDER BY i) AS cv FROM (
          SELECT cid, i,
                 round(CAST(sum(CAST(v[CAST(i AS INT)] AS DECIMAL(18,8)))
                   AS DOUBLE) / count(*), 6) AS m
          FROM $assigned CROSS JOIN (SELECT unnest(range(1, 65)) AS i) t
          GROUP BY cid, i) GROUP BY cid"""
    s"""
      WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
                 FROM embeddings),
      et AS (SELECT * FROM e $trainWhere),
      c0 AS (SELECT id AS cid, v AS cv FROM et ORDER BY id LIMIT 8),
      a1 AS (${assignSql("et", "c0")}),
      c1 AS (${meanSql("a1")}),
      a2 AS (${assignSql("et", "c1")}),
      c2 AS (${meanSql("a2")}),
      af AS (${assignSql("e", "c2")})"""
  }

  /** Shared ranker CTE chain (DuckDB): corpus stats + the BM25 and
    * query-likelihood ranking pipelines over `Bm25Queries`. The three
    * retrieval oracles (text_bm25 / text_ql / text_rrf) each SELECT from a
    * different stage of the same chain — DuckDB prunes the unreferenced
    * CTEs, and sharing the text keeps the chains from drifting apart. */
  private def rankerCtes: String = s"""
      words AS (SELECT doc_id AS id,
                  unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
                FROM documents),
      doclen AS (SELECT id, count(*) AS dl FROM words GROUP BY 1),
      stats AS (SELECT count(*) AS n_docs, sum(dl) AS tot_len FROM doclen),
      tot AS (SELECT count(*) AS tc FROM words),
      qt AS (SELECT * FROM (VALUES ${Bm25Queries.flatMap { case (q, ts) =>
        ts.map(t => s"($q, '$t')") }.mkString(", ")}) AS t(query_id, w)),
      tf AS (SELECT id, w, count(*) AS tf FROM words
             WHERE w IN (SELECT w FROM qt) GROUP BY 1, 2),
      dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
      cf AS (SELECT w, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
      bm25c AS (
        SELECT qt.query_id, tf.id,
               CAST(round(ln(1.0 + (stats.n_docs - dfreq.df + 0.5) /
                     (dfreq.df + 0.5)) * tf.tf * 2.2 /
                     (tf.tf + 1.2 * (0.25 + 0.75 * doclen.dl /
                       (CAST(stats.tot_len AS DOUBLE) / stats.n_docs))), 6)
                 AS DECIMAL(18,6)) AS c6
        FROM tf JOIN dfreq USING (w) JOIN qt USING (w)
             JOIN doclen ON doclen.id = tf.id CROSS JOIN stats),
      bm25s AS (SELECT query_id, id,
                  round(CAST(sum(c6) AS DOUBLE), 4) AS score4
                FROM bm25c GROUP BY 1, 2),
      bm25r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY score4 DESC, id) AS rnk FROM bm25s),
      qlcand AS (SELECT DISTINCT qt.query_id, tf.id
                 FROM tf JOIN qt USING (w)),
      qlpairs AS (SELECT c.query_id, c.id, q.w
                  FROM qlcand c JOIN qt q USING (query_id)),
      qlc AS (
        SELECT p.query_id, p.id,
               CAST(round(ln((COALESCE(tf.tf, 0) + 100.0 *
                     (CAST(cf.cf AS DOUBLE) / tot.tc)) /
                     (doclen.dl + 100.0)), 6) AS DECIMAL(18,6)) AS c6
        FROM qlpairs p
        LEFT JOIN tf ON tf.id = p.id AND tf.w = p.w
        JOIN cf ON cf.w = p.w
        JOIN doclen ON doclen.id = p.id
        CROSS JOIN tot),
      qls AS (SELECT query_id, id,
                round(CAST(sum(c6) AS DOUBLE), 4) AS score4
              FROM qlc GROUP BY 1, 2),
      qlr AS (SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY score4 DESC, id) AS rnk FROM qls)"""

  val defs: Map[String, Entry] = Map(

    // BM25 top-10 per query (TextAnalysis.bm25TopK): corpus pruned to the
    // query vocabulary BEFORE the tf shuffle; df/query list broadcast;
    // per-term contributions decimal-summed so ranks replay cross-engine
    "text_bm25" -> (((spark, dir) => {
      TextAnalysis.bm25TopK(load(spark, dir, "documents"), "doc_id", "text",
          Bm25Queries, k = 10)
        .withColumnRenamed("id", "doc_id")
        .orderBy("query_id", "rnk")
    }, Some(s"""
      WITH $rankerCtes
      SELECT query_id, CAST(rnk AS INT) AS rnk, id AS doc_id, score4
      FROM bm25r WHERE rnk <= 10 ORDER BY query_id, rnk"""))),

    // Query-likelihood (Dirichlet, mu=100) top-10: candidates restricted
    // to docs holding >= 1 query term (inverted-index discipline); missing
    // terms smooth through tf=0 against broadcast collection stats
    "text_ql" -> (((spark, dir) => {
      TextAnalysis.queryLikelihoodTopK(load(spark, dir, "documents"),
          "doc_id", "text", Bm25Queries, k = 10)
        .withColumnRenamed("id", "doc_id")
        .orderBy("query_id", "rnk")
    }, Some(s"""
      WITH $rankerCtes
      SELECT query_id, CAST(rnk AS INT) AS rnk, id AS doc_id, score4
      FROM qlr WHERE rnk <= 10 ORDER BY query_id, rnk"""))),

    // Reciprocal-rank fusion of the BM25 and QL top-20 lists (k=60):
    // union + one aggregation, 8dp-decimal contributions — no outer join
    "text_rrf" -> (((spark, dir) => {
      val docs = load(spark, dir, "documents")
      TextAnalysis.rrfFuse(
          TextAnalysis.bm25TopK(docs, "doc_id", "text", Bm25Queries, k = 20),
          TextAnalysis.queryLikelihoodTopK(docs, "doc_id", "text",
            Bm25Queries, k = 20),
          kConst = 60, k = 10)
        .withColumnRenamed("id", "doc_id")
        .orderBy("query_id", "rnk")
    }, Some(s"""
      WITH $rankerCtes,
      rrfc AS (
        SELECT query_id, id, CAST(round(1.0 / (60 + rnk), 8)
                 AS DECIMAL(18,8)) AS c8
        FROM bm25r WHERE rnk <= 20
        UNION ALL
        SELECT query_id, id, CAST(round(1.0 / (60 + rnk), 8)
                 AS DECIMAL(18,8)) AS c8
        FROM qlr WHERE rnk <= 20),
      rrfs AS (SELECT query_id, id,
                 round(CAST(sum(c8) AS DOUBLE), 6) AS fused6
               FROM rrfc GROUP BY 1, 2),
      rrfr AS (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY fused6 DESC, id) AS rnk FROM rrfs)
      SELECT query_id, CAST(rnk AS INT) AS rnk, id AS doc_id, fused6
      FROM rrfr WHERE rnk <= 10 ORDER BY query_id, rnk"""))),

    // Per-source score calibration: percent_rank of the (pushdown-pruned)
    // n_chars quality proxy within each source — makes scores comparable
    // across domains before a global curation cut. One source-keyed window.
    "llm_calibrate" -> (((spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
      load(spark, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
        .withColumn("pct6", round(percent_rank().over(w), 6))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id, source, n_chars,
             round(percent_rank() OVER (PARTITION BY source
               ORDER BY n_chars, doc_id), 6) AS pct6
      FROM documents ORDER BY doc_id"""))),

    // Inverted-index posting heads (TextAnalysis.invertedIndex): per-term
    // df + first-16 sorted doc ids; the cap applies BEFORE collect, so
    // aggregation state is bounded on stopword-hot terms
    "text_postings" -> (((spark, dir) => {
      TextAnalysis.invertedIndex(load(spark, dir, "documents"),
          "doc_id", "text", maxPostings = 16)
        .orderBy("term")
    }, Some("""
      WITH pairs AS (SELECT DISTINCT
                       unnest(string_split_regex(lower(trim(text)), '\s+'))
                         AS w,
                       doc_id AS id
                     FROM documents),
      dfq AS (SELECT w, count(*) AS df FROM pairs GROUP BY 1),
      capped AS (SELECT w, id, row_number() OVER (PARTITION BY w
                   ORDER BY id) AS rn FROM pairs),
      heads AS (SELECT w, string_agg(CAST(id AS VARCHAR), ','
                  ORDER BY id) AS head_csv
                FROM capped WHERE rn <= 16 GROUP BY 1)
      SELECT d.w AS term, d.df, h.head_csv
      FROM dfq d JOIN heads h USING (w) ORDER BY term"""))),

    // BPE merge-pair statistics (TextAnalysis.bpePairStats): adjacent char
    // pairs weighted by word frequency, counted over the DISTINCT
    // vocabulary (pair explosion runs per vocab entry, not per token)
    "text_bpe_pairs" -> (((spark, dir) => {
      TextAnalysis.bpePairStats(load(spark, dir, "documents"), "text",
        topK = 40)
    }, Some("""
      WITH vocab AS (
        SELECT w, count(*) AS wc FROM (
          SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
          FROM documents)
        GROUP BY 1 HAVING length(w) >= 2),
      pairs AS (
        SELECT unnest(list_transform(range(1, length(w)),
                 i -> w[CAST(i AS INT):CAST(i AS INT)+1])) AS pair, wc
        FROM vocab)
      SELECT pair, CAST(sum(wc) AS BIGINT) AS n_pair FROM pairs
      GROUP BY 1 ORDER BY n_pair DESC, pair LIMIT 40"""))),

    // JL ±1 random projection (Similarity.jlProject): 64-d float vectors
    // to 8 components against the shared portablePlanes sign matrix —
    // broadcast literal matrix, zero shuffles, strict-fold dot products
    "sim_jl" -> (((spark, dir) => {
      Similarity.jlProject(load(spark, dir, "embeddings"),
          "vec_id", "embedding", dim = 64, outDim = 8)
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id", "proj_id")
    }, Some {
      val unions = JlPlanes.zipWithIndex.map { case (s, j) =>
        s"SELECT vec_id, $j AS proj_id, " +
          s"round(${dotSql("v", s.mkString("[", ", ", "]"))} / sqrt(8.0), 4)" +
          " AS p4 FROM base"
      }.mkString(" UNION ALL ")
      s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v
                        FROM embeddings)
          $unions ORDER BY vec_id, proj_id"""
    })),

    // D137 — multi-probe sign-LSH ANN (Lv et al. 2007): the query-TIME
    // recall knob — each query probes its own sign bucket PLUS the nflip
    // buckets across its least-confident hyperplanes (smallest
    // |projection|), against the SAME one-bucket-per-vector corpus table
    // a single-probe scan uses (zero extra index state, where multi-TABLE
    // LSH multiplies it). Corpus bucketing is a per-row projection (no
    // shuffle); the (nflip+1)·|queries| probe list broadcasts to the
    // bucket join. The oracle replays projections, the confidence sort,
    // the XOR probe set, and the ranking; the gate also require()s that
    // multi-probe recalls strictly more candidates than single-probe
    // would rank identically only by luck — via a recall floor vs brute
    // force, the sim_recall harness contract.
    // D222 — MMR diversity reranking (Similarity.mmrRerank, Carbonell
    // & Goldstein 1998): per query, the brute-force top-20 candidates
    // greedily re-select by λ·rel − (1−λ)·max-sim-to-selected (λ=0.5 —
    // both multipliers exact doubles), ties to the smaller id. The
    // greedy runs per-query inside flatMapGroups (bounded retriever
    // output, the sanctioned imperative case); the oracle UNROLLS all
    // five selection stages in SQL and replays every pick and score.
    "sim_mmr" -> (((spark, dir) => {
      val emb = load(spark, dir, "embeddings")
      val queries = emb.filter(pmod(col("vec_id"), lit(100)) === 0)
      val cands = Similarity.bruteForceTopK(queries, emb, "vec_id",
          "embedding", k = 20, roundDigits = Some(4))
        .select(col("query_id"), col("neighbor_id").as("id"),
          col("cosine").as("rel4"))
        .join(emb.select(col("vec_id").as("id"),
          col("embedding").as("v")), "id")
      val picks = Similarity.mmrRerank(cands, "query_id", "id", "rel4",
        "v", k = 5, lambda = 0.5).localCheckpoint()
      Q.Phase.opDone() // the diversity proof below is PROOF
      // the diversity property itself: the MMR set's mean pairwise
      // similarity must not exceed the top-k-by-relevance set's (the
      // whole point of the pass) — checked corpus-wide in one action
      val topk = cands.withColumn("rn",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy("query_id")
            .orderBy(col("rel4").desc, col("id").asc)))
        .filter(col("rn") <= 5).select(col("query_id"), col("id"))
      def meanPairSim(sel: org.apache.spark.sql.DataFrame): Double = {
        val v = cands.select(col("query_id"), col("id"), col("v"))
        val s = sel.join(v, Seq("query_id", "id"))
        s.as("a").join(s.as("b"),
            col("a.query_id") === col("b.query_id") &&
              col("a.id") < col("b.id"))
          .select(round(Similarity.dot(col("a.v"), col("b.v")) /
            (sqrt(Similarity.dot(col("a.v"), col("a.v"))) *
              sqrt(Similarity.dot(col("b.v"), col("b.v")))), 4).as("s"))
          .agg(avg(col("s"))).head().getDouble(0)
      }
      require(meanPairSim(picks.select("query_id", "id")) <=
        meanPairSim(topk) + 1e-12,
        "MMR must not be LESS diverse than pure relevance top-k")
      picks.orderBy("query_id", "rank")
    }, Some(mmrOracle(5)))),

    "sim_multiprobe" -> (((spark, dir) => {
      val emb = load(spark, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
      // nflip=6 covers the full Hamming-1 shell; pairDepth=3 adds the 3
      // pairwise (Hamming-2) probes of the least-confident planes — 10
      // probes of 64 buckets, sized so the recall floor holds as the
      // corpus grows (4 probes measured 0.138 recall at sf0.1; the knob
      // exists precisely to be turned at query time)
      val mp = Similarity.multiProbeTopK(q, emb, "vec_id", "embedding",
        MpPlanes, nflip = 6, k = 10, pairDepth = 3)
      val bf = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding",
          k = 10, roundDigits = Some(4))
        .select(col("query_id"), col("neighbor_id"))
        .withColumn("hit", lit(1))
      val recall = mp.join(bf, Seq("query_id", "neighbor_id"), "left")
        .agg((sum(coalesce(col("hit"), lit(0))) / count(lit(1)))
          .cast("double")).head().getDouble(0)
      require(recall >= 0.20,
        f"multi-probe recall@10 vs brute force = $recall%.3f — under the " +
          "0.20 floor; raise nflip or planes")
      mp.orderBy("query_id", "rank")
    }, Some {
      def dotLit(v: String, cs: Seq[Double]): String =
        dotSql(v, cs.mkString("[", ", ", "]"))
      val bucket = MpPlanes.zipWithIndex.map { case (cs, p) =>
        s"(CASE WHEN ${dotLit("v", cs)} > 0 THEN ${1 << p} ELSE 0 END)"
      }.mkString(" + ")
      val flipStructs = MpPlanes.zipWithIndex.map { case (cs, p) =>
        s"{'a': abs(${dotLit("v", cs)}), 'm': ${1 << p}}"
      }.mkString("[", ", ", "]")
      s"""
      WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
                 FROM embeddings),
      cb AS (SELECT id, v, $bucket AS bucket FROM e),
      qp AS (SELECT id AS query_id, v AS qv, $bucket AS b0,
                    list_sort($flipStructs) AS fl
             FROM e WHERE id < 8),
      pr AS (SELECT query_id, qv,
                    unnest(list_concat(
                      list_prepend(b0,
                        list_transform(fl[1:6], f -> xor(b0, f.m))),
                      [xor(b0, fl[1].m + fl[2].m),
                       xor(b0, fl[1].m + fl[3].m),
                       xor(b0, fl[2].m + fl[3].m)])) AS probe
             FROM qp),
      cand AS (
        SELECT pr.query_id, cb.id AS neighbor_id,
               round(${dotSql("pr.qv", "cb.v")} /
                 (sqrt(${dotSql("pr.qv", "pr.qv")}) *
                  sqrt(${dotSql("cb.v", "cb.v")})), 4) AS cosine4
        FROM pr JOIN cb ON cb.bucket = pr.probe
        WHERE cb.id <> pr.query_id),
      ranked AS (
        SELECT query_id, neighbor_id, cosine4,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine4 DESC, neighbor_id ASC) AS rank
        FROM cand)
      SELECT query_id, neighbor_id, cosine4, CAST(rank AS INT) AS rank
      FROM ranked WHERE rank <= 10 ORDER BY query_id, rank"""
    })),

    // D202 — bounded kNN-GRAPH construction (Similarity.knnGraph): the
    // all-nodes neighbor structure graph dedup/clustering builds on.
    // Candidates from TWO independent sign-LSH tables with
    // deterministic per-bucket caps (NEVER all-pairs — the candidate
    // count is require()d under the tables·buckets·cap·(cap−1) bound,
    // the invariant that holds at ANY corpus size), exact rounded
    // cosine on candidates only, per-node top-k heap. Recall vs brute
    // force require()d; the full edge list oracled by replaying the
    // pinned plane tables in SQL.
    "sim_knn_graph" -> (((spark, dir) => {
      val emb = load(spark, dir, "embeddings")
      val cap = 64
      // ScaleConfig derivation pin (r13): the default cap 64 is a
      // DEFAULT, not law — given the budget today's constant spends on
      // the MEASURED bucket histogram (one count agg), the derived cap
      // must reproduce its behavior exactly. Equal pair cost forces
      // equal per-bucket member counts (termwise-monotone sum), and
      // deterministic admission makes equal counts the identical
      // membership — so cost equality IS bit-for-bit reproduction.
      val hist = graft.llm.ScaleConfig.bucketHistogram(emb, "vec_id",
        "embedding", KnnTables)
      val derived = graft.llm.ScaleConfig.bucketCapFor(hist,
        graft.llm.ScaleConfig.pairCost(hist, cap))
      require(derived <= cap &&
        graft.llm.ScaleConfig.pairCost(hist, derived) ==
          graft.llm.ScaleConfig.pairCost(hist, cap),
        s"derived cap $derived must spend exactly what cap $cap spends " +
          "on this corpus — the budget derivation drifted")
      // candidates materialize ONCE: the cap-bound check and the graph
      // share them (the bucket self-join is the expensive stage)
      val cand = Similarity.knnCandidates(emb, "vec_id", "embedding",
        KnnTables, bucketCap = cap).localCheckpoint()
      val bound = KnnTables.size.toLong * 32 * cap * (cap - 1)
      val nCand = cand.count()
      require(nCand <= bound && nCand > 0,
        s"candidate pairs $nCand must stay under the cap bound $bound")
      val g = Similarity.knnGraphFromCandidates(cand, k = 5)
        .localCheckpoint()
      Q.Phase.opDone() // the brute-force recall floor below is PROOF
      // recall floor vs brute force on a node sample: the graph is
      // approximate by contract, but it must FIND neighbors
      val sample = emb.filter(col("vec_id") < 40)
      val bf = Similarity.bruteForceTopK(sample, emb, "vec_id",
          "embedding", k = 5, roundDigits = Some(4))
        .select(col("query_id").as("src_id"),
          col("neighbor_id").as("dst_id"))
        .withColumn("hit", lit(1))
      val recall = g.filter(col("src_id") < 40)
        .join(bf, Seq("src_id", "dst_id"), "right")
        .agg((sum(when(col("rank").isNotNull, 1).otherwise(0)) /
          count(lit(1))).cast("double")).head().getDouble(0)
      require(recall >= 0.15,
        f"kNN-graph recall@5 vs brute force = $recall%.3f — under the " +
          "0.15 floor; add tables or raise the cap")
      g.orderBy("src_id", "rank")
    }, Some(knnGraphOracle(extraWhere = "")))),

    // D206 — INCREMENTAL kNN-graph maintenance (the D27/D131 discipline
    // applied to D202): an appended vector batch changes only the nodes
    // sharing a capped bucket with an admitted batch member — their
    // edges recompute (src-side-filtered bucket join, O(affected ×
    // bucket members)), everyone else's edges splice through untouched.
    // The incremental result is require()d EQUAL to the full rebuild
    // over corpus ∪ batch, locality require()d real (affected ≪ all),
    // and the spliced graph slice is oracled like D202.
    "sim_knn_graph_incr" -> (((spark, dir) => {
      val emb = load(spark, dir, "embeddings")
      val cap = 64
      val maxId = emb.agg(max("vec_id")).head().getLong(0)
      val cut = maxId * 4 / 5 // batch ids strictly above every corpus id
      val corpus = emb.filter(col("vec_id") <= cut)
      val batch = emb.filter(col("vec_id") > cut)
      // the pre-existing graph is FIXTURE state the increment consumes:
      // built once per JVM and hardlinked per pass (FixtureCache, the
      // dd_cluster_incr discipline — r15 methodology note in
      // OPTIMIZATION_r15.md), so timed passes measure the INCREMENT.
      // Deterministic: cap admission is by smallest id and batch ids
      // exceed every corpus id, so the corpus membership is exactly the
      // union membership filtered to corpus ids (bucketMembership doc;
      // KnnGraphSpec pins the identity). The OPERATOR under test still
      // runs its own full path inside knnGraphIncrement.
      val op = Q.scratchDir("knn_incr").resolve("old").toString
      Q.FixtureCache.link(spark, s"$dir|sim_knn_graph_incr_old", op) {
        Similarity.knnGraphFromMembership(
          Similarity.bucketMembership(emb, "vec_id", "embedding",
            KnnTables, bucketCap = cap).filter(col("id") <= cut), k = 5)
      }
      val old = spark.read.parquet(op)
      Q.Phase.setupDone()
      val incr = Similarity.knnGraphIncrement(corpus, batch, old,
        "vec_id", "embedding", KnnTables, k = 5, bucketCap = cap)
        .localCheckpoint()
      Q.Phase.opDone() // what follows is the equality/locality PROOF
      // equality + locality run at CORRECTNESS SF only (Q.benchLean
      // contract): the rebuild exists purely to prove the increment —
      // the bench times the increment, Verify proves it every round
      if (!Q.benchLean) {
        val full = Similarity.knnGraphFromMembership(
          Similarity.bucketMembership(emb, "vec_id", "embedding",
            KnnTables, bucketCap = cap), k = 5)
          .localCheckpoint()
        require(Q.multisetEqual(incr, full),
          "the incremental graph must EQUAL the full rebuild")
        // locality: most sources carried over from the old graph
        // untouched
        val changed = incr.exceptAll(old).select("src_id").distinct()
          .count()
        val nodes = emb.count()
        require(changed > 0 && changed < nodes,
          s"increment must touch some ($changed) but not all ($nodes) " +
            "nodes")
      }
      incr.filter(pmod(col("src_id"), lit(7)) === 0)
        .orderBy("src_id", "rank")
    }, Some(knnGraphOracle(extraWhere = "AND src_id % 7 = 0")))),

    // D210 — NN-Descent refinement round (Dong et al. 2011) over the
    // D202 graph: candidates = undirected neighbor-of-neighbor pairs ∪
    // current edges (O(n·(2k)²), never all-pairs, no LSH), exact
    // re-rank, keep top-k. The invariant that IS monotone by
    // construction is rank-wise cosine (current edges sit in the
    // candidate set, so the new top-k dominates the old rank by rank);
    // recall vs brute force is NOT — under 4-digit rounded cosine a new
    // candidate tying a true edge with a smaller dst_id ejects it — so
    // the gate require()s the former plus that the round actually
    // improved some edges; the refined edge list is oracled by the full
    // two-stage SQL replay.
    "sim_knn_refine" -> (((spark, dir) => {
      val emb = load(spark, dir, "embeddings")
      // the initial LSH graph is the fixture: FixtureCache'd per JVM
      // (key SHARED with sim_knn_converge — identical construction), so
      // timed passes measure the refinement round (r15 methodology note)
      val bp = Q.scratchDir("knn_base").resolve("base").toString
      Q.FixtureCache.link(spark, s"$dir|sim_knn_base_k5_cap64", bp) {
        Similarity.knnGraph(emb, "vec_id", "embedding", KnnTables,
          k = 5, bucketCap = 64)
      }
      val base = spark.read.parquet(bp)
      Q.Phase.setupDone()
      val refined = Similarity.nnDescentRound(base, emb, "vec_id",
        "embedding", k = 5).localCheckpoint()
      Q.Phase.opDone() // monotonicity proof follows
      val viol = base.select(col("src_id"), col("rank"),
          col("cosine4").as("c0"))
        .join(refined.select(col("src_id"), col("rank"),
          col("cosine4").as("c1")), Seq("src_id", "rank"))
        .filter(col("c1") < col("c0")).count()
      require(viol == 0L,
        s"rank-wise cosine must be monotone by construction " +
          s"($viol violations)")
      val improved = refined.exceptAll(base).count()
      require(improved > 0L,
        "one round must improve some edges on this corpus")
      refined.orderBy("src_id", "rank")
    }, Some(knnRefineOracle))),

    // D210+ — NN-Descent run to CONVERGENCE (the paper's value is the
    // fixed point, not one sweep): Similarity.nnDescentConverge stops
    // when a round changes no edge (the confirming round counts) or at
    // maxRounds = 3. Rank-wise cosine monotonicity base→final is
    // require()d (sound by construction — per-round monotonicity and
    // the no-op fixed point are pinned in KnnGraphSpec); the final
    // graph is oracled by the 3-round unrolled SQL replay, which
    // equals the operator whether it converged early (further rounds
    // no-op) or ran the full budget.
    "sim_knn_converge" -> (((spark, dir) => {
      val emb = load(spark, dir, "embeddings")
      // fixture shared with sim_knn_refine (same cache key — built once
      // per JVM for both gates; r15 methodology note)
      val bp = Q.scratchDir("knn_base").resolve("base").toString
      Q.FixtureCache.link(spark, s"$dir|sim_knn_base_k5_cap64", bp) {
        Similarity.knnGraph(emb, "vec_id", "embedding", KnnTables,
          k = 5, bucketCap = 64)
      }
      val base = spark.read.parquet(bp)
      Q.Phase.setupDone()
      val (finalG, rounds) = Similarity.nnDescentConverge(base, emb,
        "vec_id", "embedding", k = 5, maxRounds = 3)
      Q.Phase.opDone() // monotonicity/progress proof follows
      require(rounds >= 1 && rounds <= 3, s"rounds=$rounds")
      val viol = base.select(col("src_id"), col("rank"),
          col("cosine4").as("c0"))
        .join(finalG.select(col("src_id"), col("rank"),
          col("cosine4").as("c1")), Seq("src_id", "rank"))
        .filter(col("c1") < col("c0")).count()
      require(viol == 0L,
        s"rank-wise cosine must be monotone across rounds ($viol)")
      require(finalG.exceptAll(base).count() > 0L,
        "convergence must improve some edges on this corpus")
      finalG.orderBy("src_id", "rank")
    }, Some(knnRoundsOracle(3)))),

    // D207 — embedding-space eval-set decontamination
    // (Similarity.semanticContamination): D19 catches VERBATIM leakage
    // by n-gram overlap; paraphrased eval items need the embedding
    // space. The (small) eval side's bucket memberships broadcast; the
    // corpus buckets by pure projection; candidates are bucket
    // collisions; best eval match per contaminated doc reported. The
    // removal split is require()d exact; the hit list oracled by the
    // pinned-plane SQL replay.
    "llm_embed_decontaminate" -> (((spark, dir) => {
      val emb = load(spark, dir, "embeddings")
      val eval = emb.filter(col("vec_id") % 50 === 0)
      val corpus = emb.filter(col("vec_id") % 50 =!= 0)
      val hits = Similarity.semanticContamination(corpus, eval,
        "vec_id", "embedding", KnnTables, threshold = 0.35)
        .localCheckpoint() // reused by the split require below
      val n = hits.count()
      require(n > 0, "the threshold must catch contamination here")
      val clean = corpus.join(hits.select(col("id").as("vec_id")),
        Seq("vec_id"), "left_anti")
      require(clean.count() + n == corpus.count(),
        "clean + contaminated must partition the corpus exactly")
      hits.orderBy("id")
    }, Some {
      def dotLit(v: String, cs: Seq[Double]): String =
        dotSql(v, cs.mkString("[", ", ", "]"))
      def bucket(planes: Seq[Seq[Double]]): String =
        planes.zipWithIndex.map { case (cs, p) =>
          s"(CASE WHEN ${dotLit("v", cs)} > 0 THEN ${1 << p} ELSE 0 END)"
        }.mkString(" + ")
      val bSql = KnnTables.zipWithIndex.map { case (planes, t) =>
        s"SELECT $t AS tbl, ${bucket(planes)} AS bucket, id, v FROM e"
      }.mkString("\n            UNION ALL\n            ")
      s"""
      WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
                 FROM embeddings),
      b AS ($bSql),
      ce AS (SELECT * FROM b WHERE id % 50 <> 0),
      ee AS (SELECT tbl, bucket, id AS eval_id, v AS ev FROM b
             WHERE id % 50 = 0),
      hits AS (
        SELECT DISTINCT ce.id, ee.eval_id,
               round(${dotSql("ce.v", "ee.ev")} /
                 (sqrt(${dotSql("ce.v", "ce.v")}) *
                  sqrt(${dotSql("ee.ev", "ee.ev")})), 4) AS cosine4
        FROM ce JOIN ee ON ce.tbl = ee.tbl AND ce.bucket = ee.bucket),
      ranked AS (
        SELECT id, eval_id, cosine4,
               row_number() OVER (PARTITION BY id
                 ORDER BY cosine4 DESC, eval_id ASC) AS rn
        FROM hits WHERE cosine4 >= 0.35)
      SELECT id, eval_id, cosine4 FROM ranked WHERE rn = 1
      ORDER BY id"""
    })),

    // D217 — readability metrics (TextAnalysis.readability, the
    // Flesch-reading-ease tier of a quality stack): whitespace words,
    // non-empty [.!?]+ sentence segments (floor 1), [aeiouy]+ vowel
    // groups as the syllable proxy (floored at the word count), and
    // the public Flesch formula — two IEEE divisions, rounded 4. Pure
    // per-row codegen map, zero shuffles; oracle replays every counter.
    "text_readability" -> (((spark, dir) => {
      graft.llm.TextAnalysis.readability(
        load(spark, dir, "documents").select("doc_id", "text"), "text")
        .select("doc_id", "n_words", "n_sentences", "n_syllables",
          "flesch4")
        .orderBy("doc_id")
    }, Some("""
      WITH t AS (SELECT doc_id, lower(trim(text)) AS lt,
                   CASE WHEN len(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(text), '\s+'))
                   END AS nw
                 FROM documents),
      r AS (SELECT doc_id, CAST(nw AS BIGINT) AS nw,
              CAST(greatest(len(list_filter(
                string_split_regex(lt, '[.!?]+'),
                s -> len(trim(s)) > 0)), 1) AS BIGINT) AS ns,
              CAST(greatest(len(regexp_extract_all(lt, '[aeiouy]+')),
                nw) AS BIGINT) AS sy
            FROM t)
      SELECT doc_id, nw AS n_words, ns AS n_sentences,
             sy AS n_syllables,
             CASE WHEN nw > 0 THEN
               round(206.835 - 1.015 * (CAST(nw AS DOUBLE) / ns)
                 - 84.6 * (CAST(sy AS DOUBLE) / nw), 4) END AS flesch4
      FROM r ORDER BY doc_id"""))),

    // Char-distribution entropy (a–z + space): counts via the
    // length-minus-translate identity, one bound 27-count array, fixed-
    // order -Σ p·ln p fold — per-row codegen map, zero shuffles.
    // >3 s in battery yet GENUINELY ALL-OP (the dd-heavy discipline):
    // no setup, no proof arm — the cost is the 27 per-character string
    // traversals per row; a phase split would report setup=assert=0.
    "text_entropy" -> (((spark, dir) => {
      load(spark, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.charEntropy(col("text")).as("ent6"))
        .orderBy("doc_id")
    }, Some {
      val csSql = (('a' to 'z').map(_.toString) :+ " ")
        .map(c => s"CAST(length(t) - length(replace(t, '$c', '')) " +
          "AS BIGINT)")
        .mkString("[", ", ", "]")
      s"""
      WITH raw AS (SELECT doc_id, lower(text) AS t FROM documents),
      cnt AS (SELECT doc_id, $csSql AS cs FROM raw),
      tot AS (SELECT doc_id, cs,
                list_reduce(list_prepend(CAST(0 AS BIGINT), cs),
                  (a, x) -> a + x) AS n
              FROM cnt)
      SELECT doc_id,
             CASE WHEN n = 0 THEN 0.0 ELSE
               round(-list_reduce(list_prepend(0.0, list_transform(cs,
                 c -> CASE WHEN c > 0
                      THEN (CAST(c AS DOUBLE) / n) *
                           ln(CAST(c AS DOUBLE) / n)
                      ELSE 0.0 END)), (a, x) -> a + x), 6) END AS ent6
      FROM tot ORDER BY doc_id"""
    })),

    // Content-defined chunking (Rabin/LBFS boundaries): cut after token i
    // when hash(token[i-1] token[i]) % 8 = 0 — local-content boundaries,
    // the chunk-level-dedup pre-step; per-row HOFs, zero shuffles
    "llm_cdc_chunks" -> (((spark, dir) => {
      TextAnalysis.cdcChunks(load(spark, dir, "documents"),
          "doc_id", "text", modulus = 8)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }, Some(s"""
      WITH t AS (SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\\s+') AS ws
                 FROM documents),
      b AS (SELECT doc_id, len(ws) AS n,
              list_filter(range(2, greatest(len(ws), 2) + 1),
                i -> i < len(ws) AND
                  (CAST(concat('0x', substring(md5(
                     concat_ws(' ', ws[CAST(i AS INT)-1],
                       ws[CAST(i AS INT)])), 1, 15)) AS BIGINT)
                   % ${Dedup.PortableP}) % 8 = 0) AS bnd
            FROM t),
      p AS (SELECT doc_id,
              list_concat(list_concat([CAST(0 AS BIGINT)], bnd),
                [CAST(n AS BIGINT)]) AS pos
            FROM b),
      l AS (SELECT doc_id, list_transform(range(1, len(pos)),
              j -> pos[CAST(j AS INT)+1] - pos[CAST(j AS INT)]) AS lens
            FROM p)
      SELECT doc_id, CAST(len(lens) AS INT) AS n_chunks,
             CAST(list_max(lens) AS INT) AS max_chunk,
             md5(array_to_string(lens, ',')) AS lens_md5
      FROM l ORDER BY doc_id"""))),

    // K-means training (2 Lloyd rounds, k=8): decimal-exact centroid
    // means, rounded-cosine assignment with the ivf tiebreak — the oracle
    // unrolls both rounds and replays the final assignment
    "sim_kmeans" -> (((spark, dir) => {
      Similarity.kmeans(load(spark, dir, "embeddings"),
        "vec_id", "embedding", k = 8, iters = 2)
    }, Some(s"""
      $kmeansCtes,
      cs AS (SELECT cid, round(list_reduce(list_prepend(0.0, cv),
               (a, x) -> a + x), 6) AS csum6 FROM c2)
      SELECT nn.cid, nn.n, cs.csum6
      FROM (SELECT cid, count(*) AS n FROM af GROUP BY 1) nn
      JOIN cs USING (cid) ORDER BY cid"""))),

    // D213 — cluster-balanced diversity sampling (the DataComp-era
    // curation move composing D83 + a quota window): at most
    // `perCluster` members survive per k-means cluster, chosen by the
    // portable id-hash order (deterministic "random", bit-replayable).
    // The gate require()s the quota BINDS (≥1 capped cluster, sample
    // smaller than corpus) and never overflows; full (vec_id, cid,
    // rank) oracled by the unrolled Lloyd chain + the same hash window.
    "llm_cluster_balance" -> (((spark, dir) => {
      val emb = load(spark, dir, "embeddings")
      val sample = Similarity.clusterBalancedSample(emb, "vec_id",
        "embedding", k = 8, iters = 2, perCluster = 40)
        .localCheckpoint()
      Q.Phase.opDone() // k-means + quota window materialized above;
      // the quota-binding requires below are assert-phase proof
      val per = sample.groupBy("cid").agg(count(lit(1)).as("n"))
      require(per.agg(max("n")).head().getLong(0) <= 40L,
        "no cluster may exceed its quota")
      require(per.filter(col("n") === 40).count() >= 1,
        "the quota must BIND on at least one cluster of this corpus")
      require(sample.count() < emb.count(),
        "balanced sampling must drop rows here")
      sample.select(col("id").as("vec_id"), col("cid"), col("rank"))
        .orderBy("cid", "rank")
    }, Some(s"""
      $kmeansCtes,
      h AS (SELECT id, cid,
              CAST(concat('0x', substring(md5(CAST(id AS VARCHAR)),
                1, 15)) AS BIGINT) % ${graft.llm.Dedup.PortableP} AS hh
            FROM af),
      r AS (SELECT id, cid,
              row_number() OVER (PARTITION BY cid
                ORDER BY hh ASC, id ASC) AS rank
            FROM h)
      SELECT id AS vec_id, cid, CAST(rank AS INT) AS rank
      FROM r WHERE rank <= 40 ORDER BY cid, rank"""))),

    // D215 — INCREMENTAL cluster-balance maintenance (the D27/D131/
    // D206 discipline applied to D213): a batch arrives, centroids are
    // PINNED, and only clusters receiving batch members re-rank — over
    // oldSample ∪ batch ONLY (exact: hash order is static and the old
    // sample is each cluster's top-quota, so an already-outranked
    // corpus member can never re-enter when members are only added).
    // O(sample + batch), corpus never rescanned; require()d EQUAL to
    // the from-scratch sample under the same centroids; full output
    // oracled by the train-on-corpus / assign-all Lloyd replay.
    "llm_cluster_balance_incr" -> (((spark, dir) => {
      val emb = load(spark, dir, "embeddings")
      val corpus = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
      val batch = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
      // trained centroids + prior sample = fixture, FixtureCache'd per
      // JVM (r15 methodology note): both are deterministic (pinned-init
      // Lloyd; hash-ranked quota sample — the oracle replays each in
      // SQL), so every pass links byte-identical fixture rows
      val tmpCb = Q.scratchDir("cbal_incr")
      val cp = tmpCb.resolve("cents").toString
      Q.FixtureCache.link(spark, s"$dir|llm_cbal_cents_k8i2", cp) {
        Similarity.kmeansCentroids(corpus, "vec_id", "embedding",
          k = 8, iters = 2)
      }
      val cents = spark.read.parquet(cp)
      val sp = tmpCb.resolve("old").toString
      Q.FixtureCache.link(spark, s"$dir|llm_cbal_old_pc40", sp) {
        Similarity.clusterBalancedFromCentroids(corpus,
          "vec_id", "embedding", cents, perCluster = 40)
      }
      val old = spark.read.parquet(sp)
      Q.Phase.setupDone()
      val incr = Similarity.clusterBalancedIncrement(old, batch,
        "vec_id", "embedding", cents, perCluster = 40).localCheckpoint()
      Q.Phase.opDone() // the from-scratch rebuild + equality is PROOF
      // equality + movement proofs at correctness SF only (Q.benchLean
      // contract, as sim_knn_graph_incr): the rebuild exists purely to
      // prove the increment — Verify runs it every round
      if (!Q.benchLean) {
        val full = Similarity.clusterBalancedFromCentroids(emb, "vec_id",
          "embedding", cents, perCluster = 40).localCheckpoint()
        require(incr.count() == full.count() &&
          incr.exceptAll(full).isEmpty,
          "the incremental sample must EQUAL the from-scratch rebuild " +
            "under pinned centroids")
        require(incr.exceptAll(old).count() > 0L,
          "the batch must actually move the sample on this corpus")
      }
      incr.select(col("id").as("vec_id"), col("cid"), col("rank"))
        .orderBy("cid", "rank")
    }, Some(s"""
      ${kmeansCtesWhere("WHERE id % 5 <> 0")},
      h AS (SELECT id, cid,
              CAST(concat('0x', substring(md5(CAST(id AS VARCHAR)),
                1, 15)) AS BIGINT) % ${graft.llm.Dedup.PortableP} AS hh
            FROM af),
      r AS (SELECT id, cid,
              row_number() OVER (PARTITION BY cid
                ORDER BY hh ASC, id ASC) AS rank
            FROM h)
      SELECT id AS vec_id, cid, CAST(rank AS INT) AS rank
      FROM r WHERE rank <= 40 ORDER BY cid, rank"""))),

    // Cross-source boilerplate score: fraction of a doc's word-3-grams
    // that also appear in ANOTHER source — the template/boilerplate
    // detector that positional dup-span counting (dd_dup_spans) and
    // eval-set decontamination don't cover. Grams hash to 60-bit longs
    // BEFORE every exchange (the dd_dup_spans discipline: shuffles carry
    // longs and ids, never text); one gram-keyed source-count aggregation
    // + one join back + one per-doc mean of exact 0/1 indicators.
    "text_boilerplate" -> (((spark, dir) => {
      val sh = load(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          explode(Dedup.wordShingles(col("text"), 3)).as("g"))
        .select(col("doc_id"), col("source"),
          Dedup.portableWordHash(col("g")).as("gh"))
      // distinct-source count per gram as window functions over ONE
      // gh-keyed exchange (max(dense_rank) ≡ count_distinct; source is
      // non-null in this corpus and the oracle already rests on that):
      // the groupBy + join-back shape evaluated the md5 gram scan twice.
      // Skew note (r15): wordShingles is array_distinct per doc, so the
      // window's rows per gh are already at most one per (gram, doc) —
      // the same pre-reduced bound the dd_dup_spans r15 rewrite restores;
      // a hot gram costs O(docs containing it), never O(occurrences)
      val wGh = Window.partitionBy("gh")
      sh.withColumn("__dr", dense_rank().over(wGh.orderBy(col("source"))))
        .withColumn("n_src", max(col("__dr")).over(wGh))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          round(avg(when(col("n_src") >= 2, 1.0).otherwise(0.0)), 4)
            .as("boiler_frac4"))
        .orderBy("doc_id")
    }, Some(s"""
      WITH sh AS (
        SELECT doc_id, source,
               (CAST(concat('0x', substring(md5(g), 1, 15)) AS BIGINT)
                 % ${Dedup.PortableP}) AS gh
        FROM (SELECT doc_id, source,
                unnest(list_distinct(list_transform(
                  range(1, greatest(len(ws) - 1, 2)),
                  i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])))) AS g
              FROM (SELECT doc_id, source,
                      string_split_regex(trim(text), '\\s+') AS ws
                    FROM documents))),
      gsrc AS (SELECT gh, count(DISTINCT source) AS n_src
               FROM sh GROUP BY 1)
      SELECT doc_id, count(*) AS n_grams,
             round(avg(CASE WHEN n_src >= 2 THEN 1.0 ELSE 0.0 END), 4)
               AS boiler_frac4
      FROM sh JOIN gsrc USING (gh)
      GROUP BY doc_id ORDER BY doc_id"""))),

    // Weighted sampling without replacement (Efraimidis–Spirakis — public
    // algorithm): key = u^(1/w) with u = portable-hash uniform and
    // w = n_chars, top-16 by key — ONE pass + a per-task heap
    // (TakeOrderedAndProject), the distributed-weighted-sample shape.
    // Keys round to 8dp before ranking so cross-engine pow() ulps can't
    // flip an order; doc_id breaks residual ties.
    "llm_weighted_sample" -> (((spark, dir) => {
      val u = Dedup.portableWordHash(col("doc_id")).cast("double") /
        lit(Dedup.PortableP.toDouble)
      load(spark, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          round(pow(u, lit(1.0) / col("n_chars")), 8).as("key8"))
        .orderBy(col("key8").desc, col("doc_id"))
        .limit(16)
    }, Some(s"""
      SELECT doc_id, n_chars,
             round(pow(CAST((CAST(concat('0x', substring(md5(
                 CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                 % ${Dedup.PortableP}) AS DOUBLE) / ${Dedup.PortableP}.0,
               1.0 / n_chars), 8) AS key8
      FROM documents
      ORDER BY key8 DESC, doc_id LIMIT 16"""))),

    // Text ANN end-to-end over the feature-hashed vectors: integer-exact
    // dot products from the 8 pivoted bucket sums (no learned embeddings
    // anywhere), rounded-cosine top-3 per query doc — composes D84 into
    // the similarity plane
    "text_ann" -> (((spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val sparse = TextAnalysis.featureHash(load(spark, dir, "documents"),
        "doc_id", "text", m = 8)
      val buckets = (0 until 8).map(j =>
        sum(when(col("j") === j, col("v")).otherwise(0L)).as(s"v$j"))
      val dense = sparse.groupBy("id").agg(buckets.head, buckets.tail: _*)
      def dotCols(a: String, b: String) = (0 until 8)
        .map(j => col(s"$a.v$j") * col(s"$b.v$j"))
        .reduce(_ + _)
      val q = dense.filter(col("id") < 3).as("qv")
      val c = dense.as("cv")
      val rankW = Window.partitionBy("query_id")
        .orderBy(col("cos4").desc, col("neighbor_id"))
      broadcast(q).crossJoin(c)
        .filter(col("qv.id") =!= col("cv.id"))
        .select(col("qv.id").as("query_id"), col("cv.id").as("neighbor_id"),
          round(dotCols("qv", "cv").cast("double") /
            (sqrt(dotCols("qv", "qv").cast("double")) *
             sqrt(dotCols("cv", "cv").cast("double"))), 4).as("cos4"))
        .withColumn("rnk", row_number().over(rankW))
        .filter(col("rnk") <= 3)
        .select(col("query_id"), col("rnk"), col("neighbor_id"),
          col("cos4"))
        .orderBy("query_id", "rnk")
    }, Some {
      val dot = (0 until 8).map(j => s"a.v$j * b.v$j").mkString(" + ")
      val qdot = (0 until 8).map(j => s"a.v$j * a.v$j").mkString(" + ")
      val cdot = (0 until 8).map(j => s"b.v$j * b.v$j").mkString(" + ")
      val piv = (0 until 8).map(j =>
        s"CAST(sum(CASE WHEN j = $j THEN v ELSE 0 END) AS BIGINT) AS v$j")
        .mkString(", ")
      s"""
      WITH words AS (SELECT doc_id,
                       unnest(string_split_regex(lower(trim(text)), '\\s+'))
                         AS w
                     FROM documents),
      hashed AS (SELECT doc_id,
                   (CAST(concat('0x', substring(md5(w), 1, 15)) AS BIGINT)
                     % ${Dedup.PortableP}) AS h
                 FROM words),
      sparse AS (SELECT doc_id AS id, h % 8 AS j,
                   CAST(sum(CASE WHEN (h >> 20) % 2 = 0 THEN 1 ELSE -1 END)
                     AS BIGINT) AS v
                 FROM hashed GROUP BY 1, 2),
      dense AS (SELECT id, $piv FROM sparse GROUP BY id),
      scored AS (
        SELECT a.id AS query_id, b.id AS neighbor_id,
               round(CAST($dot AS DOUBLE) /
                 (sqrt(CAST($qdot AS DOUBLE)) *
                  sqrt(CAST($cdot AS DOUBLE))), 4) AS cos4
        FROM dense a CROSS JOIN dense b
        WHERE a.id < 3 AND a.id <> b.id),
      ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY cos4 DESC, neighbor_id) AS rnk FROM scored)
      SELECT query_id, CAST(rnk AS INT) AS rnk, neighbor_id, cos4
      FROM ranked WHERE rnk <= 3 ORDER BY query_id, rnk"""
    })),

    // Next-token table: per preceding word, the top-3 most frequent
    // successors from the corpus bigram counts — the LM-serving companion
    // of text_bigram_nll; one bigram agg + one w1-keyed rank window
    "text_next_token" -> (((spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = load(spark, dir, "documents")
        .select(split(trim(lower(col("text"))), "\\s+").as("ws"))
        .filter(size(col("ws")) >= 2)
      val counts = docs.select(explode(transform(
          sequence(lit(1), size(col("ws")) - 1),
          i => struct(element_at(col("ws"), i).as("w1"),
            element_at(col("ws"), i + 1).as("w2")))).as("p"))
        .select(col("p.w1"), col("p.w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("w1")
        .orderBy(col("n").desc, col("w2"))
      counts.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("w1"), col("rnk"), col("w2"), col("n"))
        .orderBy("w1", "rnk")
    }, Some("""
      WITH docbi AS (
        SELECT unnest(list_transform(range(1, len(ws)),
                 i -> ws[CAST(i AS INT)])) AS w1,
               unnest(list_transform(range(1, len(ws)),
                 i -> ws[CAST(i AS INT)+1])) AS w2
        FROM (SELECT string_split_regex(lower(trim(text)), '\s+') AS ws
              FROM documents)
        WHERE len(ws) >= 2),
      counts AS (SELECT w1, w2, count(*) AS n FROM docbi GROUP BY 1, 2),
      ranked AS (SELECT *, row_number() OVER (PARTITION BY w1
                   ORDER BY n DESC, w2) AS rnk FROM counts)
      SELECT w1, CAST(rnk AS INT) AS rnk, w2, n
      FROM ranked WHERE rnk <= 3 ORDER BY w1, rnk"""))),

    // Vocabulary coverage curve: what fraction of corpus TOKENS the top-k
    // vocabulary covers at k = 4/8/16 — the tokenizer-sizing diagnostic;
    // one vocab agg, one global rank window over the (tiny) vocabulary
    "text_vocab_coverage" -> (((spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val vocab = load(spark, dir, "documents")
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("wc"))
      val rankW = Window.orderBy(col("wc").desc, col("w"))
      val cumW = rankW.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      val allW = Window.partitionBy()
      vocab.withColumn("rk", row_number().over(rankW))
        .withColumn("cum", sum("wc").over(cumW))
        .withColumn("total", sum("wc").over(allW))
        .filter(col("rk").isin(4, 8, 16))
        .select(col("rk").as("k"), col("cum"),
          round(col("cum").cast("double") / col("total"), 6)
            .as("coverage6"))
        .orderBy("k")
    }, Some("""
      WITH vocab AS (SELECT w, count(*) AS wc FROM (
                       SELECT unnest(string_split_regex(lower(trim(text)),
                         '\s+')) AS w
                       FROM documents) GROUP BY 1),
      ranked AS (SELECT w, wc,
                   row_number() OVER (ORDER BY wc DESC, w) AS rk,
                   CAST(sum(wc) OVER (ORDER BY wc DESC, w
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum,
                   CAST(sum(wc) OVER () AS BIGINT) AS total
                 FROM vocab)
      SELECT CAST(rk AS INT) AS k, cum,
             round(CAST(cum AS DOUBLE) / total, 6) AS coverage6
      FROM ranked WHERE rk IN (4, 8, 16) ORDER BY k"""))),

    // Feature-hashed doc vectors (hashing trick): integer-exact ±1 bucket
    // sums, one (id, bucket) aggregation — text gets a fixed-width vector
    // with no learned embedding
    "text_feature_hash" -> (((spark, dir) => {
      TextAnalysis.featureHash(load(spark, dir, "documents"),
          "doc_id", "text", m = 8)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "j")
    }, Some(s"""
      WITH words AS (SELECT doc_id,
                       unnest(string_split_regex(lower(trim(text)), '\\s+'))
                         AS w
                     FROM documents),
      hashed AS (SELECT doc_id,
                   (CAST(concat('0x', substring(md5(w), 1, 15)) AS BIGINT)
                     % ${Dedup.PortableP}) AS h
                 FROM words)
      SELECT doc_id, h % 8 AS j,
             CAST(sum(CASE WHEN (h >> 20) % 2 = 0 THEN 1 ELSE -1 END)
               AS BIGINT) AS v
      FROM hashed GROUP BY 1, 2 ORDER BY doc_id, j"""))),

    // Grouped order-statistic monitoring: exact discrete P50/P95 of event
    // values per (event_type, hour-of-day) — one window + one pivot agg,
    // the per-group twin of q_winsorize's order-statistic discipline
    "evt_group_percentiles" -> (((spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val grpW = Window.partitionBy("event_type", "hod")
      val rankW = grpW.orderBy("value", "event_id")
      load(spark, dir, "events")
        .select(col("event_type"),
          expr("(ts div 3600000000000) % 24").as("hod"),
          col("value"), col("event_id"))
        .withColumn("n", count(lit(1)).over(grpW))
        .withColumn("rn", row_number().over(rankW))
        .groupBy("event_type", "hod")
        .agg(max("n").as("n"),
          max(when(col("rn") === ceil(col("n") * lit(0.5)), col("value")))
            .as("p50"),
          max(when(col("rn") === ceil(col("n") * lit(0.95)), col("value")))
            .as("p95"))
        .orderBy("event_type", "hod")
    }, Some("""
      WITH e AS (SELECT event_type,
                   (epoch_ns(ts) // 3600000000000) % 24 AS hod,
                   "value", event_id,
                   count(*) OVER (PARTITION BY event_type,
                     (epoch_ns(ts) // 3600000000000) % 24) AS n,
                   row_number() OVER (PARTITION BY event_type,
                     (epoch_ns(ts) // 3600000000000) % 24
                     ORDER BY "value", event_id) AS rn
                 FROM events)
      SELECT event_type, hod, max(n) AS n,
             max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT)
               THEN "value" END) AS p50,
             max(CASE WHEN rn = CAST(ceil(n * 0.95) AS BIGINT)
               THEN "value" END) AS p95
      FROM e GROUP BY 1, 2 ORDER BY 1, 2"""))),

    // Distributed BPE training: 3 merge rounds, in-plan winning pairs,
    // greedy leftmost application as non-regex replace on padded symbol
    // strings — the oracle unrolls the identical 3 rounds
    "llm_bpe_train" -> (((spark, dir) => {
      TextAnalysis.bpeTrain(load(spark, dir, "documents"), "text",
          merges = 3)
        .orderBy("iter")
    }, Some("""
      WITH v0 AS (
        SELECT ' ' || regexp_replace(w, '(.)', ' \1 ', 'g') || ' ' AS s, wc
        FROM (SELECT w, count(*) AS wc FROM (
                SELECT unnest(string_split_regex(lower(trim(text)), '\s+'))
                  AS w
                FROM documents) GROUP BY 1)),
      p1 AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS n FROM (
               SELECT wc, unnest(list_transform(range(1, len(sym)),
                 i -> sym[CAST(i AS INT)] || ' ' ||
                      sym[CAST(i AS INT)+1])) AS pair
               FROM (SELECT wc, string_split_regex(trim(s), ' +') AS sym FROM v0))
             GROUP BY 1),
      t1 AS (SELECT 1 AS iter, pair, n FROM p1
             ORDER BY n DESC, pair LIMIT 1),
      v1 AS (SELECT replace(s,
                 ' ' || replace(t1.pair, ' ', '  ') || ' ',
                 ' ' || replace(t1.pair, ' ', '') || ' ') AS s, wc
             FROM v0 CROSS JOIN t1),
      p2 AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS n FROM (
               SELECT wc, unnest(list_transform(range(1, len(sym)),
                 i -> sym[CAST(i AS INT)] || ' ' ||
                      sym[CAST(i AS INT)+1])) AS pair
               FROM (SELECT wc, string_split_regex(trim(s), ' +') AS sym FROM v1))
             GROUP BY 1),
      t2 AS (SELECT 2 AS iter, pair, n FROM p2
             ORDER BY n DESC, pair LIMIT 1),
      v2 AS (SELECT replace(s,
                 ' ' || replace(t2.pair, ' ', '  ') || ' ',
                 ' ' || replace(t2.pair, ' ', '') || ' ') AS s, wc
             FROM v1 CROSS JOIN t2),
      p3 AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS n FROM (
               SELECT wc, unnest(list_transform(range(1, len(sym)),
                 i -> sym[CAST(i AS INT)] || ' ' ||
                      sym[CAST(i AS INT)+1])) AS pair
               FROM (SELECT wc, string_split_regex(trim(s), ' +') AS sym FROM v2))
             GROUP BY 1),
      t3 AS (SELECT 3 AS iter, pair, n FROM p3
             ORDER BY n DESC, pair LIMIT 1)
      SELECT iter, pair, n FROM (
        SELECT * FROM t1 UNION ALL SELECT * FROM t2
        UNION ALL SELECT * FROM t3)
      ORDER BY iter"""))),

    // D82+ — BPE ENCODE: the trained 3 merges applied back to the corpus
    // (TextAnalysis.bpeEncode). Merge application runs on the distinct
    // vocabulary only; docs broadcast-join their per-word token counts.
    // The oracle replays training AND encoding, carrying word identity
    // through the merge chain.
    "llm_bpe_encode" -> (((spark, dir) => {
      val docs = load(spark, dir, "documents")
      val merges = TextAnalysis.bpeTrain(docs, "text", merges = 3)
      TextAnalysis.bpeEncode(docs, "doc_id", "text", merges)
        .orderBy("doc_id")
    }, Some("""
      WITH wcs AS (SELECT w, count(*) AS wc FROM (
              SELECT unnest(string_split_regex(lower(trim(text)), '\s+'))
                AS w
              FROM documents) GROUP BY 1),
      v0 AS (SELECT w, wc,
               ' ' || regexp_replace(w, '(.)', ' \1 ', 'g') || ' ' AS s
             FROM wcs),
      p1 AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS n FROM (
               SELECT wc, unnest(list_transform(range(1, len(sym)),
                 i -> sym[CAST(i AS INT)] || ' ' ||
                      sym[CAST(i AS INT)+1])) AS pair
               FROM (SELECT wc, string_split_regex(trim(s), ' +') AS sym
                     FROM v0))
             GROUP BY 1),
      t1 AS (SELECT pair FROM p1 ORDER BY n DESC, pair LIMIT 1),
      v1 AS (SELECT w, wc, replace(s,
                 ' ' || replace(t1.pair, ' ', '  ') || ' ',
                 ' ' || replace(t1.pair, ' ', '') || ' ') AS s
             FROM v0 CROSS JOIN t1),
      p2 AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS n FROM (
               SELECT wc, unnest(list_transform(range(1, len(sym)),
                 i -> sym[CAST(i AS INT)] || ' ' ||
                      sym[CAST(i AS INT)+1])) AS pair
               FROM (SELECT wc, string_split_regex(trim(s), ' +') AS sym
                     FROM v1))
             GROUP BY 1),
      t2 AS (SELECT pair FROM p2 ORDER BY n DESC, pair LIMIT 1),
      v2 AS (SELECT w, wc, replace(s,
                 ' ' || replace(t2.pair, ' ', '  ') || ' ',
                 ' ' || replace(t2.pair, ' ', '') || ' ') AS s
             FROM v1 CROSS JOIN t2),
      p3 AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS n FROM (
               SELECT wc, unnest(list_transform(range(1, len(sym)),
                 i -> sym[CAST(i AS INT)] || ' ' ||
                      sym[CAST(i AS INT)+1])) AS pair
               FROM (SELECT wc, string_split_regex(trim(s), ' +') AS sym
                     FROM v2))
             GROUP BY 1),
      t3 AS (SELECT pair FROM p3 ORDER BY n DESC, pair LIMIT 1),
      v3 AS (SELECT w, replace(s,
                 ' ' || replace(t3.pair, ' ', '  ') || ' ',
                 ' ' || replace(t3.pair, ' ', '') || ' ') AS s
             FROM v2 CROSS JOIN t3),
      tok AS (SELECT w,
                CAST(len(string_split_regex(trim(s), ' +')) AS BIGINT) AS t
              FROM v3),
      dw AS (SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
             FROM documents)
      SELECT doc_id, count(*) AS n_words,
             CAST(sum(t) AS BIGINT) AS n_tokens
      FROM dw JOIN tok USING (w)
      GROUP BY 1 ORDER BY doc_id"""))),

    // Two-sample KS drift: n_chars distribution of src0 vs src1 — exact
    // ECDFs over the value DOMAIN (per-value counts first, window second)
    "llm_ks_drift" -> (((spark, dir) => {
      TextAnalysis.ksDrift(load(spark, dir, "documents"),
        "n_chars", "source", "src0", "src1")
    }, Some("""
      WITH two AS (SELECT source AS s, n_chars AS v FROM documents
                   WHERE source IN ('src0', 'src1')),
      pv AS (SELECT v,
               count(CASE WHEN s = 'src0' THEN 1 END) AS ca,
               count(CASE WHEN s = 'src1' THEN 1 END) AS cb
             FROM two GROUP BY 1),
      cdf AS (SELECT v,
                sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW) AS cum_a,
                sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW) AS cum_b,
                CAST(sum(ca) OVER () AS BIGINT) AS n_a,
                CAST(sum(cb) OVER () AS BIGINT) AS n_b
              FROM pv)
      SELECT n_a, n_b,
             max(round(abs(CAST(cum_a AS DOUBLE) / n_a -
               CAST(cum_b AS DOUBLE) / n_b), 6)) AS ks6
      FROM cdf GROUP BY n_a, n_b"""))),

    // Chi-square token drift: WHICH tokens moved between src0 and src1 —
    // 2x2 contingency per token against pooled expectations, heap top-15
    "text_chi2_drift" -> (((spark, dir) => {
      TextAnalysis.chi2Drift(load(spark, dir, "documents"),
        "text", "source", "src0", "src1", topK = 15)
    }, Some("""
      WITH words AS (SELECT source AS s,
                       unnest(string_split_regex(lower(trim(text)), '\s+'))
                         AS w
                     FROM documents WHERE source IN ('src0', 'src1')),
      pt AS (SELECT w,
               count(CASE WHEN s = 'src0' THEN 1 END) AS oa,
               count(CASE WHEN s = 'src1' THEN 1 END) AS ob
             FROM words GROUP BY 1),
      tot AS (SELECT CAST(sum(oa) AS BIGINT) AS ta,
                     CAST(sum(ob) AS BIGINT) AS tb FROM pt),
      wt AS (SELECT w, oa, ob, ta, tb FROM pt CROSS JOIN tot)
      SELECT w, oa, ob,
             round(CAST(ta + tb AS DOUBLE) *
                   ((CAST(oa AS DOUBLE) * CAST(tb - ob AS DOUBLE) -
                     CAST(ob AS DOUBLE) * CAST(ta - oa AS DOUBLE)) *
                    (CAST(oa AS DOUBLE) * CAST(tb - ob AS DOUBLE) -
                     CAST(ob AS DOUBLE) * CAST(ta - oa AS DOUBLE))) /
                   ((CAST(oa AS DOUBLE) + CAST(ob AS DOUBLE)) *
                    (CAST(ta - oa AS DOUBLE) + CAST(tb - ob AS DOUBLE)) *
                    CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE)), 4)
               AS chi2_4
      FROM wt
      ORDER BY chi2_4 DESC, w LIMIT 15"""))),

    // Bigram LM scoring: per-doc mean NLL under the corpus's own
    // add-half-smoothed bigram model — order-sensitive perplexity proxy
    "text_bigram_nll" -> (((spark, dir) => {
      TextAnalysis.bigramNll(load(spark, dir, "documents"),
          "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }, Some("""
      WITH docbi AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ws)),
                 i -> ws[CAST(i AS INT)])) AS w1,
               unnest(list_transform(range(1, len(ws)),
                 i -> ws[CAST(i AS INT)+1])) AS w2
        FROM (SELECT doc_id,
                string_split_regex(lower(trim(text)), '\s+') AS ws
              FROM documents)
        WHERE len(ws) >= 2),
      counts AS (SELECT w1, w2, count(*) AS c12 FROM docbi GROUP BY 1, 2),
      margin AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1
                 FROM counts GROUP BY 1),
      voc AS (SELECT count(*) AS v FROM
                (SELECT w1 FROM counts UNION SELECT w2 FROM counts)),
      contrib AS (
        SELECT d.doc_id,
               CAST(round(-ln((c.c12 + 0.5) / (m.c1 + 0.5 * voc.v)), 6)
                 AS DECIMAL(18,6)) AS nll6
        FROM docbi d JOIN counts c USING (w1, w2)
             JOIN margin m USING (w1) CROSS JOIN voc)
      SELECT doc_id, count(*) AS n_bigrams,
             round(CAST(sum(nll6) AS DOUBLE) / count(*), 4) AS nll4
      FROM contrib GROUP BY 1 ORDER BY doc_id"""))),

    // KMV sketch SET OPERATIONS (Beyer et al. / theta-sketch style —
    // public): per-source k-minimum-hash sets over word-3-shingles, then
    // union / intersection / Jaccard ESTIMATES from the sketches next to
    // the exact answers. Everything after the distinct-(source, hash)
    // aggregation touches <= 2k rows — the sketch algebra is free at any
    // corpus size; the one big exchange is the distinct. Estimates are
    // exact-rational until the final rounds, so DuckDB replays them.
    "q_kmv_setops" -> (((spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val k = 64
      val estScale = (k - 1).toDouble * Dedup.PortableP // (k-1)·M
      val (sA, sB) = ("src0", "src1")
      val elems = load(spark, dir, "documents")
        .filter(col("source").isin(sA, sB))
        .select(col("source"),
          explode(Dedup.wordShingles(col("text"), 3)).as("g"))
        .select(col("source"), Dedup.portableWordHash(col("g")).as("h"))
        .distinct()
      val rnW = Window.partitionBy("source").orderBy("h")
      val kmin = elems.withColumn("rn", row_number().over(rnW))
        .filter(col("rn") <= k)
      def est(hk: Column, nk: Column) =
        when(nk < k, nk.cast("double"))
          .otherwise(lit(estScale) / hk)
      val perSrc = kmin.groupBy("source")
        .agg(max("h").as("hk"), count(lit(1)).as("n_k"))
        .agg(max(when(col("source") === sA,
            round(est(col("hk"), col("n_k")), 4))).as("est_a4"),
          max(when(col("source") === sB,
            round(est(col("hk"), col("n_k")), 4))).as("est_b4"))
      val theta = kmin.select("h").distinct().orderBy("h").limit(k)
        .agg(max("h").as("theta"), count(lit(1)).as("n_u"))
      val matches = kmin.groupBy("h")
        .agg(count_distinct(col("source")).as("ns"))
        .filter(col("ns") === 2)
        .crossJoin(broadcast(theta.select("theta")))
        .filter(col("h") <= col("theta"))
        .agg(count(lit(1)).as("n_match"))
      val exact = elems.agg(
        count(when(col("source") === sA, 1)).as("n_a"),
        count(when(col("source") === sB, 1)).as("n_b"),
        count_distinct(col("h")).as("union_exact"))
      val estU = est(col("theta"), col("n_u"))
      // Jaccard divides by the union-sketch SIZE min(k, n_u), not k: when
      // both strata hold fewer than k distinct hashes the sketch IS the
      // exact union and n_match/k would understate similarity.
      val sketchK = least(lit(k.toDouble), col("n_u").cast("double"))
      exact.crossJoin(broadcast(perSrc)).crossJoin(broadcast(matches))
        .crossJoin(broadcast(theta))
        .select(col("n_a"), col("n_b"),
          (col("n_a") + col("n_b") - col("union_exact")).as("inter_exact"),
          col("union_exact"),
          col("est_a4"), col("est_b4"),
          round(estU, 4).as("est_union4"),
          round(col("n_match") / sketchK, 4).as("jacc4"),
          round(col("n_match") / sketchK * estU, 4).as("est_inter4"))
    }, Some(s"""
      WITH sh AS (
        SELECT source, unnest(list_distinct(list_transform(
                 range(1, greatest(len(ws) - 1, 2)),
                 i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])))) AS g
        FROM (SELECT source, string_split_regex(trim(text), '\\s+') AS ws
              FROM documents WHERE source IN ('src0', 'src1'))),
      elems AS (SELECT DISTINCT source,
                  (CAST(concat('0x', substring(md5(g), 1, 15)) AS BIGINT)
                    % ${Dedup.PortableP}) AS h
                FROM sh),
      kmin AS (SELECT * FROM (SELECT source, h, row_number() OVER
                 (PARTITION BY source ORDER BY h) AS rn FROM elems)
               WHERE rn <= 64),
      persrc AS (
        SELECT max(CASE WHEN source = 'src0' THEN e4 END) AS est_a4,
               max(CASE WHEN source = 'src1' THEN e4 END) AS est_b4
        FROM (SELECT source,
                round(CASE WHEN count(*) < 64
                  THEN CAST(count(*) AS DOUBLE)
                  ELSE ${(63).toDouble * Dedup.PortableP} / max(h) END, 4)
                  AS e4
              FROM kmin GROUP BY source)),
      u AS (SELECT DISTINCT h FROM kmin ORDER BY h LIMIT 64),
      th AS (SELECT max(h) AS theta, count(*) AS n_u FROM u),
      mt AS (SELECT count(*) AS n_match
             FROM (SELECT h FROM kmin GROUP BY h
                   HAVING count(DISTINCT source) = 2) b
             CROSS JOIN th WHERE b.h <= th.theta),
      ex AS (SELECT count(CASE WHEN source = 'src0' THEN 1 END) AS n_a,
                    count(CASE WHEN source = 'src1' THEN 1 END) AS n_b,
                    count(DISTINCT h) AS union_exact
             FROM elems)
      SELECT n_a, n_b, n_a + n_b - union_exact AS inter_exact, union_exact,
             est_a4, est_b4,
             round(CASE WHEN n_u < 64 THEN CAST(n_u AS DOUBLE)
               ELSE ${(63).toDouble * Dedup.PortableP} / theta END, 4)
               AS est_union4,
             round(n_match / least(64.0, CAST(n_u AS DOUBLE)), 4) AS jacc4,
             round(n_match / least(64.0, CAST(n_u AS DOUBLE)) *
               (CASE WHEN n_u < 64 THEN CAST(n_u AS DOUBLE)
                ELSE ${(63).toDouble * Dedup.PortableP} / theta END), 4)
               AS est_inter4
      FROM ex CROSS JOIN persrc CROSS JOIN mt CROSS JOIN th"""))),

    // Exact proportional stratified sample: 20% per source, chosen by the
    // portable doc-hash order (deterministic, reproducible cross-engine).
    // Both windows hash on `source`, so one exchange serves count + rank.
    // At 100 TB a dominant stratum serializes its rank window — the scale
    // path swaps row_number for the hash-threshold variant
    // (llm_hash_sample) once a stratum outgrows a partition.
    "llm_stratified_sample" -> (((spark, dir) => {
      val cntW = Window.partitionBy("source")
      val ordW = Window.partitionBy("source")
        .orderBy(Dedup.portableWordHash(col("doc_id")), col("doc_id"))
      load(spark, dir, "documents")
        .select(col("doc_id"), col("source"))
        .withColumn("n_src", count(lit(1)).over(cntW))
        .withColumn("rn", row_number().over(ordW))
        .filter(col("rn") <= ceil(col("n_src") * lit(0.2)))
        .select(col("doc_id"), col("source"), col("rn").cast("int").as("rn"))
        .orderBy("source", "rn")
    }, Some(s"""
      WITH d AS (
        SELECT doc_id, source,
               count(*) OVER (PARTITION BY source) AS n_src,
               row_number() OVER (PARTITION BY source ORDER BY
                 (CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)),
                    1, 15)) AS BIGINT) % ${Dedup.PortableP}), doc_id) AS rn
        FROM documents)
      SELECT doc_id, source, CAST(rn AS INT) AS rn
      FROM d WHERE rn <= CAST(ceil(n_src * 0.2) AS BIGINT)
      ORDER BY source, rn""")))
  )
}
