package graft.queries

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

  /** Strict left-fold dot product in DuckDB — the same summation order as
    * Spark's aggregate(zip_with(...)) / the native DotProductFloat loop. */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(list_zip($a, $b), " +
      s"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, x) -> acc + x)"

  /** Fixed BM25 query set over the synthetic corpus vocabulary. */
  private val Bm25Queries = Seq(
    1 -> Seq("hash", "join"),
    2 -> Seq("scan", "filter", "column"),
    3 -> Seq("stream", "window"))

  /** JL sign matrix shared by the Spark plan and the oracle (8×64 ±1). */
  private val JlPlanes = Dedup.portablePlanes(8, 64)

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
      WITH words AS (SELECT doc_id AS id,
                       unnest(string_split_regex(lower(trim(text)), '\\s+'))
                         AS w
                     FROM documents),
      doclen AS (SELECT id, count(*) AS dl FROM words GROUP BY 1),
      stats AS (SELECT count(*) AS n_docs, sum(dl) AS tot_len FROM doclen),
      qt AS (SELECT * FROM (VALUES ${Bm25Queries.flatMap { case (q, ts) =>
        ts.map(t => s"($q, '$t')") }.mkString(", ")}) AS t(query_id, w)),
      tf AS (SELECT id, w, count(*) AS tf FROM words
             WHERE w IN (SELECT w FROM qt) GROUP BY 1, 2),
      dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
      contrib AS (
        SELECT qt.query_id, tf.id,
               CAST(round(ln(1.0 + (stats.n_docs - dfreq.df + 0.5) /
                     (dfreq.df + 0.5)) * tf.tf * 2.2 /
                     (tf.tf + 1.2 * (0.25 + 0.75 * doclen.dl /
                       (CAST(stats.tot_len AS DOUBLE) / stats.n_docs))), 6)
                 AS DECIMAL(18,6)) AS c6
        FROM tf JOIN dfreq USING (w) JOIN qt USING (w)
             JOIN doclen ON doclen.id = tf.id CROSS JOIN stats),
      scored AS (SELECT query_id, id,
                   round(CAST(sum(c6) AS DOUBLE), 4) AS score4
                 FROM contrib GROUP BY 1, 2),
      ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY score4 DESC, id) AS rnk FROM scored)
      SELECT query_id, CAST(rnk AS INT) AS rnk, id AS doc_id, score4
      FROM ranked WHERE rnk <= 10 ORDER BY query_id, rnk"""))),

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
