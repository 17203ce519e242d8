package graft.queries

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Multimodal, Similarity, TextAnalysis, Vocab}
import Q._

/** Beyond-reference LLM-data-pipeline operators (BASELINE north star):
  * dedup family, similarity search, text analysis, multimodal plumbing.
  * EVERY query here is DuckDB-oracled — where an operator is hash- or
  * randomness-dependent, the query uses a portable twin (md5-derived
  * hashes, pinned plane/permutation constants, fold-ordered float math)
  * whose oracle SQL is GENERATED from the same Scala constants, so both
  * engines run literally identical arithmetic.
  */
object LlmQueries {

  /** Weak-supervision stopword list for the D125 trained quality scorer —
    * the same 15 EN stopwords the langid heuristic uses. */
  private val LrStopwords = Seq("the", "and", "of", "to", "in", "is",
    "that", "with", "for", "it", "was", "on", "are", "this", "be")

  /** DuckDB twin of LogReg.train + score on the quality features: the
    * oracle RE-TRAINS the 3 GD rounds as an unrolled CTE chain (generated
    * here so iteration arithmetic is written once), using the identical
    * rational sigmoid, per-term round(·,8) + DECIMAL(28,8) sums, and
    * round(·,8) weight updates — weights and scores must match Spark's
    * driver recurrence bit-for-bit. */
  private def lrQualityOracle: String = {
    val lr = "4.0"
    val sw = LrStopwords.map(w => s"'$w'").mkString("[", ",", "]")
    def gradCte(g: String, from: String): String =
      s"""$g AS (SELECT
         |  sum(CAST(round((p - y) * 1.0, 8) AS DECIMAL(28,8))) AS g0,
         |  sum(CAST(round((p - y) * x1, 8) AS DECIMAL(28,8))) AS g1,
         |  sum(CAST(round((p - y) * x2, 8) AS DECIMAL(28,8))) AS g2,
         |  sum(CAST(round((p - y) * x3, 8) AS DECIMAL(28,8))) AS g3
         |  FROM $from)""".stripMargin
    def wCte(w: String, g: String, prev: Option[String]): String = {
      val base = (j: Int) => prev.fold("0.0")(p => s"$p.w$j")
      s"""$w AS (SELECT
         |  round(${base(0)} - $lr * CAST($g.g0 AS DOUBLE) / nn, 8) AS w0,
         |  round(${base(1)} - $lr * CAST($g.g1 AS DOUBLE) / nn, 8) AS w1,
         |  round(${base(2)} - $lr * CAST($g.g2 AS DOUBLE) / nn, 8) AS w2,
         |  round(${base(3)} - $lr * CAST($g.g3 AS DOUBLE) / nn, 8) AS w3
         |  FROM $g, n${prev.fold("")(p => s", $p")})""".stripMargin
    }
    def pCte(p: String, w: String): String =
      s"""$p AS (SELECT z.*, round(0.5 + 0.5 * z / (1 + abs(z)), 8) AS p
         |  FROM (SELECT f.*, $w.w0 + $w.w1 * x1 + $w.w2 * x2 + $w.w3 * x3
         |          AS z FROM f, $w) z)""".stripMargin
    s"""
      WITH d AS (
        SELECT doc_id, lang, text,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+')) END
                 AS words
        FROM documents),
      f AS (
        SELECT doc_id,
               CASE WHEN words > 50 THEN 1.0 ELSE 0.0 END AS y,
               round(least(words, 512) / 512.0, 6) AS x1,
               round(len(list_intersect(list_distinct(
                   string_split_regex(lower(trim(text)), '\\s+')), $sw))
                 / 15.0, 6) AS x2,
               round(least(CASE WHEN words = 0 THEN 0.0
                                ELSE length(text) / CAST(words AS DOUBLE) END,
                           20.0) / 20.0, 6) AS x3
        FROM d),
      n AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM f),
      p1 AS (SELECT f.*, 0.5 AS p FROM f),
      ${(1 to 5).map { i =>
        val prev = if (i == 1) None else Some(s"w${i - 1}")
        (if (i == 1) "" else pCte(s"p$i", s"w${i - 1}") + ",\n      ") +
          gradCte(s"g$i", s"p$i") + ",\n      " + wCte(s"w$i", s"g$i", prev)
      }.mkString(",\n      ")}
      SELECT doc_id, round(0.5 + 0.5 * z / (1 + abs(z)), 6) AS score
      FROM (SELECT doc_id, w5.w0 + w5.w1 * x1 + w5.w2 * x2 + w5.w3 * x3 AS z
            FROM f, w5) zz
      ORDER BY doc_id"""
  }

  /** Skew guard for the oracled simhash query — BINDING at sf0.1 (near-dup
    * clusters make intra-bucket pair generation quadratic), and replicated
    * exactly in the oracle SQL (row_number ≤ cap per bucket, same doc_id
    * order as Spark's sort_array slice). */
  private val SimhashMaxBucket = 256

  /** DuckDB twin of Dedup.simhashChunksPortable + pair mining — generated
    * from the SAME constants (PortableP, portableA/B) so the two engines run
    * literally identical arithmetic. */
  private def simhashOracleSql: String = {
    val P = Dedup.PortableP
    val sumCols = (0 until 64).map(j =>
      s"SUM(CASE WHEN ((hb * ${Dedup.portableA(j)} + ${Dedup.portableB(j)}) " +
        s"% $P) * 2 < $P THEN 1 ELSE -1 END) AS s$j").mkString(", ")
    val chunkCols = (0 until 4).map { i =>
      (0 until 16).map(t =>
        s"(CASE WHEN s${16 * i + t} > 0 THEN ${1 << t} ELSE 0 END)")
        .mkString(" + ") + s" AS c$i"
    }.mkString(", ")
    s"""
      WITH words AS (
        SELECT doc_id, unnest(list_distinct(
          string_split_regex(lower(trim(text)), '\\s+'))) AS w
        FROM documents),
      h AS (
        SELECT doc_id,
               CAST(concat('0x', substring(md5(w), 1, 15)) AS BIGINT) % $P AS hb
        FROM words),
      sums AS (SELECT doc_id, $sumCols FROM h GROUP BY doc_id),
      chunks AS (SELECT doc_id, $chunkCols FROM sums),
      chunked AS (
        SELECT doc_id, c0, c1, c2, c3, x.chunk AS chunk,
               CASE x.chunk WHEN 0 THEN c0 WHEN 1 THEN c1
                            WHEN 2 THEN c2 ELSE c3 END AS ch
        FROM chunks, (VALUES (0), (1), (2), (3)) x(chunk)),
      kept AS (
        SELECT * FROM (SELECT *, row_number() OVER
            (PARTITION BY chunk, ch ORDER BY doc_id) AS rn FROM chunked)
        WHERE rn <= $SimhashMaxBucket),
      cand AS (
        SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
               bit_count(xor(a.c0, b.c0)) + bit_count(xor(a.c1, b.c1)) +
               bit_count(xor(a.c2, b.c2)) + bit_count(xor(a.c3, b.c3)) AS hamming
        FROM kept a JOIN kept b ON a.chunk = b.chunk AND a.ch = b.ch
         AND a.doc_id < b.doc_id)
      SELECT id1, id2, CAST(hamming AS INT) AS hamming
      FROM cand WHERE hamming <= 3 ORDER BY id1, id2"""
  }

  /** Shared plane matrix for the oracled embedding near-dup (8 planes ×
    * 64 dims, deterministic LCG constants — inlined into both engines). */
  private val EmbedPlanes = Dedup.portablePlanes(8, 64)
  private val EmbedMaxBucket = 256


  /** Shared connected-components CTE chain (DuckDB, recursive): exact
    * word-3-shingle Jaccard pairs → symmetric edges → reachability closure
    * `r`. dd_cluster labels from it; dd_canonical picks keepers from it. */
  private def ccCtes: String = """sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                 range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 1, 2)),
                 i -> concat_ws(' ',
                        string_split_regex(trim(text), '\s+')[i],
                        string_split_regex(trim(text), '\s+')[i+1],
                        string_split_regex(trim(text), '\s+')[i+2]))) AS g
        FROM documents),
      pairs AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) /
              (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.8),
      edges AS (SELECT id1 AS src, id2 AS dst FROM pairs
                UNION SELECT id2, id1 FROM pairs),
      r AS (
        SELECT src AS id, src AS reach FROM edges
        UNION
        SELECT r.id, e.dst FROM r JOIN edges e ON r.reach = e.src)"""

  /** Shared IVF index-build + probe CTE chain (DuckDB): smallest-id
    * centroids, fold-ordered cosine assignment, rounded-rank probes —
    * the exact replay of `Similarity.ivfTopK(nlist=32, nprobe=8)` on the
    * `vec_id < 8` query set. sim_ivf SELECTs its top-10 from `ivfranked`;
    * sim_recall joins `ivfranked` against a brute-force chain. */
  private def ivfCtes: String = s"""
      e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      cent AS (SELECT vec_id AS cent_id, v AS cv FROM e
               ORDER BY vec_id LIMIT 32),
      assign AS (
        SELECT vec_id, v, cent_id,
               row_number() OVER (PARTITION BY vec_id ORDER BY
                 ${dotSql("v", "cv")} /
                   (sqrt(${dotSql("v", "v")}) * sqrt(${dotSql("cv", "cv")}))
                 DESC, cent_id ASC) AS rn
        FROM e, cent),
      idx AS (SELECT vec_id, v, cent_id AS list_id FROM assign WHERE rn = 1),
      q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
      probes AS (
        SELECT query_id, qv, cent_id AS list_id FROM (
          SELECT query_id, qv, cent_id,
                 row_number() OVER (PARTITION BY query_id ORDER BY
                   ${dotSql("qv", "cv")} /
                     (sqrt(${dotSql("qv", "qv")}) * sqrt(${dotSql("cv", "cv")}))
                   DESC, cent_id ASC) AS rn
          FROM q, cent)
        WHERE rn <= 8),
      ivfscored AS (
        SELECT query_id, i.vec_id AS neighbor_id,
               round(${dotSql("qv", "i.v")} /
                 (sqrt(${dotSql("qv", "qv")}) * sqrt(${dotSql("i.v", "i.v")})), 4)
                 AS cosine4
        FROM probes p JOIN idx i USING (list_id)
        WHERE i.vec_id <> p.query_id),
      ivfranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY cosine4 DESC, neighbor_id ASC) AS rank
                    FROM ivfscored)"""

  /** Full SQL replay of `Similarity.ivfPqTopK(dim=64, nlist=16, nprobe=4,
    * m=4, ncodes=16)` on the `vec_id < 8` query set: coarse assignment,
    * residuals, largest-id residual codebook, per-subspace argmin codes,
    * per-(query, list) asymmetric distance tables, decimal-exact code-sum
    * ranking. Sub-distances use the canonical left-fold (dotSql's shape)
    * over list_slice subvectors so every rounded value matches to the bit. */
  private def ivfPqOracle: String = ivfPqOracleFrom("TRUE")

  /** IVF-PQ full SQL replay, with the index MODEL (centroids + codebook)
    * trained on the subset of the corpus satisfying `baseFilter` — "TRUE"
    * replays a full build; a cut predicate replays the D131 incremental
    * shape (model pinned on the base epoch, codes over everything). */
  private def ivfPqOracleFrom(baseFilter: String): String = {
    def fold(listExpr: String) =
      s"list_reduce(list_prepend(0.0, $listExpr), (a, b) -> a + b)"
    def subd(a: String, b: String) =
      s"""round(${fold(s"list_transform(list_zip(" +
        s"list_slice($a, j.j*8+1, j.j*8+8), " +
        s"list_slice($b, j.j*8+1, j.j*8+8)), " +
        "p -> (p[1]-p[2])*(p[1]-p[2]))")}, 4)"""
    s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      cent AS (SELECT vec_id AS cent_id, v AS cv FROM e
               WHERE $baseFilter ORDER BY vec_id LIMIT 32),
      assign AS (
        SELECT vec_id, v, cent_id,
               row_number() OVER (PARTITION BY vec_id ORDER BY
                 ${dotSql("v", "cv")} /
                   (sqrt(${dotSql("v", "v")}) * sqrt(${dotSql("cv", "cv")}))
                 DESC, cent_id ASC) AS rn
        FROM e, cent),
      resid AS (
        SELECT a.vec_id, a.cent_id AS list_id,
               list_transform(list_zip(a.v, c.cv), p -> p[1] - p[2]) AS r
        FROM assign a JOIN cent c ON a.cent_id = c.cent_id WHERE a.rn = 1),
      cb AS (SELECT vec_id AS code_id, r AS cr FROM resid
             WHERE $baseFilter ORDER BY vec_id DESC LIMIT 64),
      js AS (SELECT unnest(range(8)) AS j),
      subd AS (
        SELECT r.vec_id, r.list_id, c.code_id, j.j,
               ${subd("r.r", "c.cr")} AS d
        FROM resid r, cb c, js j),
      codes AS (
        SELECT vec_id, list_id, j, code_id FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id, j
                      ORDER BY d, code_id) AS rn FROM subd)
        WHERE rn = 1),
      q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
      probes AS (
        SELECT query_id, cent_id AS list_id,
               list_transform(list_zip(qv, cv), p -> p[1] - p[2]) AS qr
        FROM (
          SELECT query_id, qv, cent_id, cv,
                 row_number() OVER (PARTITION BY query_id ORDER BY
                   ${dotSql("qv", "cv")} /
                     (sqrt(${dotSql("qv", "qv")}) *
                      sqrt(${dotSql("cv", "cv")})) DESC, cent_id ASC) AS rn
          FROM q, cent) WHERE rn <= 8),
      dtab AS (
        SELECT p.query_id, p.list_id, c.code_id, j.j,
               ${subd("p.qr", "c.cr")} AS dj
        FROM probes p, cb c, js j),
      pqscored AS (
        SELECT d.query_id, c.vec_id AS neighbor_id,
               CAST(SUM(CAST(d.dj AS DECIMAL(18,4))) AS DOUBLE) AS adist4
        FROM codes c JOIN dtab d
          ON c.list_id = d.list_id AND c.j = d.j AND c.code_id = d.code_id
        WHERE c.vec_id <> d.query_id GROUP BY 1, 2),
      pqranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY adist4, neighbor_id) AS prank FROM pqscored),
      refined AS (
        SELECT s.query_id, s.neighbor_id,
               round(${dotSql("q.qv", "i.v")} /
                 (sqrt(${dotSql("q.qv", "q.qv")}) *
                  sqrt(${dotSql("i.v", "i.v")})), 4) AS cosine4
        FROM pqranked s
        JOIN q ON q.query_id = s.query_id
        JOIN (SELECT vec_id, v FROM e) i ON i.vec_id = s.neighbor_id
        WHERE s.prank <= 80),
      reranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY cosine4 DESC, neighbor_id) AS rank
                   FROM refined)
      SELECT query_id, neighbor_id, cosine4, CAST(rank AS INT) AS rank
      FROM reranked WHERE rank <= 10 ORDER BY query_id, rank"""
  }

  private def embedOracleSql: String = {
    val bucketExpr = EmbedPlanes.zipWithIndex.map { case (cs, p) =>
      val lit = cs.mkString("[", ", ", "]")
      s"(CASE WHEN ${dotSql("v", lit)} > 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString(" + ")
    s"""
      WITH base AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000,
               list_transform(embedding,
                 x -> CAST(x * CAST(1.1 AS FLOAT) AS FLOAT))::DOUBLE[]
        FROM embeddings WHERE vec_id < 20),
      b AS (SELECT vec_id, v, $bucketExpr AS bucket FROM base),
      kept AS (
        SELECT * FROM (SELECT *, row_number() OVER
            (PARTITION BY bucket ORDER BY vec_id) AS rn FROM b)
        WHERE rn <= $EmbedMaxBucket),
      cand AS (
        SELECT DISTINCT a.vec_id AS id1, b2.vec_id AS id2,
               round(${dotSql("a.v", "b2.v")} /
                 (sqrt(${dotSql("a.v", "a.v")}) *
                  sqrt(${dotSql("b2.v", "b2.v")})), 4) AS c4
        FROM kept a JOIN kept b2
          ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
      SELECT id1, id2, c4 FROM cand WHERE c4 >= 0.9 ORDER BY id1, id2"""
  }

  /** DuckDB twin of TextAnalysis.qualityScore — shared by `text_quality`
    * and the curation queries so the exact same arithmetic ranks both. */
  /** Brute-force exact word-3-shingle-Jaccard pairs ≥ 0.8 — the shared
    * oracle of dd_minhash and dd_cap_default (the LSH result matches
    * iff recall is 1.0 on this corpus). */
  private val minhashExactOracleSql: String = """
      WITH sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                 range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 1, 2)),
                 i -> concat_ws(' ',
                        string_split_regex(trim(text), '\s+')[i],
                        string_split_regex(trim(text), '\s+')[i+1],
                        string_split_regex(trim(text), '\s+')[i+2]))) AS g
        FROM documents),
      pairs AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2,
               len(list_intersect(a.g, b.g)) AS i,
               len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) AS u
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      SELECT id1, id2, round(CAST(i AS DOUBLE) / u, 4) AS j4
      FROM pairs WHERE CAST(i AS DOUBLE) / u >= 0.8
      ORDER BY id1, id2"""

  private val qualityOracleBody: String = """
      WITH f AS (
        SELECT doc_id,
               CAST(length(text) AS DOUBLE) AS chars,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS DOUBLE) AS toks,
               CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) AS punct,
               CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) AS digits,
               CAST(
                 len(list_intersect(list_distinct(string_split_regex(lower(trim(text)), '\s+')),
                   ['the','and','of','to','in','is','that','with','for','it','was','on','are','this','be'])) +
                 len(list_intersect(list_distinct(string_split_regex(lower(trim(text)), '\s+')),
                   ['el','la','de','que','y','en','los','del','las','un','una','con','por','para','es'])) +
                 len(list_intersect(list_distinct(string_split_regex(lower(trim(text)), '\s+')),
                   ['der','die','und','das','von','zu','mit','den','ist','im','ein','eine','auf','nicht','als'])) +
                 len(list_intersect(list_distinct(string_split_regex(lower(trim(text)), '\s+')),
                   ['le','la','les','de','des','et','en','un','une','du','est','dans','que','pour','qui']))
               AS DOUBLE) AS stophits
        FROM documents)
      SELECT doc_id,
             round(least(toks / 20.0, 1.0) * 0.3
               + greatest(0.0, 1.0 - (punct / greatest(chars, 1.0)) * 4) * 0.25
               + greatest(0.0, 1.0 - (digits / greatest(chars, 1.0)) * 4) * 0.25
               + least(stophits / 5.0, 1.0) * 0.2, 4) AS quality
      FROM f"""

  /** DuckDB twin of the word-3-shingle set (Dedup.wordShingles w=3): same
    * boundaries, same whole-doc fallback for short texts (concat_ws skips
    * the NULL slots past the array end). */
  private val gram3Sql: String = """
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(len(ws) - 1, 2)),
               i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])))) AS g
      FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
            FROM documents)"""

  val defs: Map[String, Entry] = Map(

    // ---- training-data curation operators ----

    // Decontamination: flag training docs sharing any word-3-gram with the
    // eval set (doc_id % 100 == 0 plays the held-out benchmark; real
    // pipelines use longer grams — width is a parameter, 3 collides
    // meaningfully on this synthetic vocab). Shape: explode grams on both
    // sides, inner-join on the gram, count distinct shared grams per doc —
    // at 100 TB the join keys would be xxhash64(g) (longs, not strings)
    // and the eval side (tiny by construction) broadcasts; the string join
    // here keeps the oracle exact.
    "llm_decontaminate" -> (((spark, dir) => {
      val docs = load(spark, dir, "documents")
      def grams(df: org.apache.spark.sql.DataFrame) =
        df.select(col("doc_id"),
          explode(Dedup.wordShingles(col("text"), 3)).as("g"))
      val evalGrams = grams(docs.filter(col("doc_id") % 100 === 0))
        .select("g").distinct()
      grams(docs.filter(col("doc_id") % 100 =!= 0))
        .join(broadcast(evalGrams), "g")
        .groupBy("doc_id")
        .agg(count_distinct(col("g")).as("n_shared"))
        .orderBy("doc_id")
    }, Some(s"""
      WITH g AS ($gram3Sql),
      e AS (SELECT DISTINCT g FROM g WHERE doc_id % 100 = 0),
      t AS (SELECT * FROM g WHERE doc_id % 100 <> 0)
      SELECT t.doc_id, count(DISTINCT t.g) AS n_shared
      FROM t JOIN e USING (g)
      GROUP BY t.doc_id ORDER BY doc_id"""))),

    // D220 — eval-overlap contamination REPORT (Dedup.overlapFractions):
    // D19's binary flag upgraded to the overlap FRACTION per (corpus
    // doc, eval doc) pair — n_shared distinct gram hashes / the eval
    // item's gram count, rounded 4, thresholded at 0.03 (the synthetic vocab collides at low rates; real pipelines use 8-grams and higher floors). Grams hash to
    // the portable space before any exchange; the eval side broadcasts.
    // The oracle replays hash, counts, division and threshold exactly.
    "llm_overlap_frac" -> (((spark, dir) => {
      val docs = load(spark, dir, "documents")
      Dedup.overlapFractions(
        docs.filter(col("doc_id") % 100 =!= 0),
        docs.filter(col("doc_id") % 100 === 0),
        "doc_id", "text", width = 3, minFrac = 0.03)
        .orderBy("doc_id", "eval_id")
    }, Some(s"""
      WITH g0 AS ($gram3Sql),
      g AS (SELECT DISTINCT doc_id,
              CAST(concat('0x', substring(md5(g), 1, 15)) AS BIGINT)
                % ${Dedup.PortableP} AS gh
            FROM g0),
      e AS (SELECT doc_id AS eval_id, gh FROM g WHERE doc_id % 100 = 0),
      en AS (SELECT eval_id, CAST(count(*) AS BIGINT) AS n
             FROM e GROUP BY 1),
      t AS (SELECT doc_id, gh FROM g WHERE doc_id % 100 <> 0),
      sh AS (SELECT t.doc_id, e.eval_id,
               CAST(count(*) AS BIGINT) AS n_shared
             FROM t JOIN e USING (gh) GROUP BY 1, 2)
      SELECT sh.doc_id, sh.eval_id, sh.n_shared,
             round(CAST(n_shared AS DOUBLE) / n, 4) AS frac4
      FROM sh JOIN en USING (eval_id)
      WHERE round(CAST(n_shared AS DOUBLE) / n, 4) >= 0.03
      ORDER BY doc_id, eval_id"""))),

    // Deterministic hash sampling: a reproducible ~10% corpus sample keyed
    // on md5(doc_id) — the way a 100 TB pipeline samples (pure per-row
    // predicate, no RNG state, no shuffle; pushdown-friendly and stable
    // across re-runs/engines, unlike TABLESAMPLE)
    "llm_hash_sample" -> (((spark, dir) => {
      load(spark, dir, "documents")
        .filter(Dedup.portableWordHash(col("doc_id")) % 100 < 10)
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        .orderBy("doc_id")
    }, Some(s"""
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
      FROM documents
      WHERE (CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
               AS BIGINT) % ${Dedup.PortableP}) % 100 < 10
      ORDER BY doc_id"""))),

    // Corpus mixing: per-source (domain) sampling rates — the pretraining
    // mixture step (upweight clean domains, downsample the rest). The keep
    // decision is the same deterministic md5(doc_id) predicate as
    // llm_hash_sample, thresholded per source: rate% = 100 − 4·source_idx.
    // Pure per-row predicate + one aggregation; reproducible across runs
    // and engines, no RNG state.
    "llm_mix_sources" -> (((spark, dir) => {
      val srcIdx = regexp_replace(col("source"), "[^0-9]", "").cast("int")
      val bucket = Dedup.portableWordHash(col("doc_id")) % 100
      load(spark, dir, "documents")
        .withColumn("kept",
          when(bucket < lit(100) - srcIdx * 4, 1L).otherwise(0L))
        .groupBy("source")
        .agg(count(lit(1)).as("n_total"), sum(col("kept")).as("n_kept"))
        .orderBy("source")
    }, Some(s"""
      SELECT source, count(*) AS n_total,
             CAST(SUM(CASE WHEN (CAST(concat('0x',
                   substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                   % ${Dedup.PortableP}) % 100
                 < 100 - 4 * CAST(regexp_replace(source, '[^0-9]', '', 'g')
                   AS INT)
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      FROM documents GROUP BY source ORDER BY source"""))),

    // Temperature-based multilingual rebalancing (the α=0.5 upsampling of
    // low-resource languages from multilingual-LM data work): target share
    // per language ∝ n^α, keep-rate r = min(1, share·T/n) materialized as
    // an integer PPM threshold against the portable doc hash — fully
    // deterministic (per-language sqrt terms go through a 6-dp decimal sum
    // so the normalizer is exact and order-independent), one scan + one
    // broadcast of 4 tiny rate rows.
    "llm_temperature_mix" -> (((spark, dir) => {
      val docs = load(spark, dir, "documents")
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      val z = counts.agg(
        sum(round(sqrt(col("n")), 6).cast("decimal(18,6)")).cast("double")
          .as("z"),
        sum(col("n")).as("total"))
      val rates = counts.crossJoin(broadcast(z))
        .withColumn("rate_ppm", least(lit(1000000L),
          floor(round(sqrt(col("n")), 6).cast("double") / col("z") *
            floor(col("total") * 0.4) / col("n") * 1000000).cast("long")))
        .select(col("lang"), col("rate_ppm"))
      docs
        .withColumn("b",
          graft.llm.Dedup.portableWordHash(col("doc_id")) % 1000000)
        .join(broadcast(rates), "lang")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("b") < col("rate_ppm"), 1L).otherwise(0L))
            .as("n_kept"),
          max(col("rate_ppm")).as("rate_ppm"))
        .orderBy("lang")
    }, Some(s"""
      WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
      zt AS (SELECT CAST(SUM(CAST(round(sqrt(n), 6) AS DECIMAL(18,6)))
                      AS DOUBLE) AS z,
                    CAST(SUM(n) AS BIGINT) AS total FROM c),
      r AS (SELECT lang,
              least(1000000, CAST(floor(CAST(round(sqrt(n), 6) AS DOUBLE)
                / z * floor(total * 0.4) / n * 1000000) AS BIGINT))
                AS rate_ppm
            FROM c, zt)
      SELECT d.lang, count(*) AS n_total,
             CAST(SUM(CASE WHEN (CAST(concat('0x',
                   substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
                   AS BIGINT) % ${graft.llm.Dedup.PortableP}) % 1000000
                 < r.rate_ppm THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             max(r.rate_ppm) AS rate_ppm
      FROM documents d JOIN r USING (lang)
      GROUP BY 1 ORDER BY 1"""))),

    // Sequence packing: assemble docs into fixed token-budget training
    // sequences (2048) with a per-SHARD running token sum — the window is
    // partitioned by shard so packing parallelizes across executors (a
    // global cumsum would serialize 100 TB through one partition); each
    // shard packs its docs in id order, first-fit
    "llm_pack_sequences" -> (((spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val toks = load(spark, dir, "documents")
        .select(col("doc_id"), pmod(col("doc_id"), lit(8)).as("shard"),
          TextAnalysis.tokenCount(col("text")).as("tok"))
      val w = Window.partitionBy("shard").orderBy("doc_id")
      toks.withColumn("cum", sum("tok").over(w))
        .withColumn("seq_id",
          ((col("cum") - col("tok")) / lit(2048)).cast("long"))
        .groupBy("shard", "seq_id")
        .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("seq_tokens"))
        .orderBy("shard", "seq_id")
    }, Some("""
      WITH t AS (
        SELECT doc_id, doc_id % 8 AS shard,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS tok
        FROM documents),
      c AS (
        SELECT shard, doc_id, tok,
               CAST(SUM(tok) OVER (PARTITION BY shard ORDER BY doc_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM t)
      SELECT shard, (cum - tok) // 2048 AS seq_id, count(*) AS n_docs,
             CAST(SUM(tok) AS BIGINT) AS seq_tokens
      FROM c GROUP BY 1, 2 ORDER BY shard, seq_id"""))),

    // Quality-ranked curation: keep the top-3 docs per language by quality
    // score (rounded-score ranking + id tiebreak, the fp-stable contract) —
    // the "take the best N per stratum" selection every curated corpus runs
    "llm_curate_topk" -> (((spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang")
        .orderBy(col("quality").desc, col("doc_id").asc)
      load(spark, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("lang"), col("rn").as("rank_in_lang"), col("doc_id"),
          col("quality"))
        .orderBy("lang", "rank_in_lang")
    }, Some(s"""
      WITH q AS ($qualityOracleBody),
      ranked AS (
        SELECT d.lang, q.doc_id, q.quality,
               row_number() OVER (PARTITION BY d.lang
                 ORDER BY q.quality DESC, q.doc_id ASC) AS rank_in_lang
        FROM q JOIN documents d USING (doc_id))
      SELECT lang, CAST(rank_in_lang AS INT) AS rank_in_lang, doc_id, quality
      FROM ranked WHERE rank_in_lang <= 3
      ORDER BY lang, rank_in_lang"""))),

    // D241 — difficulty-binned curriculum interleaving (llm.Curriculum):
    // the training-order scheduler between curation and the D203 shard
    // writer. Docs bin by exact word-count quartiles (t-digest
    // cutpoints at corpus scale), then the stride schedule gives bin
    // element i of n the key i/(n+1) — every prefix of the
    // (sched_key, bin, bin_rank) order carries each bin in proportion
    // to its corpus share. The gate require()s that contract EXACTLY
    // (the half-prefix holds n_b/2 ± 1 of every bin) and oracles the
    // full (bin, rank, key) assignment via the SQL replay; no global
    // window anywhere in the operator — one shuffle keyed by bin.
    "llm_curriculum" -> (((spark, dir) => {
      val docs = load(spark, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("double").as("nw"))
      val thr = docs.agg(percentile(col("nw"),
          array(lit(0.25), lit(0.5), lit(0.75))))
        .head().getSeq[Double](0)
      val sched = graft.llm.Curriculum.interleave(
          graft.llm.Curriculum.binByThresholds(docs, col("nw"), thr),
          "bin", "doc_id")
        .localCheckpoint()
      Q.Phase.opDone() // prefix-balance proof below
      val perBin = sched.groupBy("bin").agg(count(lit(1)).as("n"),
          sum(when(col("sched_key") <= 0.5, 1L).otherwise(0L))
            .as("half"))
        .collect()
      require(perBin.length == 4, s"expected 4 quartile bins, got " +
        s"${perBin.length}")
      perBin.foreach { r =>
        val (n, half) = (r.getLong(1), r.getLong(2))
        require(math.abs(half - n / 2.0) <= 1.0,
          s"prefix balance broken for bin ${r.get(0)}: $half of $n")
      }
      sched.select(col("doc_id"), col("bin"), col("bin_rank"),
          col("sched_key"))
        .orderBy("doc_id")
    }, Some("""
      WITH t AS (
        SELECT doc_id,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+'))
                    END AS DOUBLE) AS nw
        FROM documents),
      q AS (SELECT quantile_cont(nw, 0.25) AS q1,
                   quantile_cont(nw, 0.50) AS q2,
                   quantile_cont(nw, 0.75) AS q3 FROM t),
      b AS (SELECT doc_id,
              1 + CASE WHEN nw > q1 THEN 1 ELSE 0 END
                + CASE WHEN nw > q2 THEN 1 ELSE 0 END
                + CASE WHEN nw > q3 THEN 1 ELSE 0 END AS bin
            FROM t, q),
      r AS (SELECT doc_id, bin,
              row_number() OVER (PARTITION BY bin ORDER BY doc_id)
                AS bin_rank,
              count(*) OVER (PARTITION BY bin) AS n
            FROM b)
      SELECT doc_id, CAST(bin AS INT) AS bin,
             CAST(bin_rank AS INT) AS bin_rank,
             round(CAST(bin_rank AS DOUBLE) / (n + 1), 9) AS sched_key
      FROM r ORDER BY doc_id"""))),

    // Exact dedup on content hash
    "dd_exact" -> (((spark, dir) => {
      Dedup.exact(load(spark, dir, "documents"), "doc_id", "text")
        .orderBy("keep_id")
    }, Some("""
      SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
             count(*) AS dup_count
      FROM documents GROUP BY text ORDER BY keep_id"""))),

    // MinHash+LSH near-dup pairs, verified by exact word-3-shingle Jaccard.
    // Oracle = brute-force exact-Jaccard pairs: matches iff LSH recall is
    // 1.0 on this corpus (validated on the fixed testdata; threshold 0.8
    // with k=32,b=8 ⇒ collision prob ≥ 0.985 per qualifying pair).
    // Cap-less since r14: the call takes the ScaleConfig.Auto default, so
    // the battery's flagship dedup gate exercises the DERIVED-cap path —
    // at this corpus the derivation clamps to the largest band bucket,
    // capping is a no-op, and the oracle match pins recall stays 1.0.
    "dd_minhash" -> (((spark, dir) => {
      Dedup.minhashLshPairs(load(spark, dir, "documents"), "doc_id", "text",
          shingleWidth = 3, k = 32, b = 8, threshold = 0.8)
        .select(col("id1"), col("id2"), round(col("jaccard"), 4).as("j4"))
        .orderBy("id1", "id2")
    }, Some(minhashExactOracleSql))),

    // D229 — derived caps are the DEFAULT, not an opt-in: the cap-less
    // run above must emit EXACTLY the pairs of an explicit maxBucket=64
    // run (today's constant) — the budget derivation clamps to the
    // largest bucket at battery SFs, so equal membership frames, equal
    // pairs, and the exact-Jaccard oracle replays the result. A drifted
    // derivation (cap below a real bucket) would break the equality
    // require before it could silently ship fewer pairs.
    "dd_cap_default" -> (((spark, dir) => {
      val docs = load(spark, dir, "documents")
      val auto = Dedup.minhashLshPairs(docs, "doc_id", "text",
          shingleWidth = 3, k = 32, b = 8, threshold = 0.8)
        .select(col("id1"), col("id2"), round(col("jaccard"), 4).as("j4"))
        .localCheckpoint()
      Q.Phase.opDone() // explicit-cap equality proof below
      // equality proof at correctness SF only (Q.benchLean contract):
      // the explicit-cap arm is a full second mine that exists purely
      // to prove the derived cap reproduces it — Verify runs it every
      // round, the bench times the derived-cap mine itself
      if (!Q.benchLean) {
        val explicit = Dedup.minhashLshPairs(docs, "doc_id", "text",
            shingleWidth = 3, k = 32, b = 8, threshold = 0.8,
            maxBucket = 64)
          .select(col("id1"), col("id2"),
            round(col("jaccard"), 4).as("j4"))
        require(auto.exceptAll(explicit).isEmpty &&
          explicit.exceptAll(auto).isEmpty,
          "the cap-less (derived) run must equal the explicit cap-64 run")
      }
      auto.orderBy("id1", "id2")
    }, Some(minhashExactOracleSql))),

    // D124 — STREAMING near-dup dedup (Streams.nearDupStream): documents
    // arrive as a stream in two epochs (ids < 250, then the rest appended
    // and the query RESTARTED from its checkpoint), each doc is flagged
    // against everything seen before it — second-epoch dups of first-epoch
    // docs must come out of the state store, not the batch. Per-bucket
    // state verifies candidates with exact Jaccard, so under the
    // ascending-id feed the verdicts equal the batch miner's min-id-wins —
    // which is what the brute-force oracle replays (same shingle grammar
    // as dd_minhash). Final per-doc verdict = OR over the b band verdicts,
    // a plain batch aggregation over the (fault-tolerant) file sink.
    "dd_stream_neardup" -> (((spark, dir) => withStreamPartitions(spark, 4) {
      // 4 state partitions: the wall here is state-store checkpoint I/O
      // (exact-verification shingle sets), and store instances scale with
      // shuffle partitions x stateful ops x micro-batches — semantics are
      // partition-count-invariant (r9: 6.7 -> measured below)
      import org.apache.spark.sql.streaming.Trigger
      val tmp = Q.scratchDir("sneardup_gate")
      val (raw, outp, chk) = (tmp.resolve("raw").toString,
        tmp.resolve("out").toString, tmp.resolve("chk").toString)
      try {
        // bounded corpus half: the gate proves STATE-STORE semantics
        // (cross-epoch dup detection through a checkpoint restart), and
        // state checkpointing carries exact-verification shingle sets —
        // corpus size only scales the checkpoint I/O, not the semantics
        val docs = load(spark, dir, "documents").select("doc_id", "text")
          .filter(col("doc_id") % 2 === 0)
        // 4 files per epoch: the file-source stream parallelizes by file,
        // and the shingle/minhash map stage is the gate's wall — one file
        // would run it on one core (measured 2.7 exec-s single-task)
        Q.FixtureCache.link(spark, s"$dir|neardup_e1", raw)(
          docs.filter(col("doc_id") < 250).coalesce(4))
        val schema = spark.read.parquet(raw).schema
        Q.Phase.setupDone() // op = both stream epochs (incl. the
        // epoch-2 fixture append: the restart THROUGH new files IS the
        // operator under test) + the final per-doc verdict fold
        def run(): Unit = {
          val in = spark.readStream.schema(schema).parquet(raw)
          val q = graft.streaming.Streams
            .nearDupStream(in, "doc_id", "text",
              shingleWidth = 3, k = 32, b = 8, threshold = 0.8)
            .toDF().writeStream.format("parquet")
            .option("path", outp).option("checkpointLocation", chk)
            .outputMode("append").trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        // the epoch split + restart is correctness protocol (state-store
        // reload is what Verify proves); verdicts are feed-order-
        // independent (min-id-wins under ANY order — see nearDupStream),
        // so one delivery yields the identical frame
        if (!Q.benchLean) run() // epoch 1: ids < 250
        Q.FixtureCache.link(spark, s"$dir|neardup_e2", raw)(
          docs.filter(col("doc_id") >= 250).coalesce(4))
        run() // epoch 2: restart; cross-epoch dups prove the state store
        spark.read.parquet(outp)
          .groupBy("doc_id")
          .agg(max(col("is_dup")).as("is_dup"),
            coalesce(min(when(col("dup_of") >= 0, col("dup_of"))), lit(-1L))
              .as("dup_of"))
          .orderBy("doc_id")
          .localCheckpoint() // materialize before the sink dir dies
      } finally graft.sink.StageWriter.deleteRecursively(tmp)
    }, Some("""
      WITH dd AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
      sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                 range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 1, 2)),
                 i -> concat_ws(' ',
                        string_split_regex(trim(text), '\s+')[i],
                        string_split_regex(trim(text), '\s+')[i+1],
                        string_split_regex(trim(text), '\s+')[i+2]))) AS g
        FROM dd),
      p AS (
        SELECT b.doc_id, min(a.doc_id) AS dup_of
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
              / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.8
        GROUP BY b.doc_id)
      SELECT d.doc_id, p.doc_id IS NOT NULL AS is_dup,
             COALESCE(p.dup_of, -1) AS dup_of
      FROM dd d LEFT JOIN p ON d.doc_id = p.doc_id
      ORDER BY d.doc_id"""))),

    // Duplicate CLUSTERS: connected components over the minhash pair graph
    // (pairs alone mishandle chains A~B~C — the canonical survivor must be
    // chosen per component). Oracle = DuckDB recursive CTE reachability
    // over the brute-force pair set.
    // D219 — cross-source duplication matrix (Dedup.sourceDupMatrix):
    // the mined near-dup pairs rolled up per UNORDERED source pair —
    // the overlap analysis a mixture designer runs before setting
    // D32/D48 weights (which sources duplicate INTO which; the
    // diagonal is within-source duplication). Oracle = brute-force
    // exact-Jaccard pairs joined to sources (recall-1.0 argument as
    // dd_minhash).
    "dd_source_matrix" -> (((spark, dir) => {
      val docs = load(spark, dir, "documents")
      val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleWidth = 3, k = 32, b = 8, threshold = 0.8)
        .select("id1", "id2")
      Dedup.sourceDupMatrix(pairs, docs, "doc_id", "source")
        .orderBy("source_a", "source_b")
    }, Some("""
      WITH sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                 range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 1, 2)),
                 i -> concat_ws(' ',
                        string_split_regex(trim(text), '\s+')[i],
                        string_split_regex(trim(text), '\s+')[i+1],
                        string_split_regex(trim(text), '\s+')[i+2]))) AS g
        FROM documents),
      p AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
              / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))
              >= 0.8),
      s AS (SELECT doc_id, source FROM documents)
      SELECT least(sa.source, sb.source) AS source_a,
             greatest(sa.source, sb.source) AS source_b,
             CAST(count(*) AS BIGINT) AS n_dup_pairs
      FROM p JOIN s sa ON p.id1 = sa.doc_id
             JOIN s sb ON p.id2 = sb.doc_id
      GROUP BY 1, 2 ORDER BY 1, 2"""))),

    // phase: genuinely all-op — the gate runs nothing but the operator
    // chain (pair mining → connected components); no fixture, no proof
    "dd_cluster" -> (((spark, dir) => {
      val pairs = Dedup.minhashLshPairs(load(spark, dir, "documents"),
        "doc_id", "text", shingleWidth = 3, k = 32, b = 8, threshold = 0.8)
      Dedup.connectedComponents(pairs.select(col("id1"), col("id2")))
        .select(col("id").as("doc_id"), col("cluster"))
        .orderBy("doc_id")
    }, Some(s"""
      WITH RECURSIVE $ccCtes
      SELECT id AS doc_id, min(reach) AS cluster
      FROM r GROUP BY id ORDER BY doc_id"""))),

    // D119 — incremental CC maintenance: the corpus labeling absorbs a
    // new batch by contracting each old component to its label star and
    // re-running the star rounds over label edges + new pairs only —
    // never the historical pair graph. Must equal from-scratch CC over
    // the full graph: the oracle IS dd_cluster's full-graph recursive
    // closure.
    "dd_cluster_incr" -> (((spark, dir) => {
      val docs = load(spark, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 4 =!= 0)
      val batch = docs.filter(col("doc_id") % 4 === 0)
      // STORED labeling via a real parquet round-trip (the production
      // shape), not localCheckpoint: a checkpoint preserves the origin
      // plan's constraints, and the CC plan's internal self-union
      // attributes then crash Spark's union constraint rewrite when the
      // labeling is composed into the next run ("key not found: u#...")
      val tmp = Q.scratchDir("cc_incr")
      val lp = tmp.resolve("labels").toString
      // the stored labeling is FIXTURE state (setup, not the operator):
      // build it once per JVM and hardlink into this pass's scratch dir
      // (the streaming gates' FixtureCache discipline — VERDICT r14 #6),
      // so the timed passes measure the INCREMENT, not a re-mine + CC of
      // the corpus per pass. Labels are deterministic (cluster = min id
      // of the component, partitioning-invariant), so every pass links
      // byte-identical fixture rows; Verify builds it fresh per JVM too.
      Q.FixtureCache.link(spark, s"$dir|dd_cluster_incr_labels", lp) {
        Dedup.connectedComponents(
          Dedup.minhashLshPairs(corpus, "doc_id", "text",
            shingleWidth = 3, k = 32, b = 8, threshold = 0.8)
            .select(col("id1"), col("id2")))
      }
      val labels0 = spark.read.parquet(lp)
      // the corpus labeling is fixture state the increment consumes —
      // everything after (pair mining on the batch + ccIncremental) is
      // the operator under test
      Q.Phase.setupDone()
      try {
        val crossPairs = Dedup.minhashLshNewVsCorpus(corpus, batch,
            "doc_id", "text", shingleWidth = 3, k = 32, b = 8,
            threshold = 0.8)
          .select(col("batch_id").as("id1"), col("corpus_id").as("id2"))
        val intraPairs = Dedup.minhashLshPairs(batch, "doc_id", "text",
            shingleWidth = 3, k = 32, b = 8, threshold = 0.8)
          .select(col("id1"), col("id2"))
        // mined pairs stored too (CC's init reads its input four ways;
        // a parquet write is both the realistic shape and the cheap one)
        val pp = tmp.resolve("pairs").toString
        crossPairs.unionByName(intraPairs).write.parquet(pp)
        Dedup.ccIncremental(labels0, spark.read.parquet(pp))
          .select(col("id").as("doc_id"), col("cluster"))
          .orderBy("doc_id")
          .localCheckpoint()
      } finally graft.sink.StageWriter.deleteRecursively(tmp)
    }, Some(s"""
      WITH RECURSIVE $ccCtes
      SELECT id AS doc_id, min(reach) AS cluster
      FROM r GROUP BY id ORDER BY doc_id"""))),

    // Canonical-representative selection (the curation step AFTER dup
    // clustering): every doc joins its connected component (singletons
    // form their own), and exactly one KEEPER per cluster survives — the
    // longest doc, doc_id tiebreak. One left join against the (small)
    // component table + one cluster-keyed window.
    // phase: genuinely all-op — pair mining → CC → survivor window IS
    // the operator composition under test; no fixture, no proof
    "dd_canonical" -> (((spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = load(spark, dir, "documents")
      val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleWidth = 3, k = 32, b = 8, threshold = 0.8)
      val cc = Dedup.connectedComponents(pairs.select(col("id1"),
          col("id2")))
        .withColumnRenamed("id", "doc_id")
      val w = Window.partitionBy("cluster")
        .orderBy(col("n_chars").desc, col("doc_id"))
      docs.select("doc_id", "n_chars")
        .join(cc, Seq("doc_id"), "left")
        .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
        .withColumn("keep",
          when(row_number().over(w) === 1, 1).otherwise(0))
        .orderBy("doc_id")
    }, Some(s"""
      WITH RECURSIVE $ccCtes,
      cc AS (SELECT id AS doc_id, min(reach) AS cluster FROM r GROUP BY id),
      alldocs AS (
        SELECT d.doc_id, d.n_chars, COALESCE(cc.cluster, d.doc_id)
                 AS cluster
        FROM documents d LEFT JOIN cc USING (doc_id))
      SELECT doc_id, n_chars, cluster,
             CASE WHEN row_number() OVER (PARTITION BY cluster
               ORDER BY n_chars DESC, doc_id) = 1 THEN 1 ELSE 0 END AS keep
      FROM alldocs ORDER BY doc_id"""))),

    // Incremental dedup: a NEW batch (doc_id % 5 == 0) mined against the
    // EXISTING corpus (the rest) — band-join, never an all-pairs scan.
    // Oracle = brute-force Jaccard of batch × corpus (recall 1.0 on this
    // corpus at threshold 0.8, same argument as dd_minhash).
    "dd_incremental" -> (((spark, dir) => {
      val docs = load(spark, dir, "documents")
      Dedup.minhashLshNewVsCorpus(
          docs.filter(col("doc_id") % 5 =!= 0),
          docs.filter(col("doc_id") % 5 === 0),
          "doc_id", "text", shingleWidth = 3, k = 32, b = 8, threshold = 0.8)
        .select(col("batch_id"), col("corpus_id"),
          round(col("jaccard"), 4).as("j4"))
        .orderBy("batch_id", "corpus_id")
    }, Some("""
      WITH sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                 range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 1, 2)),
                 i -> concat_ws(' ',
                        string_split_regex(trim(text), '\s+')[i],
                        string_split_regex(trim(text), '\s+')[i+1],
                        string_split_regex(trim(text), '\s+')[i+2]))) AS g
        FROM documents),
      pairs AS (
        SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
               len(list_intersect(b.g, c.g)) AS i,
               len(b.g) + len(c.g) - len(list_intersect(b.g, c.g)) AS u
        FROM sh b JOIN sh c
          ON b.doc_id % 5 = 0 AND c.doc_id % 5 <> 0)
      SELECT batch_id, corpus_id, round(CAST(i AS DOUBLE) / u, 4) AS j4
      FROM pairs WHERE CAST(i AS DOUBLE) / u >= 0.8
      ORDER BY batch_id, corpus_id"""))),

    // D27+ — incremental dedup via the PERSISTED band table
    // (dd_incremental's production loop made literal): corpus bands
    // written to disk, an accepted batch's bands APPENDED — maintenance
    // without a corpus re-mine — then the next batch queried against the
    // read-back table, verifying candidates through a semi-join-pruned
    // corpus text lookup. Must equal the from-scratch recompute: the
    // oracle is dd_incremental's all-pairs SQL over the same split.
    "dd_incremental_update" -> (((spark, dir) => {
      val docs = load(spark, dir, "documents")
      val corpus0 = docs.filter(col("doc_id") % 5 =!= 0 &&
        col("doc_id") % 5 =!= 4)
      val batch1 = docs.filter(col("doc_id") % 5 === 4)
      val batch2 = docs.filter(col("doc_id") % 5 === 0)
      val tmp = Q.scratchDir("incr_bands")
      try {
        val bt = tmp.resolve("bands").toString
        Dedup.bandTableFor(corpus0, "doc_id", "text").write.parquet(bt)
        Dedup.bandTableFor(batch1, "doc_id", "text")
          .write.mode("append").parquet(bt)
        Dedup.minhashLshBatchVsStoredBands(
            docs.filter(col("doc_id") % 5 =!= 0),
            spark.read.parquet(bt), batch2, "doc_id", "text",
            shingleWidth = 3, k = 32, b = 8, threshold = 0.8)
          .select(col("batch_id"), col("corpus_id"),
            round(col("jaccard"), 4).as("j4"))
          .orderBy("batch_id", "corpus_id")
          .localCheckpoint()
      } finally graft.sink.StageWriter.deleteRecursively(tmp)
    }, Some("""
      WITH sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                 range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 1, 2)),
                 i -> concat_ws(' ',
                        string_split_regex(trim(text), '\s+')[i],
                        string_split_regex(trim(text), '\s+')[i+1],
                        string_split_regex(trim(text), '\s+')[i+2]))) AS g
        FROM documents),
      pairs AS (
        SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
               len(list_intersect(b.g, c.g)) AS i,
               len(b.g) + len(c.g) - len(list_intersect(b.g, c.g)) AS u
        FROM sh b JOIN sh c
          ON b.doc_id % 5 = 0 AND c.doc_id % 5 <> 0)
      SELECT batch_id, corpus_id, round(CAST(i AS DOUBLE) / u, 4) AS j4
      FROM pairs WHERE CAST(i AS DOUBLE) / u >= 0.8
      ORDER BY batch_id, corpus_id"""))),

    // SimHash near-dup pairs. The portable variant derives bit contributions
    // from a polynomial word hash (identical math in both engines) so the
    // full pipeline — hash → 64 bit-sums → chunk banding → hamming filter —
    // is DuckDB-verified; simhashPairs (xxhash64) is the production twin
    // with the same shape.
    // phase: genuinely all-op — ONE operator call over the source table
    // (hash → bit-sums → banding → hamming filter); no fixture, no proof
    "dd_simhash" -> (((spark, dir) => {
      Dedup.simhashPairsPortable(load(spark, dir, "documents"), "doc_id",
          "text", maxHamming = 3, maxBucket = SimhashMaxBucket)
        .orderBy("id1", "id2")
    }, Some(simhashOracleSql))),

    // Character-3-gram Jaccard for explicit candidate pairs (consecutive ids)
    "dd_ngram" -> (((spark, dir) => {
      val docs = load(spark, dir, "documents")
      val pairs = docs.select(col("doc_id").as("id1"))
        .join(docs.select(col("doc_id").as("id2")),
          col("id2") === col("id1") + 1)
      Dedup.ngramJaccardPairs(docs, pairs, "doc_id", "text", n = 3)
        .select(col("id1"), col("id2"), round(col("jaccard"), 4).as("j4"))
        .orderBy("id1")
    }, Some("""
      WITH g AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, length(text) - 1),
                 i -> substring(text, i, 3))) AS ng
        FROM documents)
      SELECT a.doc_id AS id1, b.doc_id AS id2,
             round(CAST(len(list_intersect(a.ng, b.ng)) AS DOUBLE) /
               (len(a.ng) + len(b.ng) - len(list_intersect(a.ng, b.ng))), 4) AS j4
      FROM g a JOIN g b ON b.doc_id = a.doc_id + 1
      ORDER BY id1"""))),

    // EXACT set-similarity self-join via prefix filtering (PPJoin family,
    // Dedup.prefixJaccardPairs): every pair with word-set Jaccard ≥ 0.8,
    // no false negatives — the exact complement to the LSH miners. The
    // oracle is the O(n²) brute force over ALL pairs, so the hash match
    // proves the prefix filter dropped nothing. Gated on a FIXED 500-doc
    // slice (the full corpus at sf0.01): this synthetic corpus shares a
    // template vocabulary so ~25% of ALL pairs pass even at 0.8 — output
    // is inherently quadratic in corpus size on this data, and the bounded
    // slice keeps the bench measuring the operator, not the data's
    // pathology. (On natural corpora the rare-token prefixes are the
    // selectivity; LSH miners remain the first-line tool either way.)
    "dd_prefix_join" -> (((spark, dir) => {
      Dedup.prefixJaccardPairs(
          load(spark, dir, "documents").filter(col("doc_id") < 500),
          "doc_id", "text", threshold = 0.8)
        .select(col("id1"), col("id2"), round(col("jaccard"), 4).as("j4"))
        .orderBy("id1", "id2")
    }, Some("""
      WITH t AS (
        SELECT doc_id,
               list_distinct(string_split_regex(lower(trim(text)), '\s+'))
                 AS ts
        FROM documents WHERE doc_id < 500)
      SELECT a.doc_id AS id1, b.doc_id AS id2,
             round(CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) /
               (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))), 4)
               AS j4
      FROM t a JOIN t b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) /
              (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts)))
            >= 0.8
      ORDER BY id1, id2"""))),

    // Embedding near-dup via sign-LSH. The raw corpus has no cosine≥0.9
    // pairs, so plant exact duplicates (scaled copies, cosine = 1.0) of the
    // first 20 vectors — the detector must surface them. The portable
    // variant pins the hyperplane matrix to shared constants and computes
    // every dot product as the same left fold in both engines, so the full
    // pipeline (projection signs → buckets → capped pairs → rounded-cosine
    // threshold) is DuckDB-verified; embeddingNearDup (xxhash planes) is
    // the production twin.
    "dd_embed" -> (((spark, dir) => {
      val emb = load(spark, dir, "embeddings")
      val planted = emb.filter(col("vec_id") < 20)
        .select((col("vec_id") + 1000000).as("vec_id"),
          transform(col("embedding"), x => x * lit(1.1f)).as("embedding"),
          col("label"))
      Dedup.embeddingNearDupPortable(emb.unionByName(planted), "vec_id",
          "embedding", threshold = 0.9, planes = EmbedPlanes,
          maxBucket = EmbedMaxBucket)
        .orderBy("id1", "id2")
    }, Some(embedOracleSql))),

    // SemDeDup (Abbas et al. 2023): IVF-cluster the corpus, drop within
    // each cluster every vector with a >= tau cosine neighbor of smaller
    // id. 20 planted scaled copies (cosine exactly 1.0 with their
    // originals) land in their original's cluster and MUST drop; the
    // oracle replays the whole pipeline — centroid choice, min-struct
    // assignment, rounded within-cluster cosines
    "dd_semantic" -> (((spark, dir) => {
      val emb = load(spark, dir, "embeddings")
      val planted = emb.filter(col("vec_id") < 20)
        .select((col("vec_id") + 1000000).as("vec_id"),
          transform(col("embedding"), x => x * lit(1.1f)).as("embedding"))
      val base = emb.select(col("vec_id"), col("embedding"))
        .unionByName(planted)
      // ScaleConfig pin (r13): nlist 16 is a DEFAULT, not law — the
      // uniform-shard derivation under the budget today's constant
      // spends (⌈n²/16⌉) must reproduce it on this corpus
      val n = base.count()
      val derived = graft.llm.ScaleConfig.nlistFor(n, (n * n + 15) / 16)
      require(derived == 16,
        s"derived nlist $derived must reproduce the constant 16 under " +
          "its own budget — the uniform-shard derivation drifted")
      Similarity.semanticDedup(base, "vec_id", "embedding",
          nlist = 16, tau = 0.9)
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id")
    }, Some(s"""
      WITH base AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000,
               list_transform(embedding,
                 x -> CAST(x * CAST(1.1 AS FLOAT) AS FLOAT))::DOUBLE[]
        FROM embeddings WHERE vec_id < 20),
      cent AS (SELECT vec_id AS cent_id, v AS cv FROM base
               ORDER BY vec_id LIMIT 16),
      assign AS (
        SELECT vec_id, v, cent_id,
               row_number() OVER (PARTITION BY vec_id ORDER BY
                 ${dotSql("v", "cv")} /
                   (sqrt(${dotSql("v", "v")}) * sqrt(${dotSql("cv", "cv")}))
                 DESC, cent_id ASC) AS rn
        FROM base, cent),
      idx AS (SELECT vec_id, v, cent_id AS list_id FROM assign WHERE rn = 1),
      drops AS (
        SELECT DISTINCT b2.vec_id AS id
        FROM idx a JOIN idx b2
          ON a.list_id = b2.list_id AND a.vec_id < b2.vec_id
        WHERE round(${dotSql("a.v", "b2.v")} /
                (sqrt(${dotSql("a.v", "a.v")}) *
                 sqrt(${dotSql("b2.v", "b2.v")})), 4) >= 0.9)
      SELECT i.vec_id, i.list_id,
             CASE WHEN d.id IS NULL THEN 0 ELSE 1 END AS dropped
      FROM idx i LEFT JOIN drops d ON i.vec_id = d.id
      ORDER BY i.vec_id"""))),

    // Brute-force cosine top-k (recall-1 baseline): ranks on ROUNDED cosine
    // so cross-engine fp noise cannot reorder, tie-broken by neighbor id
    "sim_topk" -> (((spark, dir) => {
      val emb = load(spark, dir, "embeddings")
      // rounded-rank mode: cross-engine fp noise cannot reorder results
      Similarity.bruteForceTopK(emb.filter(col("vec_id") < 8), emb,
          "vec_id", "embedding", k = 10, roundDigits = Some(4))
        .select(col("query_id"), col("neighbor_id"),
          col("cosine").as("cosine4"), col("rank").as("rnk"))
        .orderBy("query_id", "rnk")
    }, Some(s"""
      WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                 FROM embeddings WHERE vec_id < 8),
      scored AS (
        SELECT query_id, e.vec_id AS neighbor_id,
               round(${dotSql("qv", "e.embedding::DOUBLE[]")} /
                 (sqrt(${dotSql("qv", "qv")}) *
                  sqrt(${dotSql("e.embedding::DOUBLE[]",
                    "e.embedding::DOUBLE[]")})), 4) AS c4
        FROM q, embeddings e WHERE e.vec_id <> query_id),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY c4 DESC, neighbor_id) AS rnk
        FROM scored)
      SELECT query_id, neighbor_id, c4 AS cosine4, rnk
      FROM ranked WHERE rnk <= 10 ORDER BY query_id, rnk"""))),

    // IVF approximate top-k (scale path). Recall < 1 vs brute force, but the
    // ALGORITHM is deterministic — smallest-id centroids, fold-ordered
    // cosine assignment, rounded-rank probes — so the oracle replays the
    // exact same index build + probe in SQL and the output hash-matches.
    "sim_ivf" -> (((spark, dir) => {
      val emb = load(spark, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
      Similarity.ivfTopK(q, emb, "vec_id", "embedding", k = 10,
          nlist = 32, nprobe = 8, roundDigits = Some(4))
        .select(col("query_id"), col("neighbor_id"),
          col("cosine").as("cosine4"), col("rank"))
        .orderBy("query_id", "rank")
    }, Some(s"""
      WITH $ivfCtes
      SELECT query_id, neighbor_id, cosine4, CAST(rank AS INT) AS rank
      FROM ivfranked WHERE rank <= 10 ORDER BY query_id, rank"""))),

    // ANN recall evaluation ("measure, don't guess"): recall@10 of the IVF
    // path against the exact brute-force list, per query. Both rankers use
    // rounded-rank mode with identical tiebreaks, so the lists — and the
    // recall — are deterministic cross-engine. At scale this is the
    // tuning harness for (nlist, nprobe): the brute pass runs on a SAMPLE
    // of queries, the IVF pass is the production config under test.
    "sim_recall" -> (((spark, dir) => {
      val emb = load(spark, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
      val bf = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding",
          k = 10, roundDigits = Some(4))
        .select(col("query_id"), col("neighbor_id"))
      val iv = Similarity.ivfTopK(q, emb, "vec_id", "embedding", k = 10,
          nlist = 32, nprobe = 8, roundDigits = Some(4))
        .select(col("query_id"), col("neighbor_id"))
        .withColumn("hit", lit(1))
      bf.join(iv, Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id").agg(count(col("hit")).as("n_hit"))
        .select(col("query_id"), col("n_hit"),
          round(col("n_hit") / lit(10.0), 4).as("recall4"))
        .orderBy("query_id")
    }, Some(s"""
      WITH $ivfCtes,
      bscored AS (
        SELECT q.query_id, e2.vec_id AS neighbor_id,
               round(${dotSql("qv", "e2.v")} /
                 (sqrt(${dotSql("qv", "qv")}) *
                  sqrt(${dotSql("e2.v", "e2.v")})), 4) AS c4
        FROM q, e e2 WHERE e2.vec_id <> q.query_id),
      branked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY c4 DESC, neighbor_id) AS rnk FROM bscored),
      rec AS (
        SELECT b.query_id, count(i.neighbor_id) AS n_hit
        FROM branked b LEFT JOIN ivfranked i
          ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
         AND i.rank <= 10
        WHERE b.rnk <= 10 GROUP BY 1)
      SELECT query_id, n_hit, round(n_hit / 10.0, 4) AS recall4
      FROM rec ORDER BY query_id"""))),

    // D7+D51 COMPOSED — the IVF-PQ serving shape (coarse lists → PQ
    // residual codes → asymmetric distance scan), the memory-bounded ANN
    // a 100 TB corpus keeps hot: the query path touches only m-byte codes
    // plus one shared codebook, never a full-precision vector. The gate
    // require()s recall@10 against the brute-force arm (the sim_recall
    // tuning-harness contract) and hash-matches the ENTIRE pipeline —
    // assignment, residuals, codebook, codes, distance tables, ranking —
    // against the SQL replay.
    "sim_ivfpq" -> (((spark, dir) => {
      val emb = load(spark, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
      // checkpoint: the result feeds the recall proof AND the output —
      // un-checkpointed it re-ran the whole train+encode+probe twice
      val pq = Similarity.ivfPqTopK(q, emb, "vec_id", "embedding",
        dim = 64, k = 10, nlist = 32, nprobe = 8, m = 8, ncodes = 64,
        rerank = 8).localCheckpoint()
      Q.Phase.opDone() // brute-force recall floor is the PROOF
      val bf = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding",
          k = 10, roundDigits = Some(4))
        .select(col("query_id"), col("neighbor_id"))
        .withColumn("hit", lit(1))
      val recall = pq.join(bf, Seq("query_id", "neighbor_id"), "left")
        .agg((sum(coalesce(col("hit"), lit(0))) / count(lit(1)))
          .cast("double")).head().getDouble(0)
      require(recall >= 0.30,
        f"IVF-PQ recall@10 vs brute force = $recall%.3f — under the 0.30 " +
          "serving floor; retune (nlist, nprobe, m, ncodes)")
      pq.orderBy("query_id", "rank")
    }, Some(ivfPqOracle))),

    // D122 — IVF-PQ index PERSISTENCE (the serving lifecycle): the index
    // (centroids, codebook, codes) is built ONCE, written to parquet, read
    // back, and queried — build offline / serve online, the shape a 100 TB
    // corpus actually deploys (index build is a batch job; queries only
    // load codes + codebook and point-read shortlisted vectors). Results
    // must be bit-identical to the inline composition, so the SAME SQL
    // replay is the oracle.
    "sim_ivfpq_stored" -> (((spark, dir) => {
      val emb = load(spark, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
      val tmp = Q.scratchDir("ivfpq_idx")
      try {
        // offline build + persist = fixture; op = the serving path
        // (load index + query). The build is deterministic (pinned
        // k-means, SQL-replayed by the oracle), so the persisted index
        // is FixtureCache'd per JVM and hardlinked per pass — timed
        // passes measure SERVING, not four re-builds of the same index
        // (r15 methodology note). The lazy triple is built at most once
        // per JVM (first cache miss).
        lazy val built = Similarity.ivfPqBuild(emb, "vec_id",
          "embedding", dim = 64, nlist = 32, m = 8, ncodes = 64)
        Q.FixtureCache.link(spark, s"$dir|ivfpq_stored_cents",
          tmp.resolve("centroids").toString) { built._1 }
        Q.FixtureCache.link(spark, s"$dir|ivfpq_stored_cb",
          tmp.resolve("codebook").toString) { built._2 }
        Q.FixtureCache.link(spark, s"$dir|ivfpq_stored_codes",
          tmp.resolve("codes").toString) { built._3 }
        Q.Phase.setupDone()
        Similarity.ivfPqQuery(q,
            spark.read.parquet(tmp.resolve("centroids").toString),
            spark.read.parquet(tmp.resolve("codebook").toString),
            spark.read.parquet(tmp.resolve("codes").toString),
            emb, "vec_id", "embedding", dim = 64, k = 10, nprobe = 8,
            m = 8, rerank = 8)
          .orderBy("query_id", "rank")
          .localCheckpoint() // materialize before the index dir dies
      } finally graft.sink.StageWriter.deleteRecursively(tmp)
    }, Some(ivfPqOracle))),

    // D131 — incremental IVF-PQ index MAINTENANCE (Similarity.ivfPqEncode):
    // the index model (centroids + codebook) trains on a BASE epoch and
    // is then FROZEN; a later vector batch is assigned/encoded against
    // the stored model and its codes rows APPENDED — the stored corpus is
    // never touched and queries see the union immediately (how a served
    // ANN index actually ingests). The oracle replays the same pinned
    // model in SQL (ivfPqOracleFrom with the base-epoch filter).
    "sim_ivfpq_incr" -> (((spark, dir) => {
      val emb = load(spark, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
      val base = emb.filter(col("vec_id") < 100)
      val add = emb.filter(col("vec_id") >= 100)
      val (cents0, cb0, codesBase0) = Similarity.ivfPqBuild(base, "vec_id",
        "embedding", dim = 64, nlist = 32, m = 8, ncodes = 64)
      // the frozen base-epoch model is the fixture: materialize it so
      // the op phase measures encode-append + query, not the k-means
      val cents = cents0.localCheckpoint()
      val cb = cb0.localCheckpoint()
      val codesBase = codesBase0.localCheckpoint()
      Q.Phase.setupDone()
      val codes = codesBase.unionByName(Similarity.ivfPqEncode(add, cents,
        cb, "vec_id", "embedding", dim = 64, m = 8))
      Similarity.ivfPqQuery(q, cents, cb, codes, emb, "vec_id", "embedding",
        dim = 64, k = 10, nprobe = 8, m = 8, rerank = 8)
        .orderBy("query_id", "rank")
    }, Some(ivfPqOracleFrom("vec_id < 100")))),

    // Embedding L2 norms (deterministic double fold — exact cross-engine)
    "sim_norms" -> (((spark, dir) => {
      load(spark, dir, "embeddings")
        .select(col("vec_id"),
          round(Similarity.l2norm(col("embedding")), 4).as("norm4"),
          col("label"))
        .orderBy("vec_id")
    }, Some("""
      SELECT vec_id,
             round(sqrt(list_reduce(list_transform(embedding::DOUBLE[],
               x -> x * x), (a, b) -> a + b)), 4) AS norm4,
             label
      FROM embeddings ORDER BY vec_id"""))),

    // Native codegen'd dot product (graft.functions.DotProductFloat) on the
    // ANN hot path: every (query × corpus-row) pair scored by the tight
    // float loop instead of the HOF zip/aggregate — same strict left fold
    // in double, so the oracle replays the identical list_reduce. The
    // VectorOpsSpec proves native ≡ HOF at the BIT level; this gate proves
    // the native path end-to-end against the second engine.
    "sim_dot_native" -> (((spark, dir) => {
      val emb = load(spark, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      emb.crossJoin(broadcast(q))
        .select(col("query_id"), col("vec_id"),
          round(graft.functions.VectorOps.vecDot(col("embedding"), col("qv")), 4)
            .as("dot4"))
        .orderBy("query_id", "vec_id")
    }, Some(s"""
      WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                 FROM embeddings WHERE vec_id < 8)
      SELECT query_id, e.vec_id,
             round(${dotSql("e.embedding", "qv")}, 4) AS dot4
      FROM embeddings e, q
      ORDER BY query_id, e.vec_id"""))),

    // Context-window chunking: 32-token windows sliding by 24 (8 overlap) —
    // per-row HOF + narrow explode, zero shuffles; the gate verifies chunk
    // boundaries AND content (md5 of each chunk's text)
    "llm_chunk_docs" -> (((spark, dir) => {
      TextAnalysis.chunkDocs(load(spark, dir, "documents"),
          "doc_id", "text", chunkTokens = 32, overlap = 8)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "chunk_start")
    }, Some("""
      WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
                 FROM documents),
      s AS (SELECT doc_id, ws,
                   unnest(range(0, greatest(len(ws) - 9, 0) + 1, 24))
                     AS chunk_start
            FROM w)
      SELECT doc_id, CAST(chunk_start AS INT) AS chunk_start,
             CAST(least(32, len(ws) - chunk_start) AS INT) AS n_chunk_tokens,
             md5(array_to_string(ws[chunk_start+1 : chunk_start+32], ' '))
               AS chunk_md5
      FROM s ORDER BY doc_id, chunk_start"""))),

    // TF-IDF keyword extraction: top-3 terms per doc by tf·ln(N/df) on the
    // rounded score — three combinable aggregations + a per-doc rank window
    "text_tfidf" -> (((spark, dir) => {
      TextAnalysis.tfidfTopK(load(spark, dir, "documents"),
          "doc_id", "text", k = 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "rnk")
    }, Some("""
      WITH words AS (SELECT doc_id,
                       unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
                     FROM documents),
      tf AS (SELECT doc_id, w, count(*) AS tf FROM words GROUP BY 1, 2),
      dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT count(*) AS n_docs FROM documents),
      scored AS (
        SELECT doc_id, w,
               round(tf * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 4)
                 AS score4
        FROM tf JOIN dfreq USING (w) CROSS JOIN n),
      ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                   ORDER BY score4 DESC, w ASC) AS rnk FROM scored)
      SELECT doc_id, CAST(rnk AS INT) AS rnk, w AS term, score4
      FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk"""))),

    // Int8 embedding quantization: per-vector max-abs scale, rounded
    // components — every arithmetic step (fold max, division, half-away
    // rounding) has an exact DuckDB twin, so the quantized checksums
    // hash-match
    "sim_quantize" -> (((spark, dir) => {
      val v = col("embedding")
      load(spark, dir, "embeddings")
        .select(col("vec_id"), TextAnalysis.bindOnce(
          Similarity.maxAbs(v) / 127.0) { scale =>
          TextAnalysis.bindOnce(Similarity.quantizeInt8(v, scale)) { q =>
            struct(round(scale, 8).as("scale8"),
              aggregate(q, lit(0L), (a, x) => a + x).as("qsum"),
              array_min(q).as("qmin"), array_max(q).as("qmax"))
          }
        }.as("s"))
        .select(col("vec_id"), col("s.scale8"), col("s.qsum"),
          col("s.qmin"), col("s.qmax"))
        .orderBy("vec_id")
    }, Some("""
      WITH b AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               list_reduce(list_prepend(0.0,
                 list_transform(embedding::DOUBLE[], x -> abs(x))),
                 (a, x) -> greatest(a, x)) / 127.0 AS scale
        FROM embeddings),
      q AS (
        SELECT vec_id, scale,
               list_transform(v, x -> CAST(round(x / scale) AS INT)) AS qv
        FROM b)
      SELECT vec_id, round(scale, 8) AS scale8,
             CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(qv, x -> CAST(x AS BIGINT))),
               (a, x) -> a + x) AS BIGINT) AS qsum,
             list_min(qv) AS qmin, list_max(qv) AS qmax
      FROM q ORDER BY vec_id"""))),

    // Adjacent-word PMI collocations (TextAnalysis.cooccurrencePmi): the
    // word-association miner behind phrase vocabularies — one bigram
    // explode, map-side-combined pair/unigram counts, scalar-N broadcast,
    // per-task-heap top-k. (n_ab, w1, w2) totally orders the cutoff so the
    // LIMIT is deterministic; PMI double math has fixed operation order.
    "text_pmi" -> (((spark, dir) => {
      graft.llm.TextAnalysis.cooccurrencePmi(
        load(spark, dir, "documents"), "text", topK = 40)
    }, Some("""
      WITH w AS (SELECT string_split_regex(lower(trim(text)), '\s+') AS ws
                 FROM documents),
      bg AS (SELECT unnest(ws[1:len(ws)-1]) AS w1,
                    unnest(ws[2:len(ws)]) AS w2
             FROM w WHERE len(ws) >= 2),
      ab AS (SELECT w1, w2, count(*) AS n_ab FROM bg GROUP BY 1, 2),
      a AS (SELECT w1, count(*) AS n_a FROM bg GROUP BY 1),
      b AS (SELECT w2, count(*) AS n_b FROM bg GROUP BY 1),
      t AS (SELECT count(*) AS n_total FROM bg)
      SELECT w1, w2, n_ab,
             round(log2(CAST(n_ab AS DOUBLE) * n_total / n_a / n_b), 4)
               AS pmi4
      FROM ab JOIN a USING (w1) JOIN b USING (w2), t
      ORDER BY n_ab DESC, w1, w2 LIMIT 40"""))),

    // Product-quantization codes (Similarity.pqEncode): 64-dim vectors →
    // 4 subspace code ids from a seed-free 16-entry codebook — the
    // compressed-index rung of the ANN family. Assignment is one
    // map-side-combinable min(struct(rounded_dist, code_id)) aggregation
    // over a broadcast codebook; the oracle unpivots the 4 subspaces and
    // replays the identical argmin + reconstruction error.
    "sim_pq" -> (((spark, dir) => {
      Similarity.pqEncode(load(spark, dir, "embeddings"), "vec_id",
          "embedding", dim = 64, m = 4, ncodes = 16)
        .orderBy("vec_id")
    }, Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      cb AS (SELECT vec_id AS code_id, v AS cv FROM e
             ORDER BY vec_id LIMIT 16),
      d AS (
        SELECT e.vec_id, cb.code_id, j.j,
               round(CASE j.j
                 WHEN 0 THEN list_distance(e.v[1:16],  cb.cv[1:16])
                 WHEN 1 THEN list_distance(e.v[17:32], cb.cv[17:32])
                 WHEN 2 THEN list_distance(e.v[33:48], cb.cv[33:48])
                 ELSE        list_distance(e.v[49:64], cb.cv[49:64])
               END, 4) AS dist
        FROM e, cb, (SELECT unnest(range(4)) AS j) j),
      r AS (SELECT *, row_number() OVER (PARTITION BY vec_id, j
                       ORDER BY dist, code_id) AS rn FROM d),
      b AS (SELECT vec_id,
              max(CASE WHEN j = 0 THEN code_id END) AS c0,
              max(CASE WHEN j = 0 THEN dist END) AS d0,
              max(CASE WHEN j = 1 THEN code_id END) AS c1,
              max(CASE WHEN j = 1 THEN dist END) AS d1,
              max(CASE WHEN j = 2 THEN code_id END) AS c2,
              max(CASE WHEN j = 2 THEN dist END) AS d2,
              max(CASE WHEN j = 3 THEN code_id END) AS c3,
              max(CASE WHEN j = 3 THEN dist END) AS d3
            FROM r WHERE rn = 1 GROUP BY 1)
      SELECT vec_id,
             c0 || ',' || c1 || ',' || c2 || ',' || c3 AS codes,
             round(d0 + d1 + d2 + d3, 4) AS recon
      FROM b ORDER BY vec_id"""))),

    // PII redaction: emails + long digit runs replaced with tokens. The
    // corpus is word soup, so deterministic synthetic PII is appended in
    // BOTH engines (same concat) and the gate verifies counts AND the md5
    // of the scrubbed text — byte-identical redaction, not just counts
    "llm_redact" -> (((spark, dir) => {
      val pii = concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@example.com ref "),
        (col("doc_id") * 7654321L + 1000000L).cast("string"))
      load(spark, dir, "documents")
        .select(col("doc_id"), TextAnalysis.bindOnce(pii) { t =>
          struct(
            regexp_count(t, lit(TextAnalysis.EmailPattern)).as("n_emails"),
            regexp_count(t, lit(TextAnalysis.LongNumberPattern)).as("n_nums"),
            md5(TextAnalysis.redact(t)).as("redacted_md5"))
        }.as("s"))
        .select(col("doc_id"), col("s.n_emails"), col("s.n_nums"),
          col("s.redacted_md5"))
        .orderBy("doc_id")
    }, Some(s"""
      WITH p AS (
        SELECT doc_id,
               concat(text, ' contact user', CAST(doc_id AS VARCHAR),
                 '@example.com ref ',
                 CAST(doc_id * 7654321 + 1000000 AS VARCHAR)) AS t
        FROM documents)
      SELECT doc_id,
             CAST(len(regexp_extract_all(t,
               '${TextAnalysis.EmailPattern}')) AS INT)
               AS n_emails,
             CAST(len(regexp_extract_all(t,
               '${TextAnalysis.LongNumberPattern}')) AS INT) AS n_nums,
             md5(regexp_replace(regexp_replace(t,
               '${TextAnalysis.EmailPattern}',
               '<EMAIL>', 'g'),
               '${TextAnalysis.LongNumberPattern}', '<NUM>', 'g'))
               AS redacted_md5
      FROM p ORDER BY doc_id"""))),

    // Repetition filter (Gopher-style): most-frequent word-2-gram share per
    // doc — boilerplate detection via two map-side-combinable aggregations
    "text_repetition" -> (((spark, dir) => {
      TextAnalysis.repetitionStats(load(spark, dir, "documents"),
          "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }, Some("""
      WITH w AS (SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\s+') AS ws
                 FROM documents),
      g AS (SELECT doc_id, unnest(list_transform(
              range(1, greatest(len(ws), 2)),
              i -> concat_ws(' ', ws[i], ws[i+1]))) AS g
            FROM w),
      c AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2)
      SELECT doc_id, max(c) AS max_c, CAST(SUM(c) AS BIGINT) AS n_grams,
             round(CAST(max(c) AS DOUBLE) / CAST(SUM(c) AS BIGINT), 4)
               AS rep_ratio
      FROM c GROUP BY doc_id ORDER BY doc_id"""))),

    // Token counting (whitespace + char counts)
    "text_tokens" -> (((spark, dir) => {
      val d = load(spark, dir, "documents")
      d.select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          length(col("text")).as("n_chars_calc"))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
             length(text) AS n_chars_calc
      FROM documents ORDER BY doc_id"""))),

    // BPE-ish subword estimate (RE2-compatible pattern — same regex IS the
    // oracle)
    "text_bpeish" -> (((spark, dir) => {
      load(spark, dir, "documents")
        .select(col("doc_id"),
          graft.llm.TextAnalysis.bpeishCount(col("text")).as("n_subwords"))
        .orderBy("doc_id")
    }, Some(s"""
      SELECT doc_id,
             len(regexp_extract_all(text, '${graft.llm.TextAnalysis.BpeishPattern}')) AS n_subwords
      FROM documents ORDER BY doc_id"""))),

    // Gopher quality rules (Rae et al. 2021): word-count bounds, mean word
    // length, type-token ratio, alpha-word fraction, stopword presence —
    // pure per-row expressions over one bound tokenization, zero shuffles
    "text_gopher" -> (((spark, dir) => {
      load(spark, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.gopherStats(col("text")).as("g"))
        .select(col("doc_id"), col("g.n_words"), col("g.mean_wlen"),
          col("g.ttr"), col("g.alpha_frac"), col("g.n_stop"), col("g.keep"))
        .orderBy("doc_id")
    }, Some("""
      WITH w AS (SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\s+') AS ws,
                   length(trim(text)) AS lt
                 FROM documents),
      s AS (SELECT doc_id,
              CASE WHEN lt = 0 THEN 0 ELSE len(ws) END AS n_words,
              list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(ws, x -> CAST(length(x) AS BIGINT))),
                (a, b) -> a + b) AS suml,
              len(list_distinct(ws)) AS n_distinct,
              len(list_filter(ws, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
              len(list_intersect(list_distinct(ws),
                ['the','and','of','to','in','is','that','with','for','it',
                 'was','on','are','this','be'])) AS n_stop
            FROM w),
      m AS (SELECT doc_id, n_words,
              CASE WHEN n_words = 0 THEN 0.0
                   ELSE round(CAST(suml AS DOUBLE) / n_words, 4) END AS mean_wlen,
              CASE WHEN n_words = 0 THEN 0.0
                   ELSE round(CAST(n_distinct AS DOUBLE) / n_words, 4) END AS ttr,
              CASE WHEN n_words = 0 THEN 0.0
                   ELSE round(CAST(n_alpha AS DOUBLE) / n_words, 4) END AS alpha_frac,
              n_stop
            FROM s)
      SELECT doc_id, n_words, mean_wlen, ttr, alpha_frac, n_stop,
             CASE WHEN n_words BETWEEN 50 AND 100000
                   AND mean_wlen BETWEEN 3.0 AND 10.0
                   AND alpha_frac >= 0.8 AND ttr >= 0.2 AND n_stop >= 2
                  THEN 1 ELSE 0 END AS keep
      FROM m ORDER BY doc_id"""))),

    // Cross-document duplicated-span rate (Lee et al. 2022 exact-substring
    // metric): fraction of word-8-gram positions whose gram occurs in 2+
    // docs — shuffles carry 60-bit gram hashes and ids, never text
    "dd_dup_spans" -> (((spark, dir) => {
      Dedup.dupSpanStats(load(spark, dir, "documents"), "doc_id", "text",
          width = 8)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }, Some("""
      WITH w AS (SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\s+') AS ws
                 FROM documents),
      g AS (SELECT doc_id, unnest(list_transform(range(1, len(ws) - 6),
              i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3],
                             ws[i+4], ws[i+5], ws[i+6], ws[i+7]))) AS gram
            FROM w WHERE len(ws) >= 8),
      h AS (SELECT doc_id,
              CAST('0x' || substring(md5(gram), 1, 15) AS BIGINT) AS h
            FROM g),
      nd AS (SELECT h, count(DISTINCT doc_id) AS nd FROM h GROUP BY 1),
      pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
             FROM h JOIN nd USING (h) GROUP BY 1)
      SELECT d.doc_id,
             coalesce(n_grams, 0) AS n_grams,
             coalesce(n_dup, 0) AS n_dup,
             CASE WHEN coalesce(n_grams, 0) = 0 THEN 0.0
                  ELSE round(CAST(n_dup AS DOUBLE) / n_grams, 4) END AS dup_frac
      FROM documents d LEFT JOIN pd USING (doc_id) ORDER BY doc_id"""))),

    // D115 — set-containment join (near-superset detection): pairs where
    // A's distinct word-3-grams are >= 80% inside B's — the asymmetric
    // quote/excerpt relation Jaccard dilutes when |B| >> |A|. Spark side
    // runs the LOSSLESS asymmetric prefix filter (rarest-gram candidates);
    // the oracle computes all-pairs containment directly, same discipline
    // as dd_prefix_join.
    "dd_containment" -> (((spark, dir) => {
      Dedup.containmentPairs(
          load(spark, dir, "documents").filter(col("doc_id") < 500),
          "doc_id", "text", width = 3, threshold = 0.8)
        .select(col("id1"), col("id2"),
          round(col("containment"), 4).as("c4"))
        .orderBy("id1", "id2")
    }, Some("""
      WITH w AS (SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\s+') AS ws
                 FROM documents WHERE doc_id < 500),
      t AS (SELECT doc_id, list_distinct(list_transform(
              range(1, len(ws) - 1),
              i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS ts
            FROM w WHERE len(ws) >= 3)
      SELECT a.doc_id AS id1, b.doc_id AS id2,
             round(CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) /
               len(a.ts), 4) AS c4
      FROM t a JOIN t b ON a.doc_id <> b.doc_id
      WHERE CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) / len(a.ts)
            >= 0.8
      ORDER BY id1, id2"""))),

    // D111 — exact duplicated-span REMOVAL (the rewrite twin of
    // dd_dup_spans, Lee et al. 2022): every word position covered by an
    // 8-gram occurring in 2+ docs is dropped and the survivors rejoined.
    // Coverage is ONE per-doc window max over gram-start flags (never a
    // width-way position explode); gram shuffles carry 60-bit hashes. The
    // oracle replays hash, coverage window and reassembly exactly.
    // phase: genuinely all-op — one operator call over the source
    // table; no fixture, no proof
    "dd_strip_spans" -> (((spark, dir) => {
      Dedup.removeDupSpans(load(spark, dir, "documents"), "doc_id", "text",
          width = 8)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }, Some("""
      WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
                 FROM documents),
      wp AS (SELECT doc_id, p, ws[p] AS wd
             FROM (SELECT doc_id, ws,
                     unnest(generate_series(1, len(ws))) AS p FROM w)),
      g AS (SELECT doc_id, s,
              CAST('0x' || substring(md5(lower(concat_ws(' ', ws[s],
                ws[s+1], ws[s+2], ws[s+3], ws[s+4], ws[s+5], ws[s+6],
                ws[s+7]))), 1, 15) AS BIGINT) AS h
            FROM (SELECT doc_id, ws,
                    unnest(generate_series(1, len(ws) - 7)) AS s
                  FROM w WHERE len(ws) >= 8)),
      dup AS (SELECT h FROM g GROUP BY h
              HAVING count(DISTINCT doc_id) >= 2),
      st AS (SELECT DISTINCT doc_id, s FROM g JOIN dup USING (h)),
      cov AS (SELECT wp.doc_id, wp.p, wp.wd,
                max(CASE WHEN st.s IS NULL THEN 0 ELSE 1 END) OVER
                  (PARTITION BY wp.doc_id ORDER BY wp.p
                   ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS c
              FROM wp LEFT JOIN st
                ON wp.doc_id = st.doc_id AND wp.p = st.s)
      SELECT doc_id,
             coalesce(string_agg(wd, ' ' ORDER BY p) FILTER (WHERE c = 0),
               '') AS clean_text,
             count(*) AS n_words,
             CAST(sum(c) AS BIGINT) AS n_removed
      FROM cov GROUP BY doc_id ORDER BY doc_id"""))),

    // DSIR importance weights (Xie et al. 2023, "Data Selection for
    // Language Models via Importance Resampling" — public paper): hashed
    // unigram features (64 buckets), add-1-smoothed target/raw bucket
    // distributions (target proxy: doc_id % 10 = 0), per-doc importance
    // log-weight = Σ_b n_b · λ_b with λ_b = ln(p_b/q_b) rounded to 6dp
    // and decimal-summed (order-independent). Scale shape: the bucket
    // distribution is 64 rows (broadcast); shuffles carry (doc, bucket)
    // counts, never words.
    "llm_dsir" -> (((spark, dir) => {
      val docs = load(spark, dir, "documents")
      val words = docs.select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      val b = words.select(col("doc_id"),
        pmod(Dedup.portableHash60(col("w")), lit(64)).as("b"))
      val isTarget = col("doc_id") % 10 === 0
      val dist = b.groupBy("b").agg(
        sum(when(isTarget, 1).otherwise(0)).as("ct"),
        sum(when(!isTarget, 1).otherwise(0)).as("cr"))
      val tot = dist.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("rt"))
      val lam = dist.crossJoin(broadcast(tot))
        .select(col("b"),
          round(log((col("ct") + 1).cast("double") / (col("tt") + 64)) -
            log((col("cr") + 1).cast("double") / (col("rt") + 64)), 6)
            .cast("decimal(18,6)").as("lam"))
      val db = b.groupBy("doc_id", "b").agg(count(lit(1)).as("n"))
      db.join(broadcast(lam), "b")
        .groupBy("doc_id")
        .agg(sum(col("n")).as("n_tokens"),
          round(sum(col("n") * col("lam")).cast("double"), 4).as("dsir4"))
        .orderBy("doc_id")
    }, Some("""
      WITH words AS (SELECT doc_id,
                       unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
                     FROM documents),
      b AS (SELECT doc_id,
              CAST('0x' || substring(md5(w), 1, 15) AS BIGINT) % 64 AS b
            FROM words),
      dist AS (SELECT b,
                 CAST(SUM(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ct,
                 CAST(SUM(CASE WHEN doc_id % 10 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS cr
               FROM b GROUP BY 1),
      tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS tt,
                     CAST(SUM(cr) AS BIGINT) AS rt FROM dist),
      lam AS (SELECT b,
                CAST(round(ln(CAST(ct + 1 AS DOUBLE) / (tt + 64)) -
                           ln(CAST(cr + 1 AS DOUBLE) / (rt + 64)), 6)
                  AS DECIMAL(18,6)) AS lam
              FROM dist CROSS JOIN tot),
      db AS (SELECT doc_id, b, count(*) AS n FROM b GROUP BY 1, 2)
      SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tokens,
             round(CAST(SUM(n * lam) AS DOUBLE), 4) AS dsir4
      FROM db JOIN lam USING (b) GROUP BY doc_id ORDER BY doc_id"""))),

    // Quality scoring (length/punct/digit/stopword components)
    "text_quality" -> (((spark, dir) => {
      load(spark, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    }, Some(qualityOracleBody + " ORDER BY doc_id"))),

    // D125 — distributed logistic-regression quality scorer
    // (llm/LogReg.train): a weak-label classifier TRAINED IN-PLAN — 3
    // rounds of full-batch gradient descent, each ONE map-side-combinable
    // aggregation job (d+1 decimal-exact sums; the driver holds only the
    // 4-vector of weights between rounds, the MLlib treeAggregate shape).
    // The sigmoid is the ALGEBRAIC rational σ(z) = 0.5 + 0.5·z/(1+|z|) —
    // IEEE plus/times/divide replay exactly in any engine where exp()
    // differs in final ulps — so the DuckDB oracle re-TRAINS the model in
    // an unrolled CTE chain and must land on identical weights and scores.
    // Features: capped length, EN-stopword hit ratio, capped chars/word;
    // weak label = the Gopher-ish MIN-LENGTH RULE (words > 50) — the
    // Snorkel-style bootstrap where rules label and the classifier
    // smooths them into a score. (This corpus's lang column is synthetic
    // noise w.r.t. its text — a rule label is the only honestly
    // learnable supervision here; an earlier lang-labeled form failed
    // separation at sf0.1 for exactly that reason.) The gate asserts the
    // model actually separates (mean score of rule-positive docs clears
    // rule-negative).
    "llm_lr_quality" -> (((spark, dir) => {
      import graft.llm.{LogReg, TextAnalysis}
      val words = TextAnalysis.tokenCount(col("text"))
      val feats = load(spark, dir, "documents").select(
        col("doc_id"),
        when(words > 50, 1.0).otherwise(0.0).as("y"),
        round(least(words, lit(512)) / lit(512.0), 6).as("x1"),
        round(size(array_intersect(
            array_distinct(split(lower(trim(col("text"))), "\\s+")),
            lit(LrStopwords.toArray))) / lit(15.0), 6).as("x2"),
        round(least(when(words === lit(0), lit(0.0))
            .otherwise(length(col("text")) / words.cast("double")),
          lit(20.0)) / lit(20.0), 6).as("x3"))
        .cache() // tokenize/intersect ONCE; the 5 GD rounds iterate on
                 // cached feature columns (the treeAggregate discipline —
                 // roughly halves the 20x smoke wall)
      val w = LogReg.train(feats, Seq("x1", "x2", "x3"), "y", iters = 5,
        lr = 4.0)
      val scored = feats.select(col("doc_id"), col("y"),
        LogReg.score(Seq("x1", "x2", "x3"), w).as("score"))
      val sep = scored.groupBy("y").agg(avg("score").as("m"))
        .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      require(sep(1.0) > sep(0.0) + 0.01,
        s"model failed to separate the weak classes: $sep")
      val out = scored.select("doc_id", "score").orderBy("doc_id")
        .localCheckpoint()
      feats.unpersist()
      out
    }, Some(lrQualityOracle))),

    // Language ID (stopword heuristic + CJK density)
    "text_langid" -> (((spark, dir) => {
      load(spark, dir, "documents")
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")
    }, Some("""
      WITH s AS (
        SELECT doc_id, length(text) AS chars,
               length(text) - length(regexp_replace(text, '[一-鿿]', '', 'g')) AS cjk,
               len(list_intersect(list_distinct(string_split_regex(lower(trim(text)), '\s+')),
                 ['the','and','of','to','in','is','that','with','for','it','was','on','are','this','be'])) AS s_en,
               len(list_intersect(list_distinct(string_split_regex(lower(trim(text)), '\s+')),
                 ['el','la','de','que','y','en','los','del','las','un','una','con','por','para','es'])) AS s_es,
               len(list_intersect(list_distinct(string_split_regex(lower(trim(text)), '\s+')),
                 ['der','die','und','das','von','zu','mit','den','ist','im','ein','eine','auf','nicht','als'])) AS s_de,
               len(list_intersect(list_distinct(string_split_regex(lower(trim(text)), '\s+')),
                 ['le','la','les','de','des','et','en','un','une','du','est','dans','que','pour','qui'])) AS s_fr
        FROM documents)
      SELECT doc_id,
             CASE WHEN cjk * 4 > chars THEN 'zh'
                  WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
                  WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                  WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                  WHEN s_de >= s_fr THEN 'de'
                  ELSE 'fr' END AS lang_pred
      FROM s ORDER BY doc_id"""))),

    // Unigram LM score (perplexity proxy): mean -ln p(w) per doc under the
    // corpus unigram distribution; contributions rounded to 6 decimals and
    // decimal-summed so summation order is moot cross-engine
    "text_lm_score" -> (((spark, dir) => {
      TextAnalysis.unigramNll(load(spark, dir, "documents"), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }, Some("""
      WITH words AS (SELECT doc_id,
                       unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
                     FROM documents),
      freq AS (SELECT w, count(*) AS wc FROM words GROUP BY 1),
      t AS (SELECT count(*) AS tc FROM words)
      SELECT doc_id, count(*) AS n_tokens,
             round(CAST(SUM(CAST(round(-ln(CAST(wc AS DOUBLE) / tc), 6)
               AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS nll4
      FROM words JOIN freq USING (w) CROSS JOIN t
      GROUP BY doc_id ORDER BY doc_id"""))),

    // Rolling polynomial fingerprint (left-fold, mod 1e9+7)
    "text_fingerprint" -> (((spark, dir) => {
      load(spark, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(
                   string_split(regexp_replace(regexp_replace(lower(trim(text)),
                     '[^[:alnum:] ]', '', 'g'), '\s+', ' ', 'g'), ''),
                   c -> CAST(coalesce(ascii(c), 0) AS BIGINT))),
               (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
      FROM documents ORDER BY doc_id"""))),

    // End-to-end corpus cleaning — the composition a training-data pipeline
    // actually runs: exact-dedup (keep lowest id) → language ID → quality
    // score → filter. One groupBy + per-row maps; at 100 TB this is one
    // shuffle on the content hash.
    "llm_corpus_clean" -> (((spark, dir) => {
      val docs = load(spark, dir, "documents")
      val keep = Dedup.exact(docs, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      docs.join(keep, "doc_id")
        .select(col("doc_id"),
          TextAnalysis.langId(col("text")).as("lang_pred"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
        .filter(col("quality") >= 0.5 && col("lang_pred") =!= "und")
        .orderBy("doc_id")
    }, Some("""
      WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
      feats AS (
        SELECT d.doc_id, d.text, length(d.text) AS chars,
               length(d.text) - length(regexp_replace(d.text, '[一-鿿]', '', 'g')) AS cjk,
               CAST(CASE WHEN length(trim(d.text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(d.text), '\s+')) END AS DOUBLE) AS toks,
               CAST(length(d.text) - length(regexp_replace(d.text, '[[:punct:]]', '', 'g')) AS DOUBLE) AS punct,
               CAST(length(d.text) - length(regexp_replace(d.text, '[0-9]', '', 'g')) AS DOUBLE) AS digits,
               len(list_intersect(list_distinct(string_split_regex(lower(trim(d.text)), '\s+')),
                 ['the','and','of','to','in','is','that','with','for','it','was','on','are','this','be'])) AS s_en,
               len(list_intersect(list_distinct(string_split_regex(lower(trim(d.text)), '\s+')),
                 ['el','la','de','que','y','en','los','del','las','un','una','con','por','para','es'])) AS s_es,
               len(list_intersect(list_distinct(string_split_regex(lower(trim(d.text)), '\s+')),
                 ['der','die','und','das','von','zu','mit','den','ist','im','ein','eine','auf','nicht','als'])) AS s_de,
               len(list_intersect(list_distinct(string_split_regex(lower(trim(d.text)), '\s+')),
                 ['le','la','les','de','des','et','en','un','une','du','est','dans','que','pour','qui'])) AS s_fr
        FROM documents d JOIN keep USING (doc_id)),
      scored AS (
        SELECT doc_id,
               CASE WHEN cjk * 4 > chars THEN 'zh'
                    WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
                    WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                    WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                    WHEN s_de >= s_fr THEN 'de'
                    ELSE 'fr' END AS lang_pred,
               round(least(toks / 20.0, 1.0) * 0.3
                 + greatest(0.0, 1.0 - (punct / greatest(chars, 1.0)) * 4) * 0.25
                 + greatest(0.0, 1.0 - (digits / greatest(chars, 1.0)) * 4) * 0.25
                 + least(CAST(s_en + s_es + s_de + s_fr AS DOUBLE) / 5.0, 1.0) * 0.2,
                 4) AS quality
        FROM feats)
      SELECT doc_id, lang_pred, quality FROM scored
      WHERE quality >= 0.5 AND lang_pred <> 'und'
      ORDER BY doc_id"""))),

    // Multimodal metadata plumbing (binary payload + typed metadata)
    "mm_meta" -> (((spark, dir) => {
      Multimodal.fromDocuments(load(spark, dir, "documents"))
        .select(col("media_id"), col("media_type"),
          length(col("payload")).as("byte_len"))
        .orderBy("media_id")
    }, Some("""
      SELECT doc_id AS media_id, 'image/fake' AS media_type,
             octet_length(encode(text)) AS byte_len
      FROM documents ORDER BY media_id"""))),

    // Multimodal frame sampling: split each payload into fixed-size frames,
    // keep every 2nd. DuckDB cannot byte-slice blobs, so the oracle verifies
    // the sampling GEOMETRY (stride selection, frame boundaries, short-
    // payload truncation) arithmetically; the slicing itself is Spark's
    // built-in substring-on-binary.
    "mm_frames" -> (((spark, dir) => {
      Multimodal.sampleFrames(
          Multimodal.fromDocuments(load(spark, dir, "documents")),
          frameBytes = 32, stride = 2)
        .select(col("media_id"), col("frame_idx"),
          length(col("frame")).as("frame_len"))
        .orderBy("media_id", "frame_idx")
    }, Some("""
      WITH m AS (SELECT doc_id AS media_id, octet_length(encode(text)) AS len
                 FROM documents),
      f AS (SELECT media_id, len,
                   unnest(range(0, greatest(len // 32, 1), 2)) AS frame_idx
            FROM m)
      SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
             CAST(CASE WHEN len < 32 THEN len ELSE 32 END AS INT) AS frame_len
      FROM f ORDER BY media_id, frame_idx"""))),

    // D116 — scene-cut detection (shot boundaries): consecutive sampled
    // frames whose perceptual-hash hamming distance exceeds 36 mark a
    // cut. Runs entirely on 64-bit frame hashes (frame bytes never
    // shuffle; one media-partitioned lag window); the oracle replays
    // frame slicing, the block-parity phash, the lag and the threshold.
    "mm_scene_cuts" -> (((spark, dir) => {
      val frames = Multimodal.sampleFrames(
        Multimodal.fromDocuments(load(spark, dir, "documents")),
        frameBytes = 64, stride = 1)
      Multimodal.sceneCuts(Multimodal.framePhash(frames), threshold = 36)
        .groupBy("media_id")
        .agg(count(lit(1)).as("n_frames"),
          sum(col("cut")).cast("long").as("n_cuts"),
          coalesce(min(when(col("cut") === 1, col("frame_idx"))), lit(-1))
            .cast("int").as("first_cut"))
        .orderBy("media_id")
    }, Some("""
      WITH m AS (SELECT doc_id AS media_id, text, length(text) AS len
                 FROM documents),
      f AS (SELECT media_id, frame_idx,
              text[CAST(frame_idx * 64 + 1 AS INT) :
                   CAST(frame_idx * 64 + 64 AS INT)] AS frame
            FROM (SELECT media_id, text,
                    unnest(range(0, greatest(len // 64, 1))) AS frame_idx
                  FROM m) t),
      ph AS (SELECT media_id, frame_idx,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(0, 64),
                 j -> CASE WHEN (list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(range(j * length(frame) // 64,
                                            (j+1) * length(frame) // 64),
                          i -> CAST(ascii(frame[CAST(i+1 AS INT):
                                 CAST(i+1 AS INT)]) AS BIGINT))),
                        (a, x) -> a + x) & 1) = 1
                      THEN (CASE WHEN CAST(j AS INT) = 63
                            THEN CAST(-9223372036854775808 AS BIGINT)
                            ELSE (CAST(1 AS BIGINT) << CAST(j AS INT)) END)
                      ELSE CAST(0 AS BIGINT) END)),
                 (a, b) -> a + b) AS phash
             FROM f),
      lagd AS (SELECT media_id, frame_idx, phash,
                 lag(phash) OVER (PARTITION BY media_id
                   ORDER BY frame_idx) AS prev
               FROM ph),
      c AS (SELECT media_id, frame_idx,
              CASE WHEN prev IS NULL THEN 0
                   WHEN bit_count(xor(prev, phash)) > 36 THEN 1
                   ELSE 0 END AS cut
            FROM lagd)
      SELECT media_id, count(*) AS n_frames,
             CAST(sum(cut) AS BIGINT) AS n_cuts,
             CAST(coalesce(min(CASE WHEN cut = 1 THEN frame_idx END), -1)
               AS INT) AS first_cut
      FROM c GROUP BY media_id ORDER BY media_id"""))),

    // Multimodal resize planning: aspect-preserving letterbox geometry into
    // 224x224 over the decoded dims — the scheduling arithmetic of the
    // resize stage, verified on top of the oracle-exact stub decode
    "mm_resize" -> (((spark, dir) => {
      Multimodal.resizePlan(
          Multimodal.decodeFeatures(
            Multimodal.fromDocuments(load(spark, dir, "documents"))),
          targetW = 224, targetH = 224)
        .select(col("media_id"), col("width"), col("height"),
          col("out_w"), col("out_h"), col("pad_x"), col("pad_y"))
        .orderBy("media_id")
    }, Some("""
      WITH d AS (
        SELECT doc_id AS media_id,
               64 + CAST(h % 1024 AS INT) AS width,
               64 + CAST((h >> 10) % 1024 AS INT) AS height
        FROM (SELECT doc_id,
                     CAST('0x' || substring(md5(text), 1, 15) AS BIGINT) AS h
              FROM documents)),
      r AS (
        SELECT media_id, width, height,
               least(224 / width, 224 / height) AS scale
        FROM d)
      SELECT media_id, width, height,
             CAST(greatest(1, floor(width * scale)) AS INT) AS out_w,
             CAST(greatest(1, floor(height * scale)) AS INT) AS out_h,
             CAST((224 - CAST(greatest(1, floor(width * scale)) AS INT)) // 2
               AS INT) AS pad_x,
             CAST((224 - CAST(greatest(1, floor(height * scale)) AS INT)) // 2
               AS INT) AS pad_y
      FROM r ORDER BY media_id"""))),

    // Multimodal decode stage: mapPartitions batch decode with a per-
    // partition codec handle. The stub codec derives features from the
    // payload md5 (DuckDB's md5(text) hashes the same UTF-8 bytes as
    // Spark's md5 over encode(text)), so even the RDD-side decode is
    // hash-verified.
    "mm_decode" -> (((spark, dir) => {
      Multimodal.decodeFeatures(
        Multimodal.fromDocuments(load(spark, dir, "documents")))
        .orderBy("media_id")
    }, Some("""
      SELECT media_id, media_type, byte_len,
             64 + CAST(h % 1024 AS INT) AS width,
             64 + CAST((h >> 10) % 1024 AS INT) AS height,
             3 AS channels, h AS checksum
      FROM (SELECT doc_id AS media_id, 'image/fake' AS media_type,
                   octet_length(encode(text)) AS byte_len,
                   CAST('0x' || substring(md5(text), 1, 15) AS BIGINT) AS h
            FROM documents)
      ORDER BY media_id"""))),

    // Audio windowed energy + silence detection (Multimodal.audioWindows):
    // the audio member of the modality triple — per-window energy from
    // the stubbed codec (md5-derived; a real deployment swaps in RMS over
    // decoded PCM without changing the dataflow) computed INSIDE the
    // mapPartitions decode stage, payloads never shuffle. Gate aggregates
    // the voice-activity shape: windows, silent-window count, first
    // window's energy.
    "mm_audio_energy" -> (((spark, dir) => {
      Multimodal.audioWindows(
          Multimodal.fromDocuments(load(spark, dir, "documents")))
        .groupBy("media_id")
        .agg(count(lit(1)).as("n_windows"),
          sum(col("is_silent").cast("int")).as("n_silent"),
          min(when(col("window_idx") === 0, col("energy"))).as("e0"))
        .orderBy("media_id")
    }, Some("""
      WITH h AS (SELECT doc_id AS media_id,
               CAST('0x' || substring(md5(text), 1, 15) AS BIGINT) AS h
             FROM documents),
      w AS (SELECT media_id, CAST(i AS INT) AS window_idx,
              CAST((h >> CAST(7 * i AS INT)) % 256 AS INT) AS e
            FROM h, range(0, 8) t(i))
      SELECT media_id, count(*) AS n_windows,
             CAST(SUM(CASE WHEN e < 40 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_silent,
             MIN(CASE WHEN window_idx = 0 THEN e END) AS e0
      FROM w GROUP BY 1 ORDER BY media_id"""))),

    // Perceptual-hash near-dup over media payloads (Multimodal.phashPairs):
    // 64 block-parity bits computed INSIDE the mapPartitions decode stage
    // (payloads never shuffle — only id + 64-bit hash leave the scan),
    // then 16-bit-chunk pigeonhole banding + hamming <= 3 verify; 20
    // planted identical copies MUST surface as hamming-0 pairs. The
    // oracle recomputes the block sums from ascii() on the text twin of
    // the payload bytes (the corpus is ASCII; payload = encode(text)).
    "mm_phash_dedup" -> (((spark, dir) => {
      val docs = load(spark, dir, "documents")
      val planted = docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
      val media = Multimodal.fromDocuments(
        docs.select("doc_id", "text").unionByName(planted))
      Multimodal.phashPairs(Multimodal.perceptualHash(media),
          maxHamming = 3)
        .orderBy("id1", "id2")
    }, Some("""
      WITH base AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 20),
      ph AS (
        SELECT doc_id AS media_id,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(0, 64),
                 j -> CASE WHEN (list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(range(j * length(text) // 64,
                                            (j+1) * length(text) // 64),
                          i -> CAST(ascii(text[CAST(i+1 AS INT):
                                 CAST(i+1 AS INT)]) AS BIGINT))),
                        (a, x) -> a + x) & 1) = 1
                      THEN (CASE WHEN CAST(j AS INT) = 63
                            THEN CAST(-9223372036854775808 AS BIGINT)
                            ELSE (CAST(1 AS BIGINT) << CAST(j AS INT)) END)
                      ELSE CAST(0 AS BIGINT) END)),
                 (a, b) -> a + b) AS phash
        FROM base),
      chunks AS (SELECT media_id, phash,
                        c, (phash >> (CAST(c AS INT) * 16)) & 65535 AS v
                 FROM ph CROSS JOIN (SELECT unnest(range(0, 4)) AS c) t),
      cand AS (SELECT DISTINCT a.media_id AS id1, b.media_id AS id2,
                      CAST(bit_count(xor(a.phash, b.phash)) AS INT)
                        AS hamming
               FROM chunks a JOIN chunks b
                 ON a.c = b.c AND a.v = b.v AND a.media_id < b.media_id)
      SELECT id1, id2, hamming FROM cand WHERE hamming <= 3
      ORDER BY id1, id2"""))),

    // Vocabulary build + token-id encoding (llm/Vocab.scala): top-16
    // tokens by (freq desc, token asc) get dense ids, every document is
    // encoded to its (pos, token_id) stream, OOV → -1. Top-K plans as
    // TakeOrderedAndProject (per-task heap, no full sort) and the encode
    // join broadcasts the 16-row vocab — the text never shuffles.
    "llm_vocab_encode" -> (((spark, dir) => {
      val docs = load(spark, dir, "documents")
      val vocab = Vocab.build(docs, "text", 16)
      Vocab.encode(docs, vocab, "doc_id", "text")
        .orderBy("doc_id", "pos")
    }, Some("""
      WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\s+')) AS token,
               unnest(generate_series(0,
                 len(string_split_regex(lower(trim(text)), '\s+')) - 1))
                 AS pos
        FROM documents),
      tf AS (SELECT token, count(*) AS freq FROM toks
             WHERE token <> '' GROUP BY 1),
      vocab AS (SELECT token,
                  CAST(row_number() OVER (ORDER BY freq DESC, token) AS INT)
                    - 1 AS token_id
                FROM tf ORDER BY freq DESC, token LIMIT 16)
      SELECT t.doc_id, CAST(t.pos AS INT) AS pos,
             coalesce(v.token_id, -1) AS token_id, t.token
      FROM toks t LEFT JOIN vocab v USING (token)
      WHERE t.token <> ''
      ORDER BY doc_id, pos""")))
  )
}
