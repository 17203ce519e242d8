package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for training-data pipelines (BASELINE north star):
  * language ID, quality scoring, token counting, document fingerprinting.
  * Pure Column expressions — every operator is a per-row map inside
  * whole-stage codegen; at 100 TB these add zero shuffles to a scan.
  */
object TextAnalysis {

  /** Expression-level let-binding: evaluate `c` ONCE and substitute the
    * bound value into `f`'s body via a single-element higher-order
    * `transform` lambda. Column trees have no sharing — referencing a
    * Column twice duplicates (and re-evaluates) its whole subtree, and
    * `when(p, a).otherwise(b)` chains built by folds grow exponentially.
    * Codegen's common-subexpression elimination does not hoist across
    * conditional branches, so this binding is the reliable way to keep an
    * expensive intermediate linear. */
  def bindOnce(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  /** Whitespace token count. */
  def tokenCount(t: Column): Column =
    when(length(trim(t)) === 0, lit(0))
      .otherwise(size(split(trim(t), "\\s+")))

  /** BPE-ish subword-unit count: letter runs + digit runs + each individual
    * punctuation mark, the way byte-pair tokenizers fragment text — a cheap
    * deterministic token estimate. The pattern uses only constructs RE2 also
    * supports (no lookarounds), so the exact same regex runs in DuckDB as
    * the oracle. */
  val BpeishPattern = "[\\p{L}]+|[\\p{N}]+|[^\\p{L}\\p{N}\\s]"
  def bpeishCount(t: Column): Column =
    size(regexp_extract_all(t, lit(BpeishPattern), lit(0)))

  /** Punctuation / digit / uppercase / whitespace character counts. */
  def countMatches(t: Column, regex: String): Column =
    length(t) - length(regexp_replace(t, regex, ""))

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "with", "for",
      "it", "was", "on", "are", "this", "be"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "las",
      "un", "una", "con", "por", "para", "es"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "den",
      "ist", "im", "ein", "eine", "auf", "nicht", "als"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "en", "un", "une",
      "du", "est", "dans", "que", "pour", "qui"))

  /** Distinct-stopword hit count for one language. */
  def stopwordHits(words: Column, lang: String): Column =
    size(array_intersect(words, typedLit(stopwords(lang))))

  /** N-gram/stopword-heuristic language ID over {en, es, de, fr, zh}.
    * zh detection is CJK-character density; the latin languages score by
    * distinct stopword hits, ties broken by fixed priority order
    * (en > es > de > fr). Returns the predicted code, "und" if no signal. */
  def langId(t: Column): Column = {
    val words = split(lower(trim(t)), "\\s+")
    val cjk = countMatches(t, "[\\u4e00-\\u9fff]")
    // (score, priority, lang) structs compared lexicographically: greatest()
    // evaluates each stopword-intersect ONCE and picks max score, ties
    // resolved by the priority field (en > es > de > fr). A when/otherwise
    // fold here would duplicate every earlier struct's subtree per level —
    // exponential expression growth (measured 20× slower at 5k docs).
    val scored = Seq(("en", 4), ("es", 3), ("de", 2), ("fr", 1)).map {
      case (l, prio) => struct(stopwordHits(words, l).as("score"),
        lit(prio).as("prio"), lit(l).as("lang"))
    }
    bindOnce(greatest(scored: _*)) { best =>
      when(cjk * 4 > length(t), lit("zh"))
        .when(best.getField("score") === 0, lit("und"))
        .otherwise(best.getField("lang"))
    }
  }

  /** Quality score in [0,1]: penalizes very short docs, extreme punctuation
    * or digit density, and no-stopword text (gibberish signal). Deterministic
    * rational arithmetic; rounded to 4 decimals so distributed summation
    * order can never change the value. */
  def qualityScore(t: Column): Column = {
    val chars = length(t).cast(DoubleType)
    val punct = countMatches(t, "\\p{Punct}").cast(DoubleType)
    val digits = countMatches(t, "[0-9]").cast(DoubleType)
    // tokenize once; the four stopword intersects and the token count all
    // reuse the bound array instead of re-splitting per use
    bindOnce(split(lower(trim(t)), "\\s+")) { words =>
      val toks = when(length(trim(t)) === 0, lit(0))
        .otherwise(size(words)).cast(DoubleType)
      val stopHits = Seq("en", "es", "de", "fr")
        .map(l => stopwordHits(words, l)).reduce(_ + _).cast(DoubleType)
      val lenScore = least(toks / lit(20.0), lit(1.0))
      val punctScore = greatest(lit(0.0), lit(1.0) - (punct / greatest(chars, lit(1.0))) * 4)
      val digitScore = greatest(lit(0.0), lit(1.0) - (digits / greatest(chars, lit(1.0))) * 4)
      val stopScore = least(stopHits / lit(5.0), lit(1.0))
      round(lenScore * lit(0.3) + punctScore * lit(0.25) +
        digitScore * lit(0.25) + stopScore * lit(0.2), 4)
    }
  }

  /** PII scrubbing: replace every (pattern → token) pair left to right —
    * emails, long digit runs (ids/phones), whatever the corpus policy
    * needs. Pure per-row regexp_replace chain (codegen'd); patterns must
    * stay in the RE2-compatible subset so the same regexes verify in the
    * oracle. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongNumberPattern = "[0-9]{6,}"
  def redact(t: Column,
      rules: Seq[(String, String)] = Seq(EmailPattern -> "<EMAIL>",
        LongNumberPattern -> "<NUM>")): Column =
    rules.foldLeft(t) { case (c, (re, token)) =>
      regexp_replace(c, re, token)
    }

  /** Gopher-style repetition statistics: per document, the most frequent
    * word-2-gram's share of all 2-grams — boilerplate/spam detection
    * (a high ratio means the doc repeats itself). Two map-side-combinable
    * aggregations keyed by (doc, gram) then doc: at 100 TB the shuffle
    * carries gram counts, never text. Returns
    * (id, max_c, n_grams, rep_ratio). */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val grams = bindOnce(split(trim(lower(col(textCol))), "\\s+")) { ws =>
      when(size(ws) >= 2,
        transform(sequence(lit(1), size(ws) - 1),
          i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))))
        .otherwise(array(concat_ws(" ", ws)))
    }
    df.select(col(idCol).as("id"), explode(grams).as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(max(col("c")).as("max_c"),
        sum(col("c")).as("n_grams"))
      .select(col("id"), col("max_c"), col("n_grams"),
        round(col("max_c") / col("n_grams"), 4).as("rep_ratio"))
  }

  /** Gopher-style quality-rule statistics (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", §A1.1 — public paper): word-count
    * bounds, mean word length, type-token ratio, alphabetic-word fraction,
    * stopword presence, and the combined keep/drop verdict. All pure
    * per-row Column expressions over ONE bound tokenization — zero
    * shuffles at any corpus size; at 100 TB this is a free rider on
    * whatever scan already reads the text. Returns a struct
    * (n_words, mean_wlen, ttr, alpha_frac, n_stop, keep). */
  def gopherStats(t: Column): Column =
    bindOnce(split(lower(trim(t)), "\\s+")) { ws =>
      val n = when(length(trim(t)) === 0, lit(0)).otherwise(size(ws))
      val sumLen = aggregate(transform(ws, w => length(w)),
        lit(0L), (acc, x) => acc + x)
      val nAlpha = size(filter(ws, w => w.rlike("[a-z]")))
      val nDistinct = size(array_distinct(ws))
      val nStop = stopwordHits(ws, "en")
      val meanW = when(n === 0, lit(0.0))
        .otherwise(round(sumLen.cast(DoubleType) / n, 4))
      val ttr = when(n === 0, lit(0.0))
        .otherwise(round(nDistinct.cast(DoubleType) / n, 4))
      val alphaFrac = when(n === 0, lit(0.0))
        .otherwise(round(nAlpha.cast(DoubleType) / n, 4))
      val keep = when(n.between(50, 100000) && meanW.between(3.0, 10.0) &&
        alphaFrac >= 0.8 && ttr >= 0.2 && nStop >= 2, lit(1)).otherwise(lit(0))
      struct(n.as("n_words"), meanW.as("mean_wlen"), ttr.as("ttr"),
        alphaFrac.as("alpha_frac"), nStop.as("n_stop"), keep.as("keep"))
    }

  /** Context-window chunking: split each document into token windows of
    * `chunkTokens` words sliding by `chunkTokens - overlap` — the shape
    * every pretraining pipeline runs before packing. Pure per-row HOF
    * (the bound word array is tokenized once; slices are O(chunk)) +
    * one narrow explode; zero shuffles at any corpus size. Returns
    * (id, chunk_start, n_chunk_tokens, chunk_md5). */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 32, overlap: Int = 8): DataFrame = {
    require(overlap < chunkTokens, "overlap must be < chunkTokens")
    val stride = chunkTokens - overlap
    val starts = bindOnce(split(trim(col(textCol)), "\\s+")) { ws =>
      transform(
        sequence(lit(0), greatest(size(ws) - overlap - 1, lit(0)), lit(stride)),
        start => struct(start.as("chunk_start"),
          least(lit(chunkTokens), size(ws) - start).as("n_chunk_tokens"),
          md5(concat_ws(" ", slice(ws, start + 1, lit(chunkTokens))))
            .as("chunk_md5")))
    }
    df.select(col(idCol).as("id"), explode(starts).as("c"))
      .select(col("id"), col("c.chunk_start"), col("c.n_chunk_tokens"),
        col("c.chunk_md5"))
  }

  /** TF-IDF keyword extraction: tf(w, d) · ln(N / df(w)), top `k` terms per
    * document on the ROUNDED score with a term tiebreak (fp-stable across
    * engines). Three map-side-combinable aggregations + one per-doc rank
    * window; the shuffles carry (doc, term) counts, never text. */
  def tfidfTopK(df: DataFrame, idCol: String, textCol: String, k: Int = 3)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = df.select(col(idCol).as("id"),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("w"))
    val tf = words.groupBy("id", "w").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val n = df.select(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "w").crossJoin(broadcast(n))
      .withColumn("score4",
        round(col("tf") * log(col("n_docs").cast(DoubleType) /
          col("df").cast(DoubleType)), 4))
    val w = Window.partitionBy("id")
      .orderBy(col("score4").desc, col("w").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("id"), col("rnk"), col("w").as("term"), col("score4"))
  }

  /** Unigram language-model score: per-doc mean negative log-likelihood
    * under the corpus's own unigram distribution — the cheap perplexity
    * proxy quality filters use (gibberish and boilerplate both score far
    * from the corpus center). Per-word contributions are ROUNDED to 6
    * decimals and summed as exact decimals, so the distributed summation
    * order cannot perturb the result (raw double sums are order-dependent
    * and would never hash-match an oracle). Shapes: one vocab aggregation,
    * one count scalar, one join back, one per-doc aggregation — all
    * map-side combinable. Returns (id, n_tokens, nll4). */
  def unigramNll(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = df.select(col(idCol).as("id"),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("w"))
    val freq = words.groupBy("w").agg(count(lit(1)).as("wc"))
    val total = words.select(count(lit(1)).as("tc"))
    words.join(freq, "w").crossJoin(broadcast(total))
      .withColumn("nll6",
        round(-log(col("wc").cast(DoubleType) / col("tc").cast(DoubleType)), 6)
          .cast(DecimalType(18, 6)))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        round((sum(col("nll6")).cast(DoubleType) / count(lit(1))), 4)
          .as("nll4"))
  }

  /** Rolling polynomial fingerprint of normalized text:
    * hash = Σ code(c_i)·31^i mod 1_000_000_007 over the lowercased,
    * whitespace-collapsed, punctuation-stripped text. Computed as a
    * left-fold with higher-order `aggregate` — codegen-friendly, no UDF. */
  def fingerprint(t: Column): Column = {
    val norm = regexp_replace(
      regexp_replace(lower(trim(t)), "[^a-zA-Z0-9 ]", ""), "\\s+", " ")
    val chars = split(norm, "")
    aggregate(chars, lit(0L),
      (acc, ch) => pmod(acc * 31 + coalesce(ascii(ch), lit(0)), lit(1000000007L)))
  }

  /** Adjacent-word co-occurrence with PMI scoring — the word-association
    * miner behind collocation detection and phrase vocabularies (a
    * wordpiece/BPE pre-step): count every adjacent (w1, w2) pair, count
    * unigram occurrences at bigram positions, and score
    * pmi = log2(n_ab·N / (n_a·n_b)).
    *
    * Scale shape: bigram explode → ONE map-side-combined count per pair
    * (the shuffle carries (w1, w2, partial n)); unigram counts derive from
    * the same bigram rows; the scalar N broadcasts as a one-row
    * cross join. Top-k by (count, pair) is a TakeOrderedAndProject — a
    * per-task heap, never a global sort of the pair table. The PMI double
    * math runs once per surviving pair with fixed operation order, so
    * round(pmi, 4) replays cross-engine. */
  def cooccurrencePmi(df: DataFrame, textCol: String, topK: Int): DataFrame = {
    val ws = split(trim(lower(col(textCol))), "\\s+")
    // pre-filter 0/1-word docs: sequence(1, 0) would run DESCENDING
    val pairs = df.select(ws.as("w")).filter(size(col("w")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("w")) - 1),
        i => struct(element_at(col("w"), i).as("w1"),
          element_at(col("w"), i + 1).as("w2")))).as("p"))
      .select(col("p.w1"), col("p.w2"))
    // unigram/total counts derive from the bigram COUNTS, not from three
    // more passes over the exploded pairs: the (w1, w2) aggregation
    // exchange is identical in all four subtrees, so Catalyst reuses ONE
    // explode + shuffle (the dd_ngram exchange-reuse discipline)
    val bigramCounts = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("n_ab"))
    val leftCounts = bigramCounts.groupBy("w1").agg(sum("n_ab").as("n_a"))
    val rightCounts = bigramCounts.groupBy("w2").agg(sum("n_ab").as("n_b"))
    val total = bigramCounts.agg(sum("n_ab").as("n_total"))
    bigramCounts
      .join(leftCounts, "w1").join(rightCounts, "w2")
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("n_ab"),
        round(log2(col("n_ab").cast(DoubleType) * col("n_total") /
          col("n_a") / col("n_b")), 4).as("pmi4"))
      .orderBy(col("n_ab").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** BM25 retrieval scoring (Robertson et al.; the Lucene
    * `ln(1 + (N - df + .5)/(df + .5))` idf variant): top-`k` documents per
    * query for a FIXED query set. Scale shape: the corpus prunes to the
    * query vocabulary BEFORE the tf aggregation (a broadcast semi-join on
    * the term column), so the big shuffle carries only matching (doc, term)
    * counts — at 100 TB the cost is one pass over the scan plus
    * aggregations proportional to the hit set, not the corpus vocabulary.
    * df/idf and the query list ride along as broadcasts; per-term
    * contributions round to 6 decimals and sum as exact decimals so the
    * distributed summation order cannot perturb a rank. Returns
    * (query_id, rnk, id, score4). */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Int, Seq[String])], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    // Per-doc length is computed INLINE on the scan and carried through
    // the vocabulary-pruned tf rows (first(dl) per group) — there is no
    // corpus-sized doclen aggregation and no corpus-keyed join anywhere in
    // the plan (PlanShapeSpec counts the exchanges). The only full-corpus
    // pass is the scan itself; every shuffle after it carries hit-set or
    // scalar-sized data.
    val withDl = df.select(col(idCol).as("id"),
      split(trim(lower(col(textCol))), "\\s+").as("ws"))
      .withColumn("dl", size(col("ws")))
    val stats = withDl.agg(count(lit(1)).as("n_docs"), sum("dl").as("tot_len"))
    val words = withDl.select(col("id"), col("dl"),
      explode(col("ws")).as("w"))
    val qterms = queries.flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("query_id", "w")
    // vocab distinct runs on the DRIVER (it is a literal list — an in-plan
    // distinct would add a pointless exchange under the broadcast), and dl
    // rides the group via max() — first() is order-dependent, which blocks
    // exchange/stage reuse of the tf subtree between the dfreq and contrib
    // branches (max is deterministic, so the shuffle materializes ONCE).
    val vocab = queries.flatMap(_._2).distinct.toDF("w")
    val tf = words.join(broadcast(vocab), "w")
      .groupBy("id", "w")
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))
    // df comes from a term-keyed window over the (vocab-pruned, tiny) tf
    // set — NOT a separate aggregation branch: column pruning specializes
    // a re-referenced tf subtree per branch, which blocks exchange reuse
    // and re-scans the corpus. This shape scans the text ONCE for tf
    // (plus the scalar stats pass) — PlanShapeSpec counts both.
    val withDf = tf.withColumn("df",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy("w")))
    val avgdl = col("tot_len").cast(DoubleType) / col("n_docs")
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + 0.5) /
      (col("df") + 0.5))
    val den = col("tf") + lit(k1) *
      (lit(1 - b) + lit(b) * col("dl") / avgdl)
    val contrib = withDf
      .join(broadcast(qterms), "w")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("id"),
        round(idf * col("tf") * lit(k1 + 1) / den, 6)
          .cast(DecimalType(18, 6)).as("c6"))
    val scored = contrib.groupBy("query_id", "id")
      .agg(round(sum("c6").cast(DoubleType), 4).as("score4"))
    val rankW = Window.partitionBy("query_id")
      .orderBy(col("score4").desc, col("id").asc)
    scored.withColumn("rnk", row_number().over(rankW))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("id"), col("score4"))
  }

  /** Query-likelihood ranking with Dirichlet smoothing (Ponte & Croft /
    * Zhai & Lafferty — public IR models): per query, rank candidate
    * documents by `Σ_t ln((tf + μ·cf_t/|C|) / (dl + μ))`. Candidates are
    * restricted to documents containing at least one query term (the
    * inverted-index discipline — scoring the whole corpus per query would
    * be a cross product at 100 TB); missing terms smooth through tf=0.
    * Same scale shape as [[bm25TopK]]: vocabulary-pruned tf shuffle,
    * broadcast collection stats, decimal-summed contributions. Returns
    * (query_id, rnk, id, score4). */
  def queryLikelihoodTopK(df: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Int, Seq[String])], k: Int = 10, mu: Double = 100.0)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    // Same no-corpus-join shape as [[bm25TopK]]: dl rides the pruned tf
    // rows; candidates aggregate (query_id, id, max(dl)) so a missing
    // term's tf=0 row still knows its document length without ever
    // shuffling a corpus-sized doclen table.
    val withDl = df.select(col(idCol).as("id"),
      split(trim(lower(col(textCol))), "\\s+").as("ws"))
      .withColumn("dl", size(col("ws")))
    val total = withDl.agg(sum("dl").as("tc"))
    val words = withDl.select(col("id"), col("dl"),
      explode(col("ws")).as("w"))
    val qterms = queries.flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("query_id", "w")
    val vocab = queries.flatMap(_._2).distinct.toDF("w")
    val tf = words.join(broadcast(vocab), "w")
      .groupBy("id", "w")
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))
    val cf = tf.groupBy("w").agg(sum("tf").as("cf"))
    val cand = tf.join(broadcast(qterms), "w")
      .groupBy("query_id", "id").agg(max("dl").as("dl"))
    val pairs = cand.join(broadcast(qterms), "query_id")
    val scored = pairs.join(tf.select("id", "w", "tf"), Seq("id", "w"),
        "left")
      .na.fill(0L, Seq("tf"))
      .join(broadcast(cf), "w")
      .crossJoin(broadcast(total))
      .select(col("query_id"), col("id"),
        round(log((col("tf") + lit(mu) *
          (col("cf").cast(DoubleType) / col("tc"))) /
          (col("dl") + lit(mu))), 6)
          .cast(DecimalType(18, 6)).as("c6"))
      .groupBy("query_id", "id")
      .agg(round(sum("c6").cast(DoubleType), 4).as("score4"))
    val rankW = Window.partitionBy("query_id")
      .orderBy(col("score4").desc, col("id").asc)
    scored.withColumn("rnk", row_number().over(rankW))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("id"), col("score4"))
  }

  /** Reciprocal-rank fusion (Cormack et al. — public method): combine two
    * rankers' lists, `fused = Σ_r 1/(kConst + rank_r)`, re-rank, top `k`.
    * Inputs are (query_id, …, id-col, …) frames carrying a `rnk` column
    * (e.g. [[bm25TopK]] and [[queryLikelihoodTopK]] outputs). A union +
    * one aggregation — no outer join; contributions round to 8 decimals
    * and sum exactly so fusion replays cross-engine. Returns
    * (query_id, rnk, id, fused6). */
  def rrfFuse(a: DataFrame, b: DataFrame, kConst: Int = 60, k: Int = 10)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def contrib(r: DataFrame) = r.select(col("query_id"), col("id"),
      round(lit(1.0) / (lit(kConst) + col("rnk")), 8)
        .cast(DecimalType(18, 8)).as("c8"))
    val fused = contrib(a).unionByName(contrib(b))
      .groupBy("query_id", "id")
      .agg(round(sum("c8").cast(DoubleType), 6).as("fused6"))
    val rankW = Window.partitionBy("query_id")
      .orderBy(col("fused6").desc, col("id").asc)
    fused.withColumn("rnk", row_number().over(rankW))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("id"), col("fused6"))
  }

  /** Inverted-index posting lists: per term, the document frequency plus
    * the first `maxPostings` doc ids in sorted order (the head of the
    * posting list — enough to seed a conjunctive scan). The cap is applied
    * by a row_number window BEFORE collect_list, so per-term aggregation
    * state is bounded by `maxPostings` regardless of how hot the term is
    * (an uncapped collect on a stopword at 100 TB would buffer millions of
    * ids); the window and both aggregations hash on the term column, so
    * Catalyst reuses one exchange. Returns (term, df, head_csv). */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
      maxPostings: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = df.select(col(idCol).as("id"),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("w"))
      .distinct()
    val headW = Window.partitionBy("w").orderBy("id")
    // ONE aggregation computes both outputs off the window's partitioning:
    // df = max(rn) (rn runs over ALL of the term's postings), and the head
    // keeps only rn <= cap ids — collect_list skips the nulls the `when`
    // leaves, so per-term state stays bounded on stopword-hot terms. The
    // final groupBy hashes on the window's own key, so it adds NO exchange
    // (PlanShapeSpec counts: distinct + the term window = 2 total).
    pairs.withColumn("rn", row_number().over(headW))
      .groupBy("w")
      .agg(max("rn").cast("long").as("df"),
        concat_ws(",", sort_array(collect_list(
          when(col("rn") <= maxPostings, col("id"))))).as("head_csv"))
      .select(col("w").as("term"), col("df"), col("head_csv"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic between the distributions of
    * `valueCol` in two strata — the standard corpus-drift alarm (did this
    * week's crawl shift the length/quality distribution?). Exact, not
    * sampled: counts aggregate per DISTINCT VALUE (one map-side-combinable
    * shuffle keyed on the value), then one window pass over the distinct
    * values computes both ECDFs — the window is global but runs over the
    * value DOMAIN (bounded, e.g. ≤ 65k distinct lengths), never the rows.
    * Per-value |F1−F2| rounds to 6 decimals BEFORE the max, so the result
    * replays cross-engine. Returns one row (n_a, n_b, ks6). */
  def ksDrift(df: DataFrame, valueCol: String, stratumCol: String,
      a: String, b: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val twoStrata = df.filter(col(stratumCol).isin(a, b))
      .select(col(stratumCol).as("s"), col(valueCol).as("v"))
    val perValue = twoStrata.groupBy("v")
      .agg(count(when(col("s") === a, 1)).as("ca"),
        count(when(col("s") === b, 1)).as("cb"))
    // totals derive FROM the per-value counts as global windows — a
    // separate corpus aggregation branch would re-scan and re-tokenize
    // the input (column pruning blocks exchange reuse across branches);
    // both window specs share the one single-partition exchange over the
    // value DOMAIN
    val cdfW = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val allW = Window.partitionBy()
    perValue
      .withColumn("cum_a", sum("ca").over(cdfW))
      .withColumn("cum_b", sum("cb").over(cdfW))
      .withColumn("n_a", sum("ca").over(allW))
      .withColumn("n_b", sum("cb").over(allW))
      .select(col("n_a"), col("n_b"),
        round(abs(col("cum_a").cast(DoubleType) / col("n_a") -
          col("cum_b").cast(DoubleType) / col("n_b")), 6).as("d6"))
      .groupBy("n_a", "n_b").agg(max("d6").as("ks6"))
  }

  /** Chi-square token-frequency drift between two strata: per token, the
    * FULL 2×2 contingency statistic `N·(ad−bc)² / (r₁·r₂·c₁·c₂)` over
    * (token vs rest) × (stratum a vs b) — surfaces WHICH tokens moved,
    * not just that the distribution did (the actionable half of drift
    * monitoring next to [[ksDrift]]). One token-keyed map-side-combinable
    * aggregation; the stratum totals re-aggregate FROM perTok and ride
    * back as a broadcast — the two branches share the identical token
    * exchange (same keys, same aggregates → ReuseExchange fires; a
    * words-level totals branch would re-scan the corpus, and a global
    * window would serialize the whole vocabulary through one partition);
    * per-token chi2 stays fully parallel and top-k is a per-task heap. */
  def chi2Drift(df: DataFrame, textCol: String, stratumCol: String,
      a: String, b: String, topK: Int): DataFrame = {
    val words = df.filter(col(stratumCol).isin(a, b))
      .select(col(stratumCol).as("s"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("w"))
    val perTok = words.groupBy("w")
      .agg(count(when(col("s") === a, 1)).as("oa"),
        count(when(col("s") === b, 1)).as("ob"))
    val totals = perTok.agg(sum("oa").as("ta"), sum("ob").as("tb"))
    val aD = col("oa").cast(DoubleType)
    val bD = col("ob").cast(DoubleType)
    val cD = (col("ta") - col("oa")).cast(DoubleType)
    val dD = (col("tb") - col("ob")).cast(DoubleType)
    val num = (aD * dD - bD * cD) * (aD * dD - bD * cD)
    perTok.crossJoin(broadcast(totals))
      .select(col("w"), col("oa"), col("ob"),
        round((col("ta") + col("tb")).cast(DoubleType) * num /
          ((aD + bD) * (cD + dD) * col("ta").cast(DoubleType) *
            col("tb").cast(DoubleType)), 4).as("chi2_4"))
      .orderBy(col("chi2_4").desc, col("w"))
      .limit(topK)
  }

  /** Per-document bigram language-model score: mean negative log-likelihood
    * under the corpus's own add-half-smoothed bigram model,
    * `P(w2|w1) = (c(w1,w2) + 0.5) / (c(w1,·) + 0.5·V)` — the sharper
    * perplexity proxy above [[unigramNll]] (catches scrambled word ORDER
    * that unigrams cannot). Shapes: one (w1,w2)-keyed count aggregation
    * (its w1 margin and the vocab size V derive FROM those counts — the
    * PMI exchange-reuse discipline), one join of doc bigrams back to the
    * model, one per-doc aggregation. Per-bigram contributions round to 6
    * decimals and sum exactly. Returns (id, n_bigrams, nll4). */
  def bigramNll(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // pre-filter 0/1-word docs (sequence(1, 0) would run DESCENDING) —
    // the PMI shingle discipline; the ws attribute is materialized once
    val docBi = df.select(col(idCol).as("id"),
        split(trim(lower(col(textCol))), "\\s+").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("id"), explode(transform(
        sequence(lit(1), size(col("ws")) - 1),
        i => struct(element_at(col("ws"), i).as("w1"),
          element_at(col("ws"), i + 1).as("w2")))).as("p"))
      .select(col("id"), col("p.w1"), col("p.w2"))
    val counts = docBi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val margin = counts.groupBy("w1").agg(sum("c12").as("c1"))
    val vocab = counts.select("w1")
      .union(counts.select("w2")).distinct()
      .agg(count(lit(1)).as("v"))
    docBi.join(counts, Seq("w1", "w2"))
      .join(margin, "w1")
      .crossJoin(broadcast(vocab))
      .select(col("id"),
        round(-log((col("c12") + 0.5) / (col("c1") + lit(0.5) * col("v"))),
            6)
          .cast(DecimalType(18, 6)).as("nll6"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum("nll6").cast(DoubleType) / count(lit(1)), 4).as("nll4"))
  }

  /** Character-distribution entropy over a FIXED alphabet (a–z + space) —
    * the cheap gibberish/boilerplate signal quality filters stack next to
    * [[qualityStats]]: natural text sits near the language's typical
    * ~2.8–3.1 nats, base64/URL noise runs higher on its alphabet, repeated
    * boilerplate collapses low. Counts come from the classic
    * `length(t) - length(replace(t, c, ''))` identity (no explode, no
    * per-char array), the 27 counts bind ONCE into an array, and the
    * `-Σ p·ln p` fold runs in fixed alphabet order — a pure per-row map
    * inside codegen with a deterministic summation order any engine
    * replays. Returns NULL-free doubles rounded to `roundDigits`. */
  def charEntropy(textCol: Column, roundDigits: Int = 6): Column = {
    val alphabet = ('a' to 'z').mkString + " "
    // counts in ONE native byte scan (AsciiCharCounts) instead of 27
    // length-minus-translate passes per row — count-identical by the
    // ASCII/UTF-8 byte argument (spec-pinned old ≡ new, interpreted ≡
    // codegen); the -Σ p·ln p fold below is UNCHANGED, so the doubles
    // (and their fold order) are bit-identical to the r14 shape
    val counts = org.apache.spark.sql.graftx.Bridge.column(
      graft.functions.AsciiCharCounts(
        org.apache.spark.sql.graftx.Bridge.expression(
          lower(textCol).cast(StringType)), alphabet))
    bindOnce(counts) { cs =>
      bindOnce(aggregate(cs, lit(0L), (acc, x) => acc + x)) { n =>
        when(n === 0, lit(0.0)).otherwise(
          round(-aggregate(transform(cs, c =>
            when(c > 0, (c.cast(DoubleType) / n) *
              log(c.cast(DoubleType) / n)).otherwise(lit(0.0))),
            lit(0.0), (acc, x) => acc + x), roundDigits))
      }
    }
  }

  /** Content-defined chunking (Rabin/LBFS-style — public technique): cut
    * the token stream after position `i` whenever the portable hash of the
    * (token(i-1), token(i)) window is ≡ 0 mod `modulus` — boundaries
    * depend only on LOCAL content, so an insertion early in a document
    * shifts chunk edges only until the next boundary (the property
    * fixed-size chunking lacks, and why CDC is the standard pre-step for
    * chunk-level dedup). Pure per-row HOFs over one bound tokenization +
    * zero shuffles. Returns (id, n_chunks, max_chunk, lens_md5) where
    * lens_md5 fingerprints the chunk-length sequence. */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
      modulus: Int = 8): DataFrame = {
    val out = bindOnce(split(trim(lower(col(textCol))), "\\s+")) { ws =>
      bindOnce(size(ws)) { n =>
        // i < n: a cut after the LAST token is a no-op — allowing it would
        // emit a phantom zero-length trailing chunk for ~1/modulus of docs
        val bnd = filter(sequence(lit(2), greatest(n, lit(2))),
          i => i < n && Dedup.portableWordHash(
            concat_ws(" ", element_at(ws, i - 1), element_at(ws, i)))
            % modulus === 0)
        bindOnce(concat(array(lit(0)), bnd.cast("array<int>"),
            array(n))) { p =>
          bindOnce(transform(sequence(lit(1), size(p) - 1),
            j => element_at(p, j + 1) - element_at(p, j))) { lens =>
            struct(size(lens).as("n_chunks"),
              array_max(lens).as("max_chunk"),
              md5(concat_ws(",", transform(lens, x => x.cast("string"))))
                .as("lens_md5"))
          }
        }
      }
    }
    df.select(col(idCol).as("id"), out.as("c"))
      .select(col("id"), col("c.n_chunks"), col("c.max_chunk"),
        col("c.lens_md5"))
  }

  /** Feature-hashed document vectors (Weinberger et al.'s hashing trick —
    * public method): φ(doc)[j] = Σ over tokens hashing to bucket j of the
    * token's ±1 sign, with bucket = h(w) mod `m` and sign = parity of the
    * next hash bit. INTEGER-exact (no rounding anywhere), so the sketch
    * replays bit-for-bit in any engine; one (id, bucket)-keyed map-side-
    * combinable aggregation is the only shuffle. The cheap way to give
    * text a fixed-width vector for ANN/clustering when no learned
    * embedding exists. Returns sparse rows (id, j, v). */
  def featureHash(df: DataFrame, idCol: String, textCol: String, m: Int)
      : DataFrame = {
    // the sign bit must be DISJOINT from the bucket bits or the hashing
    // trick's sign-independence collapses (with sign = bit 3 and m >= 16,
    // sign would be a pure function of the bucket and v degenerates to
    // ± the raw count): bucket uses the low log2(m) bits, sign uses bit
    // 20 — independent for any m <= 2^20 (the hash itself is < 2^30)
    require(m <= (1 << 20), s"bucket count $m would overlap the sign bit")
    val words = df.select(col(idCol).as("id"),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("w"))
    val h = Dedup.portableWordHash(col("w"))
    words.select(col("id"), pmod(h, lit(m)).as("j"),
        when(shiftright(h, 20) % 2 === 0, 1L).otherwise(-1L).as("s"))
      .groupBy("id", "j").agg(sum("s").as("v"))
  }

  /** Distributed BPE tokenizer TRAINING (Sennrich et al.) — `merges`
    * rounds of the count-pairs → pick-top → apply-merge loop, entirely
    * in-plan (the winning pair is a 1-row broadcast, never a driver
    * value, so a SQL oracle replays every round). Words live as
    * DOUBLE-space-delimited symbol strings ("  h  e  l  l  o  "): the
    * merge pattern ' x  y ' consumes ONE space from each flanking double
    * boundary and the replacement ' xy ' restores it, so adjacent merge
    * sites never fight over a shared delimiter and a single non-regex
    * left-to-right replace IS exactly BPE's greedy leftmost application —
    * including same-symbol runs (' a  a  a  a  a ' → ' aa  aa  a '),
    * where single-space padding provably under-merges (the match eats the
    * next site's leading space) and regex lookarounds are unavailable
    * because the oracle's RE2 engine lacks them. Scale shape: the ONE
    * corpus-sized pass is the word-count aggregation; every round after
    * runs on the (tiny) vocabulary — the reason BPE training
    * parallelizes. Returns the merge table (iter, pair, n). */
  def bpeTrain(df: DataFrame, textCol: String, merges: Int): DataFrame = {
    var vocab = df.select(explode(
        split(trim(lower(col(textCol))), "\\s+")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .select(concat(lit(" "), regexp_replace(col("w"), "(.)", " $1 "),
        lit(" ")).as("s"), col("wc"))
    val rounds = (1 to merges).map { it =>
      val pairs = vocab
        .select(col("wc"), split(trim(col("s")), " +").as("sym"))
        .filter(size(col("sym")) >= 2)
        .select(col("wc"), explode(transform(
          sequence(lit(1), size(col("sym")) - 1),
          i => concat_ws(" ", element_at(col("sym"), i),
            element_at(col("sym"), i + 1)))).as("pair"))
        .groupBy("pair").agg(sum("wc").as("n"))
      // localCheckpoint both per round: the next round references vocab
      // twice (pair counts + merge application) and the final union
      // references every top — without the cut, round r's plan re-embeds
      // and RE-EXECUTES all earlier rounds (the PageRank discipline)
      val top = pairs.orderBy(col("n").desc, col("pair")).limit(1)
        .withColumn("iter", lit(it))
        .localCheckpoint()
      // pair is stored "x y"; the in-string pattern needs the double-gap
      // form " x  y " and the replacement re-wraps the fused symbol
      vocab = vocab.crossJoin(broadcast(top.select(col("pair").as("_m"))))
        .select(expr("replace(s, concat(' ', replace(_m, ' ', '  '), ' '), " +
          "concat(' ', replace(_m, ' ', ''), ' '))").as("s"), col("wc"))
        .localCheckpoint()
      top
    }
    rounds.reduce(_ unionByName _)
      .select(col("iter"), col("pair"), col("n"))
  }

  /** Apply trained BPE merges to a corpus — the ENCODE half of the D82
    * tokenizer loop. All merge application happens on the DISTINCT
    * vocabulary (the tiny table), in training order, with the same
    * double-gap replace trick as [[bpeTrain]]; documents then broadcast-
    * join their words to the per-word token counts — at 100 TB the corpus
    * pass is one explode + one map-side-combinable per-doc aggregation,
    * and the merge loop never sees a document. The merge list itself is
    * collected driver-side (merge-count rows — the model, not data).
    * Returns (id, n_words, n_tokens). */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
      merges: DataFrame): DataFrame = {
    def sq(s: String): String = s.replace("'", "''")
    val ms = merges.orderBy("iter").select("pair").collect()
      .map(_.getString(0))
    val words = df.select(col(idCol),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("w"))
    val vocab = words.select("w").distinct()
      .withColumn("s", concat(lit(" "),
        regexp_replace(col("w"), "(.)", " $1 "), lit(" ")))
    val encoded = ms.foldLeft(vocab) { (v, m) =>
      val gap = sq(m.replace(" ", "  "))
      val fused = sq(m.replace(" ", ""))
      v.withColumn("s",
        expr(s"replace(s, concat(' ', '$gap', ' '), " +
          s"concat(' ', '$fused', ' '))"))
    }
    val tok = encoded.select(col("w"),
      size(split(trim(col("s")), " +")).cast("long").as("t"))
    words.join(broadcast(tok), "w")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"), sum("t").as("n_tokens"))
  }

  /** BPE merge-pair statistics (Sennrich et al.): the first tokenizer-
    * training step — count every adjacent character pair inside each
    * distinct word, weighted by the word's corpus frequency, and rank the
    * merge candidates. Aggregating to distinct words FIRST means the pair
    * explosion runs once per vocabulary entry, not once per corpus token —
    * at 100 TB the heavy pass is the word count (map-side combinable);
    * the pair stage works on the (tiny) vocabulary. Top-k by
    * (count desc, pair asc) is a per-task heap (TakeOrderedAndProject),
    * never a global sort. Returns (pair, n_pair). */
  def bpePairStats(df: DataFrame, textCol: String, topK: Int): DataFrame = {
    val vocab = df.select(explode(
        split(trim(lower(col(textCol))), "\\s+")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .filter(length(col("w")) >= 2)
    vocab.select(col("wc"), explode(transform(
        sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy("pair").agg(sum("wc").as("n_pair"))
      .orderBy(col("n_pair").desc, col("pair").asc)
      .limit(topK)
  }

  /** (mojibake sequence → intended character): the UTF-8 byte pairs/
    * triples of common Latin/punctuation characters mis-decoded as
    * Windows-1252/Latin-1 — the dominant real-world encoding corruption
    * in crawled corpora (what the public `ftfy` library calls mojibake).
    * Pinned, ordered, and shared verbatim with the SQL oracle (the
    * portable-constants discipline); sequences are disjoint under this
    * order, and no repair output contains another entry's input, so the
    * chained replace is confluent. Only safe cp1252 codepoints appear
    * (no C1 control bytes). ` ` is the NBSP Latin-1 maps 0xA0 to. */
  val MojibakePairs: Seq[(String, String)] = Seq(
    "â€™" -> "’", "â€œ" -> "“", "â€“" -> "–", "â€”" -> "—",
    "â‚¬" -> "€", "Ã©" -> "é", "Ã¨" -> "è", "Ã¼" -> "ü",
    "Ã¶" -> "ö", "Ã¤" -> "ä", "Ã±" -> "ñ", "Ã§" -> "ç",
    "Ã " -> "à", "Â°" -> "°", "Â " -> " ")

  /** Mojibake repair (D167): adds `repaired` — `textCol` with every
    * [[MojibakePairs]] sequence folded back to its intended character.
    * Pure per-row projection of codegen'd literal `replace` calls: zero
    * shuffles, linear in corpus bytes, trivially 100 TB-safe. Recovery
    * metrics (characters recovered = length delta, changed flag) are one
    * more projection the caller derives — the gate pins both. */
  def mojibakeRepair(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("repaired",
      MojibakePairs.foldLeft(col(textCol)) { case (c, (bad, good)) =>
        org.apache.spark.sql.functions.replace(c, lit(bad), lit(good))
      })

  /** Readability metrics (SURVEY §2D, D217) — the Flesch-reading-ease
    * tier of a quality-filtering stack (Kincaid et al. 1975, public
    * formula; Gopher/C4-style stacks gate on it alongside D10/D26/D55).
    * Heuristic counters chosen for CROSS-ENGINE replayability:
    *
    *  - words: whitespace tokens ([[tokenCount]]'s grammar);
    *  - sentences: non-empty `[.!?]+`-separated segments, floor 1;
    *  - syllables: `[aeiouy]+` vowel GROUPS over the lowercased text —
    *    the standard cheap proxy — floored at the word count (every
    *    word carries ≥1 syllable, which the proxy misses for "rhythm");
    *  - flesch = 206.835 − 1.015·(words/sentences) − 84.6·(syll/words),
    *    each division a single IEEE op, rounded to 4.
    *
    * Adds (n_words, n_sentences, n_syllables, flesch4). Pure per-row
    * projection inside whole-stage codegen — zero shuffles at any
    * scale; empty/blank docs surface flesch4 = NULL (0 words). */
  def readability(df: DataFrame, textCol: String): DataFrame = {
    val t = lower(trim(col(textCol)))
    df.withColumn("n_words", tokenCount(col(textCol)).cast(LongType))
      .withColumn("n_sentences",
        greatest(size(filter(split(t, "[.!?]+"),
          s => length(trim(s)) > 0)), lit(1)).cast(LongType))
      .withColumn("n_syllables",
        greatest(size(regexp_extract_all(t, lit("[aeiouy]+"), lit(0))),
          col("n_words")).cast(LongType))
      .withColumn("flesch4",
        when(col("n_words") > 0,
          round(lit(206.835)
            - lit(1.015) * (col("n_words").cast(DoubleType) /
              col("n_sentences").cast(DoubleType))
            - lit(84.6) * (col("n_syllables").cast(DoubleType) /
              col("n_words").cast(DoubleType)), 4)))
  }
}
