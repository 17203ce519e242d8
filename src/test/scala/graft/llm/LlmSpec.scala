package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** LLM-pipeline operators: planted-duplicate recall, similarity-search
  * correctness vs a driver-side brute-force oracle, text analysis. */
class LlmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river shore"),
    (3L, "completely different text about spark distributed query engines"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (5L, "one two three four five six seven eight nine ten eleven twelve")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val got = Dedup.exact(docs, "doc_id", "text")
    assert(got.count() == 4) // 1&4 collapse
    assert(got.filter($"dup_count" === 2).select("keep_id")
      .as[Long].collect().toSeq == Seq(1L))
  }

  test("minhash LSH finds planted near-duplicates and exact dups") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleWidth = 3, k = 32, b = 8, threshold = 0.6)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L))) // identical, jaccard 1.0
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 4L))) // near-dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("incremental dedup finds a new batch's near-dups in the corpus " +
    "without pairing corpus docs with each other") {
    val corpus = docs // ids 1..5
    val batch = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (101L, "totally novel content that matches nothing in the corpus at all")
    ).toDF("doc_id", "text")
    val got = Dedup.minhashLshNewVsCorpus(corpus, batch, "doc_id", "text",
        shingleWidth = 3, k = 32, b = 8, threshold = 0.6)
      .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(got.contains((100L, 1L)) && got.contains((100L, 4L))) // identical
    assert(got.contains((100L, 2L))) // near-dup
    assert(!got.exists(_._1 == 101L)) // novel doc matches nothing
    assert(got.forall(p => p._1 >= 100L && p._2 < 100L)) // batch × corpus only
  }

  test("connected components merge duplicate chains into one cluster") {
    // chain 1~2, 2~3 (transitive), separate pair 7~9
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id1", "id2")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("connected components match a driver-side union-find on random graphs") {
    for (seed <- Seq(7, 42, 1337)) {
      val rnd = new scala.util.Random(seed)
      val n = 30
      val edges = Seq.fill(25)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      // reference: classic union-find
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(id => id -> find(id.toInt).toLong).toMap
      val got = Dedup.connectedComponents(edges.toDF("id1", "id2"))
        .as[(Long, Long)].collect().toMap
      assert(got == expect, s"seed $seed")
    }
  }

  test("prefix-filtered set-similarity join equals brute force (no false negatives)") {
    val corpus = (1 to 60).map { i =>
      // overlapping sliding vocabularies: plenty of pairs straddle the
      // threshold from both sides
      val words = (i until i + 10).map(w => s"w${w % 25}").distinct
      (i.toLong, words.mkString(" "))
    }
    val df = corpus.toDF("doc_id", "text")
    for (t <- Seq(0.5, 0.8)) {
      val got = Dedup.prefixJaccardPairs(df, "doc_id", "text", t)
        .as[(Long, Long, Double)].collect()
        .map(r => (r._1, r._2)).toSet
      val sets = corpus.map { case (id, tx) =>
        id -> tx.split("\\s+").toSet }.toMap
      val expect = (for {
        a <- corpus.map(_._1); b <- corpus.map(_._1) if a < b
        inter = sets(a).intersect(sets(b)).size.toDouble
        j = inter / (sets(a).size + sets(b).size - inter)
        if j >= t
      } yield (a, b)).toSet
      assert(got == expect, s"threshold $t")
    }
  }

  test("connected components converge in O(log n) rounds on a 1000-link chain") {
    // a planted path 0-1-2-…-1000: diameter 1000, so min-label propagation
    // needs 1000 rounds; alternating star rounds must finish in ~log2(n)
    val chain = (0L until 1000L).map(i => (i, i + 1)).toDF("id1", "id2")
    val (labels, rounds) = Dedup.ccWithRounds(chain, maxIter = 20)
    assert(rounds <= 12, s"expected O(log n) rounds, took $rounds")
    val got = labels.as[(Long, Long)].collect()
    assert(got.length == 1001 && got.forall(_._2 == 0L),
      s"all 1001 chain nodes must label to 0")
  }

  test("connected components emit ONE label per node even on a maxIter exit") {
    // a long chain cut off mid-contraction: labels may be non-minimal but
    // must never fan out to contradictory rows per node
    val chain = (0L until 200L).map(i => (i, i + 1)).toDF("id1", "id2")
    val (labels, rounds) = Dedup.ccWithRounds(chain, maxIter = 2)
    assert(rounds == 2)
    val got = labels.as[(Long, Long)].collect()
    assert(got.length == 201, s"one row per node, got ${got.length}")
    assert(got.map(_._1).distinct.length == 201)
  }

  test("simhash: identical texts have distance 0, near-dups small") {
    val hs = docs.select($"doc_id", Dedup.simhash($"text").as("h"))
      .as[(Long, Long)].collect().toMap
    assert(hs(1L) == hs(4L))
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(2L)) <= 12)
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(3L)) > 12)
  }

  test("production simhash pair mining surfaces the identical pair") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("id1", "id2", "hamming").as[(Long, Long, Int)].collect()
    assert(pairs.exists { case (a, b, h) => a == 1L && b == 4L && h == 0 })
    assert(!pairs.exists { case (a, b, _) => a == 3L || b == 3L })
  }

  test("production embedding near-dup (xxhash planes) finds planted clones") {
    val vecs = (0 until 40).map { i =>
      val r = new scala.util.Random(i)
      (i.toLong, Array.fill(16)(r.nextFloat() - 0.5f))
    }
    val base = vecs.toDF("vec_id", "embedding")
    val clones = vecs.take(5)
      .map { case (id, v) => (id + 1000, v.map(_ * 2.0f)) }
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDup(base.unionByName(clones), "vec_id",
        "embedding", threshold = 0.99)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    (0 until 5).foreach { i =>
      assert(pairs.contains((i.toLong, i + 1000L)), s"missing clone pair $i")
    }
  }

  test("ngram jaccard: identical 1.0, unrelated low") {
    val pairs = Seq((1L, 4L), (1L, 3L)).toDF("id1", "id2")
    val m = Dedup.ngramJaccardPairs(docs, pairs, "doc_id", "text")
      .select("id1", "id2", "jaccard").as[(Long, Long, Double)]
      .collect().map { case (a, b, j) => (a, b) -> j }.toMap
    assert(m((1L, 4L)) == 1.0)
    assert(m((1L, 3L)) < 0.3)
  }

  test("brute-force cosine top-k matches a driver-side oracle") {
    val vecs = (0 until 50).map { i =>
      val r = new scala.util.Random(i)
      (i.toLong, Array.fill(16)(r.nextFloat() - 0.5f))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(df.filter($"vec_id" < 3), df,
      "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    for (q <- 0 until 3) {
      val expect = vecs.filter(_._1 != q)
        .map { case (id, v) => (id, cos(vecs(q)._2, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
      assert(got(q.toLong) == expect, s"query $q")
    }
  }

  test("IVF top-k achieves high recall vs brute force on clustered data") {
    // clustered vectors: IVF with nprobe covering most lists
    val vecs = (0 until 200).map { i =>
      val r = new scala.util.Random(i % 8) // 8 clusters
      val jitter = new scala.util.Random(i)
      (i.toLong, Array.fill(16)(r.nextFloat() + jitter.nextFloat() * 0.1f))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val q = df.filter($"vec_id" < 3)
    val brute = Similarity.bruteForceTopK(q, df, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(q, df, "vec_id", "embedding", 5,
      nlist = 16, nprobe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("LSH bucket cap is applied BEFORE aggregation (bounded buffers) " +
    "and keeps the smallest ids on a degenerate all-identical corpus") {
    // every doc identical → ONE bucket per band holds the whole corpus:
    // the worst-case hot bucket. The cap must (a) bound the pair set to
    // C(cap,2) over the smallest ids, (b) sit BELOW the collect_list
    // aggregate in the plan as a rank limit, so the aggregation buffer can
    // never see more than `cap` rows per bucket.
    val same = (1L to 20L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val capped = Dedup.minhashLshPairs(same, "doc_id", "text",
      shingleWidth = 3, k = 32, b = 8, threshold = 0.5, maxBucket = 4)
    val pairs = capped.select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs == (for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)).toSet)
    // structural: every collect_list aggregate has a Window (row_number
    // rank-limit) below it — the pre-aggregation cap, not a post-slice
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val plan = capped.queryExecution.optimizedPlan
    val aggs = plan.collect {
      case a: Aggregate
        if a.aggregateExpressions.exists(_.toString.contains("collect_list")) => a
    }
    assert(aggs.nonEmpty)
    aggs.foreach { a =>
      assert(a.find { case _: LWindow => true; case _ => false }.isDefined,
        "collect_list aggregate without a pre-aggregation window cap")
      assert(!a.aggregateExpressions.exists(_.toString.contains("slice(")),
        "post-aggregation slice cap found — unbounded buffer")
    }
    // same contract for the simhash + embedding shapes
    Seq(
      Dedup.simhashPairsPortable(same, "doc_id", "text", maxBucket = 4),
      Dedup.embeddingNearDupPortable(
        (1L to 9L).map(i => (i, Array.fill(8)(0.5f))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", 0.5, Dedup.portablePlanes(4, 8), maxBucket = 3)
    ).foreach { df =>
      val as = df.queryExecution.optimizedPlan.collect {
        case a: Aggregate
          if a.aggregateExpressions.exists(_.toString.contains("collect_list")) => a
      }
      assert(as.nonEmpty && as.forall(
        _.find { case _: LWindow => true; case _ => false }.isDefined))
    }
  }

  test("simhash pair miners refuse maxHamming beyond the pigeonhole bound") {
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 4)
    }
    intercept[IllegalArgumentException] {
      Dedup.simhashPairsPortable(docs, "doc_id", "text", maxHamming = 4)
    }
  }

  test("ivfAssign: map-side aggregation shape (no window), deterministic " +
    "tie-break to the smaller centroid id") {
    val df = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)),
      (2L, Array(0.5f, 0.5f)), // exactly equidistant from both centroids
      (3L, Array(0.9f, 0.1f)), (4L, Array(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val assigned = Similarity.ivfAssign(df, "vec_id", "embedding", nlist = 2)
    // scale shape: nearest-centroid via min(struct) aggregation, NOT a
    // row_number window over the nlist-replicated corpus
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    assert(assigned.queryExecution.optimizedPlan.find {
      case _: LWindow => true; case _ => false
    }.isEmpty, "ivfAssign must not use a window for nearest-centroid")
    val m = assigned.select("vec_id", "list_id").as[(Long, Long)]
      .collect().toMap
    assert(m == Map(0L -> 0L, 1L -> 1L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
  }

  test("ivfTopK with full probe equals brute force even with duplicate " +
    "vectors among the centroid ids") {
    // vec 0 and 1 are IDENTICAL: assignment ties both to centroid 0. The
    // old centroid recovery (indexed.filter(id === list_id)) lost centroid
    // 1 in this corpus; the probe set must still be the full nlist model.
    val df = Seq(
      (0L, Array(1f, 0f, 0f)), (1L, Array(1f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f)), (3L, Array(0f, 0f, 1f)),
      (4L, Array(0.7f, 0.7f, 0f)), (5L, Array(0f, 0.7f, 0.7f)),
      (6L, Array(0.5f, 0.5f, 0.7f)), (7L, Array(0.2f, 0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    val q = df.filter($"vec_id" === 7L)
    val brute = Similarity.bruteForceTopK(q, df, "vec_id", "embedding", k = 7)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toSet
    val ivf = Similarity.ivfTopK(q, df, "vec_id", "embedding", k = 7,
      nlist = 4, nprobe = 4)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toSet
    assert(ivf == brute)
  }

  test("int8 quantization stays within [-127, 127] and round-trips within " +
    "one scale step") {
    val vecs = (0 until 30).map { i =>
      val r = new scala.util.Random(i)
      (i.toLong, Array.fill(16)((r.nextFloat() - 0.5f) * (i + 1)))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val scale = Similarity.maxAbs($"embedding") / 127.0
    val rows = df.select($"vec_id", scale.as("s"),
      Similarity.quantizeInt8($"embedding", scale).as("q"), $"embedding")
      .collect()
    rows.foreach { r =>
      val s = r.getDouble(1)
      val q = r.getSeq[Int](2)
      val v = r.getSeq[Float](3)
      assert(q.forall(x => x >= -127 && x <= 127))
      // dequantized error bounded by half a quantization step
      q.zip(v).foreach { case (qi, vi) =>
        assert(math.abs(qi * s - vi) <= s / 2 + 1e-12)
      }
    }
  }

  test("redaction is idempotent and replacement tokens never re-match") {
    val t = Seq((1L, "mail a.b+c@ex-ample.org and id 12345678 now"),
      (2L, "clean text"), (3L, "x@y.io 999999"))
      .toDF("doc_id", "text")
    val once = t.select($"doc_id", TextAnalysis.redact($"text").as("r"))
    val twice = once.select($"doc_id", TextAnalysis.redact($"r").as("r"))
    assert(once.collect().toSeq.map(_.toString) ==
      twice.collect().toSeq.map(_.toString))
    val m = once.as[(Long, String)].collect().toMap
    assert(m(1L) == "mail <EMAIL> and id <NUM> now")
    assert(m(2L) == "clean text")
    assert(m(3L) == "<EMAIL> <NUM>")
  }

  test("chunking covers every token; consecutive chunks overlap by the " +
    "configured amount; the tail chunk is short") {
    val t = Seq((1L, (1 to 81).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.chunkDocs(t, "doc_id", "text",
        chunkTokens = 32, overlap = 8)
      .orderBy("chunk_start").collect()
    assert(rows.map(_.getInt(1)).toSeq == Seq(0, 24, 48, 72))
    assert(rows.map(_.getInt(2)).toSeq == Seq(32, 32, 32, 9))
    // a short doc yields exactly one whole-doc chunk
    val short = Seq((2L, "a b c")).toDF("doc_id", "text")
    val one = TextAnalysis.chunkDocs(short, "doc_id", "text", 32, 8).collect()
    assert(one.length == 1 && one.head.getInt(2) == 3)
  }

  test("repetition stats flag a self-repeating doc and not a diverse one") {
    val t = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "each word here appears exactly once in this doc"))
      .toDF("doc_id", "text")
    val m = TextAnalysis.repetitionStats(t, "doc_id", "text")
      .select("id", "rep_ratio").as[(Long, Double)].collect().toMap
    assert(m(1L) == 1.0)  // every 2-gram is "spam spam"
    assert(m(2L) < 0.2)
  }

  test("gopher stats: keep needs every rule; counts match hand calculation") {
    // 60 words, mean length in [3,10], all alpha, high TTR, stopwords present
    val good = ((1 to 55).map(i => s"word$i") ++
      Seq("the", "and", "of", "to", "in")).mkString(" ")
    val shortDoc = "too short to pass the fifty word minimum rule now"
    val noStop = (1 to 60).map(i => s"tok$i").mkString(" ")
    val t = Seq((1L, good), (2L, shortDoc), (3L, noStop)).toDF("doc_id", "text")
    val byId = t.select(col("doc_id"), TextAnalysis.gopherStats(col("text")).as("g"))
      .select("doc_id", "g.n_words", "g.n_stop", "g.keep")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(byId(1L) == ((60, 5, 1)))
    assert(byId(2L)._1 == 10 && byId(2L)._3 == 0) // word count rule fails
    assert(byId(3L) == ((60, 0, 0))) // no stopwords -> drop
  }

  test("dup spans: planted shared 8-gram counted in both docs, unique doc 0") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta" // 8 words
    val t = Seq(
      (1L, s"$shared unique1a unique1b unique1c"),
      (2L, s"prefix2a prefix2b $shared"),
      (3L, "nothing here matches any other document at all ok"),
      (4L, "tiny doc")) // < 8 words -> zero grams
      .toDF("doc_id", "text")
    val got = Dedup.dupSpanStats(t, "doc_id", "text", width = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc1: 4 gram positions, exactly position 1 is the shared gram
    assert(got(1L) == ((4L, 1L, 0.25)))
    // doc2: 3 gram positions, the last is shared
    assert(got(2L) == ((3L, 1L, round4(1.0 / 3))))
    assert(got(3L)._2 == 0L)
    assert(got(4L) == ((0L, 0L, 0.0)))
  }

  private def round4(d: Double): Double =
    BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("semantic dedup drops the scaled copy, keeps the original, and " +
    "leaves orthogonal vectors alone") {
    // 4 near-orthogonal base vectors + a scaled copy of id 0 (cosine 1.0)
    val vecs = Seq(
      (0L, Seq(1.0f, 0.1f, 0.0f, 0.0f)),
      (1L, Seq(0.0f, 1.0f, 0.1f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 1.0f, 0.1f)),
      (3L, Seq(0.1f, 0.0f, 0.0f, 1.0f)),
      (100L, Seq(1.1f, 0.11f, 0.0f, 0.0f))) // copy of 0, scaled
      .toDF("vec_id", "embedding")
    val got = Similarity.semanticDedup(vecs, "vec_id", "embedding",
        nlist = 2, tau = 0.95)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got(100L) == 1) // the copy drops (same cluster as its original)
    assert(got(0L) == 0) // keep-first: the smaller id survives
    assert(got(1L) == 0 && got(2L) == 0 && got(3L) == 0)
  }

  test("bm25: higher tf ranks first, absent docs absent, rare term " +
    "out-scores a ubiquitous one") {
    val docs = Seq(
      (1L, "hash join hash"), (2L, "scan filter"), (3L, "hash scan"),
      (4L, "scan scan")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, "doc_id", "text",
      Seq(1 -> Seq("hash"), 2 -> Seq("filter")), k = 10)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getDouble(3)))
    val q1 = got.filter(_._1 == 1).sortBy(_._2)
    assert(q1.map(_._3).toSeq == Seq(1L, 3L)) // tf=2 doc first; d2/d4 absent
    // 'filter' (df=1) on d2 must out-score 'hash' (df=2) anywhere:
    val filterScore = got.filter(_._1 == 2).head._4
    assert(filterScore > q1.head._4)
  }

  test("kmeans separates two obvious cosine clusters from a mixed init") {
    val vs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 0.0f, 0.9f, 0.1f))).toDF("vec_id", "embedding")
    val got = Similarity.kmeans(vs, "vec_id", "embedding",
      k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 2L, 1L -> 2L)) // ids {0,2} and {1,3}
  }

  test("bpe merge is greedy-leftmost on SAME-symbol runs (the shared-" +
    "delimiter skip would merge sites 1,4,7 instead of 1,3,5)") {
    val df = Seq((1L, "aaaaa")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(df, "text", merges = 2)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    // r1: ("a a", 4); greedy apply -> tokens [aa, aa, a]; r2 candidates
    // {("aa aa",1), ("aa a",1)} tie -> lexicographic -> ("aa a", 1).
    // The skip bug would leave [aa, a, aa] and r2 = ("a aa", 1).
    assert(got == Seq((1, "a a", 4L), (2, "aa a", 1L)))
  }

  test("bpe training replays the hand-computed merge sequence") {
    val df = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(df, "text", merges = 3)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    // r1: pairs {a a:4, a b:3} -> merge "a a"; vocab " aa a b "(2) " a b "(1)
    // r2: {aa a:2, a b:3} -> "a b"; vocab " aa ab "(2) " ab "(1)
    // r3: {aa ab:2} -> "aa ab"
    assert(got == Seq((1, "a a", 4L), (2, "a b", 3L), (3, "aa ab", 2L)))
  }

  test("ks drift: hand-computed two-sample statistic") {
    // F_a steps at {1,2}, F_b at {2,3}: max |F_a - F_b| = 0.5 (at v=1 or 2)
    val df = Seq(("a", 1L), ("a", 2L), ("b", 2L), ("b", 3L))
      .toDF("source", "n")
    val r = TextAnalysis.ksDrift(df, "n", "source", "a", "b").head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 0.5)
  }

  test("chi2 drift: balanced token scores 0, stratum-exclusive tokens " +
    "hit the hand-computed 2x2 statistic") {
    val df = Seq(("a", "z x x"), ("b", "z y y")).toDF("source", "text")
    val got = TextAnalysis.chi2Drift(df, "text", "source", "a", "b", 5)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    // x: cells (2,0),(1,3) -> 6*(2*3-0*1)^2/(2*4*3*3) = 3.0; z balanced
    assert(got("z") == 0.0)
    assert(got("x") == 3.0 && got("y") == 3.0)
  }

  test("bpe merge application is greedy-leftmost across overlapping " +
    "chain sites (one replace pass would skip every other site)") {
    val df = Seq((1L, "abab abab")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(df, "text", merges = 2)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    // r1: "a b" (4) applied to " a b a b " must give " ab ab " (NOT
    // " ab a b "); r2's winner is then ("ab ab", 2)
    assert(got == Seq((1, "a b", 4L), (2, "ab ab", 2L)))
  }

  test("bigram nll: the corpus-frequent order scores lower than the " +
    "scrambled one") {
    val df = Seq((1L, "x y"), (2L, "x y"), (3L, "y x"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramNll(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got(1L)._1 == 1 && got(3L)._1 == 1)
    assert(got(1L)._2 == got(2L)._2)
    assert(got(3L)._2 > got(1L)._2) // rare order = higher NLL
  }

  test("char entropy: uniform pair = ln 2, single char = 0, " +
    "non-alphabet chars ignored") {
    val df = Seq((1L, "ab"), (2L, "aaaa"), (3L, "a1b2"), (4L, "123"))
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      TextAnalysis.charEntropy(col("text")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == round6(math.log(2.0)))
    assert(got(2L) == 0.0)
    assert(got(3L) == round6(math.log(2.0))) // digits drop out
    assert(got(4L) == 0.0) // nothing in-alphabet -> n=0 guard
  }

  test("cdc chunks: modulus=1 cuts after every window; lens cover the " +
    "doc; identical text => identical fingerprint") {
    val df = Seq((1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text")
    val rows = TextAnalysis.cdcChunks(df, "doc_id", "text", modulus = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getString(3)))
    // bnd = [2,3] (no cut after the last token) -> pos [0,2,3,4]
    // -> lens [2,1,1]
    assert(rows.forall(r => r._2 == 3 && r._3 == 2))
    assert(rows(0)._4 == rows(1)._4)
  }

  private def round6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("query likelihood: candidates restricted to term-holding docs; " +
    "higher tf ranks first") {
    val docs = Seq((1L, "hash hash x"), (2L, "hash y z"), (3L, "scan only"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.queryLikelihoodTopK(docs, "doc_id", "text",
      Seq(1 -> Seq("hash")), k = 10)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(got.sortBy(_._1).map(_._2).toSeq == Seq(1L, 2L)) // d3 excluded
  }

  test("rrf fusion: a doc on both lists beats single-list docs; " +
    "rank order follows summed reciprocals") {
    val a = Seq((1, 1, 10L), (1, 2, 20L)).toDF("query_id", "rnk", "id")
    val b = Seq((1, 1, 20L), (1, 2, 30L)).toDF("query_id", "rnk", "id")
    val got = TextAnalysis.rrfFuse(a, b, kConst = 60, k = 10)
      .collect().sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
    // 20: 1/62+1/61 > 10: 1/61 > 30: 1/62
    assert(got == Seq(20L, 10L, 30L))
  }

  test("inverted index caps posting heads at maxPostings but df stays " +
    "exact") {
    val docs = Seq((10L, "a b"), (20L, "a"), (30L, "a c"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.invertedIndex(docs, "doc_id", "text",
      maxPostings = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(got("a") == (3L, "10,20")) // df counts all 3; head keeps 2
    assert(got("b") == (1L, "10") && got("c") == (1L, "30"))
  }

  test("bpe pair stats weight pairs by word frequency") {
    val docs = Seq((1L, "aaab aaab ab"), (2L, "x")).toDF("doc_id", "text")
    // aaab (wc 2) -> aa, aa, ab each x2 => aa:4, ab:2; ab (wc 1) -> ab:1
    // single-char x is excluded (no pairs)
    val got = TextAnalysis.bpePairStats(docs, "text", topK = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.toSeq == Seq("aa" -> 4L, "ab" -> 3L))
  }

  test("jl projection matches the hand-computed signed fold") {
    val v = Seq(1.0f, 2.0f, -1.0f, 0.5f)
    val df = Seq((7L, v)).toDF("vec_id", "embedding")
    val got = Similarity.jlProject(df, "vec_id", "embedding",
      dim = 4, outDim = 2)
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    val planes = Dedup.portablePlanes(2, 4)
    val want = planes.zipWithIndex.map { case (s, j) =>
      j -> round4(v.zip(s).map { case (x, sg) => x.toDouble * sg }.sum /
        math.sqrt(2.0))
    }.toMap
    assert(got == want)
  }

  test("phash: identical payloads collide at hamming 0; a single odd " +
    "byte delta flips exactly one block bit") {
    val base = "a" * 32
    val oneOff = "b" + base.substring(1) // +1 in block 0's byte sum
    val docs = Seq((1L, base), (2L, base), (3L, oneOff))
      .toDF("doc_id", "text")
    val media = Multimodal.fromDocuments(docs)
    val pairs = Multimodal.phashPairs(
      Multimodal.perceptualHash(media), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2))
      .toMap
    assert(pairs((1L, 2L)) == 0) // identical payloads
    assert(pairs((1L, 3L)) == 1 && pairs((2L, 3L)) == 1) // one parity flip
  }

  test("langid picks the stopword-matching language, CJK -> zh") {
    val t = Seq(
      (1L, "the cat and the dog are in the house with it"),
      (2L, "el perro y la casa de los gatos en la calle"),
      (3L, "der Hund und die Katze mit den Kindern ist im Haus"),
      (4L, "le chat et les chiens dans une maison pour la famille"),
      (5L, "这是一个中文测试文档内容很长"),
      (6L, "zzz qqq xxx www")).toDF("doc_id", "text")
    val got = t.select($"doc_id", TextAnalysis.langId($"text").as("l"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "en", 2L -> "es", 3L -> "de", 4L -> "fr",
      5L -> "zh", 6L -> "und"))
  }

  test("token count and fingerprint are deterministic and sane") {
    val t = Seq((1L, "  Hello,  World! 42  "), (2L, "")).toDF("doc_id", "text")
    val byId = t.select($"doc_id", TextAnalysis.tokenCount($"text").as("n"))
      .as[(Long, Int)].collect().toMap
    assert(byId(1L) == 3 && byId(2L) == 0)
    // fingerprint stable across runs
    val fp1 = t.select(TextAnalysis.fingerprint($"text")).as[Long].collect()
    val fp2 = t.select(TextAnalysis.fingerprint($"text")).as[Long].collect()
    assert(fp1.toSeq == fp2.toSeq)
  }

  test("resize geometry: aspect preserved, letterbox centered, tiny dims " +
    "clamp to 1") {
    val feats = Seq(
      (1L, 448, 224),   // wide 2:1 -> 224x112, pad_y 56
      (2L, 224, 448),   // tall 1:2 -> 112x224, pad_x 56
      (3L, 224, 224),   // exact fit
      (4L, 100000, 1)   // degenerate: height clamps to 1
    ).toDF("media_id", "width", "height")
    val got = Multimodal.resizePlan(feats, 224, 224)
      .select("media_id", "out_w", "out_h", "pad_x", "pad_y")
      .as[(Long, Int, Int, Int, Int)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == (1L, 224, 112, 0, 56))
    assert(got(2L) == (2L, 112, 224, 56, 0))
    assert(got(3L) == (3L, 224, 224, 0, 0))
    // fp floor: 224/100000*100000 lands a hair under 224 — either is fine
    assert(got(4L)._3 == 1 && got(4L)._2 >= 223 && got(4L)._2 <= 224)
  }

  test("multimodal decode plumbing: schema, determinism, payload sizes") {
    val media = Multimodal.fromDocuments(
      docs.withColumnRenamed("text", "t").withColumn("text", $"t"))
    val feats = Multimodal.decodeFeatures(media)
    assert(feats.schema == Multimodal.featureSchema)
    val rows = feats.orderBy("media_id").collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getAs[Int]("byte_len") > 0))
    // identical payloads -> identical checksums (1 and 4 share text)
    val sums = rows.map(r =>
      r.getAs[Long]("media_id") -> r.getAs[Long]("checksum")).toMap
    assert(sums(1L) == sums(4L) && sums(1L) != sums(3L))
  }

  test("mojibake repair: corrupted sequences fold back, clean text is a " +
    "fixed point, repair is idempotent, pairs are order-confluent") {
    import graft.llm.TextAnalysis
    val rows = Seq(
      (1L, "CafÃ© â€” itâ€™s a rÃ©sumÃ©"),
      (2L, "already clean text with accents: café, niño"),
      (3L, "â‚¬ 5 Â° outside, â€œquotedâ€“rangeâ€\u009d ish"),
      (4L, "")).toDF("id", "text")
    val out = TextAnalysis.mojibakeRepair(rows, "text")
      .select("id", "repaired").as[(Long, String)].collect().toMap
    assert(out(1L) == "Café — it’s a résumé")
    assert(out(2L) == "already clean text with accents: café, niño",
      "clean text must be a fixed point")
    assert(out(3L).startsWith("€ 5 ° outside, “quoted–range"))
    assert(out(4L) == "")
    // idempotent: repairing repaired text changes nothing
    val twice = TextAnalysis.mojibakeRepair(
      TextAnalysis.mojibakeRepair(rows, "text")
        .select(org.apache.spark.sql.functions.col("id"),
          org.apache.spark.sql.functions.col("repaired").as("text")),
      "text").select("id", "repaired").as[(Long, String)].collect().toMap
    assert(twice == out)
    // no repair output contains any pair's input (confluence invariant)
    TextAnalysis.MojibakePairs.foreach { case (bad, _) =>
      TextAnalysis.MojibakePairs.foreach { case (_, good) =>
        assert(!good.contains(bad)) } }
  }
}
