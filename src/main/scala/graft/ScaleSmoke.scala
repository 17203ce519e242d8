package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10×-sf0.1 scale smoke: synthesizes a larger dataset in /tmp by key-shifted
  * replication, then times the heavy operators. Not a correctness gate — a
  * check that the plans HOLD as data grows (no quadratic blowups, no
  * driver-side collapse, shuffle sizes sane). Run:
  * `sbt "runMain graft.ScaleSmoke [replication]"`. */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val rep = if (args.nonEmpty) args(0).toInt else 10
    val spark = SparkEntry.configure(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val dst = s"/tmp/graft_scale_x$rep"

    def replicate(table: String, keyCols: Map[String, Long]): Unit = {
      val path = s"$dst/$table.parquet"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path))) {
        val base = spark.read.parquet(s"$src/$table.parquet")
        val shifted = base
          .crossJoin(spark.range(rep).withColumnRenamed("id", "__rep"))
          .select(base.columns.toSeq.map { c =>
            keyCols.get(c) match {
              case Some(stride) => (col(c) + col("__rep") * stride).as(c)
              case None => col(c)
            }
          }: _*)
        shifted.write.mode("overwrite").parquet(path)
      }
    }
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scale] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    // max per-task peak execution memory (Spark's memory-consumer high-water
    // mark: aggregation maps, sorts, joins) across everything run inside f —
    // the measured twin of "the aggregation buffer is bounded"
    val peak = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null)
            peak.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
        }
      })
    def peakMemMb(f: => Long): (Long, Double) = {
      Thread.sleep(1000) // drain stragglers from PRIOR queries first
      peak.set(0)
      val n = f
      Thread.sleep(1000) // let this run's task-end events land
      (n, peak.get() / 1e6)
    }

    val M = 10000000L
    replicate("lineitem", Map("l_orderkey" -> M))
    replicate("orders", Map("o_orderkey" -> M, "o_custkey" -> M))
    replicate("customer", Map("c_custkey" -> M))
    replicate("documents", Map("doc_id" -> M))
    replicate("embeddings", Map("vec_id" -> M))
    for (t <- Seq("region", "nation", "supplier", "part", "events"))
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dst/$t.parquet")))
        spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite")
          .parquet(s"$dst/$t.parquet")

    println(s"[scale] dataset at $dst (${rep}x sf0.1)")
    val qs = SparkEntry.queries
    for (q <- Seq("q1_pricing", "q3_topk", "q5_starjoin", "a6_range_slices",
      "c3_dedup_latest", "dd_exact", "dd_minhash", "dd_simhash",
      "dd_incremental", "sim_topk", "sim_ivf", "sim_quantize",
      "llm_corpus_clean", "llm_decontaminate", "llm_hash_sample",
      "llm_pack_sequences", "llm_curate_topk", "llm_chunk_docs",
      "llm_redact", "llm_mix_sources", "text_tfidf", "text_repetition",
      "text_lm_score", "dd_cluster", "mm_decode", "mm_resize",
      "q_salted_agg", "q_approx_percentile", "q_zvalue", "text_quality",
      "evt_sessionize", "e2e_pipeline",
      "q_bloom_join", "q19_discount", "q22_no_urgent", "q_histogram",
      "q_profile", "q_fuzzy", "evt_gapfill", "llm_vocab_encode",
      "q_cms_heavy", "evt_anomaly", "evt_funnel", "evt_retention",
      "evt_funnel_steps", "evt_session_window", "q_array_hof",
      // q_tdigest is NOT in this list on purpose: its plan carries the
      // exact-percentile ORACLE GATE (whole-group buffers) — the banned
      // shape. q_percentile below is the bounded scale path.
      "q_grouping_sets", "q_window_dist", "c5_time_travel",
      "q_winsorize", "q_salted_join", "text_pmi", "sim_pq",
      "llm_temperature_mix", "c6_cdc", "dd_prefix_join",
      "text_bm25", "text_ql", "text_rrf", "text_postings",
      "text_bpe_pairs", "text_entropy", "text_gopher", "llm_cdc_chunks",
      "llm_stratified_sample", "llm_calibrate", "llm_dsir", "dd_semantic",
      "dd_canonical", "dd_dup_spans", "sim_jl", "sim_recall",
      "q_pagerank", "q_kmv_setops", "q_equidepth", "q_dq_checks",
      "evt_transitions", "evt_seq3", "c14_formats",
      "sim_kmeans", "llm_bpe_train", "llm_ks_drift", "text_chi2_drift",
      "text_bigram_nll", "evt_window_distinct", "mm_phash_dedup",
      "text_feature_hash", "evt_group_percentiles", "text_next_token",
      "text_vocab_coverage", "q_triangles", "evt_attribution",
      "llm_weighted_sample", "text_ann", "q_skyline", "evt_trend",
      "q_weighted_median", "q_gini", "text_boilerplate"))
      time(q) { qs(q)(spark, dst).count() }

    // ---- bounded-percentile proof: peak task memory FLAT as data grows ----
    // q_percentile's primary plan is the KmhSample bounded sample; its
    // aggregation state is ≤ 32·k bytes per group no matter the input, so
    // the task-level memory high-water mark must not scale with rep.
    val (_, mem1) = peakMemMb { qs("q_percentile")(spark, src).count() }
    val (_, memN) = peakMemMb { qs("q_percentile")(spark, dst).count() }
    println(f"[scale] q_percentile peak task mem: 1x ${mem1}%.1f MB -> " +
      f"${rep}x ${memN}%.1f MB (bounded sample: must stay flat)")
    assert(memN <= math.max(mem1 * 2, mem1 + 64),
      f"q_percentile peak memory grew ${memN / math.max(mem1, 0.1)}%.1fx " +
        s"at ${rep}x — the sample buffer is supposed to be bounded")

    // ---- LSH skew-in-anger: ONE band hash covering 20% of documents ----
    // A fifth of the corpus becomes the same boilerplate text, so every
    // band of those docs hashes identically — the degenerate hot bucket.
    // cappedBuckets must (a) keep the aggregation buffers bounded (peak
    // memory comparable to the organic corpus) and (b) emit exactly
    // C(maxBucket,2) hot-pair candidates, not C(0.2·N,2).
    val docs = spark.read.parquet(s"$dst/documents.parquet")
    val boiler = "the same boilerplate terms of service text stamped onto " +
      "a fifth of every page in this corpus by the site template"
    val skewed = docs.withColumn("text",
      when(pmod(col("doc_id"), lit(5)) === 0, lit(boiler))
        .otherwise(col("text")))
    val cap = 64
    def lshPairs(d: org.apache.spark.sql.DataFrame) =
      graft.llm.Dedup.minhashLshPairs(d, "doc_id", "text",
        shingleWidth = 3, k = 32, b = 8, threshold = 0.8, maxBucket = cap)
    val (nOrganic, memOrganic) = peakMemMb { lshPairs(docs).count() }
    // persist the mined pairs so the hot-clique check below reuses this
    // run instead of re-mining the whole replicated corpus
    val skewPairs = lshPairs(skewed).persist()
    val t0 = System.nanoTime()
    val (nSkew, memSkew) = peakMemMb { skewPairs.count() }
    println(f"[scale] lsh skew 20%% hot band   ${(System.nanoTime() - t0) / 1e9}%8.2f s  " +
      f"($nSkew pairs; organic $nOrganic; peak mem organic ${memOrganic}%.1f MB " +
      f"-> skewed ${memSkew}%.1f MB)")
    val hotIds = skewed.filter(col("text") === boiler)
      .select(col("doc_id").as("hid"))
    val hotPairs = skewPairs
      .join(hotIds, col("id1") === col("hid")).drop("hid")
      .join(hotIds, col("id2") === col("hid"))
      .count()
    skewPairs.unpersist()
    // every band keeps the SAME `cap` smallest hot ids, so after cross-band
    // dedup the hot clique contributes exactly C(cap,2) pairs — not
    // C(0.2·N,2), which at 10x would be ~2e9
    val expectHot = cap.toLong * (cap - 1) / 2
    assert(hotPairs == expectHot,
      s"hot-clique pairs $hotPairs != C($cap,2)=$expectHot — " +
        "bucket capping failed under 20% skew")
    assert(memSkew <= math.max(memOrganic * 3, memOrganic + 64),
      f"skewed-corpus peak memory ${memSkew}%.1f MB vs organic " +
        f"${memOrganic}%.1f MB — aggregation buffers not bounded under skew")
    println(s"[scale] lsh skew assertions OK: hot pairs $hotPairs <= " +
      s"$expectHot, peak mem bounded")

    // ---- inverted-index cap: posting-head state bounded on hot terms ----
    // The same 20%-boilerplate corpus turns every boilerplate word into a
    // stopword-hot term (df = 0.2·N). The row_number cap inside the single
    // term aggregation keeps per-term collect state <= maxPostings, so the
    // peak task memory on the skewed corpus must stay comparable to the
    // organic one (the window sort spills; the AGGREGATION must not grow).
    val (_, memPostOrg) = peakMemMb {
      graft.llm.TextAnalysis.invertedIndex(docs, "doc_id", "text", 16)
        .count()
    }
    val (_, memPostSkew) = peakMemMb {
      graft.llm.TextAnalysis.invertedIndex(skewed, "doc_id", "text", 16)
        .count()
    }
    println(f"[scale] postings peak task mem: organic ${memPostOrg}%.1f MB" +
      f" -> 20%% hot terms ${memPostSkew}%.1f MB (cap must bound state)")
    assert(memPostSkew <= math.max(memPostOrg * 3, memPostOrg + 64),
      f"inverted-index peak memory ${memPostSkew}%.1f MB vs organic " +
        f"${memPostOrg}%.1f MB — posting cap not bounding state")
    spark.stop()
  }
}
