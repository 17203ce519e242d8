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
      "evt_session_window", "q_array_hof", "q_grouping_sets",
      "q_window_dist", "c5_time_travel"))
      time(q) { qs(q)(spark, dst).count() }
    spark.stop()
  }
}
