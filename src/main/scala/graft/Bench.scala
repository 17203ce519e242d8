package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkEntry.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // timing mode: streaming gates skip their restart/replay PROOF arms
    // (see Q.benchLean scaladoc) — Verify runs the full protocol
    graft.queries.Q.benchLean = true
    // Force FULL evaluation of every output column with a noop sink —
    // df.count() lets Catalyst prune projected expressions (a projection
    // query would time a row count, not the projection).
    // Returns (total, setup, op, assert) seconds: gates that opt into
    // queries.Q.Phase marks get a real split, everything else reports
    // op = total. total = -1.0 when the query FAILED — failures are
    // recorded explicitly, never as near-zero "successes". clearCache
    // runs in finally so a failed query's operator-internal caches
    // cannot leak into the next measurement.
    final case class Timing(total: Double, setup: Double, op: Double,
      assert: Double)
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Timing = {
      val t0 = graft.queries.Q.Phase.begin()
      try {
        val df = fn(spark, sfDir)
        val tClose = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val total = (System.nanoTime() - t0) / 1e9
        val (setup, asrt) = graft.queries.Q.Phase.split(tClose)
        Timing(total, setup, math.max(0.0, total - setup - asrt), asrt)
      } catch { case scala.util.control.NonFatal(_) =>
        Timing(-1.0, 0, 0, 0) }
      finally spark.catalog.clearCache()
    }
    // optional comma-separated subset (battery-size A/B runs: the same
    // queries timed in a small battery vs the full one isolate JVM/GC
    // pressure from genuine plan regressions)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val queries = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // untimed warmup pass: JIT + codegen caches + parquet footer reads, so
    // the timed passes measure engine throughput, not JVM startup
    queries.foreach { case (_, fn) => run(fn) }
    // three timed passes, keep the per-query minimum total (and THAT
    // pass's phase split): single-pass timings at this scale are
    // GC/JIT-noise-dominated (±30% run-to-run totals; min-of-2 still
    // drifted ~20% between runs). A failure in ANY pass marks the query
    // -1 (failed). The per-query relative spread (max-min)/min across
    // the three passes is recorded alongside — the within-JVM noise
    // floor a cross-round comparison must clear before a delta means
    // anything.
    def timedPass(): Map[String, Timing] =
      queries.map { case (name, fn) => name -> run(fn) }
    val passes = Seq(timedPass(), timedPass(), timedPass())
    val best = passes.head.keys.map { k =>
      val vs = passes.map(_(k))
      k -> (if (vs.exists(_.total < 0)) Timing(-1.0, 0, 0, 0)
            else vs.minBy(_.total))
    }.toMap
    val results = best.map { case (k, t) => k -> t.total }
    val spreads = passes.head.keys.map { k =>
      val vs = passes.map(_(k).total)
      k -> (if (vs.exists(_ < 0) || vs.min <= 0) -1.0
            else BigDecimal((vs.max - vs.min) / vs.min)
              .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    // per-PHASE relative spreads across the timed passes (the whole-gate
    // spread under-floors op-only comparisons on proof-heavy gates and
    // over-floors them on assert-heavy ones — bench_diff.py consumes
    // these directly in op-compare mode). 0.0 = the phase is identically
    // zero in every pass (un-annotated); -1.0 = not computable (a pass
    // failed, or the phase collapsed to zero in some passes only).
    def phaseSpread(k: String, f: Timing => Double): Double = {
      val vs = passes.map(p => f(p(k)))
      if (passes.exists(_(k).total < 0)) -1.0
      else if (vs.max <= 0.0) 0.0
      else if (vs.min <= 0.0) -1.0
      else BigDecimal((vs.max - vs.min) / vs.min)
        .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // pinned root-cause notes for gates whose bench history needs
    // context (the round-12 drift re-measure): carried verbatim into
    // BENCH_FULL.json so a cross-round reader sees the measurement's
    // provenance next to the number it explains.
    val gateNotes: Map[String, String] = Map(
      "q_adaptive_join" -> ("r13 re-measure: cross-JVM JIT/encoder " +
        "noise on the CMS Aggregator path, not a plan change — " +
        "identical code measured 2.9-5.9s across 5 JVM launches on " +
        "identical data (r11-code 2.94/4.42, r12-code 3.44-3.75, " +
        "within-JVM spread only 0.04-0.3); r11-vs-r12 code " +
        "indistinguishable"),
      "q_file_prune" -> ("r13 re-measure: battery-size pressure, not " +
        "the tmpfs re-rooting — solo 1.36 disk vs 1.46 tmpfs (A/B, " +
        "within spread), 7-gate battery 1.8, 320-gate battery 1.9; " +
        "r11-code solo today = 1.60"),
      "q_auto_prune" -> ("r13 re-measure: solo/7-gate = 1.51 ~= r11 " +
        "1.50; the r12 320-gate 1.91 was battery pressure, no code " +
        "or medium cause"),
      "dd_simhash" -> ("r13 re-measure: 7-gate battery 2.71-2.95 ~= " +
        "r11 2.85; the r12 320-gate 3.72 was battery pressure"),
      "llm_cluster_balance" -> ("r13 re-measure: op 2.47-2.55 ~= r11 " +
        "2.67 (gate now phase-split); the r12 3.58 was battery " +
        "pressure"),
      "sim_knn_refine" -> ("r13 re-measure: op 1.21-1.40 vs r11 1.01, " +
        "inside r11's recorded 0.49 spread; r11-code total today = " +
        "3.92 ~= its recorded 4.10"),
      // r14 re-measure of the r13 write-path drift cluster: the SAME
      // 6-gate subset run back-to-back on r12 code (worktree 11c5505),
      // r13 code (1edda5e) and r14 code, same box/session. r12 CODE
      // was the slowest of the three on EVERY gate — the whole cluster
      // is box/session drift vs the r12 recording, not a code change.
      "evt_stream_jdbc_restart" -> ("r14 re-measure: 6-gate subset, " +
        "r12/r13/r14 code today = 4.85/4.75/4.54 vs r12 recording " +
        "4.13 — box drift, current code fastest of the three; op IS " +
        "the two-epoch + real-Derby-restart protocol (no profiling " +
        "target: all three code versions pay it equally)"),
      "q_partition_evolution" -> ("r14 re-measure: r12/r13/r14 code " +
        "today = 1.96/1.83/1.84 vs r12 recording 1.68 — box drift, " +
        "code flat"),
      "dd_incremental_update" -> ("r14 re-measure: r12/r13/r14 code " +
        "today = 2.95/2.28/2.68 (op spread 0.28-0.33) — r12 code " +
        "slowest; cross-version ordering inside noise, no regression"),
      "e2e_pipeline" -> ("r14 re-measure: r12/r13/r14 code today = " +
        "2.55/2.14/2.14 vs r12 recording 1.72 — box drift; current " +
        "code faster than r12 code on today's box"),
      "q_sidecar_fresh" -> ("r14 re-measure: r12/r13/r14 code today = " +
        "9.55/8.55/9.04 — r12 code slowest, box drift. The r13 " +
        "counts-plane hypothesis is structurally impossible: the gate " +
        "declares Stats+Zone+Bloom only (no counts plane to refresh)"),
      "sim_ivfpq_incr" -> ("r14 re-measure: r12/r13/r14 code today = " +
        "3.00/3.07/3.11, spread 0.33-0.35 — flat across versions; " +
        "gate phase-split since r14 (setup = frozen base-epoch model)"))
    val failures = results.count(_._2 < 0)
    def r3(d: Double): Double =
      BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
    def jmap(m: Map[String, Double]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + r3(v) }
        .mkString("{", ",", "}")
    val total = r3(results.values.filter(_ >= 0).sum)
    // The driver captures only the LAST ~2000 characters of stdout and
    // parses the JSON line out of that tail — a line carrying all
    // per-query timings is 2x too long and parses to null (it did in
    // rounds 1-3). So: ONE compact line (total + a fixed headline subset,
    // 3dp) that fits the tail with room for sbt's trailer, and the full
    // per-query map + variance written to BENCH_FULL.json alongside.
    val headline = Seq(
      "q1_pricing", "q5_starjoin", "q6_selective", "q19_discount",
      "a5_join", "a9_watermark_incr", "c3_dedup_latest", "c6_merge",
      "dd_exact", "dd_minhash", "dd_simhash", "dd_ngram", "dd_embed",
      "dd_cluster", "dd_semantic", "sim_topk", "sim_ivf", "text_langid",
      "text_quality", "text_tokens", "text_fingerprint", "text_gopher",
      "llm_corpus_clean", "llm_pack_sequences", "llm_dsir", "evt_window_agg",
      "evt_sessionize", "q_percentile", "q_approx_distinct", "q_salted_agg",
      "q_bloom_join", "q_cms_heavy", "mm_decode", "q_zvalue",
      "dd_dup_spans").filter(results.contains)
    val qs = jmap(headline.map(k => k -> results(k)).toMap)
    val note = s"${results.size} queries ($failures failed, as -1, " +
      "excluded from total), noop-sink full eval, min of 3 passes; " +
      "timing mode (Q.benchLean): restart/replay PROOF arms run in " +
      "Verify, not here; headline subset here, ALL timings + variance " +
      "in BENCH_FULL.json"
    // phase split per query: op = total for un-annotated gates; only
    // in BENCH_FULL.json (stdout line must stay inside the driver tail)
    val phases = best.toSeq.sortBy(_._1).map { case (k, t) =>
      "\"" + k + "\":{\"setup\":" + r3(t.setup) + ",\"op\":" + r3(t.op) +
        ",\"assert\":" + r3(t.assert) + "}"
    }.mkString("{", ",", "}")
    val phaseVariance = best.keys.toSeq.sorted.map { k =>
      "\"" + k + "\":{\"setup\":" + phaseSpread(k, _.setup) +
        ",\"op\":" + phaseSpread(k, _.op) +
        ",\"assert\":" + phaseSpread(k, _.assert) + "}"
    }.mkString("{", ",", "}")
    def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val notes = gateNotes.filter { case (k, _) => results.contains(k) }
      .toSeq.sortBy(_._1)
      .map { case (k, n) => "\"" + k + "\":" + jstr(n) }
      .mkString("{", ",", "}")
    val full = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""queries":${jmap(results)},"variance":${jmap(spreads)},""" +
      s""""phases":$phases,"phase_variance":$phaseVariance,""" +
      s""""notes":$notes,""" +
      s""""failures":$failures,"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
      full.getBytes("UTF-8"))
    println(s"""{"metric":"total","value":$total,"unit":"sec","n":${results.size},"failures":$failures,"sf":"$sfDir","queries":$qs,"note":"$note"}""")
    spark.stop()
  }
}
