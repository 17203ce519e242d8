package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for the headline queries — the review
  * loop for scan pushdown (PushedFilters/ReadSchema), broadcast joins, and
  * whole-stage codegen coverage. Run: `sbt "runMain graft.PlanAudit"`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val targets = if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing", "q3_topk", "q5_starjoin", "a1_projection",
        "a4_filter_semijoin", "c3_dedup_latest", "dd_exact", "sim_topk",
        "dd_incremental", "llm_decontaminate", "text_tfidf",
        "llm_pack_sequences", "q_zvalue", "q_bloom_join", "q19_discount",
        "q22_no_urgent", "evt_gapfill", "q_fuzzy", "q_percentile",
        "q_tdigest", "evt_funnel_steps")
    val qs = SparkEntry.queries
    targets.foreach { name =>
      println(s"\n########## $name ##########")
      qs(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
