package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten composition (SURVEY §2D, D186): the erasure
  * request a privacy program actually executes, assembled from parts
  * this sink already proves —
  *
  *  1. every row of the requested subjects is tombstoned via DELETION
  *     VECTORS (D162): a sidecar append, data files byte-identical, so
  *     at 100 TB an erasure costs KBs, not a table rewrite (the physical
  *     fold happens at the next compaction like any DV);
  *  2. an append-only ERASURE LEDGER records what was honored — but a
  *     ledger carrying the raw ids would itself retain the very identity
  *     it certifies deleting, so entries carry the KEYED PSEUDONYM
  *     (D153) of each subject: verifiable by the key holder ("was id X
  *     erased?" → hash and look up), meaningless to everyone else.
  *
  * DV-aware readers exclude the subjects immediately; plain readers see
  * them until the fold — the documented DV visibility contract. */
object Erasure {

  final case class Erased(subjects: Long, rows: Long)

  /** Erase `subjects` (a one-column frame of ids matching `keyCol`'s
    * type) from the keyed table at `path`; ledger entries go to
    * `ledgerPath` under pseudonyms keyed by `ledgerKey`. Idempotent in
    * EFFECT: re-erasing an already-erased subject re-appends the same
    * row positions (DV delete scans the raw data; DV reads dedup
    * positions) and a fresh ledger line — visible state unchanged. */
  def eraseSubjects(spark: SparkSession, path: String, keyCol: String,
      subjects: DataFrame, ledgerPath: String, ledgerKey: String,
      erasedAtMs: Long = System.currentTimeMillis): Erased = {
    require(subjects.columns.length == 1,
      s"subjects must be a one-column id frame, got " +
        subjects.columns.mkString(","))
    val idCol = subjects.columns.head
    val ids = subjects.select(col(idCol).as("__erase_id"))
      .na.drop().distinct().cache()
    try {
      val nSubjects = ids.count()
      require(nSubjects > 0, "no subjects to erase")
      // the DV predicate: key ∈ subjects — broadcast the (small) request
      val idList = ids // stays distributed; DV delete joins via isin-less
      val rows = DeletionVectors.delete(spark, path,
        col(keyCol).isin( // erasure requests are human-scale (a batch of
          // subject ids), so the driver-side collect here is bounded by
          // the REQUEST size, never by the table
          idList.collect().map(_.get(0)).toIndexedSeq: _*))
      val ledger = Privacy.pseudonymizeFrame(
        ids.select(col("__erase_id").as("subject")), Seq("subject"),
        ledgerKey)
        .withColumn("erased_at_ms", lit(erasedAtMs))
        .withColumn("rows_erased", lit(rows))
      ledger.write.mode(SaveMode.Append).parquet(ledgerPath)
      Erased(nSubjects, rows)
    } finally ids.unpersist()
  }

  /** Has `id` been honored? The key holder's audit: pseudonymize the id
    * with the same key and look it up in the ledger. */
  def isErased(spark: SparkSession, ledgerPath: String, id: String,
      ledgerKey: String): Boolean = {
    import spark.implicits._
    if (!java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(ledgerPath))) return false
    val token = Privacy.pseudonymizeFrame(
      Seq(id).toDF("subject"), Seq("subject"), ledgerKey)
      .select("subject").as[String].head()
    spark.read.parquet(ledgerPath)
      .filter(col("subject") === token).limit(1).count() > 0
  }

  // Privacy.pseudonymize lives in graft.llm; a tiny local alias keeps
  // the sink layer's dependencies one-directional at the call site
  private object Privacy {
    def pseudonymizeFrame(df: DataFrame, cols: Seq[String],
        key: String): DataFrame =
      graft.llm.Privacy.pseudonymize(df, cols, key)
  }
}
