package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Frequency-vocabulary building and token-id encoding — the tokenize→ids
  * step between corpus cleaning and sequence packing in an LLM data
  * pipeline (clean → dedup → tokenize → ENCODE → pack).
  *
  * Scale shape: the token-frequency aggregation is map-side combinable and
  * the top-K never sorts the full distribution (`orderBy.limit` plans as
  * TakeOrderedAndProject — each task keeps a K-row heap, the driver merges
  * heaps). The id-assignment window runs on K rows only, and the encode
  * join broadcasts the K-row vocab — document text shuffles zero times.
  *
  * Tokenization is the engine-wide portable split
  * (`split(lower(trim(text)), "\s+")` ≡ DuckDB `string_split_regex`), same
  * as TextAnalysis (llm/TextAnalysis.scala).
  */
object Vocab {

  private def tokens(text: org.apache.spark.sql.Column) =
    split(lower(trim(text)), "\\s+")

  /** Top-`size` tokens by (frequency desc, token asc) with dense ids
    * 0..size-1 in that order. Returns (token, freq, token_id). */
  def build(docs: DataFrame, textCol: String, size: Int): DataFrame = {
    val tf = docs
      .select(explode(tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("freq"))
    // K rows from here on: the single-partition window is bounded by the
    // vocabulary size, not the corpus
    tf.orderBy(col("freq").desc, col("token")).limit(size)
      .withColumn("token_id", (row_number().over(
        Window.orderBy(col("freq").desc, col("token"))) - 1).cast("int"))
  }

  /** Encode every document to its token-id stream: one row per (doc, pos),
    * out-of-vocabulary tokens → -1. The vocab side is broadcast. */
  def encode(docs: DataFrame, vocab: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    docs.select(col(idCol),
        posexplode(tokens(col(textCol))).as(Seq("pos", "token")))
      .filter(col("token") =!= "")
      .join(broadcast(vocab.select("token", "token_id")), Seq("token"),
        "left")
      .select(col(idCol), col("pos"),
        coalesce(col("token_id"), lit(-1)).as("token_id"), col("token"))
  }
}
