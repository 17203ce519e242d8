package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus datasheet builder (SURVEY §2D, D218) — the "datasheets for
  * datasets" release artifact (Gebru et al. 2021, public practice:
  * every released corpus ships per-source composition statistics).
  * One aggregation pass over the corpus produces, per source:
  *
  *  - `n_docs`, `n_chars`, `n_tokens` (whitespace grammar — the same
  *    counter the curation plane budgets with, D101/D102);
  *  - `n_langs` (distinct language labels);
  *  - `median_chars` (exact interpolated median — both engines'
  *    continuous-quantile semantics agree at 0.5);
  *  - `short_frac4` (share of docs under 100 chars, rounded 4 — the
  *    fragment-rate signal quality filters gate on).
  *
  * Scale shape: ONE map-side-combinable groupBy over the corpus; the
  * per-source result is catalog-sized (sources are dozens, not rows),
  * so the JSON sidecar render is a documented metadata-size-class
  * collect. The sidecar (`<path>` itself, one deterministic JSON file)
  * lands next to the corpus like every governance plane.
  *
  * The one non-sketch aggregate is the exact median: Spark's
  * `percentile` buffers a GROUP's values, so a source holding most of
  * a 100 TB corpus buffers that source in one task. Exactness is what
  * makes the datasheet hash-verifiable here; a petabyte deployment
  * swaps in the t-digest (D45, `functions/TDigest`) or the bounded
  * KMH sample (D44) for `median_chars` and keeps every other column —
  * they are all O(1)-state partial aggregates. */
object Datasheet {

  /** Per-source statistics frame (source-sorted, deterministic). */
  def build(df: DataFrame, sourceCol: String, textCol: String,
      langCol: String): DataFrame =
    df.select(col(sourceCol).as("source"),
        col(langCol).as("lang"),
        length(col(textCol)).cast(LongType).as("chars"),
        TextAnalysis.tokenCount(col(textCol)).cast(LongType).as("toks"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("chars")).as("n_chars"),
        sum(col("toks")).as("n_tokens"),
        count_distinct(col("lang")).as("n_langs"),
        expr("percentile(chars, 0.5)").cast(DoubleType)
          .as("median_chars"),
        round(sum(when(col("chars") < 100, 1L).otherwise(0L))
          .cast(DoubleType) / count(lit(1)).cast(DoubleType), 4)
          .as("short_frac4"))
      .orderBy("source")

  /** RFC 8259 string escaping — source names are user data (quotes,
    * backslashes, control characters) and an unescaped interpolation
    * would emit an invalid sidecar, breaking the [[read]] round-trip
    * this artifact exists for. */
  private def jsonEscape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"'  => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\b' => b.append("\\b")
      case '\f' => b.append("\\f")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < 0x20 => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  /** Render `stats` (a [[build]] result) as ONE deterministic JSON
    * document at `sidecarPath` and return the frame. The render
    * collects the per-source rows — catalog-sized by construction
    * (one row per source), never corpus-sized. */
  def write(stats: DataFrame, sidecarPath: String): DataFrame = {
    val rows = stats.collect().map { r =>
      s"""{"source":"${jsonEscape(r.getString(0))}","n_docs":${r.getLong(1)},""" +
        s""""n_chars":${r.getLong(2)},"n_tokens":${r.getLong(3)},""" +
        s""""n_langs":${r.getLong(4)},"median_chars":${r.getDouble(5)},""" +
        s""""short_frac4":${r.getDouble(6)}}"""
    }
    val doc = rows.mkString("{\"sources\":[", ",", "]}")
    java.nio.file.Files.write(java.nio.file.Paths.get(sidecarPath),
      doc.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    stats
  }

  /** Parse a [[write]] sidecar back into the stats frame shape — the
    * restart/audit surface (a datasheet is only useful if a later
    * session can read it without the corpus). */
  def read(spark: SparkSession, sidecarPath: String): DataFrame = {
    import spark.implicits._
    val ds = spark.createDataset(Seq(new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(sidecarPath)),
      java.nio.charset.StandardCharsets.UTF_8)))
    spark.read.json(ds)
      .select(explode(col("sources")).as("s"))
      .select(col("s.source").as("source"), col("s.n_docs").as("n_docs"),
        col("s.n_chars").as("n_chars"), col("s.n_tokens").as("n_tokens"),
        col("s.n_langs").as("n_langs"),
        col("s.median_chars").as("median_chars"),
        col("s.short_frac4").as("short_frac4"))
      .orderBy("source")
  }
}
