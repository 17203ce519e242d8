package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Malformed-record quarantine ingest for semi-structured feeds — the
  * ingest-side complement of the retry→CSV fallback (A14,
  * `/root/reference/artifacts/aws-glue/code/raw/raw_extract.py` error
  * handling): instead of failing the batch or silently dropping rows, a
  * parse pass SPLITS the feed into typed good rows and a quarantine
  * table carrying the raw record — the standard lake pattern (Spark's
  * PERMISSIVE mode + corrupt-record column, Delta's badRecordsPath).
  *
  * Scale discipline: one pass over the feed (Spark's JSON reader tags
  * corrupt rows inline; good/bad are two filters over the SAME cached
  * scan — no second parse), schema is caller-supplied so inference never
  * scans the corpus, and the quarantine row carries the raw line plus a
  * deterministic reason, never a driver-side exception.
  */
object JsonQuarantine {

  /** Parse a JSON-lines path against `schema`; rows that fail to parse
    * land in the quarantine frame with the raw record preserved.
    *
    * @return (good, quarantine): `good` has exactly `schema`'s columns;
    *         `quarantine` has (raw STRING, reason STRING).
    */
  def read(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    val corruptCol = "_quarantine_raw"
    val withCorrupt = schema.add(corruptCol, StringType, nullable = true)
    // Spark disallows filtering on the corrupt-record column of a raw
    // JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the documented
    // workaround is to materialize the parse first. cache() here (one
    // parse, both filters share it); a production pipeline lands the
    // parsed batch in a stage table at this point, which serves the same
    // purpose with the same single-pass cost.
    val parsed = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
      .cache()
    val good = parsed.filter(col(corruptCol).isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val bad = parsed.filter(col(corruptCol).isNotNull)
      .select(col(corruptCol).as("raw"),
        lit("malformed JSON").as("reason"))
    (good, bad)
  }
}
