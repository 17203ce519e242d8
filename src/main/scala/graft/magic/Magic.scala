package graft.magic

import java.time.LocalDate
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BigMagic "magic" encodings (reference semantics, re-expressed as Catalyst
  * Column expressions — all codegen-friendly built-ins, zero UDFs).
  *
  * Semantics derived from the reference:
  *  - magic date: integer day-count such that
  *    `date = 1900-01-01 + (n - 693596) days`
  *    (reference: artifacts/aws-glue/code/stage/light_transform.py:33-34,
  *     904-935; inverse at utils/extract_data_v2/utils/date_utils.py:103-107)
  *  - detection heuristic: numeric and > 100000 ⇒ magic
  *    (light_transform.py:922-935) — bug-compatible by design, see SURVEY §7.4.
  *  - magic time: HHMMSS int/string, lpad to 6 (light_transform.py:1041-1049)
  *  - magic period: YYYYMM string (light_transform.py:1170-1178)
  *  - magic byte: FoxPro T/F encodings (light_transform.py:1204-1213)
  */
object Magic {
  val BaseDate: LocalDate = LocalDate.of(1900, 1, 1)
  val Offset: Int = 693596
  /** "numeric and > threshold ⇒ magic day number" detection boundary. */
  val DetectThreshold: Int = 100000

  // ---- scalar (driver-side) conversions, for filter-bound math ----

  /** ISO date → magic day number (reference date_utils.py:103-107). */
  def toMagicDay(d: LocalDate): Long =
    java.time.temporal.ChronoUnit.DAYS.between(BaseDate, d) + Offset

  /** magic day number → ISO date. */
  def fromMagicDay(n: Long): LocalDate = BaseDate.plusDays(n - Offset)

  // ---- Column-level codecs ----

  /** Decode a magic day-number column (numeric or numeric-string) to DateType.
    * Does NOT apply the >100000 heuristic — caller decides (see DslFunctions). */
  def magicDayToDate(c: Column): Column =
    date_add(to_date(lit("1900-01-01")), (c.cast(IntegerType) - lit(Offset)))

  /** Encode a DateType column to its magic day number. */
  def dateToMagicDay(c: Column): Column =
    (datediff(c, to_date(lit("1900-01-01"))) + lit(Offset)).cast(LongType)

  /** True when the raw value looks like a magic day number: all-digits and
    * > 100000 (bug-compatible with light_transform.py:922-935). */
  def isMagicNumber(c: Column): Column = {
    val t = trim(c.cast(StringType))
    t.rlike("^[0-9]+$") && t.cast(LongType) > lit(DetectThreshold)
  }

  /** Normalize a magic HHMMSS time column to "HH:mm:ss" string.
    * lpad to 6 then split (light_transform.py:1041-1049). Non-numeric → null. */
  def magicTimeToString(c: Column): Column = {
    val digits = trim(c.cast(StringType))
    val padded = lpad(regexp_replace(digits, "\\.0$", ""), 6, "0")
    when(digits.rlike("^[0-9]+(\\.0)?$"),
      concat_ws(":", substring(padded, 1, 2), substring(padded, 3, 2),
        substring(padded, 5, 2))
    ).otherwise(lit(null).cast(StringType))
  }

  /** Magic HHMMSS time as seconds-since-midnight (lpad-to-6 then split, the
    * arithmetic twin of magicTimeToString — values with hh ≥ 24 intentionally
    * exceed 86400, matching the lenient parser's field rollover).
    * Non-numeric → null. */
  def magicTimeToSeconds(c: Column): Column = {
    val digits = trim(c.cast(StringType))
    val padded = lpad(regexp_replace(digits, "\\.0$", ""), 6, "0")
    when(digits.rlike("^[0-9]+(\\.0)?$"),
      substring(padded, 1, 2).cast(LongType) * 3600 +
        substring(padded, 3, 2).cast(LongType) * 60 +
        substring(padded, 5, 2).cast(LongType)
    ).otherwise(lit(null).cast(LongType))
  }

  /** Build a YYYYMM period string from (month, year) columns; nulls → 190001
    * (light_transform.py:1151-1178). */
  def period(month: Column, year: Column): Column = {
    val y = trim(year.cast(StringType))
    val m = lpad(regexp_replace(trim(month.cast(StringType)), "\\.0$", ""), 2, "0")
    when(year.isNull || month.isNull || y === "" || m === "", lit("190001"))
      .otherwise(concat(y, m))
  }
}
