package graft.extract

import java.time.{Clock, LocalDate, ZoneId, ZonedDateTime}
import graft.magic.Magic

/** Incremental month-window computation (SURVEY A8).
  *
  * Reference (extract_data.py:397-428; query_generator.py:342-367;
  * utils/extract_data_v2/utils/date_utils.py:55-110): the window is
  * [now − |DELAY_INI| months, now − |DELAY_END| months], clamped to
  * month-start / month-end, rendered per FILTER_DATA_TYPE:
  *   - `aje_period`                      → "YYYYMM" strings
  *   - `aje_date` / `aje_processperiod`  → magic day-number ints
  *
  * The reference computes "now" in America/Lima (extract_data.py:69-73);
  * we inject Clock + ZoneId explicitly so the engine's logical clock is a
  * parameter, never the session timezone (SURVEY §7.4.2).
  */
object Windows {
  final case class MonthWindow(start: LocalDate, end: LocalDate) {
    /** Render the two bounds per FILTER_DATA_TYPE as literal strings for the
      * {0}/{1} template substitution. */
    def render(filterDataType: String): (String, String) =
      filterDataType.trim.toLowerCase match {
        case "aje_period" =>
          (f"${start.getYear}%04d${start.getMonthValue}%02d",
           f"${end.getYear}%04d${end.getMonthValue}%02d")
        case "aje_date" | "aje_processperiod" =>
          (Magic.toMagicDay(start).toString, Magic.toMagicDay(end).toString)
        case _ => (start.toString, end.toString)
      }
  }

  /** [month-start(now + delayIni months), month-end(now + delayEnd months)].
    * Delays are negative-or-zero month offsets (e.g. ini=-2, end=0). */
  def monthWindow(clock: Clock, zone: ZoneId, delayIniMonths: Int,
      delayEndMonths: Int): MonthWindow = {
    val today = ZonedDateTime.now(clock.withZone(zone)).toLocalDate
    val start = today.plusMonths(delayIniMonths.min(0)).withDayOfMonth(1)
    val endBase = today.plusMonths(delayEndMonths.min(0))
    val end = endBase.withDayOfMonth(endBase.lengthOfMonth)
    MonthWindow(start, end)
  }

  /** Substitute rendered bounds into a FILTER_COLUMN template with {0}/{1}
    * placeholders, e.g. "fecha between {0} and {1}"
    * (reference query_generator.py:267-289). */
  def substitute(template: String, lo: String, hi: String): String =
    template.replace("{0}", lo).replace("{1}", hi)
}
