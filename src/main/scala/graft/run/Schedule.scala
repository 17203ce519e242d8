package graft.run

import graft.config.CsvConfigLoader

/** Process-group scheduling model (SURVEY §1.1.4): `programmer.csv` rows
  * (`ENDPOINT_NAME;INSTANCE;PROCESS_ID;CRON_MINUTES;CRON_HOURS;
  * CRON_DAY_OF_MONTH;CRON_MONTH;CRON_DAY_OF_WEEK;CRON_YEAR;ENV`) become
  * cron-like schedule specs; the reference turns these into EventBridge
  * rules (instance_stack.py:610-689) — here they parameterize a driver-side
  * scheduler loop.
  */
final case class ScheduleSpec(
    endpoint: String, instance: String, processId: String,
    minutes: String, hours: String, dayOfMonth: String, month: String,
    dayOfWeek: String, year: String) {

  private def fieldMatches(spec: String, value: Int): Boolean = {
    val s = spec.trim
    s.isEmpty || s == "*" || s == "?" ||
      s.split(",").exists { part =>
        part.split("-") match {
          case Array(single) => single.trim.toIntOption.contains(value)
          case Array(lo, hi) =>
            (for (l <- lo.trim.toIntOption; h <- hi.trim.toIntOption)
              yield value >= l && value <= h).getOrElse(false)
          case _ => false
        }
      }
  }

  /** Does this spec fire at the given local time? */
  def matches(t: java.time.LocalDateTime): Boolean =
    fieldMatches(minutes, t.getMinute) &&
      fieldMatches(hours, t.getHour) &&
      fieldMatches(dayOfMonth, t.getDayOfMonth) &&
      fieldMatches(month, t.getMonthValue) &&
      fieldMatches(dayOfWeek, t.getDayOfWeek.getValue % 7 + 1) && // 1=Sunday
      fieldMatches(year, t.getYear)
}

object Schedule {
  def load(path: String): Seq[ScheduleSpec] =
    CsvConfigLoader.parseFile(path).map(fromRow)

  def fromRow(row: Map[String, String]): ScheduleSpec = ScheduleSpec(
    endpoint = row.getOrElse("ENDPOINT_NAME", "").trim,
    instance = row.getOrElse("INSTANCE", "").trim,
    processId = row.getOrElse("PROCESS_ID", "").trim,
    minutes = row.getOrElse("CRON_MINUTES", "*"),
    hours = row.getOrElse("CRON_HOURS", "*"),
    dayOfMonth = row.getOrElse("CRON_DAY_OF_MONTH", "*"),
    month = row.getOrElse("CRON_MONTH", "*"),
    dayOfWeek = row.getOrElse("CRON_DAY_OF_WEEK", "*"),
    year = row.getOrElse("CRON_YEAR", "*"))

  /** The process groups due at time t, grouped by (endpoint, processId). */
  def due(specs: Seq[ScheduleSpec], t: java.time.LocalDateTime)
      : Seq[ScheduleSpec] = specs.filter(_.matches(t))
}
