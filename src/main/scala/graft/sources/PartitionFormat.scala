package graft.sources

import java.time.{LocalDateTime, ZoneId}
import java.time.temporal.WeekFields

/** Raw-zone path templating (SURVEY §1.1.5): `PARTITION_FORMAT` tokens
  * `{YYYY}{MM}{DD}{HH}{MI}{SS}{WEEK}{QUARTER}` rendered from the logical
  * clock (reference partition_formatter.py:7-97, light_transform.py:1815-1916).
  * Default layout is the reference's date-partitioned raw path
  * `year={YYYY}/month={MM}/day={DD}`. */
object PartitionFormat {
  val DefaultFormat = "year={YYYY}/month={MM}/day={DD}"

  def render(template: String, ts: LocalDateTime): String = {
    val week = ts.get(WeekFields.ISO.weekOfWeekBasedYear())
    val quarter = (ts.getMonthValue + 2) / 3
    template
      .replace("{YYYY}", f"${ts.getYear}%04d")
      .replace("{MM}", f"${ts.getMonthValue}%02d")
      .replace("{DD}", f"${ts.getDayOfMonth}%02d")
      .replace("{HH}", f"${ts.getHour}%02d")
      .replace("{MI}", f"${ts.getMinute}%02d")
      .replace("{SS}", f"${ts.getSecond}%02d")
      .replace("{WEEK}", f"$week%02d")
      .replace("{QUARTER}", quarter.toString)
  }

  /** Full raw path for one table load:
    * `base/team/datasource/endpoint/table/<partitions>`
    * (reference extract_data.py:236-238). */
  def rawPath(base: String, team: String, dataSource: String,
      endpoint: String, table: String, clock: java.time.Clock, zone: ZoneId,
      template: String = DefaultFormat): String = {
    val ts = LocalDateTime.now(clock.withZone(zone))
    s"$base/$team/$dataSource/$endpoint/$table/${render(template, ts)}"
  }
}
