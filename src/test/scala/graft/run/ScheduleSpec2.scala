package graft.run

import java.time.LocalDateTime
import org.scalatest.funsuite.AnyFunSuite

/** programmer.csv schedule parsing + firing rules. */
class ScheduleSpec2 extends AnyFunSuite {

  private val csv =
    """ENDPOINT_NAME;INSTANCE;PROCESS_ID;CRON_MINUTES;CRON_HOURS;CRON_DAY_OF_MONTH;CRON_MONTH;CRON_DAY_OF_WEEK;CRON_YEAR;ENV
      |EP1;I1;G1;0;5;*;*;?;*;prod
      |EP1;I1;G2;30;6,18;*;*;?;*;prod
      |EP2;I1;G1;15;2-4;1;*;?;2026;prod""".stripMargin

  test("parses rows and fires at matching times only") {
    val specs = graft.config.CsvConfigLoader.parse(csv).map(Schedule.fromRow)
    assert(specs.size == 3)
    val fiveAm = LocalDateTime.of(2026, 8, 12, 5, 0)
    assert(Schedule.due(specs, fiveAm).map(_.processId) == Seq("G1"))
    val sixThirtyPm = LocalDateTime.of(2026, 8, 12, 18, 30)
    assert(Schedule.due(specs, sixThirtyPm).map(_.processId) == Seq("G2"))
    val feb1 = LocalDateTime.of(2026, 2, 1, 3, 15)
    assert(Schedule.due(specs, feb1).map(_.endpoint) == Seq("EP2"))
    // year mismatch
    assert(Schedule.due(specs, LocalDateTime.of(2027, 2, 1, 3, 15)).isEmpty)
    // nothing at an off minute
    assert(Schedule.due(specs, LocalDateTime.of(2026, 8, 12, 5, 1)).isEmpty)
  }

  test("ranges and wildcards") {
    val s = ScheduleSpec("e", "i", "g", "0,30", "2-4", "*", "*", "?", "*")
    assert(s.matches(LocalDateTime.of(2026, 1, 1, 3, 30)))
    assert(!s.matches(LocalDateTime.of(2026, 1, 1, 5, 30)))
    assert(!s.matches(LocalDateTime.of(2026, 1, 1, 3, 15)))
  }
}
