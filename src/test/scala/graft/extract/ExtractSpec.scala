package graft.extract

import java.time.{Clock, Instant, LocalDate, ZoneId, ZoneOffset}
import org.scalatest.funsuite.AnyFunSuite
import graft.config.{LoadMode, LoadType, TableConfig}
import graft.magic.Magic
import graft.state.InMemoryWatermarkStore

/** Extraction-plane semantics (SURVEY §5.3): slice cover properties, month
  * windows, magic-day inversion, strategy plans, watermark state machine.
  * Property tests use a fixed-seed sample (scalatestplus bridge is not on
  * the offline classpath). */
class ExtractSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)

  // ---- RangeSlicer: exact cover / no overlap / sliceOf consistency ----
  test("slices form an exact non-overlapping cover of [min, max]") {
    for (_ <- 1 to 200) {
      val min = rnd.between(-1000L, 1000L)
      val span = rnd.between(0L, 100000L)
      val parts = rnd.between(1, 64)
      val max = min + span
      val slices = RangeSlicer.slices(min, max, parts)
      assert(slices.head.lo == min)
      assert(slices.last.hi == max + 1)
      slices.sliding(2).foreach {
        case Seq(a, b) => assert(a.hi == b.lo)
        case _ =>
      }
      assert(slices.forall(s => s.hi > s.lo)) // no empty slice
      assert(slices.size == math.min(parts.toLong, span + 1))
    }
  }
  test("sliceOf agrees with slice boundaries") {
    for (_ <- 1 to 100) {
      val min = rnd.between(0L, 500L)
      val span = rnd.between(0L, 2000L)
      val parts = rnd.between(1, 40)
      val max = min + span
      val slices = RangeSlicer.slices(min, max, parts)
      for (v <- min to max by math.max(1, span / 50)) {
        val i = RangeSlicer.sliceOf(v, min, max, parts)
        assert(slices(i).lo <= v && v < slices(i).hi,
          s"v=$v assigned to $i=${slices(i)}")
      }
    }
  }

  // ---- magic day inversion ----
  test("magic day roundtrip over a wide date range") {
    for (_ <- 1 to 500) {
      val d = LocalDate.of(1900, 1, 1).plusDays(rnd.between(0L, 80000L))
      assert(Magic.fromMagicDay(Magic.toMagicDay(d)) == d)
    }
  }
  test("known magic constants") {
    assert(Magic.toMagicDay(LocalDate.of(1900, 1, 1)) == 693596L)
    assert(Magic.toMagicDay(LocalDate.of(2024, 6, 25)) == 739062L)
  }

  // ---- month windows (reference date_utils.py:55-110) ----
  private val clock = Clock.fixed(Instant.parse("1997-09-15T12:00:00Z"),
    ZoneOffset.UTC)
  private val utc = ZoneId.of("UTC")

  test("month window clamps to month start/end") {
    val w = Windows.monthWindow(clock, utc, -2, 0)
    assert(w.start == LocalDate.of(1997, 7, 1))
    assert(w.end == LocalDate.of(1997, 9, 30))
  }
  test("window renders per FILTER_DATA_TYPE") {
    val w = Windows.monthWindow(clock, utc, -2, 0)
    assert(w.render("aje_period") == ("199707", "199709"))
    assert(w.render("aje_date") ==
      (Magic.toMagicDay(LocalDate.of(1997, 7, 1)).toString,
       Magic.toMagicDay(LocalDate.of(1997, 9, 30)).toString))
    assert(w.render("") == ("1997-07-01", "1997-09-30"))
  }
  test("timezone shifts the window month at boundaries") {
    // 1997-10-01 00:30 UTC is still 1997-09-30 in Lima (UTC-5)
    val boundary = Clock.fixed(Instant.parse("1997-10-01T00:30:00Z"),
      ZoneOffset.UTC)
    val lima = ZoneId.of("America/Lima")
    assert(Windows.monthWindow(boundary, utc, 0, 0).start ==
      LocalDate.of(1997, 10, 1))
    assert(Windows.monthWindow(boundary, lima, 0, 0).start ==
      LocalDate.of(1997, 9, 1))
  }

  // ---- projection parsing (A1/A2, id dedup from extraction_strategy.py) ----
  test("projection list: id prepended, expressions kept whole, id deduped") {
    val cfg = TableConfig(
      "compania, func(a, b) alias, codocas", LoadType.Full, "", "", 0, 0,
      "", "", "", "compania", "", "p", "dbo", "t", "m", "s", "a", "1")
    assert(Parsing.projectionList(cfg) ==
      Seq("compania as id", "func(a, b) alias", "codocas"))
  }

  // ---- strategies / load-mode state machine (A10) ----
  private def cfg(lt: LoadType, pcol: String = "ts") = TableConfig(
    "*", lt, "auto", pcol, -2, 0, "ts between '{0}' and '{1}'", "", "", "",
    "", "p", "dbo", "src", "t", "s", "a", "1")

  test("INITIAL plans full scan and requests watermark save") {
    val p = Strategies.plan(cfg(LoadType.Incremental), LoadMode.Initial,
      clock, utc)
    assert(p.filters.isEmpty && p.saveWatermarkFrom == Some("ts"))
  }
  test("NORMAL with watermark filters > last; without falls back to window") {
    val store = new InMemoryWatermarkStore
    val none = Strategies.plan(cfg(LoadType.Incremental), LoadMode.Normal,
      clock, utc, Some(store), "p")
    assert(none.filters == Seq("ts between '1997-07-01' and '1997-09-30'"))
    store.confirm(store.savePending("p", "src", "ts", "42"))
    val some = Strategies.plan(cfg(LoadType.Incremental), LoadMode.Normal,
      clock, utc, Some(store), "p")
    assert(some.filters == Seq("ts > 42"))
  }
  test("RESET deletes the watermark then plans full + save") {
    val store = new InMemoryWatermarkStore
    store.confirm(store.savePending("p", "src", "ts", "42"))
    val p = Strategies.plan(cfg(LoadType.Incremental), LoadMode.Reset,
      clock, utc, Some(store), "p")
    assert(store.lastConfirmed("p", "src", "ts").isEmpty)
    assert(p.filters.isEmpty && p.saveWatermarkFrom == Some("ts"))
  }
  test("non-numeric watermark literals are quoted (DATE stays a date, " +
    "not integer subtraction)") {
    val store = new InMemoryWatermarkStore
    def planFor(v: String) = {
      store.confirm(store.savePending("p", "src", "ts", v))
      Strategies.plan(cfg(LoadType.Incremental), LoadMode.Normal,
        clock, utc, Some(store), "p")
    }
    assert(planFor("2024-01-05").filters == Seq("ts > '2024-01-05'"))
    assert(planFor("2024-01-05 06:07:08").filters ==
      Seq("ts > '2024-01-05 06:07:08'"))
    assert(planFor("123.45").filters == Seq("ts > 123.45"))
    assert(planFor("-17").filters == Seq("ts > -17"))
  }
}
