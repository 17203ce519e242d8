package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import org.apache.spark.sql.types._
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** JsonQuarantine.read — split exactness, raw preservation, partial rows
  * vs broken rows. */
class JsonQuarantineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("a", LongType), StructField("b", StringType)))

  private def roundTrip(lines: Seq[String]) = {
    val tmp = Files.createTempDirectory("jsonq_spec")
    try {
      Files.write(tmp.resolve("feed.json"), lines.asJava)
      val (good, bad) = JsonQuarantine.read(spark,
        tmp.resolve("feed.json").toString, schema)
      (good.collect().map(r => (r.getLong(0),
          Option(r.getString(1)))).sortBy(_._1).toSeq,
        bad.collect().map(r => (r.getString(0), r.getString(1))).toSeq)
    } finally graft.sink.StageWriter.deleteRecursively(tmp)
  }

  test("well-formed rows parse; truncated JSON lands in quarantine with " +
    "the raw line intact") {
    val broken = """{"a": 2, "b": "y""""
    val (good, bad) = roundTrip(Seq("""{"a": 1, "b": "x"}""", broken))
    assert(good == Seq((1L, Some("x"))))
    assert(bad == Seq((broken, "malformed JSON")))
  }

  test("a MISSING field is a good row (null), not quarantine — schema " +
    "drift is not corruption") {
    val (good, bad) = roundTrip(Seq("""{"a": 3}"""))
    assert(good == Seq((3L, None)) && bad.isEmpty)
  }

  test("a type-mismatched field quarantines the row") {
    val (good, bad) = roundTrip(Seq("""{"a": "oops", "b": "z"}"""))
    assert(good.isEmpty)
    assert(bad.map(_._1) == Seq("""{"a": "oops", "b": "z"}"""))
  }

  test("good columns are exactly the declared schema (no corrupt col leak)") {
    val tmp = Files.createTempDirectory("jsonq_spec2")
    try {
      Files.write(tmp.resolve("f.json"), Seq("""{"a":1,"b":"x"}""").asJava)
      val (good, _) = JsonQuarantine.read(spark,
        tmp.resolve("f.json").toString, schema)
      assert(good.columns.toSeq == Seq("a", "b"))
    } finally graft.sink.StageWriter.deleteRecursively(tmp)
  }
}
