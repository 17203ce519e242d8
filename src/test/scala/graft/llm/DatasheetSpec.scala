package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** D217/D218 — readability metrics + the corpus datasheet sidecar. */
class DatasheetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("readability counts words, sentences (floor 1), vowel-group " +
    "syllables (floored at words) and the Flesch formula") {
    val df = Seq(
      (1L, "The cat sat. The dog ran!"),
      (2L, "rhythm myth"), // zero vowel groups -> floor at 2 words
      (3L, ""),
      (4L, "no punctuation here")).toDF("doc_id", "text")
    val r = TextAnalysis.readability(df, "text")
      .select("doc_id", "n_words", "n_sentences", "n_syllables",
        "flesch4")
      .as[(Long, Long, Long, Long, Option[Double])]
      .collect().map(t => t._1 -> t).toMap
    assert(r(1L)._2 == 6 && r(1L)._3 == 2)
    // "the cat sat the dog ran": e,a,a,e,o,a = 6 vowel groups
    assert(r(1L)._4 == 6)
    val fl = 206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (6.0 / 6.0)
    assert(math.abs(r(1L)._5.get -
      BigDecimal(fl).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(r(2L)._2 == 2 && r(2L)._3 == 1 && r(2L)._4 == 2,
      "y counts as a vowel: rhythm/myth carry one group each -> " +
        "floor not needed; got " + r(2L))
    assert(r(3L)._2 == 0 && r(3L)._5.isEmpty,
      "an empty doc has no flesch score")
    assert(r(4L)._3 == 1, "no terminator -> one sentence (floor)")
  }

  test("datasheet: per-source stats; the JSON sidecar round-trips " +
    "exactly through read()") {
    val tmp = Files.createTempDirectory("datasheet")
    try {
      val docs = Seq(
        (1L, "web", "en", "a short doc"),
        (2L, "web", "de", "x" * 150),
        (3L, "web", "en", "another small one"),
        (4L, "books", "en", "y" * 200)).toDF("doc_id", "source", "lang",
        "text")
      val stats = Datasheet.build(docs, "source", "text", "lang")
        .localCheckpoint()
      val byS = stats.collect().map(r => r.getString(0) -> r).toMap
      assert(byS("web").getLong(1) == 3 && byS("web").getLong(4) == 2)
      assert(byS("web").getDouble(6) == 0.6667,
        "2 of 3 web docs are short")
      assert(byS("books").getLong(1) == 1 &&
        byS("books").getDouble(5) == 200.0)
      // web char lengths: 11, 150, 17 -> median 17
      assert(byS("web").getDouble(5) == 17.0)
      val sc = tmp.resolve("ds.json").toString
      Datasheet.write(stats, sc)
      val back = Datasheet.read(spark, sc)
      assert(back.collect().toSet == stats.collect().toSet,
        "sidecar must round-trip the exact stats frame")
    } finally graft.sink.StageWriter.deleteRecursively(tmp)
  }

  test("datasheet sidecar escapes source names: quotes, backslashes " +
    "and control characters survive the write/read round-trip") {
    val tmp = Files.createTempDirectory("datasheet_esc")
    try {
      val evil = "web \"quoted\" \\ tab\there"
      val docs = Seq(
        (1L, evil, "en", "short doc"),
        (2L, "plain", "en", "another doc")).toDF(
        "doc_id", "source", "lang", "text")
      val stats = Datasheet.build(docs, "source", "text", "lang")
        .localCheckpoint()
      val sc = tmp.resolve("ds.json").toString
      Datasheet.write(stats, sc)
      val back = Datasheet.read(spark, sc)
      assert(back.collect().toSet == stats.collect().toSet,
        "special-character source names must round-trip exactly")
      assert(back.select("source").as[String].collect().toSet
        .contains(evil))
    } finally graft.sink.StageWriter.deleteRecursively(tmp)
  }
}
