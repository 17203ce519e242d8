package graft.sink

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Versioned-snapshot semantics: monotonic commits, time travel, crash
  * isolation (stranded version dirs are invisible to readers), vacuum
  * retention. */
class VersionedTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("vt").resolve("t").toString

  test("commit/read/asOf round-trip across versions") {
    val t = freshTable()
    assert(VersionedTable.latestVersion(t).isEmpty)
    assert(VersionedTable.commit(Seq(1, 2).toDF("x"), t) == 1)
    assert(VersionedTable.commit(Seq(1, 2, 3).toDF("x"), t) == 2)
    assert(VersionedTable.commit(Seq(9).toDF("x"), t) == 3)
    assert(VersionedTable.latestVersion(t).contains(3))
    assert(VersionedTable.read(spark, t).count() == 1)
    assert(VersionedTable.read(spark, t, asOf = Some(1)).count() == 2)
    assert(VersionedTable.read(spark, t, asOf = Some(2)).count() == 3)
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, t, asOf = Some(7))
    }
  }

  test("a stranded (uncommitted) version dir is invisible to readers") {
    val t = freshTable()
    VersionedTable.commit(Seq(1).toDF("x"), t)
    // simulate a crash mid-commit: data written, pointer never flipped
    Seq(42, 43).toDF("x").write.parquet(s"$t/v=2")
    assert(VersionedTable.latestVersion(t).contains(1))
    assert(VersionedTable.read(spark, t).count() == 1)
    // the NEXT commit must not reuse the stranded number's pointer slot
    // (it overwrites the stranded dir — single-writer model)
    assert(VersionedTable.commit(Seq(7).toDF("x"), t) == 2)
    assert(VersionedTable.read(spark, t).as[Int].collect().toSeq == Seq(7))
  }

  test("vacuum keeps the newest K committed versions") {
    val t = freshTable()
    (1 to 5).foreach(i => VersionedTable.commit(Seq(i).toDF("x"), t))
    val removed = VersionedTable.vacuum(t, keepLast = 2)
    assert(removed == Seq(1, 2, 3))
    assert(VersionedTable.versions(t) == Seq(4, 5))
    assert(VersionedTable.read(spark, t, asOf = Some(4)).count() == 1)
    assert(VersionedTable.read(spark, t).as[Int].collect().toSeq == Seq(5))
  }
}
