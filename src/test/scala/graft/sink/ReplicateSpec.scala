package graft.sink

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** VersionedTable.replicateTo — bootstrap, delta-only apply, op
  * collapsing, idempotent crash replay. */
class ReplicateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(rep: String): Map[Long, String] =
    spark.read.parquet(rep).as[(Long, String)].collect().toMap

  test("bootstrap applies everything; a later sync applies only changed " +
    "keys, collapsing update (delete+insert) to upsert") {
    val tmp = Files.createTempDirectory("repl")
    try {
      val t = tmp.resolve("t").toString
      val rep = tmp.resolve("rep").toString
      VersionedTable.commit(
        Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), t)
      val s1 = VersionedTable.replicateTo(spark, t, rep, Seq("k"))
      assert(s1.applied == 3 && rows(rep) == Map(1L -> "a", 2L -> "b",
        3L -> "c"))
      // v2: key 2 updated, key 3 deleted, key 1 untouched
      VersionedTable.commit(Seq((1L, "a"), (2L, "B")).toDF("k", "v"), t)
      val s2 = VersionedTable.replicateTo(spark, t, rep, Seq("k"))
      assert(s2.applied == 2, s"expected update+delete only, ${s2.applied}")
      assert(rows(rep) == Map(1L -> "a", 2L -> "B"))
      // already current
      assert(VersionedTable.replicateTo(spark, t, rep, Seq("k")).applied == 0)
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("a crash between merge and marker write replays the same batch " +
    "idempotently") {
    val tmp = Files.createTempDirectory("repl2")
    try {
      val t = tmp.resolve("t").toString
      val rep = tmp.resolve("rep").toString
      VersionedTable.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
      VersionedTable.replicateTo(spark, t, rep, Seq("k"))
      VersionedTable.commit(Seq((2L, "B"), (4L, "d")).toDF("k", "v"), t)
      VersionedTable.replicateTo(spark, t, rep, Seq("k"))
      val after = rows(rep)
      // simulate the crash window: merge landed, marker write lost
      Files.writeString(Paths.get(rep + ".applied_version"), "1")
      val replay = VersionedTable.replicateTo(spark, t, rep, Seq("k"))
      assert(replay.applied > 0)
      assert(rows(rep) == after, "replay diverged from the applied state")
    } finally StageWriter.deleteRecursively(tmp)
  }
}
