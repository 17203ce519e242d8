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

  test("two-writer race: exactly one commit wins, the table stays consistent") {
    val t = freshTable()
    VersionedTable.commit(Seq(0).toDF("x"), t)
    // both writers read head=1, then race their commits on a barrier
    val base = VersionedTable.latestVersion(t).get
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val results = (1 to 2).map { i =>
      val f = new java.util.concurrent.FutureTask(() => {
        barrier.await()
        try Right(VersionedTable.commit(Seq(i * 10).toDF("x"), t,
          expectedBase = Some(base)))
        catch {
          case e: VersionedTable.ConcurrentCommitException => Left(e)
        }
      })
      new Thread(f).start(); f
    }.map(_.get())
    assert(results.count(_.isRight) == 1, s"exactly one writer must win: $results")
    assert(results.count(_.isLeft) == 1, s"the loser must FAIL, not silently overwrite: $results")
    assert(VersionedTable.latestVersion(t).contains(2))
    val v = VersionedTable.read(spark, t).as[Int].collect().toSeq
    assert(v == Seq(10) || v == Seq(20)) // the winner's data, intact
  }

  test("mergeCommit: racing writers both land via retry — no lost update") {
    val t = freshTable()
    VersionedTable.commit(
      Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"), t)
    val d1 = Seq((1, "A"), (4, "d")).toDF("k", "v")   // update 1, insert 4
    val d2 = Seq((2, "B"), (5, "e")).toDF("k", "v")   // update 2, insert 5
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val versions = Seq(d1, d2).map { d =>
      val f = new java.util.concurrent.FutureTask(() => {
        barrier.await()
        VersionedTable.mergeCommit(spark, t, d, Seq("k"))
      })
      new Thread(f).start(); f
    }.map(_.get())
    // exactly one commit per writer: head is base + 2
    assert(versions.toSet == Set(2, 3))
    assert(VersionedTable.latestVersion(t).contains(3))
    val fin = VersionedTable.read(spark, t).as[(Int, String)]
      .collect().toMap
    // BOTH writers' updates and inserts survive whatever the interleaving
    assert(fin == Map(1 -> "A", 2 -> "B", 3 -> "c", 4 -> "d", 5 -> "e"))
  }

  test("mergeCommit: four-way contention — every writer lands exactly once") {
    val t = freshTable()
    VersionedTable.commit(Seq((0, "base")).toDF("k", "v"), t)
    val barrier = new java.util.concurrent.CyclicBarrier(4)
    val versions = (1 to 4).map { i =>
      val f = new java.util.concurrent.FutureTask(() => {
        barrier.await()
        VersionedTable.mergeCommit(spark, t,
          Seq((i, s"w$i")).toDF("k", "v"), Seq("k"))
      })
      new Thread(f).start(); f
    }.map(_.get())
    // four commits, no duplicates, no skips: versions are exactly 2..5
    assert(versions.toSet == Set(2, 3, 4, 5))
    assert(VersionedTable.latestVersion(t).contains(5))
    val fin = VersionedTable.read(spark, t).as[(Int, String)]
      .collect().toMap
    assert(fin == Map(0 -> "base", 1 -> "w1", 2 -> "w2", 3 -> "w3",
      4 -> "w4"))
  }

  test("mergeCommit bootstraps an empty table and dedups its delta") {
    val t = freshTable()
    val v = VersionedTable.mergeCommit(spark, t,
      Seq((1, "a"), (1, "dup"), (2, "b")).toDF("k", "v"), Seq("k"))
    assert(v == 1)
    assert(VersionedTable.read(spark, t).count() == 2)
  }

  test("stale expectedBase fails fast without touching the table") {
    val t = freshTable()
    VersionedTable.commit(Seq(1).toDF("x"), t)
    VersionedTable.commit(Seq(2).toDF("x"), t) // head moves to 2
    intercept[VersionedTable.ConcurrentCommitException] {
      VersionedTable.commit(Seq(99).toDF("x"), t, expectedBase = Some(1))
    }
    assert(VersionedTable.latestVersion(t).contains(2))
    assert(VersionedTable.read(spark, t).as[Int].collect().toSeq == Seq(2))
  }

  test("a crashed claimant blocks the head until vacuum releases the claim") {
    val t = freshTable()
    VersionedTable.commit(Seq(1).toDF("x"), t)
    // simulate: a writer claimed v2 then died before writing anything
    Files.createFile(java.nio.file.Paths.get(t, "_claims", "2"))
    intercept[VersionedTable.ConcurrentCommitException] {
      VersionedTable.commit(Seq(2).toDF("x"), t)
    }
    // default retention protects a possibly-LIVE claimant — nothing freed
    VersionedTable.vacuum(t, keepLast = 5)
    intercept[VersionedTable.ConcurrentCommitException] {
      VersionedTable.commit(Seq(2).toDF("x"), t)
    }
    // operator recovery: explicitly waive the retention for the dead claim
    VersionedTable.vacuum(t, keepLast = 5, strandedRetentionMs = 0)
    assert(VersionedTable.commit(Seq(2).toDF("x"), t) == 2)
    assert(VersionedTable.read(spark, t).as[Int].collect().toSeq == Seq(2))
  }

  test("a FAILED write releases its claim so the caller's retry succeeds") {
    val t = freshTable()
    VersionedTable.commit(Seq(1).toDF("x"), t)
    val boom = org.apache.spark.sql.functions.udf(
      () => { if (System.nanoTime() != 0) sys.error("boom"); 1 })
    val bad = spark.range(1).select(boom().as("x"))
    intercept[Exception] { VersionedTable.commit(bad, t) }
    // observed (non-crash) failure: claim released, head untouched, and a
    // plain retry takes the same version number
    assert(VersionedTable.latestVersion(t).contains(1))
    assert(VersionedTable.commit(Seq(5).toDF("x"), t) == 2)
    assert(VersionedTable.read(spark, t).as[Int].collect().toSeq == Seq(5))
  }

  test("diff reports inserts and deletes between snapshots; rollback " +
    "restores an old snapshot as a NEW commit") {
    val t = freshTable()
    VersionedTable.commit(Seq(1, 2, 3).toDF("x"), t)
    VersionedTable.commit(Seq(2, 3, 4, 5).toDF("x"), t) // -1, +4, +5
    val d = VersionedTable.diff(spark, t, 1, 2)
      .as[(Int, String)].collect().toSet
    assert(d == Set((4, "insert"), (5, "insert"), (1, "delete")))
    // restore v1: history preserved, head data = v1's
    assert(VersionedTable.rollback(spark, t, 1) == 3)
    assert(VersionedTable.read(spark, t).as[Int].collect().sorted.toSeq
      == Seq(1, 2, 3))
    assert(VersionedTable.read(spark, t, asOf = Some(2)).count() == 4)
    intercept[IllegalArgumentException] {
      VersionedTable.rollback(spark, t, 9)
    }
  }

  test("readChangeFeed: the public change-feed contract — update pairs " +
    "between committed versions, the fromV=0 bootstrap as pure inserts, " +
    "and loud refusal on invalid or vacuumed windows") {
    val t = freshTable()
    VersionedTable.commit(Seq(1, 2, 3).toDF("x"), t)
    VersionedTable.commit(Seq(2, 3, 4).toDF("x"), t) // -1, +4
    VersionedTable.commit(Seq(3, 4, 5).toDF("x"), t) // -2, +5
    val f13 = VersionedTable.readChangeFeed(spark, t, 1, 3)
      .as[(Int, String)].collect().toSet
    assert(f13 == Set((4, "insert"), (5, "insert"),
      (1, "delete"), (2, "delete")),
      "the multi-commit feed nets intermediate churn")
    val boot = VersionedTable.readChangeFeed(spark, t, 0, 2)
      .as[(Int, String)].collect().toSet
    assert(boot == Set((2, "insert"), (3, "insert"), (4, "insert")),
      "fromV=0 delivers the snapshot as pure inserts")
    intercept[IllegalArgumentException] {
      VersionedTable.readChangeFeed(spark, t, 2, 2) // empty window
    }
    intercept[IllegalArgumentException] {
      VersionedTable.readChangeFeed(spark, t, 1, 9) // beyond head
    }
    // a vacuumed endpoint must refuse — a silently-partial feed is the
    // one failure a downstream consumer cannot detect
    VersionedTable.vacuum(t, keepLast = 2)
    intercept[IllegalArgumentException] {
      VersionedTable.readChangeFeed(spark, t, 1, 3)
    }
    assert(VersionedTable.readChangeFeed(spark, t, 2, 3).count() == 2)
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

  test("time travel to a vacuumed version fails eagerly with the " +
    "retention contract, not a parquet path error") {
    val t = freshTable()
    (1 to 3).foreach(i => VersionedTable.commit(Seq(i).toDF("x"), t))
    VersionedTable.vacuum(t, keepLast = 1)
    val e = intercept[IllegalStateException] {
      VersionedTable.read(spark, t, asOf = Some(1))
    }
    assert(e.getMessage.contains("vacuum") &&
      e.getMessage.contains("keepLast"))
    assert(VersionedTable.read(spark, t).count() == 1) // head unaffected
  }

  test("vacuum racing an IN-FLIGHT reader: the read fails cleanly, " +
    "never returns partial rows") {
    val t = freshTable()
    VersionedTable.commit(Seq(1, 2, 3).toDF("x").repartition(3), t)
    VersionedTable.commit(Seq(9).toDF("x"), t)
    // reader plans over v1 (file listing happens here)...
    val reader = VersionedTable.read(spark, t, asOf = Some(1))
    // ...then vacuum reclaims v1 before the action runs
    VersionedTable.vacuum(t, keepLast = 1)
    val e = intercept[Throwable] { reader.count() }
    def chain(x: Throwable): Seq[Throwable] =
      if (x == null) Nil else x +: chain(x.getCause)
    assert(chain(e).exists(c =>
      c.isInstanceOf[java.io.FileNotFoundException] ||
        String.valueOf(c.getMessage).contains("does not exist") ||
        String.valueOf(c.getMessage).contains("FileNotFound")),
      s"expected a missing-file abort, got: $e")
  }

  test("TIMESTAMP AS OF resolves the newest version visible at ts, " +
    "inclusive at the boundary, None before history") {
    val tmp = Files.createTempDirectory("vt_asof")
    try {
      val t = tmp.resolve("t").toString
      VersionedTable.commit(Seq(1).toDF("x"), t, commitTs = 100L)
      VersionedTable.commit(Seq(1, 2).toDF("x"), t, commitTs = 200L)
      VersionedTable.commit(Seq(1, 2, 3).toDF("x"), t, commitTs = 300L)
      assert(VersionedTable.versionAsOf(t, 99L).isEmpty)
      assert(VersionedTable.versionAsOf(t, 100L).contains(1))
      assert(VersionedTable.versionAsOf(t, 250L).contains(2))
      assert(VersionedTable.versionAsOf(t, 999L).contains(3))
      assert(VersionedTable.readAsOf(spark, t, 250L).count() == 2)
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("a non-monotone injected commit timestamp is rejected") {
    val tmp = Files.createTempDirectory("vt_asof2")
    try {
      val t = tmp.resolve("t").toString
      VersionedTable.commit(Seq(1).toDF("x"), t, commitTs = 200L)
      intercept[IllegalArgumentException] {
        VersionedTable.commit(Seq(2).toDF("x"), t, commitTs = 100L)
      }
      // the failed commit released its claim; a correct ts lands
      assert(VersionedTable.commit(Seq(2).toDF("x"), t,
        commitTs = 300L) == 2)
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("write-audit-publish: a vetoed batch leaves no trace (head, " +
    "staged dir, claim) and the next publish proceeds") {
    val tmp = Files.createTempDirectory("vt_wap")
    try {
      val t = tmp.resolve("t").toString
      VersionedTable.commitAudited(Seq(1, 2).toDF("x"), t,
        staged => require(staged.count() > 0))
      val e = intercept[IllegalArgumentException] {
        VersionedTable.commitAudited(Seq.empty[Int].toDF("x"), t,
          staged => require(staged.count() > 0, "empty publish"))
      }
      assert(e.getMessage.contains("empty publish"))
      assert(VersionedTable.latestVersion(t).contains(1))
      assert(!Files.exists(tmp.resolve("t/v=2")), "staged dir leaked")
      assert(!Files.exists(tmp.resolve("t/_claims/2")), "claim leaked")
      // claim released: version 2 is reusable
      assert(VersionedTable.commitAudited(Seq(3).toDF("x"), t,
        _ => ()) == 2)
      assert(VersionedTable.read(spark, t).count() == 1)
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("shallow clone: zero-copy, clone-into-existing pins per-version, " +
    "and source vacuum past the referenced version fails the clone " +
    "EAGERLY — never partial rows") {
    val tmp = Files.createTempDirectory("vtclone")
    try {
      val src = tmp.resolve("src").toString
      val dst = tmp.resolve("dst").toString
      VersionedTable.commit(Seq(1, 2).toDF("x"), src)
      VersionedTable.commit(Seq(1, 2, 3).toDF("x"), src)
      assert(VersionedTable.cloneShallow(src, dst) == 1)
      assert(VersionedTable.read(spark, dst).count() == 3)
      assert(StageWriter.dirSize(java.nio.file.Paths.get(dst)) < 4096,
        "a shallow clone must hold pointers, not data")
      // clone an OLDER snapshot into the same existing clone table
      assert(VersionedTable.cloneShallow(src, dst, asOf = Some(1)) == 2)
      assert(VersionedTable.read(spark, dst).count() == 2)
      assert(VersionedTable.read(spark, dst, Some(1)).count() == 3)
      // chains stay flat: cloning a clone references the DATA dir
      val dst2 = tmp.resolve("dst2").toString
      assert(VersionedTable.cloneShallow(dst, dst2, asOf = Some(1)) == 1)
      assert(VersionedTable.read(spark, dst2).count() == 3)
      // vacuum the SOURCE past the referenced versions: clone reads must
      // fail eagerly with the vacuum message
      VersionedTable.commit(Seq(9).toDF("x"), src)
      VersionedTable.vacuum(src, keepLast = 1)
      val e = intercept[IllegalStateException] {
        VersionedTable.read(spark, dst, Some(1))
      }
      assert(e.getMessage.contains("vacuum"))
    } finally StageWriter.deleteRecursively(tmp)
  }
}
