package graft.sink

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import java.nio.file.Files

/** Txn — multi-table atomic visibility, half-publish invisibility,
  * transaction-level CAS, historical reads. */
class TxnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("both members flip together; a half-published member commit is " +
    "invisible; old transactions stay readable") {
    val tmp = Files.createTempDirectory("txn")
    try {
      val root = tmp.resolve("wh").toString
      assert(Txn.latestTxn(root).isEmpty)
      Txn.commit(root, Seq(
        "a" -> Seq(1, 2).toDF("x"), "b" -> Seq(10).toDF("y")))
      Txn.commit(root, Seq(
        "a" -> Seq(1, 2, 3).toDF("x"), "b" -> Seq(10, 20).toDF("y")))
      assert(Txn.latestTxn(root).contains(2))
      assert(Txn.read(spark, root, "a").count() == 3)
      assert(Txn.read(spark, root, "b").count() == 2)
      // writer dies between member commits: only 'a' landed
      VersionedTable.commit(Seq(9, 9, 9, 9).toDF("x"), s"$root/a")
      assert(Txn.read(spark, root, "a").count() == 3,
        "reader saw a half-published member version")
      // historical transaction
      assert(Txn.read(spark, root, "a", asOfTxn = Some(1)).count() == 2)
      assert(Txn.read(spark, root, "b", asOfTxn = Some(1)).count() == 1)
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("concurrent transactions serialize through the claim CAS") {
    val tmp = Files.createTempDirectory("txn2")
    try {
      val root = tmp.resolve("wh").toString
      Txn.commit(root, Seq("a" -> Seq(1).toDF("x")))
      // simulate a concurrent claimant holding txn 2
      Files.createDirectories(tmp.resolve("wh/_txn_claims"))
      Files.createFile(tmp.resolve("wh/_txn_claims/2"))
      intercept[VersionedTable.ConcurrentCommitException] {
        Txn.commit(root, Seq("a" -> Seq(2).toDF("x")))
      }
      // stale expectation fails fast without claiming
      intercept[VersionedTable.ConcurrentCommitException] {
        Txn.commit(root, Seq("a" -> Seq(2).toDF("x")),
          expectedTxn = Some(0))
      }
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("vacuum reclaims a stranded claim (crashed writer) so the root " +
    "un-wedges; spent claims drop immediately; fresh claims survive") {
    val tmp = Files.createTempDirectory("txn4")
    try {
      val root = tmp.resolve("wh").toString
      Txn.commit(root, Seq("a" -> Seq(1).toDF("x")))
      // crashed writer: claimed txn 2, died before the pointer flip —
      // without vacuum EVERY later commit recomputes next=2 and loses
      Files.createDirectories(tmp.resolve("wh/_txn_claims"))
      Files.createFile(tmp.resolve("wh/_txn_claims/2"))
      intercept[VersionedTable.ConcurrentCommitException] {
        Txn.commit(root, Seq("a" -> Seq(2).toDF("x")))
      }
      // txn 1's spent claim drops with no age gate; the stranded claim 2
      // is presumed LIVE inside the retention window and survives
      assert(Txn.vacuum(root, strandedRetentionMs = 60000) == Seq(1))
      intercept[VersionedTable.ConcurrentCommitException] {
        Txn.commit(root, Seq("a" -> Seq(2).toDF("x")))
      }
      Thread.sleep(10)
      assert(Txn.vacuum(root, strandedRetentionMs = 0) == Seq(2))
      Txn.commit(root, Seq("a" -> Seq(2, 3).toDF("x")))
      assert(Txn.latestTxn(root).contains(2))
      assert(Txn.read(spark, root, "a").count() == 2)
      // the spent claim (txn <= pointer) drops without any age gate
      assert(Txn.vacuum(root, strandedRetentionMs = 3600000) == Seq(2))
      assert(Txn.vacuum(root, strandedRetentionMs = 3600000).isEmpty)
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("member names that would break the manifest are rejected") {
    val tmp = Files.createTempDirectory("txn3")
    try {
      val root = tmp.resolve("wh").toString
      intercept[IllegalArgumentException] {
        Txn.commit(root, Seq("_txn" -> Seq(1).toDF("x")))
      }
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("cloneGroup pins every member at the source txn's versions, " +
    "publishes under one pointer, and never follows later commits") {
    val tmp = Files.createTempDirectory("txn4")
    try {
      val root = tmp.resolve("wh").toString
      val dev = tmp.resolve("dev").toString
      Txn.commit(root, Seq(
        "a" -> Seq(1, 2).toDF("x"), "b" -> Seq(10).toDF("y")))
      Txn.commit(root, Seq(
        "a" -> Seq(1, 2, 3).toDF("x"), "b" -> Seq(10, 20).toDF("y")))
      assert(Txn.cloneGroup(root, dev, asOfTxn = Some(1)) == 1)
      assert(Txn.cloneGroup(root, dev) == 2) // head = src txn 2
      assert(Txn.read(spark, dev, "a", Some(1)).count() == 2 &&
        Txn.read(spark, dev, "b", Some(1)).count() == 1,
        "the pinned clone must serve the txn-1 pair")
      assert(Txn.read(spark, dev, "a").count() == 3 &&
        Txn.read(spark, dev, "b").count() == 2)
      // source advances; the clone must not move
      Txn.commit(root, Seq(
        "a" -> Seq(9).toDF("x"), "b" -> Seq(9).toDF("y")))
      assert(Txn.read(spark, dev, "a").count() == 3,
        "the group clone followed a post-clone source commit")
      // an uncommitted source txn cannot be cloned
      intercept[IllegalArgumentException] {
        Txn.cloneGroup(root, tmp.resolve("dev2").toString,
          asOfTxn = Some(99))
      }
    } finally StageWriter.deleteRecursively(tmp)
  }
}
