package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sink.StageWriter

/** D171 — RELY join elimination: identity joins vanish, every unsound
  * shape keeps its join, fk-NULL rows still drop. */
class JoinElimSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hasJoin(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect { case j: Join => j }.nonEmpty

  private def fixture(): (String, String) = {
    val tmp = Files.createTempDirectory("jelim")
    val fact = tmp.resolve("fact").toString
    val dim = tmp.resolve("dim").toString
    // one NULL fk row: the rewrite must keep dropping it (inner-join
    // semantics), via the IsNotNull filter it leaves behind
    val rows: Seq[(Long, java.lang.Long, Double)] =
      (1L to 100L).map(i => (i, java.lang.Long.valueOf(i % 10), i / 2.0)) :+
        ((101L, null.asInstanceOf[java.lang.Long], 9.9))
    rows.toDF("id", "fk", "v").write.parquet(fact)
    (0L until 10L).map(i => (i, s"dim$i")).toDF("pk", "attr")
      .write.parquet(dim)
    Constraints.declareFk(fact, Seq("fk"), dim, Seq("pk"))
    JoinElim.ensureInstalled(spark)
    (fact, dim)
  }

  test("an identity join is eliminated; results (incl. fk-NULL drop) " +
    "match the real join exactly") {
    val (fact, dim) = fixture()
    try {
      def q() = spark.read.parquet(fact)
        .join(spark.read.parquet(dim),
          col("fk") === col("pk"), "inner")
        .select("id", "v")
      Constraints.drop(fact, dim)
      val want = q().collect().map(r => (r.getLong(0), r.getDouble(1)))
        .sorted.toSeq
      Constraints.declareFk(fact, Seq("fk"), dim, Seq("pk"))
      val opt = q()
      assert(!hasJoin(opt), "declared identity join must be eliminated")
      val got = opt.collect().map(r => (r.getLong(0), r.getDouble(1)))
        .sorted.toSeq
      assert(got == want)
      assert(got.size == 100, "the fk-NULL row must still be dropped")
      // reversed sides eliminate too
      val rev = spark.read.parquet(dim)
        .join(spark.read.parquet(fact), col("pk") === col("fk"))
        .select("id", "v")
      assert(!hasJoin(rev))
      assert(rev.count() == 100)
    } finally Constraints.drop(fact, dim)
  }

  test("unsound shapes keep their join: dim column referenced, filtered " +
    "dim, outer join, undeclared edge, extra join predicate") {
    val (fact, dim) = fixture()
    try {
      val f = spark.read.parquet(fact)
      val d = spark.read.parquet(dim)
      assert(hasJoin(f.join(d, col("fk") === col("pk"))
        .select("id", "attr")), "dim column referenced")
      assert(hasJoin(f.join(d.filter(col("attr") =!= "dim3"),
        col("fk") === col("pk")).select("id", "v")), "filtered dim")
      assert(hasJoin(f.join(d, col("fk") === col("pk"), "left")
        .select("id", "v")), "outer join")
      assert(hasJoin(f.join(d,
        col("fk") === col("pk") && col("v") > col("pk"))
        .select("id", "v")), "extra non-declared predicate")
      Constraints.drop(fact, dim)
      assert(hasJoin(f.join(d, col("fk") === col("pk"))
        .select("id", "v")), "undeclared edge")
    } finally Constraints.drop(fact, dim)
  }

  test("a fact-side alias wearing the fk's name blocks elimination — " +
    "the attribute must BE the scan's column, not merely carry its name") {
    val (fact, dim) = fixture()
    try {
      val d = spark.read.parquet(dim)
      // rebind `id` (NOT the declared fk) under the name `fk`: ids run
      // 1..101 while pks run 0..9, so the real join keeps 9 rows — an
      // unsound elimination would keep all 101
      val smuggled = spark.read.parquet(fact).drop("fk")
        .withColumnRenamed("id", "fk")
      val q = smuggled.join(d, col("fk") === col("pk")).select("fk", "v")
      assert(hasJoin(q),
        "an alias rebinding another column under the declared fk name " +
          "must NOT eliminate the join")
      assert(q.count() == 9)
      // the genuine column under a pass-through projection still
      // eliminates (attribute-only Projects preserve the scan exprId)
      val genuine = spark.read.parquet(fact).select("fk", "v")
        .join(d, col("fk") === col("pk")).select("fk", "v")
      assert(!hasJoin(genuine))
      assert(genuine.count() == 100)
    } finally Constraints.drop(fact, dim)
  }

  test("validate/splitOrphans: NULL fks are valid, real orphans counted " +
    "and isolated, duplicate pks detected") {
    val (fact, dim) = fixture()
    try {
      // fixture: fks 0..9 all covered, one NULL fk row
      assert(Constraints.validate(spark, fact, dim) ==
        Constraints.Validation(0L, 0L))
      val (valid0, orphans0) = Constraints.splitOrphans(spark, fact, dim)
      assert(valid0.count() == 101 && orphans0.count() == 0,
        "a NULL fk is legal under the declaration, not an orphan")
      // corrupt: orphan fk 42, duplicated pk 3
      val tmp = Files.createTempDirectory("jelimval")
      val fact2 = tmp.resolve("f2").toString
      val dim2 = tmp.resolve("d2").toString
      spark.read.parquet(fact).unionByName(
        Seq((999L, java.lang.Long.valueOf(42L), 1.0)).toDF("id", "fk", "v"))
        .write.parquet(fact2)
      spark.read.parquet(dim).unionByName(
        Seq((3L, "dup")).toDF("pk", "attr")).write.parquet(dim2)
      Constraints.declareFk(fact2, Seq("fk"), dim2, Seq("pk"))
      try {
        assert(Constraints.validate(spark, fact2, dim2) ==
          Constraints.Validation(1L, 1L))
        val (valid, orphans) = Constraints.splitOrphans(spark, fact2, dim2)
        assert(orphans.count() == 1 &&
          orphans.select("id").as[Long].head() == 999L)
        assert(valid.count() == 101)
      } finally Constraints.drop(fact2, dim2)
    } finally Constraints.drop(fact, dim)
  }

  test("durability: RELY edges rehydrate from the __fks__ sidecar after " +
    "a simulated restart; drop deletes it and disarms for good") {
    val (fact, dim) = fixture()
    try {
      assert(Files.isRegularFile(
        java.nio.file.Paths.get(fact + ".__fks__")),
        "declareFk must write through to the durable sidecar")
      Constraints.resetMemory() // the restart
      assert(Constraints.declared.isEmpty, "cache cleared")
      val q = spark.read.parquet(fact)
        .join(spark.read.parquet(dim), col("fk") === col("pk"), "inner")
        .select("id", "v")
      assert(!hasJoin(q),
        "the optimizer must rehydrate the edge from disk and still cut")
      assert(q.count() == 100)
      // drop removes the sidecar: no resurrection after another restart
      Constraints.drop(fact, dim)
      Constraints.resetMemory()
      val kept = spark.read.parquet(fact)
        .join(spark.read.parquet(dim), col("fk") === col("pk"), "inner")
        .select("id", "v")
      assert(hasJoin(kept), "a dropped edge must stay dropped on disk")
      // two edges on one fact table coexist in one sidecar
      val tmp2 = Files.createTempDirectory("jelimdur")
      val dimB = tmp2.resolve("dimB").toString
      (0L until 10L).map(i => (i, i * 2)).toDF("pkb", "w")
        .write.parquet(dimB)
      Constraints.declareFk(fact, Seq("fk"), dim, Seq("pk"))
      Constraints.declareFk(fact, Seq("fk"), dimB, Seq("pkb"))
      try {
        Constraints.resetMemory()
        Constraints.rehydrate(fact)
        assert(Constraints.declared.size == 2,
          "one sidecar must carry every edge of its fact table")
      } finally {
        Constraints.drop(fact, dimB)
        StageWriter.deleteRecursively(tmp2)
      }
    } finally Constraints.drop(fact, dim)
  }
}
