package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Rollup
import graft.sink.StageWriter

/** D164 — MV auto-rewrite: subsuming aggregates answer from the rollup,
  * stale or non-subsuming ones from the base, output schema preserved. */
class MvRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation =>
        lr.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.rootPaths.map(_.toUri.getPath)
    }.flatten

  private def fixture(): (String, String) = {
    val tmp = Files.createTempDirectory("rwfix")
    val base = tmp.resolve("base").toString
    val mv = tmp.resolve("mv").toString
    (1 to 1000).map(i => (s"g${i % 7}", s"h${i % 3}", (i % 100) / 4.0))
      .toDF("k1", "k2", "v").repartition(3).write.parquet(base)
    StageWriter.overwrite(
      Rollup.build(spark.read.parquet(base), Seq("k1", "k2"), "v"), mv)
    MvRewrite.register(base, mv, Seq("k1", "k2"), "v")
    MvRewrite.ensureInstalled(spark)
    (base, mv)
  }

  private def q(base: String, keys: String*) =
    spark.read.parquet(base).groupBy(keys.map(col): _*)
      .agg(sum(col("v").cast(DecimalType(18, 2))).as("s"),
        count(lit(1)).as("n"))

  test("a subsuming aggregate (grouping subset, exact-decimal sum + " +
    "count(1)) is answered from the MV with identical results and schema") {
    val (base, mv) = fixture()
    try {
      val direct = q(base, "k1")
      // force a no-rewrite twin for comparison: deregister, plan, restore
      MvRewrite.deregister(base)
      val want = direct.collect().map(r =>
        (r.getString(0), r.getDecimal(1), r.getLong(2))).toSet
      MvRewrite.register(base, mv, Seq("k1", "k2"), "v")

      val rewritten = q(base, "k1")
      assert(scanPaths(rewritten).exists(_.endsWith("/mv")),
        s"expected the MV scan, got ${scanPaths(rewritten)}")
      assert(!scanPaths(rewritten).exists(_.endsWith("/base")),
        "the base table must not be scanned after the rewrite")
      val got = rewritten.collect().map(r =>
        (r.getString(0), r.getDecimal(1), r.getLong(2))).toSet
      assert(got == want, "MV answer must equal the base answer exactly")
      assert(rewritten.schema == q(base, "k1").schema)
      // full-key grouping also rewrites (no further rollup needed)
      assert(scanPaths(q(base, "k1", "k2")).exists(_.endsWith("/mv")))
    } finally MvRewrite.deregister(base)
  }

  test("staleness: a base write after registration disables the rewrite " +
    "until re-registration — never a stale answer") {
    val (base, mv) = fixture()
    try {
      assert(scanPaths(q(base, "k1")).exists(_.endsWith("/mv")))
      Seq(("g0", "h0", 1000.0)).toDF("k1", "k2", "v")
        .write.mode("append").parquet(base)
      val afterWrite = q(base, "k1")
      assert(scanPaths(afterWrite).forall(!_.endsWith("/mv")),
        "a stale MV must stand down")
      // the fresh row is visible (answered from base)
      val g0 = afterWrite.filter(col("k1") === "g0")
        .select(col("s").cast("double")).as[Double].head()
      assert(g0 > 1000.0)
      // catch the MV up and re-register: rewrite resumes
      StageWriter.overwrite(
        Rollup.build(spark.read.parquet(base), Seq("k1", "k2"), "v"), mv)
      MvRewrite.register(base, mv, Seq("k1", "k2"), "v")
      val again = q(base, "k1")
      assert(scanPaths(again).exists(_.endsWith("/mv")))
      assert(again.filter(col("k1") === "g0")
        .select(col("s").cast("double")).as[Double].head() == g0)
    } finally MvRewrite.deregister(base)
  }

  test("non-subsuming shapes pass through untouched: plain double sum, " +
    "avg, non-key grouping, unregistered path") {
    val (base, _) = fixture()
    try {
      assert(scanPaths(spark.read.parquet(base).groupBy("k1")
        .agg(sum("v").as("s"))).forall(!_.endsWith("/mv")),
        "an IEEE double sum must NOT rewrite (not exactly equivalent)")
      assert(scanPaths(spark.read.parquet(base).groupBy("k1")
        .agg(avg("v").as("a"))).forall(!_.endsWith("/mv")))
      assert(scanPaths(spark.read.parquet(base).groupBy("v")
        .agg(count(lit(1)).as("n"))).forall(!_.endsWith("/mv")),
        "grouping by a non-key column must not rewrite")
    } finally MvRewrite.deregister(base)
  }

  test("a cast to any OTHER decimal precision/scale stands down — the " +
    "rollup's per-row rounding was DECIMAL(18,2), nothing else") {
    val (base, _) = fixture()
    try {
      for (dt <- Seq(DecimalType(38, 10), DecimalType(10, 0),
          DecimalType(18, 4))) {
        val q = spark.read.parquet(base).groupBy("k1")
          .agg(sum(col("v").cast(dt)).as("s"))
        assert(scanPaths(q).forall(!_.endsWith("/mv")),
          s"sum(cast(v AS ${dt.simpleString})) must NOT be served from " +
            "a DECIMAL(18,2)-rounded rollup")
      }
      // the exact persisted shape still rewrites
      assert(scanPaths(spark.read.parquet(base).groupBy("k1")
        .agg(sum(col("v").cast(DecimalType(18, 2))).as("s")))
        .exists(_.endsWith("/mv")))
    } finally MvRewrite.deregister(base)
  }

  test("avg: the DECIMAL(18,2) shape is served bit-identically from the " +
    "(n,s) partials; IEEE double avg and mismatched decimals stand down") {
    val (base, mvp) = fixture()
    try {
      def qa() = spark.read.parquet(base).groupBy("k1")
        .agg(avg(col("v").cast(DecimalType(18, 2))).as("a"),
          count(lit(1)).as("n"))
      val served = qa()
      assert(scanPaths(served).exists(_.endsWith("/mv")),
        s"decimal avg must be served, got ${scanPaths(served)}")
      val got = served.collect()
        .map(r => (r.getString(0), r.getDecimal(1))).toMap
      MvRewrite.deregister(base)
      val want = qa().collect()
        .map(r => (r.getString(0), r.getDecimal(1))).toMap
      assert(got == want,
        "rewritten avg must be BIT-identical (BigDecimal value+scale)")
      assert(served.schema == qa().schema)
      MvRewrite.register(base, mvp, Seq("k1", "k2"), "v")
      // IEEE double avg: sum order would drift — must NOT rewrite
      assert(scanPaths(spark.read.parquet(base).groupBy("k1")
        .agg(avg(col("v")).as("a"))).forall(!_.endsWith("/mv")),
        "double avg must stand down")
      // a mismatched decimal cast stands down like sum's
      assert(scanPaths(spark.read.parquet(base).groupBy("k1")
        .agg(avg(col("v").cast(DecimalType(20, 4))).as("a")))
        .forall(!_.endsWith("/mv")))
    } finally MvRewrite.deregister(base)
  }

  test("minmax MV: min/max groupings answer from a registered " +
    "buildMinMax artifact; sum/avg shapes are never served by it") {
    val tmp = Files.createTempDirectory("mvminmax")
    val base = tmp.resolve("base").toString
    val mvp = tmp.resolve("mv").toString
    try {
      (1 to 900).map(i => (s"g${i % 5}", s"h${i % 3}", (i % 97) / 4.0))
        .toDF("k1", "k2", "v").repartition(3).write.parquet(base)
      StageWriter.overwrite(graft.operators.Rollup.buildMinMax(
        spark.read.parquet(base), Seq("k1", "k2"), "v"), mvp)
      MvRewrite.registerMinMax(base, mvp, Seq("k1", "k2"), "v")
      MvRewrite.ensureInstalled(spark)
      def q() = spark.read.parquet(base).groupBy("k1")
        .agg(min(col("v")).as("mn_v"), max(col("v")).as("mx_v"))
      val served = q()
      assert(scanPaths(served).exists(_.endsWith("/mv")),
        s"min/max must be served from the minmax MV, " +
          s"got ${scanPaths(served)}")
      val got = served.collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
      MvRewrite.deregister(base)
      val want = q().collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
      assert(got == want)
      MvRewrite.registerMinMax(base, mvp, Seq("k1", "k2"), "v")
      // a GLOBAL min also folds from the per-group extrema
      val g = spark.read.parquet(base).agg(min(col("v")).as("m"))
      assert(scanPaths(g).exists(_.endsWith("/mv")))
      assert(g.head().getDouble(0) == 0.0)
      // sum/count/avg shapes can't be answered by (mn, mx): stand down
      assert(scanPaths(spark.read.parquet(base).groupBy("k1")
        .agg(sum(col("v").cast(DecimalType(18, 2))).as("s")))
        .forall(!_.endsWith("/mv")))
      // staleness: an append stands the minmax MV down too
      import spark.implicits._
      Seq(("g0", "h0", -5.0)).toDF("k1", "k2", "v")
        .write.mode("append").parquet(base)
      assert(scanPaths(q()).forall(!_.endsWith("/mv")))
      assert(q().filter(col("k1") === "g0").head().getDouble(1) == -5.0)
    } finally {
      MvRewrite.deregister(base)
      StageWriter.deleteRecursively(tmp)
    }
  }

  test("a GLOBAL count(1) over an empty base/rollup answers 0 from the " +
    "MV, never NULL") {
    val tmp = Files.createTempDirectory("mvempty")
    val base = tmp.resolve("base").toString
    val mv = tmp.resolve("mv").toString
    try {
      Seq.empty[(String, Double)].toDF("k", "v").repartition(1)
        .write.parquet(base)
      StageWriter.overwrite(
        Rollup.build(spark.read.parquet(base), Seq("k"), "v")
          .repartition(1), mv)
      MvRewrite.register(base, mv, Seq("k"), "v")
      MvRewrite.ensureInstalled(spark)
      val q = spark.read.parquet(base).agg(count(lit(1)).as("n"))
      assert(scanPaths(q).exists(_.endsWith("/mv")),
        s"global count must rewrite, got ${scanPaths(q)}")
      assert(q.as[Long].head() == 0L, "count over empty must be 0")
    } finally {
      MvRewrite.deregister(base)
      StageWriter.deleteRecursively(tmp)
    }
  }

  test("MvMaintain: refresh is a no-op when current, errors without " +
    "build, and summarizedVersion tracks the lifecycle") {
    val tmp = Files.createTempDirectory("mvmaint")
    val vt = tmp.resolve("t").toString
    val mv = tmp.resolve("mv").toString
    try {
      intercept[IllegalStateException] {
        MvMaintain.refresh(spark, vt, mv, Seq("k"), "v")
      }
      graft.sink.VersionedTable.commit(
        Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v"), vt)
      assert(MvMaintain.build(spark, vt, mv, Seq("k"), "v") == 1)
      assert(MvMaintain.summarizedVersion(mv).contains(1))
      val noop = MvMaintain.refresh(spark, vt, mv, Seq("k"), "v")
      assert(noop == MvMaintain.Refresh(1, 1, 0L))
      graft.sink.VersionedTable.commit(
        Seq(("a", 1.0), ("b", 2.0), ("b", 3.5)).toDF("k", "v"), vt)
      val r = MvMaintain.refresh(spark, vt, mv, Seq("k"), "v")
      assert(r.fromV == 1 && r.toV == 2 && r.changeRows == 1)
      assert(MvMaintain.summarizedVersion(mv).contains(2))
      val got = spark.read.parquet(mv)
        .select("k", "n").as[(String, Long)].collect().toMap
      assert(got == Map("a" -> 1L, "b" -> 2L))
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("MvMaintain.rehydrate restores the rewrite registration after a " +
    "registry wipe (driver restart)") {
    val tmp = Files.createTempDirectory("mvreh")
    val vt = tmp.resolve("t").toString
    val mv = tmp.resolve("mv").toString
    try {
      graft.sink.VersionedTable.commit(
        Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v"), vt)
      MvMaintain.build(spark, vt, mv, Seq("k"), "v")
      def q() = graft.sink.VersionedTable.read(spark, vt).groupBy("k")
        .agg(sum(col("v").cast(DecimalType(18, 2))).as("s"),
          count(lit(1)).as("n"))
      MvRewrite.ensureInstalled(spark)
      assert(scanPaths(q()).exists(_.endsWith("/mv")))
      // simulate a restart: the in-memory registry loses the entry
      MvRewrite.deregister(
        q().queryExecution.analyzed.collectLeaves().collectFirst {
          case lr: LogicalRelation =>
            lr.relation.asInstanceOf[
              org.apache.spark.sql.execution.datasources.HadoopFsRelation]
              .location.rootPaths.head.toUri.getPath
        }.get)
      assert(scanPaths(q()).forall(!_.endsWith("/mv")))
      val r = MvMaintain.rehydrate(spark, mv, Seq("k"), "v")
      assert(r.fromV == 1 && r.toV == 1)
      assert(scanPaths(q()).exists(_.endsWith("/mv")),
        "rehydrate must re-point the registration")
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("several MVs on one base: the COARSEST fresh subsumer answers; " +
    "a stale coarse MV falls through to the fine one") {
    val tmp = Files.createTempDirectory("mvmulti")
    val base = tmp.resolve("base").toString
    val fine = tmp.resolve("fine").toString
    val coarse = tmp.resolve("coarse").toString
    try {
      (1 to 600).map(i => (s"g${i % 6}", s"h${i % 3}", i / 4.0))
        .toDF("k1", "k2", "v").write.parquet(base)
      StageWriter.overwrite(Rollup.build(
        spark.read.parquet(base), Seq("k1", "k2"), "v"), fine)
      StageWriter.overwrite(Rollup.build(
        spark.read.parquet(base), Seq("k1"), "v"), coarse)
      MvRewrite.register(base, fine, Seq("k1", "k2"), "v")
      MvRewrite.register(base, coarse, Seq("k1"), "v")
      MvRewrite.ensureInstalled(spark)
      // k1 grouping: BOTH subsume; the coarse (1-key) rollup must win
      assert(scanPaths(q(base, "k1")).exists(_.endsWith("/coarse")),
        s"coarsest subsumer must answer, got ${scanPaths(q(base, "k1"))}")
      // (k1, k2): only the fine MV subsumes
      assert(scanPaths(q(base, "k1", "k2")).exists(_.endsWith("/fine")))
      // stale the coarse registration only: k1 falls through to fine
      MvRewrite.deregister(base, coarse)
      assert(scanPaths(q(base, "k1")).exists(_.endsWith("/fine")),
        "with the coarse MV gone, the fine one must still answer")
      val got = q(base, "k1").collect()
        .map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))).toSet
      MvRewrite.deregister(base)
      val want = q(base, "k1").collect()
        .map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))).toSet
      assert(got == want)
    } finally MvRewrite.deregister(base)
  }
}
