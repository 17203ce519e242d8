package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sink.{Sidecars, StageWriter}

/** D234 — transparent metadata-only rewrite: eligible global
  * count/min/max aggregates over declared-plane tables collapse to a
  * LocalRelation with the sidecar answer; every disqualifier (filter,
  * grouping, unsupported aggregate, undeclared table, stale inventory)
  * keeps the scan and the scan's truth. */
class MetadataRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def isLocal(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.isInstanceOf[LocalRelation]

  test("global count/min/max over declared planes collapse to a " +
    "LocalRelation whose answer equals the scan's") {
    val tmp = Files.createTempDirectory("metarw")
    try {
      val p = tmp.resolve("t").toString
      spark.range(0, 1000).select(col("id").as("k"),
          (col("id") % 7).as("v"))
        .repartition(4).write.parquet(p)
      Sidecars.declare(spark, p, Seq(Sidecars.Stats("k"), Sidecars.Counts))
      MetadataRewrite.ensureInstalled(spark)
      val q = spark.read.parquet(p).agg(count(lit(1)).as("c"),
        min("k").as("mn"), max("k").as("mx"))
      assert(isLocal(q), "the eligible aggregate must rewrite")
      assert(q.collect().head.toSeq == Seq(1000L, 0L, 999L))
      // count-only and min-only shapes rewrite too
      val c = spark.read.parquet(p).agg(count(lit(1)).as("c"))
      assert(isLocal(c) && c.collect().head.getLong(0) == 1000L)
      // a partitioned table with ONLY the counts plane serves count(*)
      val pp = tmp.resolve("part").toString
      spark.range(0, 90).select(col("id").as("k"), (col("id") % 3).as("g"))
        .write.partitionBy("g").parquet(pp)
      Sidecars.declare(spark, pp, Seq(Sidecars.Counts))
      val pc = spark.read.parquet(pp).agg(count(lit(1)).as("c"))
      assert(isLocal(pc) && pc.collect().head.getLong(0) == 90L)
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("D236 histogram plane: GROUP BY counts and filtered counts " +
    "collapse to LocalRelation (null group included); other filters " +
    "and grouped aggregates keep the scan") {
    val tmp = Files.createTempDirectory("metarw_hist")
    try {
      val p = tmp.resolve("t").toString
      spark.range(0, 900).select(col("id").as("k"),
          when(col("id") % 9 === 0, lit(null))
            .otherwise(concat(lit("g"), col("id") % 4)).as("g"))
        .repartition(3).write.parquet(p)
      graft.sink.Sidecars.declare(spark, p,
        Seq(graft.sink.Sidecars.Hist("g", maxDistinct = 8)))
      MetadataRewrite.ensureInstalled(spark)
      def t = spark.read.parquet(p)
      val grouped = t.groupBy("g").agg(count(lit(1)).as("n"))
      assert(isLocal(grouped), "grouped counts must rewrite")
      val scan = t.groupBy("g").agg(count(lit(1)).as("n"))
        .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
      val got = grouped.collect()
        .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
      assert(got == scan && got.contains(None),
        s"rewritten groups must equal the scan incl. the NULL group")
      val filtered = t.filter(col("g") === "g2").agg(count(lit(1)).as("n"))
      assert(isLocal(filtered))
      assert(filtered.collect().head.getLong(0) == scan(Some("g2")))
      val missing = t.filter(col("g") === "zz").agg(count(lit(1)).as("n"))
      assert(isLocal(missing) && missing.collect().head.getLong(0) == 0L)
      // a range filter / a non-count aggregate / grouping by another
      // column: the histogram cannot serve — scan stays
      assert(!isLocal(t.filter(col("k") > 10).agg(count(lit(1)).as("n"))))
      assert(!isLocal(t.groupBy("g").agg(sum("k").as("s"))))
      assert(!isLocal(t.groupBy("k").agg(count(lit(1)).as("n"))))
      // an EXTRA predicate next to the equality: the histogram cannot
      // see it — serving would overcount, the scan must stay (and the
      // scan's answer is the filtered truth)
      val multi = t.filter(col("g") === "g2" && col("k") > 400)
        .agg(count(lit(1)).as("n"))
      assert(!isLocal(multi), "a second conjunct must stand down")
      assert(multi.collect().head.getLong(0) ==
        t.filter(col("g") === "g2" && col("k") > 400).count())
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("D240: GROUP BY the first partition column of a Counts-declared " +
    "partitioned layout serves from per-partition counts; escaped " +
    "values, other columns and staleness keep the scan") {
    val tmp = Files.createTempDirectory("metarw_part")
    try {
      val p = tmp.resolve("t").toString
      spark.range(0, 600).select(col("id").as("k"),
          when(col("id") % 5 === 0, lit(null))
            .otherwise(concat(lit("g"), col("id") % 3)).as("g"))
        .write.partitionBy("g").parquet(p)
      graft.sink.Sidecars.declare(spark, p,
        Seq(graft.sink.Sidecars.Counts))
      MetadataRewrite.ensureInstalled(spark)
      def t = spark.read.parquet(p)
      val grouped = t.groupBy("g").agg(count(lit(1)).as("n"))
      assert(isLocal(grouped), "partition-grouped counts must rewrite")
      val scan = t.groupBy("g").agg(count(lit(1)).as("n")).collect()
        .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
      val got = grouped.collect()
        .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
      assert(got == scan && got.contains(None),
        s"must equal the scan incl. the NULL partition ($got vs $scan)")
      // grouping by a NON-partition column: nothing can serve
      assert(!isLocal(t.groupBy("k").agg(count(lit(1)).as("n"))))
      // a percent-escaped partition value: decoding is Spark-private,
      // the rewrite must stand down rather than serve a wrong string
      val esc = tmp.resolve("esc").toString
      spark.range(0, 10).select(col("id").as("k"), lit("x:y").as("g"))
        .write.partitionBy("g").parquet(esc)
      graft.sink.Sidecars.declare(spark, esc,
        Seq(graft.sink.Sidecars.Counts))
      val eg = spark.read.parquet(esc).groupBy("g")
        .agg(count(lit(1)).as("n"))
      assert(!isLocal(eg), "an escaped partition dir must stand down")
      assert(eg.collect().head.getString(0) == "x:y")
      // staleness: a file smuggled into one partition dir
      val sub = StageWriter.listDataFiles(
        tmp.resolve("t").resolve("g=g1")).head
      Files.copy(sub, sub.getParent.resolve("zz_foreign.parquet"))
      assert(!isLocal(t.groupBy("g").agg(count(lit(1)).as("n"))))
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("FILTER-clause aggregates never rewrite: the sidecars describe " +
    "the whole table, a filtered count/min/max aggregates a subset") {
    val tmp = Files.createTempDirectory("metarw_filter")
    try {
      val p = tmp.resolve("t").toString
      spark.range(0, 400).select(col("id").as("k"),
          concat(lit("h"), col("id") % 3).as("h"))
        .repartition(2).write.parquet(p)
      graft.sink.Sidecars.declare(spark, p, Seq(
        graft.sink.Sidecars.Stats("k"), graft.sink.Sidecars.Counts,
        graft.sink.Sidecars.Hist("h", maxDistinct = 8)))
      MetadataRewrite.ensureInstalled(spark)
      def t = spark.read.parquet(p)
      // sanity: the plain shapes DO rewrite on this fixture
      assert(isLocal(t.agg(count(lit(1)).as("c"))))
      assert(isLocal(t.groupBy("h").agg(count(lit(1)).as("n"))))
      // count(*)/min/max FILTER (WHERE ...) — SQL route (the DataFrame
      // API has no FILTER clause): must keep the scan and answer the
      // filtered truth, never the whole-table sidecar value
      t.createOrReplaceTempView("mrw_t")
      val fc = spark.sql(
        "SELECT count(*) FILTER (WHERE k > 100) AS c FROM mrw_t")
      assert(!isLocal(fc), "a FILTER-clause count must not rewrite")
      assert(fc.collect().head.getLong(0) == 299L)
      val fm = spark.sql(
        "SELECT min(k) FILTER (WHERE k > 100) AS mn FROM mrw_t")
      assert(!isLocal(fm) && fm.collect().head.getLong(0) == 101L)
      val fg = spark.sql("SELECT h, count(*) FILTER (WHERE k > 100) " +
        "AS n FROM mrw_t GROUP BY h")
      assert(!isLocal(fg), "a FILTER-clause grouped count must not " +
        "rewrite off the histogram")
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("disqualifiers keep the scan: filter, grouping, unsupported " +
    "aggregate, non-stats column, undeclared table, stale inventory") {
    val tmp = Files.createTempDirectory("metarw_neg")
    try {
      val p = tmp.resolve("t").toString
      spark.range(0, 500).select(col("id").as("k"), (col("id") % 7).as("v"))
        .repartition(2).write.parquet(p)
      Sidecars.declare(spark, p, Seq(Sidecars.Stats("k"), Sidecars.Counts))
      MetadataRewrite.ensureInstalled(spark)
      def t = spark.read.parquet(p)
      // a filter under the aggregate: sidecars describe the whole table
      val f = t.filter(col("k") > 100).agg(count(lit(1)).as("c"))
      assert(!isLocal(f) && f.collect().head.getLong(0) == 399L)
      // grouping
      val g = t.groupBy("v").agg(count(lit(1)).as("c"))
      assert(!isLocal(g) && g.count() == 7L)
      // an aggregate the planes cannot serve poisons the WHOLE node
      // (all-or-nothing — no partial rewrite)
      val s = t.agg(count(lit(1)).as("c"), sum("v").as("s"))
      assert(!isLocal(s))
      assert(s.collect().head.toSeq(0) == 500L)
      // min/max of a column the stats plane does not describe
      val nv = t.agg(min("v").as("mn"))
      assert(!isLocal(nv) && nv.collect().head.getLong(0) == 0L)
      // an undeclared table never rewrites (and never pays a listing)
      val u = tmp.resolve("u").toString
      spark.range(10).toDF("k").write.parquet(u)
      val uq = spark.read.parquet(u).agg(count(lit(1)).as("c"))
      assert(!isLocal(uq) && uq.collect().head.getLong(0) == 10L)
      // stale inventory: the same eligible query stands down and the
      // scan sees the smuggled rows
      val q0 = t.agg(count(lit(1)).as("c"))
      assert(isLocal(q0))
      val file = StageWriter.listDataFiles(tmp.resolve("t")).head
      Files.copy(file, file.getParent.resolve("zz_foreign.parquet"))
      val q1 = spark.read.parquet(p).agg(count(lit(1)).as("c"))
      assert(!isLocal(q1), "stale planes must keep the scan")
      assert(q1.collect().head.getLong(0) > 500L)
    } finally StageWriter.deleteRecursively(tmp)
  }
}
