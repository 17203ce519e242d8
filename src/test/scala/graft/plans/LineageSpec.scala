package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** D195 — column lineage: aliases, windows, generators, unions and
  * expand (grouping sets) all trace to their source leaves; join keys
  * and literals contribute nothing. */
class LineageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edgesOf(df: org.apache.spark.sql.DataFrame)
      : Map[String, Set[(String, String)]] =
    Lineage.of(df).groupBy(_.outCol)
      .map { case (o, es) => o -> es.map(e => (e.srcTable, e.srcCol)).toSet }

  test("alias chains, windows, explode and unions trace through; join " +
    "keys and literals contribute no edges") {
    val tmp = Files.createTempDirectory("lineage")
    try {
      val a = tmp.resolve("alpha").toString
      val b = tmp.resolve("beta").toString
      Seq((1L, 2.0, "x y")).toDF("k", "v", "words").write.parquet(a)
      Seq((1L, 5.0)).toDF("k", "w").write.parquet(b)
      val alpha = spark.read.parquet(a)
      val beta = spark.read.parquet(b)

      val joined = alpha.join(beta, "k")
        .select((col("v") * col("w")).as("vw"), col("words"))
      assert(edgesOf(joined) == Map(
        "vw" -> Set(("alpha", "v"), ("beta", "w")),
        "words" -> Set(("alpha", "words"))),
        s"got ${edgesOf(joined)}")

      val windowed = alpha.withColumn("r",
        org.apache.spark.sql.functions.sum("v").over(
          org.apache.spark.sql.expressions.Window.partitionBy("k")
            .orderBy("words")))
      // window functions: the partition/order columns are part of the
      // expression tree AND genuinely shape the value (which rows share
      // the frame), so they count — unlike join keys, which live outside
      // any output expression
      assert(edgesOf(windowed)("r") ==
        Set(("alpha", "v"), ("alpha", "k"), ("alpha", "words")))

      val exploded = alpha.select(
        explode(split(col("words"), " ")).as("tok"))
      assert(edgesOf(exploded)("tok") == Set(("alpha", "words")))

      val unioned = alpha.select(col("v").as("u"))
        .unionByName(beta.select(col("w").as("u")))
      assert(edgesOf(unioned)("u") ==
        Set(("alpha", "v"), ("beta", "w")),
        "union merges both branches' sources positionally")

      val rolled = alpha.rollup("k").agg(sum("v").as("s"))
      assert(edgesOf(rolled)("s") == Set(("alpha", "v")),
        "grouping-set Expand passes value lineage through")

      // literals and count(1): no source edges at all
      val lits = alpha.groupBy("k").agg(count(lit(1)).as("n"))
        .select(col("n"), lit("c").as("const"))
      val e = edgesOf(lits)
      assert(!e.contains("n") && !e.contains("const"))
    } finally graft.sink.StageWriter.deleteRecursively(tmp)
  }

  test("renamesOf: pure renames (incl. no-op casts through filters) " +
    "qualify; computed, re-typed, aggregated and unioned columns do not") {
    val tmp = Files.createTempDirectory("renames")
    try {
      val a = tmp.resolve("alpha").toString
      Seq((1L, "x", "2.5")).toDF("k", "s", "amt").write.parquet(a)
      val alpha = spark.read.parquet(a)
      val df = alpha.filter(col("k") > 0).select(
        col("s").as("name"),                      // pure rename
        col("s").cast("string").as("name2"),      // no-op cast: still pure
        col("amt").cast("double").as("amt_d"),    // re-typed: NOT a rename
        trim(col("s")).as("s_trim"),              // computed: NOT a rename
        col("k"))                                 // passthrough (same name)
      val r = Lineage.renamesOf(df)
      val ap = java.nio.file.Paths.get(a).toAbsolutePath.toString
      assert(r.get("name").map(_._2).contains("s") &&
        r.get("name2").map(_._2).contains("s") &&
        r.get("k").map(_._2).contains("k"), s"got $r")
      assert(r("name")._1 == ap)
      assert(!r.contains("amt_d") && !r.contains("s_trim"), s"got $r")
      // aggregation mints new attrs — never renames
      val agg = alpha.groupBy("s").agg(max("k").as("k"))
      assert(!Lineage.renamesOf(agg).contains("k"))
      // a union output is not a single source column's identity
      val un = alpha.select(col("s").as("u"))
        .unionByName(alpha.select(col("amt").as("u")))
      assert(!Lineage.renamesOf(un).contains("u"))
      // OUTER joins null-pad the non-preserved side: those columns are
      // NOT renames (values change to NULL on padded rows); the
      // preserved side keeps identity
      val b = tmp.resolve("beta").toString
      Seq((1L, "x")).toDF("k", "t").write.parquet(b)
      val beta = spark.read.parquet(b)
      val lo = alpha.join(beta, Seq("k"), "left_outer")
        .select(col("s").as("left_s"), col("t").as("right_t"))
      val rlo = Lineage.renamesOf(lo)
      assert(rlo.contains("left_s") && !rlo.contains("right_t"),
        s"left-outer: preserved side renames, padded side must not " +
          s"($rlo)")
      val fo = alpha.join(beta, Seq("k"), "full_outer")
        .select(col("s").as("fs"))
      assert(!Lineage.renamesOf(fo).contains("fs"),
        "full-outer pads both sides — nothing is a rename")
    } finally graft.sink.StageWriter.deleteRecursively(tmp)
  }

  test("rewriteRowPolicies: rename-covered predicates rewrite, " +
    "expression-derived or unparsable ones stand down") {
    import graft.sources.AccessTags
    val tmp = Files.createTempDirectory("polrw")
    try {
      val a = tmp.resolve("raw").toString
      Seq((1L, "us", "9.99")).toDF("k", "region", "amt").write.parquet(a)
      AccessTags.tagRows(a, Map(
        "narrow" -> "region = 'us' AND k > 0",
        "derived" -> "amt <> ''",
        "broken" -> "region = = 'x'",
        "locked" -> "1 = 0"))
      val raw = spark.read.parquet(a)
      val df = raw.select(col("k").as("id"), col("region").as("geo"),
        col("amt").cast("double").as("amt_d"))
      val (prop, stood) = AccessTags.rewriteRowPolicies(df, a)
      assert(prop.keySet == Set("narrow", "locked") &&
        stood.keySet == Set("derived", "broken"), s"got $prop / $stood")
      assert(prop("locked") == "1 = 0",
        "a constant (zero-reference) policy is rename-invariant and " +
          "propagates verbatim")
      // the rewritten predicate filters the DERIVED frame correctly
      assert(df.filter(expr(prop("narrow"))).count() == 1)
      assert(df.filter(expr(prop("narrow")))
        .select("geo").head().getString(0) == "us")
    } finally {
      AccessTags.untagTable(tmp.resolve("raw").toString)
      graft.sink.StageWriter.deleteRecursively(tmp)
    }
  }

  test("rewriteRowPolicies: a qualified `rawtable.col` reference " +
    "resolves through the rename map; a foreign qualifier stands down") {
    import graft.sources.AccessTags
    val tmp = Files.createTempDirectory("polqual")
    try {
      val a = tmp.resolve("raw").toString
      Seq((1L, "us"), (2L, "eu")).toDF("k", "region").write.parquet(a)
      AccessTags.tagRows(a, Map(
        "qualified" -> "raw.region = 'us' AND raw.k > 0",
        "mixed" -> "raw.region = 'us' AND k > 0",
        "foreign" -> "other.region = 'us'"))
      val raw = spark.read.parquet(a)
      val df = raw.select(col("k").as("id"), col("region").as("geo"))
      val (prop, stood) = AccessTags.rewriteRowPolicies(df, a)
      assert(prop.keySet == Set("qualified", "mixed") &&
        stood.keySet == Set("foreign"), s"got $prop / $stood")
      assert(df.filter(expr(prop("qualified"))).count() == 1)
      assert(df.filter(expr(prop("qualified")))
        .select("geo").head().getString(0) == "us",
        "the qualifier must rewrite to the BARE stage column")
    } finally {
      AccessTags.untagTable(tmp.resolve("raw").toString)
      graft.sink.StageWriter.deleteRecursively(tmp)
    }
  }

  test("rewriteRowPolicies: a plan scanning the policied path TWICE " +
    "(self-join) stands every policy down — one side's rewrite cannot " +
    "govern the other side's contribution") {
    import graft.sources.AccessTags
    val tmp = Files.createTempDirectory("polselfjoin")
    try {
      val a = tmp.resolve("raw").toString
      Seq((1L, "us", 10L), (2L, "eu", 20L))
        .toDF("k", "region", "v").write.parquet(a)
      AccessTags.tagRows(a, Map("narrow" -> "region = 'us'"))
      val raw1 = spark.read.parquet(a)
      val raw2 = spark.read.parquet(a)
      // both sides rename `region`; the single-scan rule must still
      // stand down — the rewritten predicate would filter on ONE
      // side's value while the OTHER side's restricted values (geo2,
      // v2) ride along unfiltered
      val joined = raw1.select(col("k").as("id"),
          col("region").as("geo1"))
        .join(raw2.select(col("k").as("id2"), col("region").as("geo2"),
          col("v").as("v2")), col("id") === col("id2") - 1)
      val (prop, stood) = AccessTags.rewriteRowPolicies(joined, a)
      assert(prop.isEmpty && stood.keySet == Set("narrow"),
        s"multi-scan plans must stand down every policy, got " +
          s"$prop / $stood")
      // scanPaths sees both instances
      assert(graft.plans.Lineage.scanPaths(joined)
        .count(_.endsWith("raw")) == 2)
      // a single-scan plan over the same path still propagates
      val single = raw1.select(col("k").as("id"),
        col("region").as("geo"))
      val (p2, s2) = AccessTags.rewriteRowPolicies(single, a)
      assert(p2.keySet == Set("narrow") && s2.isEmpty)
    } finally {
      AccessTags.untagTable(tmp.resolve("raw").toString)
      graft.sink.StageWriter.deleteRecursively(tmp)
    }
  }
}
