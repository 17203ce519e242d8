package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** D191 — access-tag governance: untagged columns (including ones that
  * APPEAR after tagging) default closed, unearned tags drop, tokens
  * join across governed surfaces, ungoverned reads refuse loudly. */
class AccessTagsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture(): (java.nio.file.Path, String) = {
    val tmp = Files.createTempDirectory("tags")
    val p = tmp.resolve("t").toString
    Seq((1L, "alice@x.com calls 1234567", "us", 10L),
      (2L, "plain words", "eu", 20L))
      .toDF("uid", "note", "region", "score").write.parquet(p)
    AccessTags.tagTable(p, Map("uid" -> "id", "note" -> "freetext",
      "region" -> "meta", "score" -> "meta"))
    (tmp, p)
  }

  test("a column appearing AFTER tagging is closed for every profile; " +
    "unearned tags drop; redaction and tokens apply") {
    val (tmp, p) = fixture()
    try {
      val full = AccessTags.Profile("full", Map(
        "id" -> AccessTags.Tokenize, "freetext" -> AccessTags.Redact,
        "meta" -> AccessTags.Open), key = "k1")
      val narrow = AccessTags.Profile("narrow",
        Map("meta" -> AccessTags.Open))
      assert(AccessTags.taggedView(spark, p, full).columns.toSet ==
        Set("uid", "note", "region", "score"))
      assert(AccessTags.taggedView(spark, p, narrow).columns.toSet ==
        Set("region", "score"), "unearned tags must drop")
      // schema drift: a NEW column lands (append with evolution)
      spark.read.parquet(p)
        .withColumn("ssn", concat(col("uid"), lit("-77990011")))
        .write.mode("overwrite").parquet(p + "2")
      AccessTags.tagColumns(p + "2", AccessTags.tagsOf(p)) // same tags
      val v = AccessTags.taggedView(spark, p + "2", full)
      assert(!v.columns.contains("ssn"),
        "an untagged new column must NEVER leak through the view")
      // redaction applied; token joins the D153 pseudonymize surface
      val note = v.filter(col("region") === "us")
        .select("note").as[String].head()
      assert(note == "<EMAIL> calls <NUM>", s"got $note")
      val tok = v.filter(col("region") === "us")
        .select("uid").as[String].head()
      val expected = graft.llm.Privacy.pseudonymize(
        Seq("1").toDF("uid"), Seq("uid"), "k1")
        .select("uid").as[String].head()
      assert(tok == expected,
        "tag-view tokens must join D153 pseudonymized releases")
    } finally {
      AccessTags.untagTable(p); AccessTags.untagTable(p + "2")
      graft.sink.StageWriter.deleteRecursively(tmp)
    }
  }

  test("row policies restrict per profile, filter on columns the " +
    "profile loses, and an un-policied profile keeps every row") {
    val (tmp, p) = fixture()
    try {
      AccessTags.tagRows(p, Map("narrow" -> "region = 'us'"))
      val narrow = AccessTags.Profile("narrow",
        Map("meta" -> AccessTags.Open))
      val full = AccessTags.Profile("full", Map(
        "id" -> AccessTags.Open, "freetext" -> AccessTags.Open,
        "meta" -> AccessTags.Open))
      val nv = AccessTags.taggedView(spark, p, narrow)
      assert(nv.count() == 1 &&
        nv.select("score").as[Long].head() == 10L,
        "the policy must restrict the narrow profile's rows")
      assert(AccessTags.taggedView(spark, p, full).count() == 2,
        "a profile without a policy sees every row")
      // the policy column can be one the profile never sees
      AccessTags.tagRows(p, Map("narrow" -> "uid = 2"))
      val v2 = AccessTags.taggedView(spark, p, narrow)
      assert(!v2.columns.contains("uid") &&
        v2.select("region").as[String].head() == "eu",
        "filtering on a closed column must still work (LF semantics)")
    } finally {
      AccessTags.untagTable(p)
      graft.sink.StageWriter.deleteRecursively(tmp)
    }
  }

  test("explicit and AUTO policy planes stay separate: tagRows never " +
    "wipes a propagated derivation, reads AND the planes, and the " +
    "auto plane is durable") {
    val (tmp, p) = fixture()
    try {
      val narrow = AccessTags.Profile("narrow",
        Map("meta" -> AccessTags.Open))
      AccessTags.tagRows(p, Map("narrow" -> "region = 'us'"))
      AccessTags.tagRowsAuto(p, Map("narrow" -> "score <= 15"))
      // read ANDs the planes: us AND score<=15 → exactly row uid=1
      assert(AccessTags.taggedView(spark, p, narrow).count() == 1)
      // an operator updating the EXPLICIT plane must not wipe the auto
      // derivation (separate sidecars)
      AccessTags.tagRows(p, Map("narrow" -> "region IN ('us','eu')"))
      assert(AccessTags.autoRowPoliciesOf(p) ==
        Map("narrow" -> "score <= 15"),
        "tagRows wiped the auto plane")
      assert(AccessTags.taggedView(spark, p, narrow).count() == 1,
        "the AND of both planes must keep restricting")
      // durability: the auto plane rehydrates from its sidecar
      AccessTags.resetMemory()
      assert(AccessTags.autoRowPoliciesOf(p) ==
        Map("narrow" -> "score <= 15"))
      // clearing removes it everywhere
      AccessTags.clearAutoRows(p)
      AccessTags.resetMemory()
      assert(AccessTags.autoRowPoliciesOf(p).isEmpty &&
        AccessTags.taggedView(spark, p, narrow).count() == 2)
    } finally {
      AccessTags.untagTable(p)
      graft.sink.StageWriter.deleteRecursively(tmp)
    }
  }

  test("two-phase auto-plane flip: a staged plane is invisible until " +
    "promoted except inside the crash window, where reads AND both " +
    "planes (fail-closed in both directions)") {
    val (tmp, p) = fixture()
    try {
      val narrow = AccessTags.Profile("narrow",
        Map("meta" -> AccessTags.Open))
      AccessTags.tagRowsAuto(p, Map("narrow" -> "region = 'us'"))
      // stage a LOOSER derivation (the raw policy was loosened between
      // runs — the exact case the old orderings leaked on)
      AccessTags.stageAutoRows(p, Map("narrow" -> "score <= 25"))
      // crash window: the staged sidecar exists, nothing promoted —
      // reads AND live and staged → us AND score<=25 → only uid=1
      assert(AccessTags.autoRowPoliciesOf(p) ==
        Map("narrow" -> "(region = 'us') AND (score <= 25)"))
      assert(AccessTags.taggedView(spark, p, narrow).count() == 1,
        "the crash window must stay fail-closed under a loosened policy")
      // promote = the data write succeeded: only the new plane governs
      AccessTags.promoteAutoRows(p)
      assert(AccessTags.autoRowPoliciesOf(p) ==
        Map("narrow" -> "score <= 25"))
      assert(AccessTags.taggedView(spark, p, narrow).count() == 2)
      // durable across restart, and a second promote is a no-op
      AccessTags.resetMemory()
      AccessTags.promoteAutoRows(p)
      assert(AccessTags.autoRowPoliciesOf(p) ==
        Map("narrow" -> "score <= 25"))
      // an EMPTY staged plane (source un-policied / all stood down)
      // promotes to a clear — no stale derivation lingers
      AccessTags.stageAutoRows(p, Map.empty)
      AccessTags.promoteAutoRows(p)
      AccessTags.resetMemory()
      assert(AccessTags.autoRowPoliciesOf(p).isEmpty)
    } finally {
      AccessTags.untagTable(p)
      graft.sink.StageWriter.deleteRecursively(tmp)
    }
  }

  test("row policies govern VERSIONED reads too: the policy keys by " +
    "the table root, filters every version, and composes with asOf") {
    val tmp = Files.createTempDirectory("tagsverpol")
    val t = tmp.resolve("vt").toString
    try {
      import graft.sink.VersionedTable
      VersionedTable.commit(Seq((1L, "us", 10L), (2L, "eu", 20L),
        (3L, "us", 30L)).toDF("uid", "region", "score"), t)
      VersionedTable.commit(Seq((1L, "us", 11L), (2L, "eu", 21L))
        .toDF("uid", "region", "score"), t)
      AccessTags.tagTable(t, Map("uid" -> "id", "region" -> "meta",
        "score" -> "meta"))
      AccessTags.tagRows(t, Map("narrow" -> "region = 'us'"))
      val narrow = AccessTags.Profile("narrow",
        Map("meta" -> AccessTags.Open))
      // head: v2 has one 'us' row; v1 had two — the SAME policy plane
      // (keyed by root) governs both without re-attachment
      assert(AccessTags.taggedView(spark, t, narrow).count() == 1)
      val v1 = AccessTags.taggedView(spark, t, narrow, asOf = Some(1))
      assert(v1.count() == 2 &&
        v1.select("score").as[Long].collect().sorted.toSeq == Seq(10L, 30L),
        "time travel must read through the same row policy")
    } finally {
      AccessTags.untagTable(t)
      graft.sink.StageWriter.deleteRecursively(tmp)
    }
  }

  test("propagateTags: derived columns inherit source tags through " +
    "lineage, mixed columns read most-restrictively, literals stay " +
    "closed, ungoverned frames refuse") {
    val (tmp, p) = fixture()
    try {
      val d = spark.read.parquet(p)
        .select(col("uid").as("renamed"),
          concat(col("uid"), lit("@"), col("region")).as("mixed"),
          lit(1L).as("konst"))
      val out = tmp.resolve("derived").toString
      d.write.parquet(out)
      val inherited = AccessTags.propagateTags(d, out)
      assert(inherited == Map("renamed" -> Set("id"),
        "mixed" -> Set("id", "meta")))
      val v = AccessTags.taggedView(spark, out, AccessTags.Profile(
        "a", Map("id" -> AccessTags.Tokenize, "meta" -> AccessTags.Open),
        key = "k9"))
      assert(v.columns.toSet == Set("renamed", "mixed"),
        "the literal column must stay closed")
      assert(v.filter(!col("mixed").rlike("^[0-9a-f]{64}$")).isEmpty,
        "id+meta mixture must resolve to Tokenize (most restrictive)")
      // a frame touching NO governed column refuses propagation
      val ungoverned = spark.range(3).select(lit("c").as("c"))
      intercept[IllegalArgumentException] {
        AccessTags.propagateTags(ungoverned,
          tmp.resolve("nope").toString)
      }
    } finally {
      AccessTags.untagTable(p)
      AccessTags.untagTable(tmp.resolve("derived").toString)
      graft.sink.StageWriter.deleteRecursively(tmp)
    }
  }

  test("ungoverned or fully-denied reads refuse loudly, never an " +
    "empty frame") {
    val (tmp, p) = fixture()
    try {
      val none = AccessTags.Profile("none", Map.empty)
      val e1 = intercept[IllegalArgumentException] {
        AccessTags.taggedView(spark, p, none)
      }
      assert(e1.getMessage.contains("no column"))
      AccessTags.untagTable(p)
      val e2 = intercept[IllegalArgumentException] {
        AccessTags.taggedView(spark, p,
          AccessTags.Profile("x", Map("meta" -> AccessTags.Open)))
      }
      assert(e2.getMessage.contains("no access tags"))
    } finally graft.sink.StageWriter.deleteRecursively(tmp)
  }

  test("durability: tags + row policies rehydrate from sidecars after a " +
    "simulated restart; a 'second process' sees them via the files alone") {
    val (tmp, p) = fixture()
    try {
      AccessTags.tagRows(p, Map("analyst" -> "region = 'us'"))
      val prof = AccessTags.Profile("analyst", Map(
        "id" -> AccessTags.Tokenize, "freetext" -> AccessTags.Redact,
        "meta" -> AccessTags.Open), key = "k1")
      val before = AccessTags.taggedView(spark, p, prof)
        .orderBy("uid").collect().toSeq
      AccessTags.resetMemory() // the restart
      assert(AccessTags.tagsOf(p).nonEmpty &&
        AccessTags.rowPoliciesOf(p) == Map("analyst" -> "region = 'us'"),
        "declarations must rehydrate from disk")
      val after = AccessTags.taggedView(spark, p, prof)
        .orderBy("uid").collect().toSeq
      assert(after == before, "the rehydrated view must be identical")
      assert(after.size == 1, "the row policy must survive the restart")
      // a second process sees ONLY the files: copy the sidecars to a
      // fresh table path never registered in this process
      val p2 = tmp.resolve("t_other").toString
      spark.read.parquet(p).write.parquet(p2)
      Files.copy(java.nio.file.Paths.get(p + ".__tags__"),
        java.nio.file.Paths.get(p2 + ".__tags__"))
      assert(AccessTags.tagsOf(p2) == AccessTags.tagsOf(p),
        "the sidecar file alone must carry the governance plane")
      // untag deletes the sidecars — closed again even after restart
      AccessTags.untagTable(p)
      AccessTags.resetMemory()
      intercept[IllegalArgumentException] {
        AccessTags.taggedView(spark, p, prof)
      }
    } finally {
      AccessTags.untagTable(p)
      AccessTags.untagTable(tmp.resolve("t_other").toString)
      graft.sink.StageWriter.deleteRecursively(tmp)
    }
  }

  test("versioned tables: one tagTable at the root governs every " +
    "version, asOf composes, plain tables refuse asOf") {
    val tmp = Files.createTempDirectory("tagsv")
    val t = tmp.resolve("vt").toString
    try {
      val v1 = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
        .toDF("uid", "note", "score")
      graft.sink.VersionedTable.commit(v1, t)
      AccessTags.tagTable(t, Map("uid" -> "id", "score" -> "meta"))
      graft.sink.VersionedTable.commit(v1.filter(col("uid") =!= 2L), t)
      val prof = AccessTags.Profile("a",
        Map("id" -> AccessTags.Open, "meta" -> AccessTags.Open))
      assert(AccessTags.taggedView(spark, t, prof).count() == 2L)
      assert(AccessTags.taggedView(spark, t, prof, asOf = Some(1))
        .count() == 3L)
      assert(AccessTags.taggedView(spark, t, prof).columns.toSet ==
        Set("uid", "score"), "note stays closed on every version")
      val plain = tmp.resolve("plain").toString
      v1.write.parquet(plain)
      AccessTags.tagTable(plain, Map("uid" -> "id"))
      intercept[IllegalArgumentException] {
        AccessTags.taggedView(spark, plain, prof, asOf = Some(1))
      }
    } finally {
      AccessTags.untagTable(t)
      AccessTags.untagTable(tmp.resolve("plain").toString)
      graft.sink.StageWriter.deleteRecursively(tmp)
    }
  }
}
