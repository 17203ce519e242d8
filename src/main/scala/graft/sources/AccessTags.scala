package graft.sources

import java.nio.file.Paths

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Access-tag governance (SURVEY §2D, D191) — the Lake Formation LF-Tag
  * analog made engine-shaped. The reference creates LF-Tags, attaches
  * them at catalog registration, and grants tag-scoped read permissions
  * (`crawler_stage.py:266-953`: create_lf_tag_if_not_exists →
  * add_lf_tags_to_database → grant_permissions_lf_tag); where Lake
  * Formation gates the CATALOG, an engine must gate the FRAME — so the
  * registry here maps (table, column) → tag, and [[taggedView]] returns
  * the table with each column transformed by what the reader's profile
  * earns for its tag:
  *
  *  - `Open` — pass through;
  *  - `Tokenize` — D153 keyed pseudonymization (joinable across
  *    releases, identifying to nobody without the key);
  *  - `Redact` — D25 pattern scrubbing for free text;
  *  - `Deny` (or no action for the tag) — column DROPPED.
  *
  * An UNTAGGED column is closed by default: schema drift (a column
  * appearing after tagging) must never leak through a governance
  * surface — the failure mode of every allow-list-by-omission. Pure
  * per-row projections (codegen'd sha2 / regexp chains): the view costs
  * what a SELECT costs, and composes with every pruning plane since the
  * scan underneath is the plain table scan. */
object AccessTags {

  sealed trait Action
  case object Open extends Action
  case object Tokenize extends Action
  case object Redact extends Action
  case object Deny extends Action

  /** What one class of reader may do per tag; `key` salts the D153
    * tokens so distinct deployments never share a pseudonym space.
    * Tags without an entry resolve to [[Deny]]. */
  final case class Profile(name: String, actions: Map[String, Action],
      key: String = "")

  private val registry =
    scala.collection.concurrent.TrieMap[String, Map[String, String]]()
  // row policies: table → (profile name → SQL boolean over the RAW table)
  private val rowPolicies =
    scala.collection.concurrent.TrieMap[String, Map[String, String]]()

  private def norm(p: String) = Paths.get(p).toAbsolutePath.toString

  /** Attach column → tag for the table at `path` (replaces previous
    * tags — re-tag on schema evolution, like the crawler re-attaches). */
  def tagTable(path: String, tags: Map[String, String]): Unit = {
    require(tags.nonEmpty, "tag at least one column")
    registry.put(norm(path), tags); ()
  }

  def tagsOf(path: String): Map[String, String] =
    registry.getOrElse(norm(path), Map.empty)

  def untagTable(path: String): Unit = {
    registry.remove(norm(path)); rowPolicies.remove(norm(path)); ()
  }

  /** Attach ROW policies (D193, the Lake Formation data-cells-filter
    * analog): per profile NAME, a SQL boolean over the RAW table that
    * restricts which rows that profile may see. Policies RESTRICT — a
    * profile without one sees every row the column plane allows (the
    * LF row-filter semantic; the column plane stays default-closed).
    * The predicate evaluates BEFORE column shaping, so it may filter on
    * columns the profile afterwards loses (a region gate on a column
    * the reader never sees — exactly how LF filters behave). */
  def tagRows(path: String, policies: Map[String, String]): Unit = {
    require(policies.nonEmpty, "attach at least one row policy")
    rowPolicies.put(norm(path), policies); ()
  }

  def rowPoliciesOf(path: String): Map[String, String] =
    rowPolicies.getOrElse(norm(path), Map.empty)

  /** The table as `profile` may see it. Untagged table → every column
    * denied (an empty projection is refused loudly instead — a
    * governance read of an ungoverned table is a config error, not an
    * empty frame). */
  def taggedView(spark: SparkSession, path: String,
      profile: Profile): DataFrame = {
    val tags = tagsOf(path)
    require(tags.nonEmpty,
      s"$path carries no access tags — tagTable() it before governed reads")
    val raw = spark.read.parquet(path)
    // row policy first (on the RAW frame — may reference columns the
    // profile loses below); no policy for this profile → unrestricted
    val df = rowPoliciesOf(path).get(profile.name)
      .map(p => raw.filter(expr(p))).getOrElse(raw)
    val kept: Seq[Column] = df.schema.fields.toSeq.flatMap { f =>
      tags.get(f.name).flatMap(profile.actions.get) match {
        case Some(Open) => Some(col(f.name))
        case Some(Tokenize) => Some(graft.llm.Privacy
          .pseudonymizeCol(col(f.name), profile.key).as(f.name))
        case Some(Redact) => Some(
          graft.llm.TextAnalysis.redact(col(f.name)).as(f.name))
        case Some(Deny) | None => None // untagged or unearned: closed
      }
    }
    require(kept.nonEmpty,
      s"profile ${profile.name} may read no column of $path")
    df.select(kept: _*)
  }
}
