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

  // DURABLE registry (round 10): the Lake Formation analog keeps tags in
  // a service that survives every process; the parquet-fallback answer is
  // a per-table sidecar (`path.__tags__` / `path.__rowpolicies__`, the
  // `__checks__` dialect) — every declaration writes through to disk, so
  // a restart or a SECOND writer process sees the same governance plane.
  // The TrieMaps are rehydrate-on-miss caches, never the source of truth;
  // concurrent cross-process RE-tagging of one table follows the same
  // single-catalog-writer-per-table discipline as `__checks__`.
  private val registry =
    scala.collection.concurrent.TrieMap[String, Map[String, Set[String]]]()
  // row policies: table → (profile name → SQL boolean over the RAW table).
  // TWO planes with distinct PROVENANCE: the EXPLICIT plane is what an
  // operator declared with tagRows; the AUTO plane is what the pipeline
  // last derived through rename propagation. Keeping them separate is
  // what makes re-runs sound — the pipeline REPLACES the auto plane
  // wholesale (stale derivations cannot linger) and its fail-closed
  // cover check consults only genuine operator declarations (an
  // auto-propagated predicate must never masquerade as explicit cover
  // for a policy that later stands down). Read-time they AND.
  private val rowPolicies =
    scala.collection.concurrent.TrieMap[String, Map[String, String]]()
  private val autoRowPolicies =
    scala.collection.concurrent.TrieMap[String, Map[String, String]]()

  private def norm(p: String) = Paths.get(p).toAbsolutePath.toString
  private def tagsFile(n: String) = Paths.get(n + ".__tags__")
  private def policiesFile(n: String) = Paths.get(n + ".__rowpolicies__")
  private def autoPoliciesFile(n: String) =
    Paths.get(n + ".__rowpolicies_auto__")
  private def stagedAutoPoliciesFile(n: String) =
    Paths.get(n + ".__rowpolicies_auto_staged__")

  /** Drop every in-memory cache entry (the restart simulation used by
    * specs and gates — durable state on disk is untouched and must
    * rehydrate the same governance plane). */
  def resetMemory(): Unit = {
    registry.clear(); rowPolicies.clear(); autoRowPolicies.clear()
  }

  /** Attach column → tag for the table at `path` (replaces previous
    * tags — re-tag on schema evolution, like the crawler re-attaches). */
  def tagTable(path: String, tags: Map[String, String]): Unit =
    tagColumns(path, tags.map { case (c, t) => c -> Set(t) })

  /** Multi-tag form: a column may carry SEVERAL tags — derived columns
    * inherit every contributing source tag ([[propagateTags]]) and the
    * profile's MOST RESTRICTIVE earned action wins at read time. */
  def tagColumns(path: String, tags: Map[String, Set[String]]): Unit = {
    require(tags.nonEmpty && tags.values.forall(_.nonEmpty),
      "tag at least one column, every set non-empty")
    val n = norm(path)
    graft.state.TabSidecar.write(tagsFile(n),
      tags.toSeq.sortBy(_._1).map { case (c, ts) =>
        (graft.state.TabSidecar.requireCell(c, "column") +:
          ts.toSeq.sorted.map(
            graft.state.TabSidecar.requireCell(_, "tag"))).mkString("\t")
      })
    registry.put(n, tags); ()
  }

  def tagsOf(path: String): Map[String, Set[String]] = {
    val n = norm(path)
    registry.getOrElse(n, {
      val loaded = graft.state.TabSidecar.read(tagsFile(n)).flatMap { l =>
        l.split("\t").toSeq match {
          case c +: ts if ts.nonEmpty => Some(c -> ts.toSet)
          case _ => None
        }
      }.toMap
      if (loaded.nonEmpty) registry.put(n, loaded)
      loaded
    })
  }

  def untagTable(path: String): Unit = {
    val n = norm(path)
    graft.state.TabSidecar.delete(tagsFile(n))
    graft.state.TabSidecar.delete(policiesFile(n))
    graft.state.TabSidecar.delete(autoPoliciesFile(n))
    graft.state.TabSidecar.delete(stagedAutoPoliciesFile(n))
    registry.remove(n); rowPolicies.remove(n)
    autoRowPolicies.remove(n); ()
  }

  /** Attach ROW policies (D193, the Lake Formation data-cells-filter
    * analog): per profile NAME, a SQL boolean over the RAW table that
    * restricts which rows that profile may see. Policies RESTRICT — a
    * profile without one sees every row the column plane allows (the
    * LF row-filter semantic; the column plane stays default-closed).
    * The predicate evaluates BEFORE column shaping, so it may filter on
    * columns the profile afterwards loses (a region gate on a column
    * the reader never sees — exactly how LF filters behave). */
  def tagRows(path: String, policies: Map[String, String]): Unit =
    writePolicies(policiesFile(norm(path)), rowPolicies, norm(path),
      policies)

  /** The pipeline-derived (AUTO) policy plane — REPLACE semantics per
    * run; never written by operators. An operator's [[tagRows]] cannot
    * wipe it (the two planes are separate sidecars), so updating one
    * explicit policy leaves every propagated restriction standing. */
  private[graft] def tagRowsAuto(path: String,
      policies: Map[String, String]): Unit =
    writePolicies(autoPoliciesFile(norm(path)), autoRowPolicies,
      norm(path), policies)

  /** Drop the auto plane (a re-run whose source is no longer policied,
    * or whose policies all stand down behind explicit cover, must not
    * leave a stale derivation behind). */
  private[graft] def clearAutoRows(path: String): Unit = {
    val n = norm(path)
    graft.state.TabSidecar.delete(autoPoliciesFile(n))
    autoRowPolicies.remove(n); ()
  }

  /** Stage the NEXT run's auto plane without making it live (two-phase
    * flip for the pipeline's policy-then-data ordering problem): the
    * staged sidecar is written BEFORE the stage data write and
    * [[promoteAutoRows]] flips it live atomically AFTER the write
    * succeeds. Neither ordering of a two-resource update is safe by
    * itself — tag-then-write leaves OLD data under NEW (possibly
    * loosened) policies across a crash; write-then-tag leaves NEW data
    * under OLD (possibly loosened-relative-to-tightened) policies — so
    * [[autoRowPoliciesOf]] detects a leftover staged sidecar (the crash
    * window) and ANDs BOTH planes: policies only restrict, so the
    * window is fail-closed in both directions, and the next successful
    * run repairs it. An EMPTY staged plane (unpolicied source, or every
    * policy stood down behind explicit cover) promotes to a delete of
    * the live plane — a stale derivation must not linger. */
  private[graft] def stageAutoRows(path: String,
      policies: Map[String, String]): Unit = {
    val n = norm(path)
    // the staged sidecar lands BEFORE the data write, so on a first run
    // the table's parent directory may not exist yet
    val parent = stagedAutoPoliciesFile(n).toAbsolutePath.getParent
    if (parent != null) java.nio.file.Files.createDirectories(parent)
    graft.state.TabSidecar.write(stagedAutoPoliciesFile(n),
      policies.toSeq.sortBy(_._1).map { case (prof, sql) =>
        graft.state.TabSidecar.requireCell(prof, "profile") + "\t" +
          graft.state.TabSidecar.requireCell(sql, "policy SQL")
      })
  }

  /** Flip a [[stageAutoRows]] plane live (one atomic rename — readers
    * never observe a torn flip). No-op when nothing is staged. */
  private[graft] def promoteAutoRows(path: String): Unit = {
    val n = norm(path)
    val staged = stagedAutoPoliciesFile(n)
    if (!java.nio.file.Files.isRegularFile(staged)) return
    val pols = parsePolicies(graft.state.TabSidecar.read(staged))
    if (pols.isEmpty) {
      graft.state.TabSidecar.delete(autoPoliciesFile(n))
      graft.state.TabSidecar.delete(staged)
      autoRowPolicies.remove(n); ()
    } else {
      java.nio.file.Files.move(staged, autoPoliciesFile(n),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      autoRowPolicies.put(n, pols); ()
    }
  }

  private def writePolicies(file: java.nio.file.Path,
      cache: scala.collection.concurrent.TrieMap[String, Map[String, String]],
      n: String, policies: Map[String, String]): Unit = {
    require(policies.nonEmpty, "attach at least one row policy")
    graft.state.TabSidecar.write(file,
      policies.toSeq.sortBy(_._1).map { case (prof, sql) =>
        graft.state.TabSidecar.requireCell(prof, "profile") + "\t" +
          graft.state.TabSidecar.requireCell(sql, "policy SQL")
      })
    cache.put(n, policies); ()
  }

  def rowPoliciesOf(path: String): Map[String, String] =
    readPolicies(policiesFile(norm(path)), rowPolicies, norm(path))

  /** The AUTO plane's current derivations (empty when none). A leftover
    * STAGED sidecar means a crash landed between the data write and the
    * [[promoteAutoRows]] flip — reads inside that window AND the live
    * and staged planes per profile (most restrictive wins, both
    * directions fail-closed) and are never cached (the next successful
    * run resolves the window). */
  def autoRowPoliciesOf(path: String): Map[String, String] = {
    val n = norm(path)
    val staged = stagedAutoPoliciesFile(n)
    if (java.nio.file.Files.isRegularFile(staged)) {
      val live = parsePolicies(
        graft.state.TabSidecar.read(autoPoliciesFile(n)))
      val next = parsePolicies(graft.state.TabSidecar.read(staged))
      (live.keySet ++ next.keySet).iterator.map { prof =>
        (live.get(prof), next.get(prof)) match {
          case (Some(a), Some(b)) if a != b => prof -> s"($a) AND ($b)"
          case (a, b) => prof -> a.orElse(b).get
        }
      }.toMap
    } else readPolicies(autoPoliciesFile(n), autoRowPolicies, n)
  }

  private def parsePolicies(lines: Seq[String]): Map[String, String] =
    lines.flatMap { l =>
      l.split("\t", 2) match {
        case Array(prof, sql) => Some(prof -> sql)
        case _ => None
      }
    }.toMap

  private def readPolicies(file: java.nio.file.Path,
      cache: scala.collection.concurrent.TrieMap[String, Map[String, String]],
      n: String): Map[String, String] =
    cache.getOrElse(n, {
      val loaded = parsePolicies(graft.state.TabSidecar.read(file))
      if (loaded.nonEmpty) cache.put(n, loaded)
      loaded
    })

  /** The table as `profile` may see it. Untagged table → every column
    * denied (an empty projection is refused loudly instead — a
    * governance read of an ungoverned table is a config error, not an
    * empty frame).
    *
    * VERSIONED tables compose (round 10): tags key by the table ROOT —
    * the reference grants act on catalog TABLES independent of storage
    * layout (`crawler_stage.py:233-264`) — so when `path` is a
    * [[graft.sink.VersionedTable]] root (it carries a `_latest`
    * pointer) the read routes through `VersionedTable.read`, honoring
    * `asOf` time travel; tags survive every commit without
    * re-attachment. `asOf` on a plain parquet table is refused (there
    * is no version to travel to). */
  def taggedView(spark: SparkSession, path: String,
      profile: Profile, asOf: Option[Int] = None): DataFrame = {
    val tags = tagsOf(path)
    require(tags.nonEmpty,
      s"$path carries no access tags — tagTable() it before governed reads")
    val versioned = java.nio.file.Files.exists(
      Paths.get(path).resolve("_latest"))
    require(asOf.isEmpty || versioned,
      s"asOf=$asOf on $path, which is not a versioned table root")
    val raw =
      if (versioned) graft.sink.VersionedTable.read(spark, path, asOf)
      else spark.read.parquet(path)
    // row policies first (on the RAW frame — they may reference columns
    // the profile loses below); the EXPLICIT and AUTO planes AND (most
    // restrictive wins); no policy in either plane → unrestricted
    val df = (rowPoliciesOf(path).get(profile.name).toSeq ++
      autoRowPoliciesOf(path).get(profile.name).toSeq)
      .foldLeft(raw)((d, p) => d.filter(expr(p)))
    // multi-tag resolution: the MOST RESTRICTIVE action among the
    // column's tags wins (Deny > Tokenize > Redact > Open); a tag the
    // profile has no action for resolves to Deny — default closed
    def rank(a: Action): Int = a match {
      case Deny => 3; case Tokenize => 2; case Redact => 1; case Open => 0
    }
    val kept: Seq[Column] = df.schema.fields.toSeq.flatMap { f =>
      val action = tags.get(f.name).map(_.map(t =>
        profile.actions.getOrElse(t, Deny)).maxBy(rank))
      action match {
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

  /** Tag PROPAGATION through column lineage (SURVEY §2D, D196) — the
    * laundering hole every static tag registry has: `SELECT user_id AS
    * uid FROM governed` produces an untagged table, and the copy walks
    * out the door. Here the DERIVED table's columns inherit the UNION
    * of every tag carried by the source columns they derive from
    * ([[graft.plans.Lineage]] value lineage, so join keys taint
    * nothing), and [[taggedView]]'s most-restrictive-action resolution
    * makes a column mixing a PII source with an open one read as PII.
    * Columns derived from NO governed source (literals, untagged
    * inputs) inherit nothing and stay default-closed. Registers the
    * inherited tags for `outPath` and returns them. */
  def propagateTags(df: DataFrame, outPath: String)
      : Map[String, Set[String]] = {
    val inherited = inheritedTags(df)
    require(inherited.nonEmpty,
      "no governed source column reaches this frame's output — " +
        "propagation would register an empty tag set (tag it explicitly)")
    tagColumns(outPath, inherited)
    inherited
  }

  /** Row-policy propagation through PURE renames (D193 composing with
    * D200): a raw table's row policy is a SQL boolean over RAW column
    * names; when every column it references passes to `df`'s output
    * through a 1:1 rename ([[graft.plans.Lineage.renamesOf]] — values
    * unchanged, so the predicate keeps its exact meaning), the
    * predicate rewrites through the rename map and can attach to the
    * derived table. A policy referencing any EXPRESSION-DERIVED column
    * (trimmed, cast to a different type, case-mapped) stands down:
    * rewriting it would silently change what it filters.
    *
    * Predicates may qualify columns with the raw table's basename
    * (`t.col` where `t` names the raw table): the qualifier resolves to
    * the same rename map. Any OTHER qualifier stands down. And the plan
    * must scan the raw path EXACTLY ONCE — a self-join combines two
    * source rows per output row, so a predicate rewritten onto one
    * side's renames leaves the other side's contribution unfiltered;
    * every policy stands down on a multi-scan plan (see the unique-scan
    * gate in the body).
    *
    * Returns (propagated: profile → rewritten SQL, stoodDown: profile →
    * original SQL). Registers nothing — the caller owns merge/refusal
    * semantics (the pipeline refuses fail-closed when a stood-down
    * policy has no explicit stage cover). Unparsable policies stand
    * down too (they would refuse at read time; propagation must not
    * guess). */
  def rewriteRowPolicies(df: DataFrame, rawPath: String)
      : (Map[String, String], Map[String, String]) = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    val nraw = norm(rawPath)
    // UNIQUE-SCAN safety gate: a plan scanning the policied path more
    // than once (self-join) combines TWO source rows per output row;
    // rewriting a predicate onto one side's renamed columns leaves the
    // other side's contribution unfiltered, so restricted values leak
    // through the un-rewritten side's columns — renamed OR computed.
    // Requiring a single scan of the whole path is deliberately
    // stronger than requiring per-referenced-column scan uniqueness:
    // the second scan leaks even when the policy's own columns rename
    // only from the first. Every policy stands down (fail-closed: the
    // pipeline refuses without explicit stage cover).
    val scanCount = graft.plans.Lineage.scanPaths(df)
      .count(p => norm(p) == nraw)
    val rev: Map[String, String] =
      if (scanCount > 1) Map.empty
      else graft.plans.Lineage.renamesOf(df).toSeq
        .filter { case (_, (p, _)) => norm(p) == nraw }
        .groupBy(_._2._2)
        // a raw column renamed to several outputs (of the ONE scan)
        // picks the first by name — identical values, any choice
        // preserves the predicate's meaning
        .map { case (rawCol, outs) => rawCol -> outs.map(_._1).min }
    // qualified references: `t.col` resolves iff the qualifier is the
    // raw table's basename (the only table a RAW row policy can mean);
    // any other qualifier stands down
    val rawBase = nraw.split('/').last.stripSuffix(".parquet")
    def resolve(u: UnresolvedAttribute): Option[String] =
      u.nameParts match {
        case Seq(c) if rev.contains(c) => Some(c)
        case Seq(q, c) if q.equalsIgnoreCase(rawBase) &&
          rev.contains(c) => Some(c)
        case _ => None
      }
    val results = rowPoliciesOf(rawPath).map { case (prof, sql) =>
      val rewritten = scala.util.Try {
        val e = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
          .parseExpression(sql)
        val refs = e.collect { case u: UnresolvedAttribute => u }
        // zero references (a constant gate like '1 = 0') is
        // rename-invariant by definition: propagate verbatim
        if (refs.isEmpty) Some(sql)
        else if (!refs.forall(u => resolve(u).isDefined)) None
        else Some(e.transform {
          case u: UnresolvedAttribute =>
            UnresolvedAttribute(Seq(rev(resolve(u).get)))
        }.sql)
      }.toOption.flatten
      (prof, sql, rewritten)
    }
    (results.collect { case (p, _, Some(r)) => p -> r }.toMap,
      results.collect { case (p, s, None) => p -> s }.toMap)
  }

  /** The tags `df`'s output columns inherit from their governed source
    * columns (possibly empty) — the non-registering, non-refusing core
    * of [[propagateTags]], for callers like the pipeline's automatic
    * inheritance that tag only when something is actually inherited. */
  def inheritedTags(df: DataFrame): Map[String, Set[String]] =
    graft.plans.Lineage.ofPaths(df)
      .flatMap { case (out, srcPath, srcCol) =>
        tagsOf(srcPath).getOrElse(srcCol, Set.empty).map(out -> _)
      }
      .groupBy(_._1).map { case (o, ts) => o -> ts.map(_._2).toSet }
}
