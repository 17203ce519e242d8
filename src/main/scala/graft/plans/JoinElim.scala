package graft.plans

import java.nio.file.Paths

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}

/** Join elimination from declared (RELY) constraints (SURVEY §2D, D171)
  * — the informational-constraint optimization every warehouse ships
  * (Snowflake/Oracle `RELY`, Databricks PK/FK hints): generated queries
  * and view stacks routinely join a dimension and then use none of its
  * columns; when a declared foreign key guarantees every fact row
  * matches EXACTLY ONE dimension row, that join is the identity on the
  * fact side and can be cut from the plan. At 100 TB the eliminated join
  * is a full shuffle (or a broadcast build) of the fact table — for free.
  *
  * Soundness conditions, all structural:
  *  - INNER equi-join whose conjuncts pair fact FK columns with dim PK
  *    columns EXACTLY as declared (no residual predicates);
  *  - the dimension side is a BARE scan of the declared path (attribute
  *    projections tolerated; a Filter invalidates — it could drop rows);
  *  - the enclosing Project references ONLY fact-side attributes;
  *  - a [[Constraints.declareFk]] RELY edge (fact path, fk) → (dim path,
  *    pk) with the pk declared UNIQUE. The declaration is the caller's
  *    promise (exactly the warehouse RELY contract — trusted, unchecked);
  *  - fk nullability: the inner join drops fk-NULL fact rows, so the
  *    rewrite keeps an `IsNotNull(fk)` Filter unconditionally (a no-op
  *    when the fk is non-null, correctness when it isn't).
  */
object Constraints {

  /** (fact path, fk cols) REFERENCES (dim path, pk cols), pk unique. */
  final case class Fk(factPath: String, fkCols: Seq[String],
      dimPath: String, pkCols: Seq[String])

  // DURABLE edges (round 10): RELY declarations persist as a per-fact-
  // table sidecar (`factPath.__fks__`, the `__checks__` dialect) — a
  // restart or a second process rehydrates the same graph, so JoinElim,
  // SchemaExport and LinkedSample never silently lose their inputs (the
  // reference's constraint metadata is durable in Glue by construction).
  // The TrieMap is a rehydrate-on-miss cache, never the source of truth.
  private val fks =
    scala.collection.concurrent.TrieMap[(String, String), Fk]()

  private def norm(p: String) = Paths.get(p).toAbsolutePath.toString
  private def fksFile(factNorm: String) = Paths.get(factNorm + ".__fks__")

  /** Drop every in-memory cache entry (the restart simulation used by
    * specs/gates — sidecars on disk are untouched and must rehydrate). */
  def resetMemory(): Unit = fks.clear()

  private def loadSidecar(factNorm: String): Seq[Fk] =
    graft.state.TabSidecar.read(fksFile(factNorm)).flatMap { l =>
      l.split("\t") match {
        case Array(fkCols, dimPath, pkCols) =>
          Some(Fk(factNorm, fkCols.split(",").toSeq,
            dimPath, pkCols.split(",").toSeq))
        case _ => None
      }
    }

  private def writeSidecar(factNorm: String, edges: Seq[Fk]): Unit =
    if (edges.isEmpty) graft.state.TabSidecar.delete(fksFile(factNorm))
    else graft.state.TabSidecar.write(fksFile(factNorm),
      edges.sortBy(_.dimPath).map { e =>
        Seq(e.fkCols.mkString(","), e.dimPath, e.pkCols.mkString(","))
          .mkString("\t")
      })

  /** Load `factPath`'s declared edges from its sidecar into the cache
    * (first-touch rehydrate; in-memory entries win — they are at least
    * as fresh in a single-catalog-writer deployment). */
  def rehydrate(factPath: String): Unit = {
    val nf = norm(factPath)
    loadSidecar(nf).foreach(e => fks.putIfAbsent((nf, e.dimPath), e))
  }

  /** Declare a RELY foreign key: every non-null `fkCols` combination in
    * `factPath` matches exactly one `pkCols` row in `dimPath` (which is
    * unique there). Durable: writes through to the fact's `__fks__`
    * sidecar (merging with its other declared edges). */
  def declareFk(factPath: String, fkCols: Seq[String], dimPath: String,
      pkCols: Seq[String]): Unit = {
    require(fkCols.nonEmpty && fkCols.size == pkCols.size)
    (fkCols ++ pkCols).foreach { c =>
      graft.state.TabSidecar.requireCell(c, "constraint column")
      require(!c.contains(","), s"column names must not contain ',': $c")
    }
    val nf = norm(factPath); val nd = norm(dimPath)
    val edge = Fk(nf, fkCols, nd, pkCols)
    writeSidecar(nf, loadSidecar(nf).filterNot(_.dimPath == nd) :+ edge)
    fks.put((nf, nd), edge); ()
  }

  def drop(factPath: String, dimPath: String): Unit = {
    val nf = norm(factPath); val nd = norm(dimPath)
    writeSidecar(nf, loadSidecar(nf).filterNot(_.dimPath == nd))
    fks.remove((nf, nd)); ()
  }

  private[plans] def lookup(factPath: String, dimPath: String)
      : Option[Fk] = {
    val key = (norm(factPath), norm(dimPath))
    fks.get(key).orElse { rehydrate(factPath); fks.get(key) }
  }

  /** Every declared RELY edge the CACHE knows — callers that must see
    * cross-process declarations [[rehydrate]] their tables of interest
    * first (the schema-doc exporter D192 does). */
  def declared: Seq[Fk] = fks.values.toSeq

  /** What a declared edge's data actually looks like. */
  final case class Validation(dupPkGroups: Long, orphanRows: Long) {
    def holds: Boolean = dupPkGroups == 0 && orphanRows == 0
  }

  /** Validate a declared RELY edge against the data (D174): RELY means
    * the engine TRUSTS the declaration ([[JoinElim]] cuts joins on it),
    * so governance runs this audit on write cadence — pk uniqueness via
    * one map-side-combinable count, fk coverage via one anti-join of the
    * DISTINCT fk domain (key-domain-sized, orders under the fact table)
    * against the pk side. NULL fks are not orphans (the eliminated
    * join's IsNotNull filter drops them, matching inner-join semantics). */
  def validate(spark: org.apache.spark.sql.SparkSession, factPath: String,
      dimPath: String): Validation = {
    import org.apache.spark.sql.functions._
    val fk = lookup(factPath, dimPath).getOrElse(
      throw new IllegalArgumentException(
        s"no declared edge $factPath -> $dimPath"))
    val dim = spark.read.parquet(fk.dimPath)
    val dups = dim.groupBy(fk.pkCols.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).count()
    val fact = spark.read.parquet(fk.factPath)
    val orphanKeys = fact
      .select(fk.fkCols.zip(fk.pkCols).map { case (f, p) =>
        col(f).as(p) }: _*)
      .na.drop().distinct()
      .join(dim.select(fk.pkCols.map(col): _*), fk.pkCols, "left_anti")
    val orphans = fact.join(orphanKeys,
      fk.fkCols.zip(fk.pkCols).map { case (f, p) =>
        fact(f) === orphanKeys(p) }.reduce(_ && _), "left_semi").count()
    Validation(dups, orphans)
  }

  /** Split the fact into (referentially valid, orphan) halves — the
    * repair surface when [[validate]] fails: quarantine the orphans,
    * publish the valid side, fix upstream. NULL-fk rows count as VALID
    * here (they are legal under the declaration; deletion is a policy,
    * not a referential fact). */
  def splitOrphans(spark: org.apache.spark.sql.SparkSession,
      factPath: String, dimPath: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.functions._
    val fk = lookup(factPath, dimPath).getOrElse(
      throw new IllegalArgumentException(
        s"no declared edge $factPath -> $dimPath"))
    val fact = spark.read.parquet(fk.factPath)
    val pks = spark.read.parquet(fk.dimPath)
      .select(fk.pkCols.map(col): _*).distinct()
    val cond = fk.fkCols.zip(fk.pkCols).map { case (f, p) =>
      fact(f) === pks(p) }.reduce(_ && _)
    val anyNull = fk.fkCols.map(c => fact(c).isNull).reduce(_ || _)
    val orphans = fact.join(pks, cond, "left_anti").filter(!anyNull)
    val valid = fact.join(pks, cond, "left_semi")
      .unionByName(fact.filter(anyNull))
    (valid, orphans)
  }
}

class JoinElim extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList, j: Join) =>
      eliminate(projList, j).map(Project(projList, _)).getOrElse(p)
  }

  /** The single scan path under `plan` plus the names of columns the
    * plan null-checks, tolerating attribute-only Projects and Filters
    * made ONLY of IsNotNull conjuncts (the optimizer's
    * InferFiltersFromConstraints adds `isnotnull(pk)` under every inner
    * join before this rule runs; such a filter is harmless iff it checks
    * only the join's pk columns — the CALLER verifies that against the
    * declaration). Anything else — a real Filter, aggregate, multi-root
    * scan — returns None and blocks elimination. */
  private def bareScanPath(plan: LogicalPlan)
      : Option[(String, Set[String])] = plan match {
    case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
      val roots = lr.relation.asInstanceOf[HadoopFsRelation]
        .location.rootPaths
      if (roots.size == 1) Some((roots.head.toUri.getPath, Set.empty))
      else None
    case Project(projList, child)
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      bareScanPath(child)
    case Filter(cond, child) =>
      val checks = {
        def conj(e: Expression): Seq[Expression] = e match {
          case And(l, r) => conj(l) ++ conj(r)
          case other => Seq(other)
        }
        conj(cond).map {
          case IsNotNull(a: AttributeReference) => a.name
          case _ => return None
        }
      }
      bareScanPath(child).map { case (p, s) => (p, s ++ checks) }
    case _ => None
  }

  /** The FACT side of the join, when elimination is sound. */
  private def eliminate(projList: Seq[NamedExpression],
      j: Join): Option[LogicalPlan] = {
    if (j.joinType != Inner) return None
    val cond = j.condition.getOrElse(return None)
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val refs = projList.flatMap(_.references)
    def tryDirection(fact: LogicalPlan, dim: LogicalPlan)
        : Option[LogicalPlan] = {
      if (!refs.forall(fact.outputSet.contains)) return None
      val (dimPath, dimNullChecks) = bareScanPath(dim).getOrElse(return None)
      // fact side may carry filters/projections — find its scan for the
      // declaration lookup, but keep the SUBPLAN itself
      val factScan = factScanOf(fact).getOrElse(return None)
      val factPath = factScan.relation.asInstanceOf[HadoopFsRelation]
        .location.rootPaths.head.toUri.getPath
      val fk = Constraints.lookup(factPath, dimPath).getOrElse(return None)
      // a dim-side null check is harmless ONLY on pk columns (matched
      // rows have non-null pks by the equi-join); on any other column it
      // could drop matched rows, so it blocks elimination
      if (!dimNullChecks.subsetOf(fk.pkCols.toSet)) return None
      // every conjunct must be fact.fkI = dim.pkI per the declaration
      val pairs = conjuncts(cond).map {
        case EqualTo(a: AttributeReference, b: AttributeReference)
            if fact.outputSet.contains(a) && dim.outputSet.contains(b) =>
          (a, b)
        case EqualTo(b: AttributeReference, a: AttributeReference)
            if fact.outputSet.contains(a) && dim.outputSet.contains(b) =>
          (a, b)
        case _ => return None
      }
      val declared = fk.fkCols.zip(fk.pkCols).toSet
      if (pairs.map { case (a, b) => (a.name, b.name) }.toSet != declared)
        return None
      // the declaration names SCAN columns — each fact-side attribute
      // must BE the scan's column of that name, not merely wear it: an
      // Alias rebinding some other column under the fk's name (e.g.
      // withColumnRenamed) mints a fresh exprId the scan output doesn't
      // carry, so requiring the exprId to originate from the
      // LogicalRelation rejects it (mirrors bareScanPath's
      // attribute-only tolerance on the dim side)
      if (!pairs.forall { case (a, _) => factScan.outputSet.contains(a) })
        return None
      val fkAttrs = pairs.map(_._1)
      Some(Filter(fkAttrs.map(IsNotNull(_): Expression).reduce(And), fact))
    }
    tryDirection(j.left, j.right).orElse(tryDirection(j.right, j.left))
  }

  /** The fact side's single scan: unlike the dim side, Filters over the
    * fact are fine (we keep the whole subplan) — but the caller checks
    * the join's fk attributes against THIS scan's output so aliases
    * can't smuggle another column under a declared name. */
  private def factScanOf(plan: LogicalPlan): Option[LogicalRelation] = {
    val scans = plan.collectLeaves().collect {
      case lr: LogicalRelation
          if lr.relation.isInstanceOf[HadoopFsRelation] &&
            lr.relation.asInstanceOf[HadoopFsRelation]
              .location.rootPaths.size == 1 => lr
    }
    if (scans.size == 1) Some(scans.head) else None
  }
}

object JoinElim {
  def ensureInstalled(spark: SparkSession): Unit =
    RuleInstall.ensure(spark)(_.isInstanceOf[JoinElim], new JoinElim)
}
