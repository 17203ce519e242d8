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

  private val fks =
    scala.collection.concurrent.TrieMap[(String, String), Fk]()

  private def norm(p: String) = Paths.get(p).toAbsolutePath.toString

  /** Declare a RELY foreign key: every non-null `fkCols` combination in
    * `factPath` matches exactly one `pkCols` row in `dimPath` (which is
    * unique there). */
  def declareFk(factPath: String, fkCols: Seq[String], dimPath: String,
      pkCols: Seq[String]): Unit = {
    require(fkCols.nonEmpty && fkCols.size == pkCols.size)
    fks.put((norm(factPath), norm(dimPath)),
      Fk(norm(factPath), fkCols, norm(dimPath), pkCols))
    ()
  }

  def drop(factPath: String, dimPath: String): Unit = {
    fks.remove((norm(factPath), norm(dimPath))); ()
  }

  private[plans] def lookup(factPath: String, dimPath: String): Option[Fk] =
    fks.get((norm(factPath), norm(dimPath)))
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
      // fact side may carry filters/projections — find its scan path for
      // the declaration lookup, but keep the SUBPLAN itself
      val factPath = factScanPath(fact).getOrElse(return None)
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
      val fkAttrs = pairs.map(_._1)
      Some(Filter(fkAttrs.map(IsNotNull(_): Expression).reduce(And), fact))
    }
    tryDirection(j.left, j.right).orElse(tryDirection(j.right, j.left))
  }

  /** The fact side's scan path: unlike the dim side, Filters over the
    * fact are fine (we keep the whole subplan). */
  private def factScanPath(plan: LogicalPlan): Option[String] = {
    val scans = plan.collectLeaves().collect {
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
        lr.relation.asInstanceOf[HadoopFsRelation].location.rootPaths
    }.flatten
    if (scans.size == 1) Some(scans.head.toUri.getPath) else None
  }
}

object JoinElim {
  def ensureInstalled(spark: SparkSession): Unit =
    RuleInstall.ensure(spark)(_.isInstanceOf[JoinElim], new JoinElim)
}
