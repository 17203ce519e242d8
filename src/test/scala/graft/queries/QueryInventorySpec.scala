package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry

/** The inventory invariant the correctness gate rests on: every declared
  * query has a DuckDB oracle (the driver records a weaker rows-only check
  * for oracle-less queries — this suite keeps that set EMPTY), and names
  * are unique across the contributing query maps. */
class QueryInventorySpec extends AnyFunSuite {

  test("every query carries an oracle — none downgraded to rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"queries without oracles: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("no name collisions across the query maps") {
    // ExtractionQueries.defs already folds DialectQueries in
    val groups = Seq(
      "extraction" -> ExtractionQueries.defs.keys.toSeq,
      "dsl" -> DslQueries.defs.keys.toSeq,
      "pipeline" -> PipelineQueries.defs.keys.toSeq,
      "bench" -> BenchQueries.defs.keys.toSeq,
      "analytics" -> AnalyticsQueries.defs.keys.toSeq,
      "llm" -> LlmQueries.defs.keys.toSeq,
      "retrieval" -> RetrievalQueries.defs.keys.toSeq,
      "curation" -> CurationQueries.defs.keys.toSeq,
      "governance" -> GovernanceQueries.defs.keys.toSeq,
      "mining" -> MiningQueries.defs.keys.toSeq,
      "maintenance" -> MaintenanceQueries.defs.keys.toSeq)
    val dupes = groups.flatMap { case (g, ks) => ks.map(_ -> g) }
      .groupBy(_._1).filter(_._2.size > 1)
    assert(dupes.isEmpty, s"colliding query names: ${dupes.keys.mkString(", ")}")
    assert(SparkEntry.queries.size ==
      groups.map(_._2.size).sum, "SparkEntry.all dropped entries")
  }
}
