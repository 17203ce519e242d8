package graft.sources

import java.util.Properties
import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import graft.config.EndpointConfig
import graft.extract.{ReadPlan, Slice, SqlRender}

/** JDBC source (SURVEY C2, A6/A7 pushdown mode).
  *
  * Renders a ReadPlan onto Spark's JDBC reader so every extraction shape the
  * reference generates maps to a parallel partitioned read:
  *   - range-partitioned full scan → partitionColumn/lowerBound/upperBound/
  *     numPartitions (Spark slices exactly like RangeSlicer)
  *   - between-date / watermark predicates → a predicate array, one source
  *     query per slice (`jdbc(url, table, predicates, props)`)
  *   - plain scan → single dbtable subquery with filters pushed into it
  *
  * Connection hygiene from the reference (sql_server_extractor.py:28-77):
  * fetchsize bounds memory per round-trip, queryTimeout caps runaways.
  * Execution is integration-tested against embedded Derby (SourcesSpec:
  * partitioned read, predicate slices, keyset pagination — live SQL, not
  * just option construction); the mssql/oracle/mysql dialect renderings
  * remain unit-tested since those engines need a network endpoint.
  */
object JdbcSource {

  def url(ep: EndpointConfig): String = ep.bdType.trim.toLowerCase match {
    case "mssql"  => s"jdbc:sqlserver://${ep.srcServerName}:${ep.dbPort};" +
      s"databaseName=${ep.srcDbName};encrypt=false"
    case "oracle" => s"jdbc:oracle:thin:@${ep.srcServerName}:${ep.dbPort}/" +
      ep.srcDbName
    case "mysql"  => s"jdbc:mysql://${ep.srcServerName}:${ep.dbPort}/" +
      ep.srcDbName
    case other => sys.error(s"unknown BD_TYPE '$other'")
  }

  def baseProps(ep: EndpointConfig, password: String): Properties = {
    val p = new Properties()
    p.setProperty("user", ep.srcDbUsername)
    p.setProperty("password", password)
    p.setProperty("fetchsize", "10000")
    p.setProperty("queryTimeout", "900")
    p
  }

  /** [[baseProps]] with the password (and optionally the user) resolved
    * through a [[Credentials.Provider]] AT CONNECT TIME — the reference
    * resolves `SRC_DB_SECRET` through Secrets Manager exactly here
    * (`extract_data.py:267-312`): the secret never lives in the config
    * row. A missing secret (or one without a `password` field) refuses
    * naming the secret and the providers consulted. */
  /** [[securedProps]] keyed by the endpoint's OWN configured secret
    * name (`credentials.csv` SRC_DB_SECRET) — the config-plane path a
    * deployment actually takes; refuses when the row declares none. */
  def securedPropsFor(ep: EndpointConfig,
      provider: Credentials.Provider): Properties = {
    require(ep.srcDbSecret.nonEmpty,
      s"endpoint ${ep.endpointName} declares no SRC_DB_SECRET — " +
        "credentials must come from a secret, never the config row")
    securedProps(ep, ep.srcDbSecret, provider)
  }

  def securedProps(ep: EndpointConfig, secretId: String,
      provider: Credentials.Provider): Properties = {
    val secret = Credentials.required(secretId, provider)
    val pw = secret.getOrElse("password", throw new Credentials
      .MissingSecret(s"secret '$secretId' from ${provider.name} " +
        "carries no 'password' field"))
    val p = baseProps(ep, pw)
    secret.get("user").filter(_.nonEmpty)
      .foreach(u => p.setProperty("user", u))
    p
  }

  /** The pushdown subquery for dbtable: projection + filters run ON the
    * source engine; Spark sees a narrowed relation. */
  def dbtable(plan: ReadPlan, table: String, joinExpr: String = ""): String =
    s"(${SqlRender.renderSingle(plan, table, joinExpr)}) AS src"

  /** Predicate strings for `jdbc(url, table, predicates, props)` — one
    * partition per slice (A6/A7 parity). */
  def slicePredicates(plan: ReadPlan, slices: Seq[Slice]): Array[String] =
    plan.partitionColumn match {
      case Some(pc) => slices.map(s => s"$pc >= ${s.lo} AND $pc < ${s.hi}").toArray
      case None     => Array.empty
    }

  /** Configure a reader for a range-partitioned read (Spark generates the
    * same >=lo AND <hi slices RangeSlicer proves correct). */
  def partitionedReader(spark: SparkSession, u: String, plan: ReadPlan,
      table: String, joinExpr: String, min: Long, max: Long,
      props: Properties): DataFrameReader = {
    val r = spark.read.format("jdbc")
      .option("url", u)
      .option("dbtable", dbtable(plan, table, joinExpr))
      .option("fetchsize", props.getProperty("fetchsize", "10000"))
    plan.partitionColumn match {
      case Some(pc) => r
        .option("partitionColumn", pc)
        .option("lowerBound", min)
        .option("upperBound", max + 1)
        .option("numPartitions", plan.numPartitions)
      case None => r
    }
  }

  /** Predicate-sliced read (between-date / explicit ranges). */
  def readWithPredicates(spark: SparkSession, u: String, plan: ReadPlan,
      table: String, joinExpr: String, slices: Seq[Slice],
      props: Properties): DataFrame =
    spark.read.jdbc(u, dbtable(plan, table, joinExpr),
      slicePredicates(plan, slices), props)
}
