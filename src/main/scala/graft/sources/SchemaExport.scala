package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import graft.plans.Constraints

/** Warehouse schema documentation export (SURVEY §2D, D192) — the twin
  * of the reference's `generate_dbml` utility
  * (`utils/generate_dbml/dbml.ipynb`, output at
  * `utils/generate_dbml/output.dbml:1-20`): one human-readable DBML
  * document describing every table, column, primary key and FK edge of
  * the warehouse, the artifact a data team hands to anyone asking "what
  * does this lake contain".
  *
  * Where the reference infers FK refs by COLUMN-NAME matching (`id_x` →
  * first table containing `X` — a guess that breaks on the first naming
  * collision), this exporter reads the DECLARED relationship graph:
  * [[Constraints.declareFk]] RELY edges give exact (fact.fk → dim.pk)
  * refs, and the dim side's declared-unique pk columns surface as
  * `[pk]`. Schemas come from the parquet footers (driver-side metadata
  * reads, never a scan) — the same truth the catalog registers. */
object SchemaExport {

  /** Spark type → DBML type (the reference's map,
    * `dbml.ipynb` type_map, extended with exact decimal/date). */
  private[sources] def dbmlType(dt: DataType): String = dt match {
    case StringType => "varchar"
    case TimestampType | TimestampNTZType => "timestamp"
    case ByteType | ShortType | IntegerType => "int"
    case LongType => "bigint"
    case FloatType | DoubleType => "float"
    case BooleanType => "boolean"
    case DateType => "date"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case other => other.simpleString.toLowerCase
  }

  private def norm(p: String) = Paths.get(p).toAbsolutePath.toString

  /** Render the DBML document for `tables` (name → parquet location).
    * FK refs and pk flags come from the declared RELY graph; `extraPks`
    * adds config-declared primary keys (the reference's COLUMN_ID==0
    * convention) for tables without a declared inbound edge. Tables
    * render in the given order; columns in schema order. */
  def dbml(spark: SparkSession, tables: Seq[(String, String)],
      extraPks: Map[String, Seq[String]] = Map.empty): String = {
    val byPath: Map[String, String] =
      tables.map { case (n, p) => norm(p) -> n }.toMap
    // rehydrate every documented table's durable RELY sidecar first, so
    // the export sees edges declared by OTHER processes (round 10)
    tables.foreach { case (_, p) => Constraints.rehydrate(p) }
    val edges = Constraints.declared
    // declared-unique pks: every dim side of a RELY edge
    val pkOf: Map[String, Set[String]] = edges
      .groupBy(e => byPath.getOrElse(e.dimPath, ""))
      .map { case (t, es) => t -> es.flatMap(_.pkCols).toSet }
      .filter(_._1.nonEmpty)
    // fk refs: (fact table, fk col) -> "DimTable.pkCol"
    val refOf: Map[(String, String), String] = edges.flatMap { e =>
      (byPath.get(e.factPath), byPath.get(e.dimPath)) match {
        case (Some(ft), Some(dt)) =>
          e.fkCols.zip(e.pkCols).map { case (f, p) =>
            (ft, f) -> s"$dt.$p" }
        case _ => Nil // an edge to an undocumented table renders nothing
      }
    }.toMap
    val sb = new StringBuilder
    tables.foreach { case (name, path) =>
      val schema = spark.read.parquet(path).schema
      // governance annotations (r10, D209): a column's access tags from
      // the durable D198 registry render as a DBML note — the document
      // a data team hands out now SAYS which columns are governed (the
      // reference's LF-Tags are equally visible in its catalog console)
      val tagsOf = AccessTags.tagsOf(path)
      sb.append(s"Table $name {\n")
      schema.fields.foreach { f =>
        val flags =
          (if (pkOf.getOrElse(name, Set.empty).contains(f.name) ||
            extraPks.getOrElse(name, Nil).contains(f.name)) Seq("pk")
          else Nil) ++
            refOf.get((name, f.name)).map(r => s"ref: > $r").toSeq ++
            tagsOf.get(f.name).map(ts =>
              s"note: 'tags: ${ts.toSeq.sorted.mkString(",")}'").toSeq
        val flagStr =
          if (flags.isEmpty) "" else s" [${flags.mkString(", ")}]"
        sb.append(s"  ${f.name} ${dbmlType(f.dataType)}$flagStr\n")
      }
      sb.append("}\n\n")
    }
    sb.toString
  }

  /** Write the document atomically; returns the rendered text. */
  def writeDbml(spark: SparkSession, tables: Seq[(String, String)],
      outFile: String, extraPks: Map[String, Seq[String]] = Map.empty)
      : String = {
    val text = dbml(spark, tables, extraPks)
    val target = Paths.get(outFile)
    val tmp = Files.createTempFile(
      target.toAbsolutePath.getParent, ".dbml", ".tmp")
    Files.writeString(tmp, text)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    text
  }
}
