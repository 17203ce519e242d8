package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.plans.Constraints

/** D192 — schema-catalog export: the DBML document renders tables,
  * columns, declared-pk flags and declared-FK refs as a GOLDEN FILE
  * over the gate fixtures; undeclared edges render nothing. */
class SchemaExportSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("golden DBML over region/nation with a declared RELY edge: pk " +
    "flag on the dim key, exact ref on the fk, reference type map") {
    val region = s"$dir/region.parquet"
    val nation = s"$dir/nation.parquet"
    Constraints.declareFk(nation, Seq("n_regionkey"),
      region, Seq("r_regionkey"))
    try {
      val got = SchemaExport.dbml(spark,
        Seq("NATION" -> nation, "REGION" -> region),
        extraPks = Map("NATION" -> Seq("n_nationkey")))
      val want =
        """Table NATION {
          |  n_nationkey int [pk]
          |  n_name varchar
          |  n_regionkey int [ref: > REGION.r_regionkey]
          |}
          |
          |Table REGION {
          |  r_regionkey int [pk]
          |  r_name varchar
          |}
          |
          |""".stripMargin
      assert(got == want, s"golden mismatch:\n$got")
      // writeDbml round-trips atomically
      val tmp = Files.createTempDirectory("dbml")
      try {
        val out = tmp.resolve("output.dbml").toString
        SchemaExport.writeDbml(spark,
          Seq("NATION" -> nation, "REGION" -> region), out,
          extraPks = Map("NATION" -> Seq("n_nationkey")))
        assert(Files.readString(tmp.resolve("output.dbml")) == want)
      } finally graft.sink.StageWriter.deleteRecursively(tmp)
    } finally Constraints.drop(nation, region)
  }

  test("an edge to an undocumented table renders no ref; the dbml type " +
    "map covers exact decimals and timestamps") {
    val region = s"$dir/region.parquet"
    val nation = s"$dir/nation.parquet"
    Constraints.declareFk(nation, Seq("n_regionkey"),
      region, Seq("r_regionkey"))
    try {
      val got = SchemaExport.dbml(spark, Seq("NATION" -> nation))
      assert(!got.contains("ref:"),
        "a ref to a table outside the document must not render")
      assert(!got.contains("[pk]"),
        "the pk lives on the undocumented dim — nothing to flag here")
    } finally Constraints.drop(nation, region)
    import org.apache.spark.sql.types._
    assert(SchemaExport.dbmlType(DecimalType(18, 2)) == "decimal(18,2)")
    assert(SchemaExport.dbmlType(TimestampType) == "timestamp")
    assert(SchemaExport.dbmlType(LongType) == "bigint")
    assert(SchemaExport.dbmlType(DoubleType) == "float")
  }
}
