package graft.sources

import java.sql.{SQLSyntaxErrorException, Types}
import org.scalatest.funsuite.AnyFunSuite

import graft.extract.SqlRender
import graft.sources.mock.MockDb

/** The emulated dialect endpoints must ACCEPT their own grammar and
  * REJECT the others' — that asymmetry is what makes the a16_dialect_*
  * gates evidence of per-dialect rendering rather than ANSI-by-luck. */
class MockJdbcSpec extends AnyFunSuite {

  private val ep = "spec"
  MockDb.register(ep, "t", Seq(
    MockDb.Col("K", Types.BIGINT), MockDb.Col("D", Types.VARCHAR),
    MockDb.Col("V", Types.DOUBLE)),
    (1L to 20L).map(i =>
      Array[Any](i, f"1995-${(i % 12 + 1)}%02d-01", i * 1.5)))

  test("each dialect's own rendering evaluates") {
    val mssql = s"SELECT k, v FROM t WHERE (d >= " +
      s"${SqlRender.dateLiteral(SqlRender.MsSql, "1995-06-01")})"
    val (_, r1) = MockDb.query("mssql", ep, mssql)
    assert(r1.nonEmpty && r1.forall(_(0).asInstanceOf[Long] % 12 >= 5 ||
      r1.nonEmpty))
    val oracle = s"SELECT k FROM t WHERE d >= " +
      SqlRender.dateLiteral(SqlRender.Oracle, "1995-06-01", "date")
    assert(MockDb.query("oracle", ep, oracle)._2.nonEmpty)
    val mysql = SqlRender.paginate(SqlRender.MySql, "SELECT k FROM t", "k", 5, 3)
    val (_, page) = MockDb.query("mysql", ep, mysql)
    assert(page.map(_(0)) == Seq(6L, 7L, 8L))
    val paged = SqlRender.paginate(SqlRender.MsSql, "SELECT k FROM t", "k", 5, 3)
    assert(MockDb.query("mssql", ep, paged)._2.map(_(0)) == Seq(6L, 7L, 8L))
  }

  test("wrong-dialect constructs are rejected") {
    // Oracle literal on the mssql endpoint
    intercept[SQLSyntaxErrorException] {
      MockDb.query("mssql", ep, "SELECT k FROM t WHERE d >= " +
        SqlRender.dateLiteral(SqlRender.Oracle, "1995-06-01", "date"))
    }
    // MsSql CONVERT on the oracle endpoint
    intercept[SQLSyntaxErrorException] {
      MockDb.query("oracle", ep, "SELECT k FROM t WHERE d >= " +
        SqlRender.dateLiteral(SqlRender.MsSql, "1995-06-01", "smalldatetime"))
    }
    // MySQL LIMIT on the mssql endpoint
    intercept[SQLSyntaxErrorException] {
      MockDb.query("mssql", ep,
        SqlRender.paginate(SqlRender.MySql, "SELECT k FROM t", "k", 5, 3))
    }
    // OFFSET…FETCH on the mysql endpoint
    intercept[SQLSyntaxErrorException] {
      MockDb.query("mysql", ep,
        SqlRender.paginate(SqlRender.MsSql, "SELECT k FROM t", "k", 5, 3))
    }
  }

  test("the Spark reader's wrapper shapes evaluate") {
    // schema probe: SELECT * FROM (query) alias WHERE 1=0
    val probe = "SELECT * FROM (SELECT k, v FROM t) q WHERE 1=0"
    val (cols, rows) = MockDb.query("mysql", ep, probe)
    assert(cols.map(_.name) == Seq("K", "V") && rows.isEmpty)
    // pruned partition read: quoted projection over the subquery
    val read = "SELECT \"V\",\"K\" FROM (SELECT k, v FROM t WHERE k <= 3) q"
    val (cols2, rows2) = MockDb.query("mysql", ep, read)
    assert(cols2.map(_.name) == Seq("V", "K"))
    assert(rows2.map(_(1)) == Seq(1L, 2L, 3L))
  }

  test("aliases, ORDER BY DESC, and NULL comparison semantics") {
    MockDb.register(ep, "n", Seq(
      MockDb.Col("K", Types.BIGINT), MockDb.Col("S", Types.VARCHAR)),
      Seq(Array[Any](1L, "a"), Array[Any](2L, null), Array[Any](3L, "c")))
    val (cols, rows) =
      MockDb.query("mysql", ep, "SELECT k AS id FROM n WHERE s >= 'a' " +
        "ORDER BY k DESC")
    assert(cols.map(_.name) == Seq("id"))
    // NULL never satisfies a comparison; DESC order
    assert(rows.map(_(0)) == Seq(3L, 1L))
  }
}
