package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** D201 — credential-provider seam: env key sanitization and value
  * split, properties-file fields, chain order, refusal naming. */
class CredentialsSpec extends AnyFunSuite {

  test("env provider: id sanitization, user:password split, " +
    "password-only and leading-colon forms") {
    val env = Map(
      "GRAFT_SECRET_SRC_DB_MAIN" -> "alice:pw1",
      "GRAFT_SECRET_PWONLY" -> "justpw",
      "GRAFT_SECRET_COLON" -> ":pw2")
    val p = Credentials.Env(lookup = env.get)
    assert(p.resolve("src-db.main") ==
      Some(Map("user" -> "alice", "password" -> "pw1")),
      "non-alphanumerics map to _ and the id upper-cases")
    assert(p.resolve("pwonly") == Some(Map("password" -> "justpw")))
    assert(p.resolve("colon") == Some(Map("password" -> "pw2")),
      "a leading colon keeps the config username")
    assert(p.resolve("absent").isEmpty)
  }

  test("properties-file provider resolves fields, re-reads per call, " +
    "missing file is a miss not an error") {
    val tmp = Files.createTempDirectory("creds")
    try {
      val f = tmp.resolve("s.properties")
      assert(Credentials.PropsFile(f.toString).resolve("a").isEmpty)
      Files.writeString(f, "a.user=u1\na.password=p1\nb.password=p2\n")
      val p = Credentials.PropsFile(f.toString)
      assert(p.resolve("a") == Some(Map("user" -> "u1", "password" -> "p1")))
      assert(p.resolve("b") == Some(Map("password" -> "p2")))
      Files.writeString(f, "a.user=u1\na.password=ROTATED\n")
      assert(p.resolve("a").get("password") == "ROTATED",
        "rotation must not need a restart")
    } finally graft.sink.StageWriter.deleteRecursively(tmp)
  }

  test("chain takes the FIRST hit; required() refuses naming secret " +
    "and every provider; securedProps needs a password field") {
    val first = Credentials.Static(
      Map("s" -> Map("password" -> "fromFirst")), "first")
    val second = Credentials.Static(
      Map("s" -> Map("password" -> "fromSecond"),
        "only2" -> Map("password" -> "x")), "second")
    val chain = Credentials.Chain(Seq(first, second))
    assert(Credentials.required("s", chain)("password") == "fromFirst")
    assert(Credentials.required("only2", chain)("password") == "x")
    val e = intercept[Credentials.MissingSecret] {
      Credentials.required("nope", chain)
    }
    assert(e.getMessage.contains("nope") &&
      e.getMessage.contains("first") && e.getMessage.contains("second"))
    val ep = graft.config.EndpointConfig("e", "mysql", 1, "db", "h", "cfg")
    val p = JdbcSource.securedProps(ep, "s", chain)
    assert(p.getProperty("password") == "fromFirst" &&
      p.getProperty("user") == "cfg",
      "no user field in the secret keeps the config username")
    intercept[Credentials.MissingSecret] {
      JdbcSource.securedProps(ep, "bad",
        Credentials.Static(Map("bad" -> Map("user" -> "u")), "nopw"))
    }
  }
}
