package graft.sources

import java.nio.file.{Files, Paths}

/** Pluggable credential resolution for JDBC endpoints (SURVEY §2D,
  * D201) — the reference resolves `SRC_DB_SECRET` through Secrets
  * Manager at connect time (`extract_data.py:267-312`;
  * `aje_libs/common/helpers/secrets_helper.py`): the password never
  * lives in config, logs, or the endpoint row (EndpointConfig carries
  * the username only — the credentials.csv shape). The engine twin is a
  * provider SEAM with env-var, properties-file, static (tests) and
  * first-hit chain impls — no cloud dependency; a deployment drops in
  * its own provider (Secrets Manager, Vault) behind the same two-method
  * trait. A missing secret refuses NAMING the secret id and every
  * provider consulted — the first environment seam a deployment hits,
  * made debuggable on day one.
  *
  * Secrets are field maps (the Secrets Manager JSON shape reduced to
  * what connections need): `password` required by the JDBC surface,
  * `user` optionally overriding the config's username.
  */
object Credentials {

  final class MissingSecret(msg: String) extends RuntimeException(msg)

  trait Provider {
    /** Where this provider looks — named in refusal messages. */
    def name: String
    /** The secret's fields, or None when this provider doesn't hold it. */
    def resolve(secretId: String): Option[Map[String, String]]
  }

  /** Env-var provider: secret `x` reads `<prefix><X>` (non-alphanumerics
    * mapped to `_`, upper-cased), value `user:password` (user may be
    * empty: `:pw` keeps the config username). The twelve-factor default. */
  final case class Env(prefix: String = "GRAFT_SECRET_",
      lookup: String => Option[String] = sys.env.get) extends Provider {
    def name = s"env($prefix*)"
    def resolve(secretId: String): Option[Map[String, String]] = {
      val key = prefix + secretId.map(c =>
        if (c.isLetterOrDigit) c.toUpper else '_')
      lookup(key).map { v =>
        val i = v.indexOf(':')
        if (i < 0) Map("password" -> v)
        else if (i == 0) Map("password" -> v.substring(1))
        else Map("user" -> v.substring(0, i),
          "password" -> v.substring(i + 1))
      }
    }
  }

  /** Properties-file provider: keys `<secretId>.user` /
    * `<secretId>.password` in a java properties file (0600-style local
    * secret files; re-read per resolve so rotation needs no restart). */
  final case class PropsFile(path: String) extends Provider {
    def name = s"file($path)"
    def resolve(secretId: String): Option[Map[String, String]] = {
      val p = Paths.get(path)
      if (!Files.isRegularFile(p)) return None
      val props = new java.util.Properties()
      val in = Files.newInputStream(p)
      try props.load(in) finally in.close()
      Option(props.getProperty(s"$secretId.password")).map { pw =>
        Option(props.getProperty(s"$secretId.user"))
          .map(u => Map("user" -> u, "password" -> pw))
          .getOrElse(Map("password" -> pw))
      }
    }
  }

  /** In-memory provider for tests and notebooks. */
  final case class Static(secrets: Map[String, Map[String, String]],
      label: String = "static") extends Provider {
    def name = label
    def resolve(secretId: String): Option[Map[String, String]] =
      secrets.get(secretId)
  }

  /** First-hit chain (env before file is the usual deployment order). */
  final case class Chain(providers: Seq[Provider]) extends Provider {
    require(providers.nonEmpty, "chain at least one provider")
    def name = providers.map(_.name).mkString(" -> ")
    def resolve(secretId: String): Option[Map[String, String]] =
      providers.view.flatMap(_.resolve(secretId)).headOption
  }

  /** Resolve or refuse, naming the secret and the providers consulted. */
  def required(secretId: String, provider: Provider)
      : Map[String, String] =
    provider.resolve(secretId).getOrElse(throw new MissingSecret(
      s"secret '$secretId' not found by provider ${provider.name} — " +
        "declare it (or fix the provider order) before connecting"))
}
