package graft.sources

import org.json4s._
import org.json4s.jackson.JsonMethods

/** X9 — credential resolution (`sybaseiq_extractor.py:57-95`): connection
  * secrets are fetched at runtime by reference and never stored in plans or
  * the ledger (the reference scrubs them before the ledger write,
  * `routing/lambda_function.py:125-127`; our LedgerEntry simply has no
  * credential fields).
  *
  * The reference resolves a Secrets Manager ARN; locally the reference
  * string resolves to a JSON file path (FileCredentialsProvider) or the
  * process environment (EnvCredentialsProvider).
  */
final case class JdbcCredentials(user: String, password: String,
    driver: Option[String] = None)

trait CredentialsProvider {
  def resolve(ref: Option[String]): JdbcCredentials
}

/** Secret "ARN" = path of a JSON file `{"user": …, "password": …,
  * "driver": …}` — the local analogue of a secret store entry. */
object FileCredentialsProvider extends CredentialsProvider {
  def resolve(ref: Option[String]): JdbcCredentials = {
    val path = ref.getOrElse(
      throw new IllegalArgumentException("CredentialsSecretArn required"))
    val j = JsonMethods.parse(
      java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
    def s(k: String): Option[String] = j \ k match {
      case JString(v) => Some(v); case _ => None
    }
    JdbcCredentials(s("user").getOrElse(""), s("password").getOrElse(""),
      s("driver"))
  }
}

/** Credentials from the environment (GRAFT_JDBC_USER / _PASSWORD / _DRIVER). */
object EnvCredentialsProvider extends CredentialsProvider {
  def resolve(ref: Option[String]): JdbcCredentials =
    JdbcCredentials(
      sys.env.getOrElse("GRAFT_JDBC_USER", ""),
      sys.env.getOrElse("GRAFT_JDBC_PASSWORD", ""),
      sys.env.get("GRAFT_JDBC_DRIVER"))
}

/** Fixed credentials for tests/embedded sources. */
final case class StaticCredentialsProvider(creds: JdbcCredentials)
    extends CredentialsProvider {
  def resolve(ref: Option[String]): JdbcCredentials = creds
}
