package graft.serve

import java.nio.charset.StandardCharsets
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** Authenticated principal with OAuth-style scopes (reference:
  * api-service/src/auth.py:103-120 — space-separated `scope` claim,
  * `read:analytics` for /query, `read:schema` for /schema).
  */
final case class Principal(subject: String, scopes: Set[String]) {
  def hasScope(s: String): Boolean = scopes.contains(s)
}

/** Serving-layer authentication boundary (reference V3: Auth0 RS256
  * JWKS, api-service/src/auth.py:17-100). Kept behind a trait so tests
  * and offline deployments bypass it — the reference's scheme needs an
  * outbound JWKS fetch that a hermetic build must not depend on.
  */
trait Authenticator {
  /** Returns the principal or a failure message (→ HTTP 401). */
  def authenticate(authorizationHeader: Option[String]): Either[String, Principal]
}

/** Everyone is `anonymous` with the given scopes (test/dev default). */
final class NoAuth(scopes: Set[String] = Set("read:analytics", "read:schema"))
    extends Authenticator {
  def authenticate(h: Option[String]): Either[String, Principal] =
    Right(Principal("anonymous", scopes))
}

/** HS256 JWT verification (same claim contract as the reference's RS256
  * path: exp, aud, iss, scope — auth.py:52-100 — with the asymmetric
  * JWKS step replaced by a shared-secret MAC so verification works with
  * zero egress; swap in an RS256 verifier where a JWKS endpoint exists).
  */
final class HmacJwtAuthenticator(secret: Array[Byte], audience: String,
                                 issuer: String,
                                 clock: () => Long = () => System.currentTimeMillis() / 1000)
    extends Authenticator {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def authenticate(h: Option[String]): Either[String, Principal] = {
    val token = h match {
      case Some(v) if v.startsWith("Bearer ") => v.substring(7).trim
      case _ => return Left("Missing bearer token")
    }
    token.split('.') match {
      case Array(h64, p64, s64) =>
        val mac = Mac.getInstance("HmacSHA256")
        mac.init(new SecretKeySpec(secret, "HmacSHA256"))
        val expected = Base64.getUrlEncoder.withoutPadding.encodeToString(
          mac.doFinal(s"$h64.$p64".getBytes(StandardCharsets.US_ASCII)))
        if (!java.security.MessageDigest.isEqual(
          expected.getBytes, s64.getBytes))
          return Left("Invalid token signature")
        val header = mapper.readTree(Base64.getUrlDecoder.decode(h64))
        if (header.path("alg").asText() != "HS256")
          return Left("Unsupported algorithm")
        val claims = mapper.readTree(Base64.getUrlDecoder.decode(p64))
        if (claims.has("exp") && claims.get("exp").asLong() < clock())
          return Left("Token expired")
        if (claims.path("aud").asText() != audience)
          return Left("Invalid audience")
        if (claims.path("iss").asText() != issuer)
          return Left("Invalid issuer")
        val scopes = claims.path("scope").asText("")
          .split(' ').filter(_.nonEmpty).toSet
        Right(Principal(claims.path("sub").asText("unknown"), scopes))
      case _ => Left("Malformed token")
    }
  }
}

object HmacJwtAuthenticator {
  /** Token minting for tests/tools (not a serving concern). */
  def mint(secret: Array[Byte], audience: String, issuer: String,
           subject: String, scopes: Seq[String], expEpochS: Long): String = {
    val enc = Base64.getUrlEncoder.withoutPadding
    def b64(s: String) = enc.encodeToString(s.getBytes(StandardCharsets.UTF_8))
    val header = b64("""{"alg":"HS256","typ":"JWT"}""")
    val payload = b64(
      s"""{"sub":"$subject","aud":"$audience","iss":"$issuer",""" +
        s""""scope":"${scopes.mkString(" ")}","exp":$expEpochS}""")
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(secret, "HmacSHA256"))
    val sig = enc.encodeToString(
      mac.doFinal(s"$header.$payload".getBytes(StandardCharsets.US_ASCII)))
    s"$header.$payload.$sig"
  }
}
