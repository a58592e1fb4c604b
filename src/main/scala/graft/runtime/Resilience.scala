package graft.runtime

/** Retry policy and OAuth2 token cache — the reference's resilience layer.
  *
  * Ref: Source/Services/RetryPolicies.cs:33-44 (N attempts × fixed delay,
  * cached per (env, count, delay)), Source/Services/OAuth2TokenService.cs:27-98
  * (client-credentials token cached for `expires_in` minus 60 s slack).
  */
object Resilience {

  final case class RetryPolicy(attempts: Int = 3, delayMillis: Long = 5000) {
    /** Run `f`, retrying on retryable failures with a fixed delay; the last
      * failure propagates. `sleep` injectable for tests. */
    def apply[T](retryable: Throwable => Boolean = _ => true,
                 sleep: Long => Unit = Thread.sleep)(f: => T): T = {
      // A non-positive attempts config still runs once — the zero-iteration
      // loop would otherwise `throw last` with last == null (NPE).
      val n = math.max(1, attempts)
      var last: Throwable = null
      var i = 0
      while (i < n) {
        try return f
        catch {
          case e: Throwable if retryable(e) && i < n - 1 =>
            last = e; sleep(delayMillis)
          case e: Throwable => throw e
        }
        i += 1
      }
      throw last
    }
  }

  /** The reference's retryable set: transient I/O + HTTP + DB errors
    * (RetryPolicies.cs:33-36). */
  def transientError(e: Throwable): Boolean = e match {
    case _: java.io.IOException => true
    case _: java.sql.SQLException => true
    case _: java.net.SocketTimeoutException => true
    case _ => false
  }

  /** OAuth2 client-credentials token cache: one token per endpoint key,
    * valid for (configured ∥ server expires_in ∥ 3600) − 60 s slack.
    * `fetch` performs the actual token call (injected — zero egress here);
    * it returns (accessToken, expiresInSeconds). */
  final class TokenCache(fetch: String => (String, Long),
                         clock: () => Long = () => System.currentTimeMillis()) {
    private val cache = scala.collection.mutable.Map[String, (String, Long)]()
    val SlackMillis = 60000L
    val DefaultLifetimeSeconds = 3600L

    def token(endpointKey: String): String = synchronized {
      cache.get(endpointKey) match {
        case Some((tok, validUntil)) if clock() < validUntil => tok
        case _ =>
          val (tok, expiresIn) = fetch(endpointKey)
          val lifetime = if (expiresIn > 0) expiresIn else DefaultLifetimeSeconds
          cache(endpointKey) = (tok, clock() + lifetime * 1000 - SlackMillis)
          tok
      }
    }

    def invalidate(endpointKey: String): Unit = synchronized { cache.remove(endpointKey) }
  }

  /** K2 auth header modes — Bearer / Basic / ApiKey / OAuth2
    * (ExportService.cs:228-262). */
  def authHeader(mode: String, credential: String,
                 apiKeyHeader: String = "X-Api-Key"): Map[String, String] =
    mode.toLowerCase match {
      case "bearer" => Map("Authorization" -> s"Bearer $credential")
      case "basic" => Map("Authorization" -> ("Basic " +
        java.util.Base64.getEncoder.encodeToString(
          credential.getBytes(java.nio.charset.StandardCharsets.UTF_8))))
      case "apikey" => Map(apiKeyHeader -> credential)
      case "oauth2" => Map("Authorization" -> s"Bearer $credential")
      case _ => Map.empty
    }
}
