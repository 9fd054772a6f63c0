package graft.sources.arcgis

/** Portal credential → token fetcher for [[AuthCache]]: the engine analog of
  * the reference's `POST /api/esri {url, username, password}` auth exchange
  * (`/root/reference/task.ts:110-121`), speaking the public ArcGIS
  * `generateToken` REST API directly (f=json, referer-scoped token).
  *
  * Usage:
  * {{{
  * val cache = new AuthCache(PortalAuth.fetcher(
  *   "https://portal.example/arcgis/sharing/rest/generateToken",
  *   username, password, referer = "graft"))
  * val client = new HttpArcGisClient(layerUrl, auth = Some(cache), referer = Some("graft"))
  * }}}
  */
object PortalAuth {
  def fetcher(
      generateTokenUrl: String,
      username: String,
      password: String,
      referer: String,
      expirationMinutes: Int = 60
  ): () => (String, Long) = () => {
    val body = Seq(
      "username" -> username,
      "password" -> password,
      "referer" -> referer,
      "expiration" -> expirationMinutes.toString,
      "f" -> "json"
    ).map { case (k, v) =>
      java.net.URLEncoder.encode(k, "UTF-8") + "=" + java.net.URLEncoder.encode(v, "UTF-8")
    }.mkString("&")
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(generateTokenUrl))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
      .build()
    val res = java.net.http.HttpClient.newHttpClient()
      .send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    require(res.statusCode() < 400, s"generateToken failed: HTTP ${res.statusCode()}")
    val json = MiniJson.parse(res.body())
    // ArcGIS reports auth failures as 200 + {"error":{...}} — surface them
    json.obj("error").foreach { e =>
      throw new RuntimeException(s"generateToken rejected: ${e.str("message")}")
    }
    val token = json.strOpt("token").getOrElse(
      throw new RuntimeException(s"generateToken: no token in ${res.body().take(120)}"))
    val expires = json.num("expires").map(_.toLong)
      .getOrElse(System.currentTimeMillis() + expirationMinutes * 60000L)
    (token, expires)
  }
}

/** Expiry-aware auth token cache — the reference's `auth()` ephemeral store
  * (`/root/reference/task.ts:92-135`): reuse the token until it is within
  * `refreshMarginMs` of expiry (the reference refreshes at <5 s, P6
  * predicate at `task.ts:104-108`), then fetch a new one.
  *
  * In the engine this lives once per executor (lazy transient singleton in
  * the HTTP client), so token refreshes amortize across all partitions a
  * worker processes instead of once per request.
  */
class AuthCache(
    fetchToken: () => (String, Long), // (token, expiresEpochMs)
    refreshMarginMs: Long = 5000L,
    now: () => Long = () => System.currentTimeMillis()
) extends Serializable {

  @volatile private var cached: Option[(String, Long)] = None

  /** P6: absent, or expires within the margin → refresh. */
  private def needsRefresh: Boolean = cached match {
    case None => true
    case Some((_, expires)) => expires < now() + refreshMarginMs
  }

  def token(): String = {
    if (needsRefresh) synchronized {
      if (needsRefresh) cached = Some(fetchToken())
    }
    cached.get._1
  }

  def invalidate(): Unit = synchronized { cached = None }

  /** Forced refresh — the reference's `update()` connection-refresh hook
    * (`task.ts:137-153`): unconditionally re-authenticate NOW and cache the
    * new token, regardless of the expiry predicate. Used by schedule-style
    * maintenance (keep the stored credential warm) rather than the lazy
    * per-request path of [[token]].
    */
  def refresh(): String = synchronized {
    cached = Some(fetchToken())
    cached.get._1
  }
}
