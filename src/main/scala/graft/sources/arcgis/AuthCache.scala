package graft.sources.arcgis

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
