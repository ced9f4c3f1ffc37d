package graft.operators

import java.lang.ref.WeakReference
import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.SparkSession

/** Session-scoped memo cache for persisted corpus artifacts (shingle
  * frames, IVF indexes, graph edge builds, …).
  *
  * Entries are keyed by a per-session UUID — not by
  * `System.identityHashCode`, which can be recycled after GC and would hand
  * a new session a dead session's persisted plans. Lifecycle, honestly
  * stated:
  *
  *  - **Stopped contexts**: every access sweeps entries whose
  *    SparkContext is stopped (or whose session was GC'd) — a restarted
  *    application never accumulates dead entries.
  *  - **Cycled sessions on a LIVE context** (`newSession()` per job in a
  *    long-lived service): a DataFrame value strongly references its
  *    session, so the weak reference cannot clear while the entry exists —
  *    automatic sweeping is impossible by construction for DataFrame
  *    values. The supported path is the explicit invalidation hook:
  *    [[releaseSession]] drops the finished session's entries from EVERY
  *    registered cache and hands them to a per-cache release callback
  *    (unpersist). This is the "explicit invalidation hook when a session
  *    stops" half of the round-6 ADVICE; the weak-ref sweep is the other.
  *
  * The values are usually `.persist()`-ed DataFrames: once the owning
  * session/context is stopped its cached blocks are already released, so
  * the stopped-context sweep only drops the map entry, never unpersists.
  */
private[graft] final class SessionCache[K, V](
    release: V => Unit = (_: V) => ()) {

  /** Value cell. `computeIfAbsent` inserts this cheaply; the build runs on
    * first [[force]] OUTSIDE the map's bin lock. CHM's mapping functions
    * must be short and non-reentrant — a full Spark corpus build inside one
    * would serialize unrelated keys that collide on the bin for the whole
    * build and deadlock any recursive compute into the same cache. `lazy
    * val` gives per-cell synchronization instead: concurrent callers of the
    * SAME key block on the cell; a failed build leaves the lazy val
    * uninitialized, so the next caller retries. */
  private final class Cell(s: SparkSession, f: () => V) {
    val session = new WeakReference(s)
    @volatile private var computed = false
    lazy val force: V = { val v = f(); computed = true; v }
    /** The value iff a build ever completed — eviction/release paths must
      * not run a build just to tear its result down. */
    def peek: Option[V] = if (computed) Some(force) else None
  }

  private val map = new ConcurrentHashMap[(String, K), Cell]()

  SessionCache.register(this)

  /** Drop every entry of this session and run the release callback on each
    * value (part of the global [[SessionCache.releaseSession]] hook). */
  private[graft] def releaseAll(s: SparkSession): Unit =
    removeIf(s)(_ => true).foreach(v => scala.util.Try(release(v)))

  // Stable per-session identifier: a UUID minted on first sight, held in a
  // weak identity map (SparkSession doesn't override equals). Unlike
  // `System.identityHashCode`, a UUID is never recycled, so a new session
  // can never alias a dead session's cache entries; the weak keys mean the
  // id table itself can't pin sessions. (`SparkSession.sessionUUID` would
  // be the natural key but is private[sql].)
  private[this] val sessionIds = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  private def sessionKey(s: SparkSession): String =
    sessionIds.computeIfAbsent(s, _ => java.util.UUID.randomUUID().toString)

  def getOrCompute(s: SparkSession, k: K)(f: => V): V = {
    sweep()
    map.computeIfAbsent((sessionKey(s), k), _ => new Cell(s, () => f)).force
  }

  /** Drop one entry; returns the evicted value (if ever built) so callers
    * can unpersist. */
  def remove(s: SparkSession, k: K): Option[V] =
    Option(map.remove((sessionKey(s), k))).flatMap(_.peek)

  /** Drop every entry of this session whose key matches; returns the
    * evicted values (invalidation hook for corpus replacement). */
  def removeIf(s: SparkSession)(pred: K => Boolean): Seq[V] = {
    val sk = sessionKey(s)
    val out = Seq.newBuilder[V]
    val it = map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 == sk && pred(e.getKey._2)) {
        out ++= e.getValue.peek
        it.remove()
      }
    }
    out.result()
  }

  /** Corpus-replacement form of [[removeIfAll]]: drop matching entries
    * across ALL sessions and run this cache's OWN release callback on each
    * evicted value (unpersist / scratch-dir delete — whatever the cache
    * was constructed with). Every per-module `invalidateCorpus` hook rides
    * this, so the release semantics live in one place per cache instead of
    * being re-stated at each hook site. */
  def invalidateIfAll(pred: K => Boolean): Unit =
    removeIfAll(pred).foreach(v => scala.util.Try(release(v)))

  /** Drop matching entries across ALL sessions (corpus-replacement hooks
    * that invalidate by data dir, session-agnostic); returns evicted
    * values. */
  def removeIfAll(pred: K => Boolean): Seq[V] = {
    val out = Seq.newBuilder[V]
    val it = map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (pred(e.getKey._2)) {
        out ++= e.getValue.peek
        it.remove()
      }
    }
    out.result()
  }

  private def sweep(): Unit = {
    val it = map.entrySet().iterator()
    while (it.hasNext) {
      val sess = it.next().getValue.session.get()
      if (sess == null || sess.sparkContext.isStopped) it.remove()
    }
  }

  /** Visible for tests: live entry count after a sweep. */
  private[graft] def size: Int = { sweep(); map.size() }
}

object SessionCache {
  // Registry of every cache instance (they are all object-level lazy vals —
  // a bounded, static population), so a long-lived service can release one
  // finished session's artifacts across ALL operator caches with one call.
  private val registry =
    java.util.Collections.synchronizedList(
      new java.util.ArrayList[SessionCache[_, _]]())

  private def register(c: SessionCache[_, _]): Unit = registry.add(c)

  /** The explicit end-of-session invalidation hook: drop (and release —
    * unpersist, by each cache's callback) every memoized artifact owned by
    * `s` in every cache. Call this when a long-lived service is done with
    * a session created via `newSession()` on a shared context; stopped
    * contexts are swept automatically, cycled-but-live sessions cannot be
    * (their DataFrames pin the session — see the class scaladoc). */
  def releaseSession(s: SparkSession): Unit = {
    val it = registry.iterator()
    while (it.hasNext) it.next().releaseAll(s)
  }
}
