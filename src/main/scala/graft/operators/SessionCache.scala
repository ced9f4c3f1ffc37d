package graft.operators

import java.lang.ref.WeakReference
import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.SparkSession

/** Session-scoped memo cache for persisted corpus artifacts (shingle
  * frames, IVF indexes, graph edge builds, …).
  *
  * Entries are keyed by the session's stable `sessionUUID` — not by
  * `System.identityHashCode`, which can be recycled after GC and would hand
  * a new session a dead session's persisted plans. Each entry additionally
  * holds a weak reference to its owning session, and every access sweeps
  * entries whose session has been collected or whose SparkContext is
  * stopped, so caches cannot grow without bound in a long-lived service
  * that cycles sessions (the round-6 ADVICE leak).
  *
  * The values are usually `.persist()`-ed DataFrames: once the owning
  * session/context is stopped its cached blocks are already released, so
  * the sweep only needs to drop the map entry, never unpersist.
  */
private[graft] final class SessionCache[K, V] {
  private val map =
    new ConcurrentHashMap[(String, K), (WeakReference[SparkSession], V)]()

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
    map.computeIfAbsent((sessionKey(s), k), _ => (new WeakReference(s), f))._2
  }

  /** Drop one entry; returns the evicted value so callers can unpersist. */
  def remove(s: SparkSession, k: K): Option[V] =
    Option(map.remove((sessionKey(s), k))).map(_._2)

  /** Drop every entry of this session whose key matches; returns the
    * evicted values (invalidation hook for corpus replacement). */
  def removeIf(s: SparkSession)(pred: K => Boolean): Seq[V] = {
    val sk = sessionKey(s)
    val out = Seq.newBuilder[V]
    val it = map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 == sk && pred(e.getKey._2)) {
        out += e.getValue._2
        it.remove()
      }
    }
    out.result()
  }

  /** Drop matching entries across ALL sessions (corpus-replacement hooks
    * that invalidate by data dir, session-agnostic); returns evicted
    * values. */
  def removeIfAll(pred: K => Boolean): Seq[V] = {
    val out = Seq.newBuilder[V]
    val it = map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (pred(e.getKey._2)) {
        out += e.getValue._2
        it.remove()
      }
    }
    out.result()
  }

  private def sweep(): Unit = {
    val it = map.entrySet().iterator()
    while (it.hasNext) {
      val sess = it.next().getValue._1.get()
      if (sess == null || sess.sparkContext.isStopped) it.remove()
    }
  }

  /** Visible for tests: live entry count after a sweep. */
  private[graft] def size: Int = { sweep(); map.size() }
}
