package graft.operators

import org.apache.spark.sql.SparkSession

/** Session-scoped memo for trained/derived relations (clusterings,
  * quantizers, written fixtures) shared between a "fresh" producer query
  * and its "cached" consumers.
  *
  * Keyed by the session's UUID, not `System.identityHashCode(session)`:
  * identity hash codes are reused by the JVM, so after a session stops a
  * NEW session could collide with the dead one's entry and be served a
  * `localCheckpoint`-backed DataFrame whose backing RDDs are gone —
  * failing confusingly at use time. `sessionUUID` is random per session
  * instance and never reused.
  *
  * Eviction: entries cannot be weakly collected (the cached DataFrames
  * themselves reference their session), so every access sweeps entries
  * whose underlying SparkContext has stopped — in classic Spark a
  * session's lifetime ends with its context (`session.stop()` stops the
  * context), so dead sessions' entries are reclaimed on the next access
  * by anyone, bounding the map to live sessions × corpora. */
private[graft] final class SessionCache[V] {
  private final case class Entry(session: SparkSession, value: V)
  private val m =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Entry]

  private def stopped(s: SparkSession): Boolean =
    try s.sparkContext.isStopped catch { case _: Exception => true }

  private def sweep(): Unit = {
    val it = m.entrySet().iterator()
    while (it.hasNext) if (stopped(it.next().getValue.session)) it.remove()
  }

  /** Memoized lookup: computes (and caches) `f` on first access per
    * (session, key). */
  def getOrCompute(s: SparkSession, key: String)(f: => V): V = {
    sweep()
    m.computeIfAbsent((SessionCache.id(s), key), _ => Entry(s, f)).value
  }

  /** Unconditional refresh: callers that must price a real recompute
    * (bench-visible producers) store their fresh result here. */
  def put(s: SparkSession, key: String, v: V): Unit = {
    sweep()
    m.put((SessionCache.id(s), key), Entry(s, v))
  }
}

private[graft] object SessionCache {
  /** Stable unique id for a session: the classic runtime's random
    * per-instance UUID (`sessionUUID` is JVM-public but `private[sql]`
    * to Scala, hence the one-time reflective handle). The identity-hash
    * fallback only runs on implementations without the field, which
    * never share a JVM with the classic ones this library runs on. */
  private val uuidMethod: Option[java.lang.reflect.Method] =
    try Some(Class.forName("org.apache.spark.sql.classic.SparkSession")
      .getMethod("sessionUUID"))
    catch { case _: Exception => None }

  def id(s: SparkSession): String =
    uuidMethod.filter(_.getDeclaringClass.isInstance(s))
      .map(_.invoke(s).asInstanceOf[String])
      .getOrElse(s"identity-${System.identityHashCode(s)}")
}
