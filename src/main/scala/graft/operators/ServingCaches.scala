package graft.operators

import org.apache.spark.sql.SparkSession

/** Explicit lifecycle for the library's session-scoped serving caches
  * (round 16, VERDICT r15 #6). The query library memoizes per (session,
  * corpus): trained quantizers and clusterings (`localCheckpoint`-backed
  * frames), persisted serving intermediates (the TF-IDF probe batch, the
  * ANN rerank shortlist), and built fixtures (store directories, catalog
  * names). Their lifetime is deliberately the session's — repeated
  * serving calls reuse one copy — but a LONG-LIVED session that cycles
  * corpora needs a way to hand the memory back without `session.stop()`.
  *
  * [[release]] drops ONE session's entries across every cache in the
  * library and disposes the executor-side state they pinned: persisted
  * frames leave the CacheManager (their `InMemoryRelation` buffers are
  * freed), checkpointed frames' block-manager blocks are dropped, and
  * fixture memos are forgotten (their directories stay on disk; the
  * fixture builders recreate-over on next use). The next serving call
  * after a release simply rebuilds — FUTURE correctness never depends
  * on a cache hit, so new calls after a release are always exact; it
  * costs the rebuild. One caveat (ADVICE r16): a result DataFrame
  * returned BEFORE the release may still reference the disposed
  * `localCheckpoint` blocks, which are unrecoverable once dropped —
  * re-collecting such an outstanding frame can fail on recompute.
  * Release when the corpus's outstanding results are done with, the
  * same contract as Spark's own `unpersist(blocking = true)`.
  *
  * Scoping (round 17, VERDICT r16 #6): `release(s)` drops the whole
  * session's entries; `release(s, Some(corpusDir))` drops only that
  * corpus's, so a session serving many corpora can cycle one without
  * dumping (and later rebuilding) every other corpus's trained state.
  *
  * SQL surface: `CALL <catalog>.system.release_serving_caches()`, with
  * an optional `corpus_dir` argument for the scoped form. */
object ServingCaches {

  /** Release `s`'s serving-cache entries — all of them, or only the
    * ones keyed by `corpusDir`. Returns the number of entries dropped
    * (across all registered caches). */
  def release(s: SparkSession, corpusDir: Option[String] = None): Long = {
    import scala.jdk.CollectionConverters._
    SessionCache.registry.asScala.foldLeft(0L)(_ + _.releaseSession(s, corpusDir))
  }

  /** The session's currently-cached DataFrame values across all caches —
    * the introspection hook specs use to assert that [[release]]
    * actually freed the backing storage (persisted AND checkpointed
    * RDDs all register in `sc.getPersistentRDDs`). */
  private[graft] def sessionFrames(s: SparkSession,
                                   corpusDir: Option[String] = None) = {
    import scala.jdk.CollectionConverters._
    SessionCache.registry.asScala.toSeq.flatMap(_.sessionFrames(s, corpusDir))
  }

  /** The `localCheckpoint` RDD ids a cached frame pins (empty for
    * persisted-only frames) — spec introspection. */
  private[graft] def checkpointRddIds(df: org.apache.spark.sql.DataFrame) =
    SessionCache.checkpointRddIds(df)
}
