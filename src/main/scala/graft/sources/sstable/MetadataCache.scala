package graft.sources.sstable

/** JVM-wide cache of per-file SSTable metadata — CompressionInfo, Summary,
  * bloom filter, and planned splits — keyed by `(path, length, mtime)` so
  * a rewritten file misses and re-reads (VERDICT r2 #5 / r3 #4).
  *
  * Why: every DSv2 scan re-plans splits, and the polling streaming source
  * ([[graft.sources.sstable.spark.SSTableMicroBatchStream]]) re-plans
  * every micro-batch; without a cache each plan re-reads Summary.db +
  * CompressionInfo.db (+ Filter.db for point lookups) for every file in
  * the directory — pure repeated metadata IO on immutable files. SSTable
  * filesets are write-once (the publish protocol renames Data.db into
  * place LAST, so a listed Data.db's stat uniquely identifies its final
  * content), which makes `(path, len, mtime)` a sound validity key.
  *
  * Scale shape: on a 1000-executor cluster the driver caches the
  * directory's metadata across queries (interactive reuse) and each
  * executor caches the files it re-plans (distributed planning) or
  * re-reads. Bounded LRU (default 1024 filesets) keeps bloom-filter
  * memory in check; entries are small (Summary is ~1/128 rows, splits a
  * few dozen tuples) except blooms, which dominate the bound.
  */
object SSTableMetadataCache {
  /** LRU capacity in filesets. Adjustable before first use (tests, or
    * drivers planning very wide directories). */
  @volatile var maxEntries: Int = 1024

  /** Validity key: Data.db stat PLUS a sibling stat (Summary.db length) —
    * a same-path rewrite whose Data.db is byte-identical within one mtime
    * tick (1 s-granularity filesystems; streaming replay reuses published
    * names) can still differ in sibling content, e.g. a different
    * `summaryInterval` produces an identical Data.db with a different
    * Summary.db (ADVICE r4). */
  private final case class K(path: String, len: Long, mtime: Long, summaryLen: Long)

  /** One fileset's memoized metadata. Obtained via [[entryFor]] (shared,
    * validity-keyed) or [[fresh]] (per-reader, uncached mode). */
  final class Entry private[SSTableMetadataCache] () {
    private[sstable] val compressionInfo = new Memo[Option[CompressionInfo]]
    private[sstable] val bloom = new Memo[Option[FilterFile.BloomFilter]]
    private[sstable] val summary = new Memo[(Int, Vector[SummaryEntry])]
    private[sstable] val indexLength = new Memo[Long]
    private[sstable] val statistics = new Memo[Option[SSTableStatistics]]
    private[sstable] val splits =
      new java.util.concurrent.ConcurrentHashMap[java.lang.Long, Vector[PlannedSplit]]
    private[sstable] def splitsFor(targetBytes: Long)
                                  (compute: => Vector[PlannedSplit]): Vector[PlannedSplit] =
      splits.computeIfAbsent(targetBytes, _ => compute)
  }

  /** Double-checked single-assignment slot (several Spark tasks may plan
    * the same file concurrently; `compute` runs at most once per entry). */
  private[sstable] final class Memo[T] {
    @volatile private var v: Option[T] = None
    def getOrCompute(compute: => T): T = v match {
      case Some(x) => x
      case None => synchronized {
        v match {
          case Some(x) => x
          case None => val x = compute; v = Some(x); x
        }
      }
    }
  }

  private val lru = new java.util.LinkedHashMap[K, Entry](64, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, Entry]): Boolean =
      size() > maxEntries
  }

  /** Shared entry for `path` as it currently stats; three stat calls, no
    * file IO. A concurrent rewrite changes (len, mtime, summaryLen) →
    * fresh entry. */
  def entryFor(path: String, storage: Storage): Entry = {
    val summaryLen =
      try storage.length(SSTableFiles.sibling(path, SSTableFiles.SummarySuffix))
      catch { case _: Exception => -1L } // absent sibling: constant sentinel
    val k = K(path, storage.length(path), storage.mtime(path), summaryLen)
    lru.synchronized {
      val e = lru.get(k)
      if (e != null) e
      else { val n = new Entry(); lru.put(k, n); n }
    }
  }

  /** Unshared entry — memoizes within one reader only (cache disabled). */
  def fresh(): Entry = new Entry()

  def clear(): Unit = lru.synchronized(lru.clear())
  def size: Int = lru.synchronized(lru.size())
}
