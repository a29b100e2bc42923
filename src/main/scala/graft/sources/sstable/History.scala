package graft.sources.sstable

import java.nio.charset.StandardCharsets

/** Append-only operation history for an SSTable directory (VERDICT r8
  * #3 — Delta's DESCRIBE HISTORY, Iceberg's snapshot log): every commit
  * and maintenance action records WHAT happened, WHEN, and which
  * filesets it added/removed, under `_history/` — one metadata-sized
  * file per event, so the log is append-only BY CONSTRUCTION on any
  * backend (no file-append primitive needed; object stores append by
  * creating objects). `t.generations`/`t.snapshots` show current state;
  * this shows how it got there — and unlike CDC diffs it requires no
  * advance snapshot.
  *
  * Event files are named `ev-<epochMs, zero-padded>-<nanos>-<uuid>`, so
  * a lexical sort of the listing IS time order (ties broken by the
  * monotonic-ish nano component, then the uuid). Each file is
  * `k=v`-per-line like the catalog's `_table`, written to a `.tmp` name
  * and renamed — a reader listing mid-write never sees a torn event.
  * Fileset names are generation STEMS (no directory, no suffix): the
  * identity `t.generations` and `_generation` expose.
  *
  * The log is invisible to everything else by the `_` prefix: data
  * listings see only `*-Data.db`, snapshots capture only filesets,
  * rollback unpublishes only filesets — history SURVIVES rollback, and
  * the rollback itself is an event. Retention is the operator's call
  * (the files are tiny); `DROP TABLE`/`TRUNCATE`-then-drop removes the
  * directory wholesale. */
object History {
  val DirName = "_history"
  private val EventPrefix = "ev-"

  /** ORDERING CONTRACT (pinned by CrossProcessSpec). Event ids sort as
    * `(epochMs, per-process counter, uuid)`, and the reader's order IS
    * that lexical order — stable for every reader on every read. What
    * that buys, by scope:
    *  - ONE process: true order always — the counter breaks same-ms
    *    ties in emission order (the case that matters: a commit and the
    *    fold it triggered can share a millisecond).
    *  - TWO processes, different milliseconds: true order, to clock
    *    skew — the same trust every distributed log places in wall
    *    clocks.
    *  - TWO processes, SAME millisecond: arbitrary-but-STABLE order
    *    (counter, then uuid — two independent counters are not
    *    comparable, so the order can invert real time WITHIN that
    *    millisecond). This is deliberate: a same-ms cross-process tie
    *    has no observable "real" order worth a coordination round-trip;
    *    what the audit log owes readers is that the order never
    *    CHANGES between reads, which name-sorting guarantees. */
  private val seq = new java.util.concurrent.atomic.AtomicLong(0)

  final case class Event(id: String, tsMs: Long, op: String,
                         added: Seq[String], removed: Seq[String],
                         detail: String)

  /** Record one event. Loud on storage failure — history rides the same
    * storage as the data it describes, and a store that cannot write a
    * 200-byte file is a store the surrounding commit should not trust
    * either. Names in `added`/`removed` may be full paths or stems;
    * normalized to stems here. */
  def record(storage: Storage, dir: String, op: String,
             added: Seq[String] = Nil, removed: Seq[String] = Nil,
             detail: String = ""): Unit = {
    require(op.nonEmpty && !op.exists(c => c == '\n' || c == '\r'), s"bad op: '$op'")
    require(!detail.exists(c => c == '\n' || c == '\r'),
      s"history detail must be one line: '$detail'")
    val hd = s"$dir/$DirName"
    storage.mkdirs(hd)
    val ts = System.currentTimeMillis()
    // same-millisecond tiebreaker: a process-global monotonic counter,
    // NOT nanoTime%N (which wraps every N ns independently of the ms
    // clock, so a later event could sort lexically earlier — review r9)
    val name = f"$EventPrefix$ts%013d-${seq.getAndIncrement() % 100000000}%08d-" +
      java.util.UUID.randomUUID().toString.take(8)
    val body = Seq(
      s"op=$op",
      s"ts=$ts",
      s"added=${added.map(stem).mkString(",")}",
      s"removed=${removed.map(stem).mkString(",")}",
      s"detail=$detail").mkString("\n")
    val tmp = s"$hd/$name.tmp"
    val out = storage.create(tmp)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    storage.rename(tmp, s"$hd/$name")
  }

  /** The directory's events, oldest first. Skips in-flight `.tmp` files;
    * a malformed event file is loud (the log is small and write-once —
    * corruption means something is wrong with the store). */
  def events(storage: Storage, dir: String): Seq[Event] = {
    val hd = s"$dir/$DirName"
    import scala.collection.parallel.CollectionConverters._
    val files = storage.listFiles(hd)
      .filter { p =>
        val n = fileName(p)
        n.startsWith(EventPrefix) && !n.endsWith(".tmp")
      }
      .sorted
    // one tiny read per event, parallelized on the driver like split
    // planning (a year of hourly commits is ~10k files — serial
    // object-store round-trips would dominate the t.history scan).
    // A file that VANISHES between the listing and its read was
    // expired by a concurrent retention run — skip it (the readHolder
    // tolerance pattern); the scan then reflects the post-expiry log
    files.par.flatMap { p =>
      val body =
        try Some(storage.readString(p))
        catch {
          case _: java.io.FileNotFoundException |
               _: java.nio.file.NoSuchFileException => None
        }
      body.map { text =>
        val kv = text.split("\n").toSeq.flatMap { line =>
          val i = line.indexOf('=')
          if (i <= 0) None else Some(line.take(i) -> line.drop(i + 1))
        }.toMap
        def names(k: String): Seq[String] =
          kv.getOrElse(k, "").split(",").iterator.map(_.trim).filter(_.nonEmpty).toSeq
        Event(fileName(p),
          kv.getOrElse("ts", throw new IllegalStateException(
            s"malformed history event (no ts): $p")).toLong,
          kv.getOrElse("op", throw new IllegalStateException(
            s"malformed history event (no op): $p")),
          names("added"), names("removed"), kv.getOrElse("detail", ""))
      }
    }.seq.toSeq
  }

  /** Capture the log's raw event files (name → body) so a
    * directory-REPLACING operation (rebucket's CREATE OR REPLACE swap)
    * can carry the audit trail across — the one maintenance action
    * whose mechanics would otherwise trash the log with the old
    * directory, silently breaking the append-only contract (review
    * r9). Metadata-sized by the same argument as [[events]]. */
  def exportLog(storage: Storage, dir: String): Seq[(String, String)] =
    storage.listFiles(s"$dir/$DirName")
      .filter { p =>
        val n = fileName(p)
        n.startsWith(EventPrefix) && !n.endsWith(".tmp")
      }
      .sorted.flatMap { p =>
        // vanished to a concurrent retention run: skip, like events()
        try Some(fileName(p) -> storage.readString(p))
        catch {
          case _: java.io.FileNotFoundException |
               _: java.nio.file.NoSuchFileException => None
        }
      }

  /** Re-materialize an [[exportLog]] capture under `dir` (original
    * names, so ordering and ids survive verbatim); existing names are
    * left alone — import is idempotent. */
  def importLog(storage: Storage, dir: String,
                entries: Seq[(String, String)]): Unit = {
    if (entries.isEmpty) return
    val hd = s"$dir/$DirName"
    storage.mkdirs(hd)
    entries.foreach { case (name, body) =>
      val dst = s"$hd/$name"
      if (!storage.exists(dst)) {
        // tmp name does NOT carry the event prefix: an old event's
        // ms-stamped `<name>.tmp` would look like sweepable litter to a
        // racing expire run and vanish between create and rename
        val tmp = s"$hd/imp-${java.util.UUID.randomUUID().toString.take(8)}.tmp"
        val out = storage.create(tmp)
        try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
        storage.rename(tmp, dst)
      }
    }
  }

  /** Retention for the log: remove events older than the horizon (the
    * timestamp is IN the file name, so this is a pure listing + name
    * parse — no file reads). The log is an audit trail, not state:
    * expiring old events changes nothing about the directory's data,
    * and `t.history` simply starts later. Returns (removed, kept)
    * event counts. */
  def expire(storage: Storage, dir: String, olderThanMs: Long,
             nowMs: Long = System.currentTimeMillis()): (Int, Int) = {
    val hd = s"$dir/$DirName"
    val all = storage.listFiles(hd)
      .filter(p => fileName(p).startsWith(EventPrefix))
    // orphaned `.tmp` files (a writer that died between create and
    // rename) are invisible to events() but would otherwise accumulate
    // forever — retention is their one cleanup path (review r9); they
    // carry the same ms-stamped name, so the same horizon applies
    val (stale, live) = all.partition { p =>
      val msPart = fileName(p).drop(EventPrefix.length).takeWhile(_.isDigit)
      msPart.nonEmpty && nowMs - msPart.toLong > olderThanMs
    }
    stale.foreach(storage.delete)
    // importLog's `imp-*.tmp` scratch deliberately carries no event
    // prefix (so a racing expire never mistakes a mid-import file for
    // sweepable litter by NAME) — which means an import that crashed
    // between create and rename leaks its tmp forever unless swept HERE
    // (ADVICE r9). Age-based by MTIME (the name has no timestamp), so a
    // live import — seconds long — is never raced; vanished-mid-stat
    // means the rename landed, skip.
    storage.listFiles(hd)
      .filter { p =>
        val n = fileName(p)
        n.startsWith("imp-") && n.endsWith(".tmp") && {
          try nowMs - storage.mtime(p) > olderThanMs
          catch {
            case _: java.io.FileNotFoundException |
                 _: java.nio.file.NoSuchFileException => false
          }
        }
      }
      .foreach(storage.delete)
    // counts cover real events only — tmp litter is not part of the log
    (stale.count(!_.endsWith(".tmp")), live.count(!_.endsWith(".tmp")))
  }

  private def stem(pathOrName: String): String = {
    val n = fileName(pathOrName)
    if (n.endsWith(SSTableFiles.DataSuffix))
      n.dropRight(SSTableFiles.DataSuffix.length)
    else n
  }

  private def fileName(path: String): String =
    path.substring(path.lastIndexOf('/') + 1)
}
