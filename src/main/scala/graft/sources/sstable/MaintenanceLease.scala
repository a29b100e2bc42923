package graft.sources.sstable

import java.nio.charset.StandardCharsets

/** Advisory mutual exclusion for the DESTRUCTIVE maintenance family
  * (in-place compaction, rollback, scrub-repair) — VERDICT r8 #1.
  *
  * The engine's single-maintainer contract used to be documentation
  * only, and `CALL graft.system.compact` made violating it as easy as
  * two operators typing the same statement: two concurrent bucketed
  * folds can unpublish each other's inputs mid-fold, the data-destroying
  * class of race. This turns that into a LOUD REFUSAL: every
  * maintenance entry point takes the directory's `_lease` file before
  * touching published state, and a second maintainer fails immediately
  * with the holder's identity in the message.
  *
  * Design (the same age-as-liveness rule as `vacuumStaging` and the
  * staged-DDL sweep):
  *
  *  - ACQUIRE: write `_lease-acquire-<uuid>` then `rename` it to
  *    `_lease`. Both backends' rename REFUSES an existing destination
  *    (LocalStorage checks, HDFS rename is atomic-and-refusing), so at
  *    most one contender's rename lands — losers read the winner's
  *    holder id for the refusal message.
  *  - RENEW: a daemon thread re-writes the file (atomic `replace`)
  *    every horizon/8 while the operation runs, keeping mtime fresh.
  *  - STEAL: a lease whose mtime is older than the horizon belongs to a
  *    dead maintainer (a live one renews at 8× that rate) and is
  *    deleted by the next acquirer, who then races for the name like
  *    any contender.
  *  - FENCE: destructive steps call [[MaintenanceLease.checkHeld]]
  *    before unpublishing — if the lease was stolen (the holder was
  *    presumed dead but is merely slow: a GC pause beyond the horizon,
  *    a partitioned NFS client), the old holder aborts instead of
  *    deleting files out from under the thief. The check-to-unpublish
  *    window is a metadata round-trip, vanishingly small against the
  *    horizon; byte-identical to the GC'd fold's re-validate pattern.
  *
  * The lease is ADVISORY for writers on purpose: flushes/appends are
  * publish-only and proven safe against a running maintainer
  * (ConcurrencyStressSpec); only maintainer-vs-maintainer mutates the
  * same published filesets destructively.
  */
final class MaintenanceLease private (dir: String, storage: Storage,
                                      val holder: String, horizonMs: Long) {
  import MaintenanceLease._
  @volatile private var lost = false
  /** Last instant we PROVED ownership (acquire / successful renew) —
    * the release-time staleness guard rides this, not the lease file's
    * mtime (which a thief refreshes). Package-visible so the spec can
    * simulate a renewal daemon stalled past the horizon (a GC pause /
    * partition) without faking the stall itself. */
  @volatile private[sstable] var lastOwnedMs = System.currentTimeMillis()
  private val renewer = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
    (r: Runnable) => {
      val t = new Thread(r, s"graft-lease-renew-$holder")
      t.setDaemon(true); t
    })
  private def leasePath = s"$dir/$LeaseFile"

  private[sstable] def startRenewal(): Unit = {
    val period = math.max(1L, horizonMs / 8)
    renewer.scheduleAtFixedRate(() =>
      try renew() catch { case _: Exception => lost = true },
      period, period, java.util.concurrent.TimeUnit.MILLISECONDS)
    ()
  }

  /** Re-stamp the lease (fresh mtime). Verifies ownership first: a
    * stolen lease must never be clobbered back — and because that check
    * is check-then-act against `replace` (ADVICE r9), re-verifies AFTER
    * the replace too, shrinking the undetected double-holder window to
    * the replace call itself: a steal landing around the replace is
    * caught here (mark lost, never trust this lease again) instead of
    * at the next fence, and a steal the replace itself clobbered is
    * re-detected by the THIEF's fence (holder bytes are ours again, so
    * the thief aborts loudly — the damage is a spurious abort, bounded
    * by design). */
  def renew(): Unit = {
    checkHeld()
    val tmp = s"$dir/$LeaseFile-renew-${java.util.UUID.randomUUID().toString.take(8)}"
    val out = storage.create(tmp)
    try out.write(holder.getBytes(StandardCharsets.UTF_8)) finally out.close()
    storage.replace(tmp, leasePath)
    readHolder(dir, storage) match {
      case Some(h) if h == holder => lastOwnedMs = System.currentTimeMillis()
      case other =>
        lost = true
        throw new MaintenanceLeaseLostException(dir, holder,
          other.getOrElse("<released>"))
    }
  }

  /** The FENCE: throw unless this lease is still ours. Call immediately
    * before every destructive step (unpublish, delete, restore). */
  def checkHeld(): Unit = {
    if (lost) throw new MaintenanceLeaseLostException(dir, holder)
    // NOTE: deliberately does NOT refresh lastOwnedMs — checkHeld proves
    // the bytes are ours but leaves the file's mtime (the thing the
    // steal rule reads) untouched; only renew() makes the lease
    // unstealable again, so only renew() counts as ownership proof for
    // release()'s staleness guard
    readHolder(dir, storage) match {
      case Some(h) if h == holder => ()
      case other =>
        lost = true
        throw new MaintenanceLeaseLostException(dir, holder,
          other.getOrElse("<released>"))
    }
  }

  /** Stop the renewal daemon WITHOUT releasing the lease. For holders
    * about to remove or rename away the leased directory itself (DROP's
    * trash swap, PURGE's delete): a renewal firing mid-removal re-creates
    * the vanished directory as an empty lease husk — `create` makes
    * parents on every backend, and on object stores a tree rename is a
    * long per-object copy+delete, so the window is minutes, not
    * microseconds. The husk then reads as an EMPTY live table (the
    * marker-less-dir contract) and blocks undrop. After this call the
    * lease file ages like a dead maintainer's: a removal outliving the
    * steal horizon is in the same class as a holder that crashed mid-swap
    * (the documented partial-trash crash shape), which is exactly what it
    * is from a contender's view. Idempotent; release() stays safe. */
  def stopRenewal(): Unit = {
    renewer.shutdownNow()
    renewer.awaitTermination(10, java.util.concurrent.TimeUnit.SECONDS)
    ()
  }

  /** Delete the lease iff still held (a stolen lease belongs to the
    * thief). Always stops the renewal thread.
    *
    * The ownership read below is check-then-act against the delete
    * (VERDICT r9 #2): a steal landing in that window would have its
    * FRESH lease deleted by us, letting a third maintainer in while the
    * thief is mid-fold (the thief's own fence still converts that to a
    * loud abort — no data is destroyed — but the spurious abort is
    * exactly what the fence should make rare). So a release whose last
    * PROVEN ownership is stale (older than half the steal horizon —
    * renewal runs at horizon/8, so a healthy lease is never near this)
    * skips the delete entirely: if nobody stole it, the husk ages out
    * under the normal steal path; if somebody did, their lease
    * survives. A fresh proof means any thief would have had to steal a
    * younger-than-half-horizon lease, which the steal rule forbids —
    * the delete is then safe against rule-following contenders. */
  def release(): Unit = {
    renewer.shutdownNow()
    renewer.awaitTermination(10, java.util.concurrent.TimeUnit.SECONDS)
    val staleOwnership =
      System.currentTimeMillis() - lastOwnedMs >= horizonMs / 2
    if (!lost && !staleOwnership && readHolder(dir, storage).contains(holder))
      storage.delete(leasePath)
  }
}

object MaintenanceLease {
  /** Lease file name — `_`-prefixed like every non-data internal, so
    * data listings, snapshots, and bucketed-layout guards never see it. */
  val LeaseFile = "_lease"

  /** Is `dir` a LEASE HUSK — a directory holding nothing but lease
    * litter (`_lease`, acquire/renew tmps)? The shape left behind when a
    * renewal or a contender's acquire raced a DROP/PURGE removing the
    * directory: `create` re-made the parent, the data is gone (in trash
    * or deleted), and only the lease machinery's files remain. A husk is
    * not a table — callers (DROP's residue sweep, undrop's restore) may
    * delete it. Any subdirectory or non-lease file means real content:
    * NOT a husk. A fully EMPTY directory is also not a husk — it could
    * be a user's hand-made (marker-less, readable-as-empty) table. */
  def isLeaseHusk(dir: String, storage: Storage): Boolean =
    storage.exists(dir) && storage.listSubdirs(dir, "").isEmpty && {
      val names = storage.listFiles(dir)
        .map(p => p.substring(p.lastIndexOf('/') + 1))
      names.nonEmpty && names.forall(_.startsWith(LeaseFile))
    }
  /** Default steal horizon. A LIVE maintainer renews every horizon/8
    * (~2 min), so only a maintainer dead or unreachable for the full
    * horizon loses its lease — the same liveness reasoning as
    * `vacuumStaging`, scaled to maintenance-operation runtimes. */
  val DefaultHorizonMs: Long = 15L * 60 * 1000

  /** Run a VOLUNTEER maintenance pass (write-triggered autocompact,
    * the streaming maintainers' pre-append folds, the batch df store's
    * auto-consolidation): swallow Held (someone else is maintaining —
    * yield to them) AND Lost (this pass stalled past the steal horizon
    * and was superseded — the work yields to the thief). Volunteered
    * work must never fail its host commit or kill its streaming query;
    * the next write simply volunteers again. ONE home for the
    * two-case contract (review find: it was copy-pasted at four
    * sites, and autoCompact encodes the same rule). */
  def volunteer(body: => Unit): Unit =
    try body catch {
      case _: MaintenanceLeaseHeldException => ()
      case _: MaintenanceLeaseLostException => ()
    }

  final class MaintenanceLeaseHeldException(dir: String, val holder: String)
      extends IllegalStateException(
        s"maintenance lease on $dir is held by '$holder' — one maintainer " +
          "per directory (concurrent in-place compaction/rollback/repair " +
          "can unpublish each other's inputs); wait for it to finish, or " +
          s"if it is dead its lease expires after the steal horizon")

  final class MaintenanceLeaseLostException(dir: String, holder: String,
                                            thief: String = "<unknown>")
      extends IllegalStateException(
        s"maintenance lease on $dir was lost by '$holder' (now '$thief'): " +
          "this maintainer was presumed dead and superseded — aborting " +
          "before touching published state")

  private lazy val localHost: String =
    try java.net.InetAddress.getLocalHost.getHostName
    catch { case _: Exception => "unknown-host" }

  /** Read-only lease snapshot for the health surface (round 18): the
    * current holder id (None = free) and whether it is STALE — past the
    * steal horizon, the dead-maintainer signature. Racing a release is
    * benign (a vanished lease reads as free). */
  def holderInfo(dir: String, storage: Storage,
                 horizonMs: Long = DefaultHorizonMs,
                 nowMs: () => Long = () => System.currentTimeMillis())
      : Option[(String, Boolean)] =
    readHolder(dir, storage).map { h =>
      val stale =
        try nowMs() - storage.mtime(s"$dir/$LeaseFile") > horizonMs
        catch { case _: Exception => false }
      (h, stale)
    }

  private def readHolder(dir: String, storage: Storage): Option[String] = {
    val p = s"$dir/$LeaseFile"
    if (!storage.exists(p)) return None
    try Some(storage.readString(p))
    catch {
      // vanished between exists and open: released/stolen mid-read
      case _: java.io.IOException | _: java.nio.file.NoSuchFileException => None
    }
  }

  /** Take the directory's maintenance lease or refuse loudly. `op` is
    * carried in the holder id so the refusal names WHAT is running, not
    * just that something is. */
  def acquire(dir: String, storage: Storage, op: String,
              horizonMs: Long = DefaultHorizonMs,
              nowMs: () => Long = () => System.currentTimeMillis()): MaintenanceLease = {
    val holder = s"$op@$localHost#" +
      java.util.UUID.randomUUID().toString.take(8)
    val leasePath = s"$dir/$LeaseFile"
    var attempts = 0
    var lastIo: java.io.IOException = null
    while (attempts < 3) {
      attempts += 1
      readHolder(dir, storage) match {
        case Some(h) =>
          // the mtime read races the holder's release: HadoopStorage.mtime
          // THROWS on a vanished path (LocalStorage returns 0, which
          // masked this in tests — VERDICT r9 #1), and the raw
          // FileNotFoundException is neither Held nor Lost, so a
          // committing write that merely volunteered for autocompact
          // would fail on it. A vanished lease is the same "released
          // mid-read" case readHolder already tolerates: fall through
          // and race for the name like any contender.
          val leaseMtime =
            try Some(storage.mtime(leasePath))
            catch {
              case _: java.io.FileNotFoundException |
                   _: java.nio.file.NoSuchFileException => None
            }
          leaseMtime match {
            case Some(m) if nowMs() - m <= horizonMs =>
              throw new MaintenanceLeaseHeldException(dir, h)
            case Some(_) =>
              // stale: its maintainer stopped renewing a full horizon
              // ago — presumed dead; delete and race for the name like
              // any contender (two stealers: one rename lands, one
              // refuses)
              storage.delete(leasePath)
            case None => () // vanished: released between read and stat
          }
        case None => ()
      }
      val tmp = s"$dir/$LeaseFile-acquire-${java.util.UUID.randomUUID().toString.take(8)}"
      val out = storage.create(tmp)
      try out.write(holder.getBytes(StandardCharsets.UTF_8)) finally out.close()
      try {
        storage.rename(tmp, leasePath)
        val lease = new MaintenanceLease(dir, storage, holder, horizonMs)
        lease.startRenewal()
        return lease
      } catch {
        case e: java.io.IOException =>
          // lost the rename race; report the winner (or loop if it
          // already vanished again)
          lastIo = e
          storage.delete(tmp)
          readHolder(dir, storage) match {
            case Some(h) => throw new MaintenanceLeaseHeldException(dir, h)
            case None => () // winner released instantly; retry
          }
      }
    }
    // Exhaustion with nobody visibly holding: either contenders kept
    // winning and releasing inside our rename→read window (fast ops
    // finish in ~1.4 ms — genuine churn, excusable as Held), or the
    // rename itself is broken (EACCES, quota — must stay loud, or
    // autocompact silently swallows it forever). Discriminate with a
    // CONTENTION-FREE probe rename to a unique name: if that works,
    // the storage is fine and the failures were races (review r9 #1).
    val pTmp = s"$dir/$LeaseFile-probe-${java.util.UUID.randomUUID().toString.take(8)}"
    val probeOk =
      try {
        val out = storage.create(s"$pTmp.src")
        try out.write(holder.getBytes(StandardCharsets.UTF_8)) finally out.close()
        storage.rename(s"$pTmp.src", pTmp)
        true
      } catch { case _: Exception => false }
      finally { // best-effort: neither probe name may outlive the call
        try { storage.delete(pTmp); storage.delete(s"$pTmp.src") }
        catch { case _: Exception => () }
      }
    if (probeOk)
      throw new MaintenanceLeaseHeldException(dir,
        s"<acquire/release churn after $attempts attempts>")
    throw new IllegalStateException(
      s"could not acquire maintenance lease on $dir after $attempts attempts " +
        "and no holder is visible — the lease rename itself is failing", lastIo)
  }

  /** Run `body` under the directory's lease: acquire → auto-renew →
    * release, exception-safe. The body receives the lease for fencing
    * ([[MaintenanceLease.checkHeld]] before destructive steps). */
  def withLease[T](dir: String, storage: Storage, op: String,
                   horizonMs: Long = DefaultHorizonMs)(body: MaintenanceLease => T): T = {
    val lease = acquire(dir, storage, op, horizonMs)
    try body(lease) finally lease.release()
  }

  /** [[withLease]] that WAITS OUT a live holder instead of refusing —
    * the streaming maintainers' shape (ADVICE r15): a micro-batch that
    * finds a retraction CALL holding its store's lease must not kill
    * the whole streaming query with a refusal; it polls until the
    * holder releases (maintenance CALLs run seconds-to-minutes), then
    * proceeds. Still LOUD past `waitMs`: a holder outliving the steal
    * horizon is dead anyway and gets stolen by the inner acquire. */
  def withLeaseAwait[T](dir: String, storage: Storage, op: String,
                        horizonMs: Long = DefaultHorizonMs,
                        waitMs: Long = DefaultHorizonMs,
                        pollMs: Long = 500L)(body: MaintenanceLease => T): T = {
    val deadline = System.currentTimeMillis() + waitMs
    while (true) {
      try return withLease(dir, storage, op, horizonMs)(body)
      catch {
        case e: MaintenanceLeaseHeldException =>
          if (System.currentTimeMillis() >= deadline)
            throw new IllegalStateException(
              s"$op waited ${waitMs}ms for the maintenance lease on $dir " +
                s"(holder '${e.holder}') without it releasing — a live " +
                "maintainer should finish well inside the steal horizon",
              e)
          Thread.sleep(pollMs)
      }
    }
    sys.error("unreachable")
  }
}
