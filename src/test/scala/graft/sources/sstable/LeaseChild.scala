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
  /** The storage the DIR's scheme selects — `objsim://` runs this child
    * over the object-store-semantics adapter (same selection the parent
    * made), everything else stays LocalStorage. */
  private def storageFor(dir: String): Storage =
    if (dir.startsWith("objsim://")) new HadoopStorage(ObjSimFileSystem.conf())
    else LocalStorage

  def main(args: Array[String]): Unit = {
    val Array(mode, dir, horizon) = args.take(3)
    val st = storageFor(dir)
    def touch(path: String): Unit = st.create(path).close()
    def awaitFile(path: String, deadlineMs: Long): Boolean = {
      while (System.currentTimeMillis() < deadlineMs) {
        if (st.exists(path)) return true
        Thread.sleep(20)
      }
      false
    }
    val deadline = System.currentTimeMillis() + 30000
    mode match {
      case "hold" =>
        val lease = MaintenanceLease.acquire(dir, st, "child-op",
          horizonMs = horizon.toLong)
        touch(s"$dir/child-acquired")
        val ok = awaitFile(s"$dir/parent-done", deadline)
        lease.release()
        sys.exit(if (ok) 0 else 3)
      case "holdForever" =>
        MaintenanceLease.acquire(dir, st, "doomed-child",
          horizonMs = horizon.toLong)
        touch(s"$dir/child-acquired")
        Thread.sleep(600000) // killed by the parent long before this
      case "slowVictim" =>
        val lease = MaintenanceLease.acquire(dir, st, "slow-child",
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
      case "swapper" =>
        // the REPLACE side of the cross-process writer race (VERDICT r10
        // #5): wait until the parent's INSERT signals it has PUBLISHED
        // (but not yet verified), then perform a real REPLACE-shaped
        // swap from THIS process — old table dir (first publish
        // included) to trash, fresh directory at the same path — and
        // signal back. The parent's commit must follow the table
        // identity into the replacement, exactly once.
        val parent = dir.substring(0, dir.lastIndexOf('/'))
        if (!awaitFile(s"$parent/parent-publishing", deadline)) sys.exit(3)
        st.rename(dir, s"$parent/_dropped-swapchild-deadbeef")
        st.mkdirs(dir)
        touch(s"$parent/child-swapped")
        sys.exit(0)
      case "observer" =>
        // cross-process READER of the pointer-commit contract (r12): an
        // independent JVM resolves the table exactly the way the
        // on-disk protocol specifies — the `graft.state` line of
        // `_table` (the same k=v format TableState parses; duplicated
        // here deliberately: this child proves the DISK FORMAT is the
        // contract, with no shared in-process state), redirects
        // followed, residue refused — lists the data generations, then
        // RE-CHECKS the state after the listing (the scan's post-list
        // discipline): only a snapshot whose state held still counts as
        // an observation. Distinct observations are written as ONE file
        // at exit (object-store PUT visibility makes appends useless);
        // the parent asserts every one is exactly old-state, new-state,
        // or none — never a partial generation set.
        val parent = dir.substring(0, dir.lastIndexOf('/'))
        def stateLine(d: String): Option[String] =
          if (!st.exists(s"$d/_table")) None
          else try st.readString(s"$d/_table").split("\n").map(_.trim)
            .find(_.startsWith("graft.state="))
            .map(_.drop("graft.state=".length))
          catch { // vanished between exists and read: props-less
            case _: java.io.FileNotFoundException |
                 _: java.nio.file.NoSuchFileException => None
          }
        def observeOnce(): String =
          try {
            if (!st.exists(dir)) return "none"
            val s0 = stateLine(dir)
            val target = s0 match {
              case None => dir
              case Some(v) if v.startsWith("redirect:") =>
                s"$parent/${v.split(":")(1)}"
              case Some(_) => return "none" // dropped/restoring residue refuses
            }
            val gens = st.listDataFiles(target)
              .map(p => p.substring(p.lastIndexOf('/') + 1)).sorted
            if (stateLine(dir) != s0) return "retry" // state moved mid-list
            if (gens.isEmpty && !st.exists(target)) return "retry"
            if (gens.isEmpty) "none" else gens.mkString(",")
          } catch { case _: Exception => "retry" } // mid-swap races: discard
        val seen = scala.collection.mutable.ArrayBuffer[String]()
        // sample once (retrying) BEFORE signaling ready: the parent's
        // swaps only start once this process demonstrably observes
        var first = observeOnce()
        while (first == "retry" && System.currentTimeMillis() < deadline)
          first = observeOnce()
        if (first != "retry") seen += first
        touch(s"$parent/child-observing")
        while (!st.exists(s"$parent/parent-done") &&
            System.currentTimeMillis() < deadline) {
          val o = observeOnce()
          if (o != "retry" && !seen.lastOption.contains(o)) seen += o
        }
        val out = st.create(s"$parent/child-observations")
        try out.write(seen.mkString("\n").getBytes("UTF-8")) finally out.close()
        sys.exit(if (st.exists(s"$parent/parent-done")) 0 else 3)
      case "history" =>
        (0 until 5).foreach { i =>
          History.record(st, dir, s"child-$i",
            detail = s"from child pid=${ProcessHandle.current().pid()}")
        }
        sys.exit(0)
      case other =>
        System.err.println(s"unknown mode: $other")
        sys.exit(2)
    }
  }
}
