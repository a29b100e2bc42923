package graft.sources.sstable

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import MaintenanceLease.{MaintenanceLeaseHeldException, MaintenanceLeaseLostException}

/** Unit pins for the maintenance lease protocol (VERDICT r8 #1): loud
  * refusal naming the holder, age-based steal, ownership fence, and
  * release semantics. The maintainer-vs-maintainer COMPOSITION (two
  * concurrent compactors through the real entry points) is pinned in
  * ConcurrencyStressSpec. */
class MaintenanceLeaseSpec extends AnyFunSuite {

  private def tmp(): String = Files.createTempDirectory("lease").toString

  test("second acquirer refuses loudly, naming the holder and its op") {
    val dir = tmp()
    val a = MaintenanceLease.acquire(dir, LocalStorage, "nightly-compactor")
    val e = intercept[MaintenanceLeaseHeldException] {
      MaintenanceLease.acquire(dir, LocalStorage, "rollback:v1")
    }
    assert(e.holder.startsWith("nightly-compactor@"),
      s"refusal must name WHAT is running: ${e.holder}")
    assert(e.getMessage.contains(dir))
    a.release()
    // released: the next maintainer acquires cleanly
    MaintenanceLease.acquire(dir, LocalStorage, "rollback:v1").release()
  }

  test("a stale lease (dead maintainer) is stolen past the horizon") {
    val dir = tmp()
    // simulate a maintainer that died without releasing: its lease file
    // exists but nothing renews it (a live lease renews at horizon/8)
    val out = LocalStorage.create(s"$dir/${MaintenanceLease.LeaseFile}")
    try out.write("dead-op@gone#12345678".getBytes("UTF-8")) finally out.close()
    // within the horizon: still refused (the holder might be slow, not dead)
    intercept[MaintenanceLeaseHeldException] {
      MaintenanceLease.acquire(dir, LocalStorage, "successor", horizonMs = 60000)
    }
    // past the horizon: stolen
    Thread.sleep(120)
    val lease = MaintenanceLease.acquire(dir, LocalStorage, "successor",
      horizonMs = 100)
    assert(lease.holder.startsWith("successor@"))
    lease.release()
    assert(!LocalStorage.exists(s"$dir/${MaintenanceLease.LeaseFile}"))
  }

  test("fence: a superseded holder aborts instead of touching state") {
    val dir = tmp()
    val a = MaintenanceLease.acquire(dir, LocalStorage, "slow-maintainer")
    a.checkHeld() // held: fence passes
    // a thief (who stole the lease believing `a` dead) now owns the file
    val out = LocalStorage.create(s"$dir/${MaintenanceLease.LeaseFile}")
    try out.write("thief@host#87654321".getBytes("UTF-8")) finally out.close()
    val e = intercept[MaintenanceLeaseLostException] { a.checkHeld() }
    assert(e.getMessage.contains("thief@host#87654321"))
    // renew must ALSO refuse — clobbering the thief's lease back would
    // put two maintainers in the fold
    intercept[MaintenanceLeaseLostException] { a.renew() }
    // release leaves the thief's lease alone
    a.release()
    assert(LocalStorage.exists(s"$dir/${MaintenanceLease.LeaseFile}"))
  }

  test("renewal keeps a live lease from being stolen") {
    val dir = tmp()
    // short horizon → renewal fires every ~horizon/8; a contender
    // arriving after a full horizon still finds the mtime fresh
    val a = MaintenanceLease.acquire(dir, LocalStorage, "long-runner",
      horizonMs = 400)
    Thread.sleep(800)
    intercept[MaintenanceLeaseHeldException] {
      MaintenanceLease.acquire(dir, LocalStorage, "contender", horizonMs = 400)
    }
    a.checkHeld() // still ours after the sleep
    a.release()
  }

  test("withLease releases on failure and the lease file never leaks") {
    val dir = tmp()
    intercept[RuntimeException] {
      MaintenanceLease.withLease(dir, LocalStorage, "failing-op") { _ =>
        throw new RuntimeException("fold blew up")
      }
    }
    assert(!LocalStorage.exists(s"$dir/${MaintenanceLease.LeaseFile}"),
      "a failed maintenance run must not leave the directory locked")
    MaintenanceLease.acquire(dir, LocalStorage, "next").release()
  }
}
