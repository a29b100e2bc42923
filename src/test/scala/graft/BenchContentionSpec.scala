package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the sweep-level contention self-diagnosis ([[Bench.looksContended]]):
  * the flag fires on the BENCH r8 signature — several RECHECKED queries
  * still far above baseline with scattered runs — and stays silent on
  * quiet sweeps, genuine tight regressions, and sub-threshold noise. */
class BenchContentionSpec extends AnyFunSuite {

  private def q(name: String, ratio: Double, spread: Double)
      : (String, (Double, Double)) =
    name -> (Bench.BaselineSf01(name) * ratio, spread)

  test("fires on >=3 rechecked queries over 2x with scattered runs") {
    val results = Seq(
      q("q_dedup_minhash", 4.98, 2.1), q("q_sstable_topk", 3.81, 3.0),
      q("q_stratified", 3.05, 1.9), q("q_scan_project", 1.0, 1.0))
    assert(Bench.looksContended(results,
      Set("q_dedup_minhash", "q_sstable_topk", "q_stratified")))
  }

  test("silent on a quiet sweep (nothing rechecked, ratios near 1)") {
    val results = Seq(
      q("q_dedup_minhash", 1.1, 1.05), q("q_sstable_topk", 0.95, 1.1),
      q("q_scan_project", 1.0, 1.0))
    assert(!Bench.looksContended(results, Set.empty))
  }

  test("silent on a genuine tight regression (reproduces, low spread)") {
    // a real 3x regression re-times to the same value: spread stays
    // tight, and the artifact must NOT excuse it as contention
    val results = Seq(
      q("q_dedup_minhash", 3.0, 1.1), q("q_sstable_topk", 3.2, 1.2),
      q("q_stratified", 2.8, 1.3), q("q_scan_project", 1.0, 1.0))
    assert(!Bench.looksContended(results,
      Set("q_dedup_minhash", "q_sstable_topk", "q_stratified")))
  }

  test("silent below the three-query threshold") {
    val results = Seq(
      q("q_dedup_minhash", 4.0, 2.5), q("q_sstable_topk", 3.0, 2.0),
      q("q_scan_project", 1.0, 1.0))
    assert(!Bench.looksContended(results,
      Set("q_dedup_minhash", "q_sstable_topk")))
  }

  test("errored queries (-1) never count") {
    val results = Seq(
      ("q_dedup_minhash", (-1.0, -1.0)), ("q_sstable_topk", (-1.0, -1.0)),
      ("q_stratified", (-1.0, -1.0)))
    assert(!Bench.looksContended(results, results.map(_._1).toSet))
  }
}
