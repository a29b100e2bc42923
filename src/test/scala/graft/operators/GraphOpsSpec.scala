package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Connected components (the dedup-cluster collapse): fixpoint
  * correctness on chains and multi-component graphs, determinism, and
  * the loud non-convergence contract. */
class GraphOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)], maxIters: Int = 64) =
    GraphOps.connectedComponents(edges.toDF("src", "dst"), "src", "dst", maxIters)
      .as[(Long, Long)].collect().toMap

  test("chains, cliques and singleton edges collapse to min-id components") {
    // chain 1-2-3-4-5 (diameter 4, needs several passes), clique {10,11,12},
    // isolated pair {20,21}; edge direction must not matter
    val got = cc(Seq(2L -> 1L, 2L -> 3L, 4L -> 3L, 4L -> 5L,
      10L -> 11L, 12L -> 10L, 11L -> 12L, 21L -> 20L))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("duplicate and self edges are harmless; empty input yields empty output") {
    assert(cc(Seq(1L -> 2L, 2L -> 1L, 1L -> 2L, 3L -> 3L))
      == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
    assert(cc(Nil) == Map.empty)
  }

  test("a chain with diameter >> maxIters converges via pointer jumping (VERDICT r5 #3)") {
    // 300-node chain: plain hash-to-min needs ~300 passes; the jump step
    // compresses label chains geometrically, well inside the default 64
    val edges = (0L until 299L).map(i => i -> (i + 1))
    val got = cc(edges)
    assert(got.size == 300 && got.values.forall(_ == 0L),
      "every chain vertex must reach component 0")
  }

  test("property: pointer jumping and plain hash-to-min agree on random graphs") {
    val rnd = new scala.util.Random(991)
    for (trial <- 0 until 3) {
      val n = 50 + trial * 25
      val edges = (0 until n * 2).map(_ =>
        rnd.nextInt(n).toLong -> rnd.nextInt(n).toLong)
      val df = edges.toDF("src", "dst")
      val fast = GraphOps.connectedComponents(df, "src", "dst")
        .as[(Long, Long)].collect().toMap
      val plain = GraphOps.connectedComponents(df, "src", "dst",
        pointerJumping = false).as[(Long, Long)].collect().toMap
      assert(fast == plain, s"trial $trial diverged")
    }
  }

  test("non-convergence fails loudly instead of returning a half-merged clustering") {
    // a 6-node chain cannot converge in one pass
    val e = intercept[IllegalArgumentException](
      cc(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L), maxIters = 1))
    assert(e.getMessage.contains("did not converge"))
  }
}
