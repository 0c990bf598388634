package graft

import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def labelsOf(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents
      .components(pairs.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("chain collapses to its minimum (transitivity beyond any single pair)") {
    // 1-2, 2-3, 3-4, 4-5: (1,5) never co-occur in a pair, same cluster anyway.
    val l = labelsOf(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(l == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint components keep separate min labels") {
    val l = labelsOf(Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L), (31L, 30L)))
    assert(l == Map(
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L,
      30L -> 30L, 31L -> 30L))
  }

  test("cycle, reversed orientation, and duplicate edges are harmless") {
    val l = labelsOf(Seq((3L, 2L), (2L, 1L), (1L, 3L), (3L, 2L), (2L, 3L)))
    assert(l == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("star already in fixpoint form converges immediately") {
    val l = labelsOf(Seq((1L, 2L), (1L, 3L), (1L, 4L)))
    assert(l == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("long path converges within the iteration cap (log-round behavior)") {
    val n = 64L
    val chain = (1L until n).map(i => (i, i + 1))
    val l = labelsOf(chain)
    assert(l.size == n)
    assert(l.values.forall(_ == 1L))
  }

  test("clusterSizes summarizes membership") {
    val labels = ConnectedComponents
      .components(Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("a", "b"), "a", "b")
    val sizes = ConnectedComponents.clusterSizes(labels)
      .as[(Long, Long, Long)].collect()
      .map { case (k, n, mx) => k -> ((n, mx)) }.toMap
    assert(sizes == Map(1L -> ((3L, 3L)), 7L -> ((2L, 8L))))
  }
}
