package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HierarchySpec extends SparkSpec {
  import spark.implicits._

  test("flatten resolves root and depth on a hand-built forest") {
    // Forest: 1 ← 12 ← 123 ← 1234; 2 ← 27; 9 isolated-but-parent (9 ← 91).
    val edges = Seq((12L, 1L), (123L, 12L), (1234L, 123L), (27L, 2L), (91L, 9L))
      .toDF("node", "parent")
    val out = Hierarchy.flatten(edges, rounds = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set(
      (1L, 1L, 0L), (12L, 1L, 1L), (123L, 1L, 2L), (1234L, 1L, 3L),
      (2L, 2L, 0L), (27L, 2L, 1L),
      (9L, 9L, 0L), (91L, 9L, 1L)))
  }

  test("r rounds resolve exactly depth ≤ 2^r; deeper chains surface unconverged") {
    // A depth-5 chain: 0 ← 1 ← 2 ← 3 ← 4 ← 5.
    val chain = (1L to 5L).map(i => (i, i - 1)).toDF("node", "parent")
    val two = Hierarchy.flatten(chain, rounds = 2)
      .as[(Long, Long, Long)].collect().map { case (n, r, _) => n -> r }.toMap
    // 2 rounds resolve depth ≤ 4; node 5 (depth 5) is still mid-walk.
    assert((0L to 4L).forall(n => two(n) == 0L))
    assert(two(5L) !== 0L)
    val three = Hierarchy.flatten(chain, rounds = 3)
      .as[(Long, Long, Long)].collect()
    assert(three.forall(_._2 == 0L))
    assert(three.map(t => t._1 -> t._3).toMap === (0L to 5L).map(n => n -> n).toMap)
  }

  test("label propagation keeps two dense clusters separate across a weak bridge") {
    // Clusters {1,2,3} and {10,11,12}, each fully connected with heavy
    // weights; one light bridge 3—10. CC would merge everything; LPA
    // must keep two communities because the bridge vote is outweighed.
    val pairs = Seq(
      (1L, 2L, 9L), (1L, 3L, 9L), (2L, 3L, 9L),
      (10L, 11L, 9L), (10L, 12L, 9L), (11L, 12L, 9L),
      (3L, 10L, 3L))
      .toDF("part_a", "part_b", "n_ab")
    val out = Retail.labelPropagation(pairs, minCount = 3, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 3L, 10L -> 3L))
  }

  test("empty inputs: flatten and label propagation return empty, not errors") {
    val noEdges = Seq.empty[(Long, Long)].toDF("node", "parent")
    assert(Hierarchy.flatten(noEdges).count() === 0L)
    val noPairs = Seq.empty[(Long, Long, Long)].toDF("part_a", "part_b", "n_ab")
    assert(Retail.labelPropagation(noPairs).count() === 0L)
  }

  test("label propagation is synchronous and deterministic on ties") {
    // Square 1-2-3-4 with equal weights: every vote ties and the
    // min-label tiebreak must win identically on both neighbors.
    val pairs = Seq((1L, 2L, 5L), (2L, 3L, 5L), (3L, 4L, 5L), (1L, 4L, 5L))
      .toDF("part_a", "part_b", "n_ab")
    val one = Retail.labelPropagation(pairs, minCount = 3, iters = 1)
      .as[(Long, Long)].collect().toMap
    // Round 1: node 1 sees {2,4} → label 2; node 2 sees {1,3} → 1;
    // node 3 sees {2,4} → 2; node 4 sees {1,3} → 1.
    assert(one === Map(1L -> 2L, 2L -> 2L))
  }
}
