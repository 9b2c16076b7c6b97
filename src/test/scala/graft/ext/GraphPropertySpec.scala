package graft.ext

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Property tests for the iterative-graph family: pointer-doubling
  * flatten against a naive sequential walk on random forests, and
  * label-propagation partition-invariance (the distributed result must
  * not depend on how the data happens to be partitioned).
  */
class GraphPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  /** Random forest over node ids 0..n−1: each node i ≥ 1 gets a parent
    * drawn from [0, i) (so the structure is acyclic by construction);
    * node 0 is always a root, and a random subset of others are made
    * roots by dropping their edge.
    */
  private val forestGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(2, 24)
    parents <- Gen.sequence[List[Long], Long](
      (1 until n).map(i => Gen.chooseNum(0L, i - 1L)))
    drops <- Gen.listOfN(n - 1, Gen.prob(0.15))
  } yield (1 until n).toList.zip(parents).zip(drops).collect {
    case (((child, parent)), false) => (child.toLong, parent)
  }

  private def naiveFlatten(edges: List[(Long, Long)]): Map[Long, (Long, Long)] = {
    val parent = edges.toMap
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map { n =>
      var cur = n; var d = 0L
      while (parent.contains(cur)) { cur = parent(cur); d += 1 }
      n -> (cur, d)
    }.toMap
  }

  test("pointer doubling equals the sequential walk on random forests") {
    val prop = Prop.forAll(forestGen) { edges =>
      edges.isEmpty || {
        // Parents drawn from [0, i) bound depth at n−1 ≤ 23 < 2^5.
        val got = Hierarchy.flatten(edges.toDF("node", "parent"), rounds = 5)
          .as[(Long, Long, Long)].collect()
          .map { case (n, r, d) => n -> (r, d) }.toMap
        got == naiveFlatten(edges)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("label propagation is invariant to input partitioning") {
    val prop = Prop.forAll(forestGen) { edges0 =>
      edges0.isEmpty || {
        // Reuse the forest edges as an undirected weighted graph.
        val pairs = edges0.zipWithIndex.map { case ((a, b), i) =>
          (math.min(a, b), math.max(a, b), 3L + (i % 4)) }
          .toDF("part_a", "part_b", "n_ab")
        val one = Retail.labelPropagation(pairs.repartition(1), minCount = 3)
          .as[(Long, Long)].collect().toSet
        val many = Retail.labelPropagation(pairs.repartition(7), minCount = 3)
          .as[(Long, Long)].collect().toSet
        one == many
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
