package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.Similarity

/** ScalaCheck laws for the pure (non-Spark) parts of the engine. */
object LawsSpec extends Properties("graft") {

  // random DAGs: nodes 0..n-1, edges only from lower to higher index (acyclic)
  private val dagGen: Gen[Map[Int, Seq[Int]]] = for {
    n <- Gen.choose(1, 12)
    edges <- Gen.sequence[Seq[Seq[Int]], Seq[Int]]((0 until n).map { i =>
      if (i == 0) Gen.const(Seq.empty[Int])
      else Gen.someOf(0 until i).map(_.toSeq)
    })
  } yield (0 until n).map(i => i -> edges(i)).toMap

  property("dag.run orders every node after all its dependencies") = forAll(dagGen) { g =>
    // build fns never touch DataFrames in this law — null frames suffice
    val nodes = g.toSeq.map { case (i, deps) =>
      graft.core.Dag.Node(s"n$i", deps.map(d => s"n$d"), _ => null, materialize = false)
    }
    val order = graft.core.Dag.run(nodes).order
    Prop.all(
      (order.size == g.size): Prop,
      Prop.all(g.toSeq.flatMap { case (i, deps) =>
        deps.map(d => (order.indexOf(s"n$d") < order.indexOf(s"n$i")): Prop)
      }: _*)
    )
  }

  property("dag.run rejects any cycle") = forAll(Gen.choose(2, 8)) { n =>
    // ring: 0 -> 1 -> ... -> n-1 -> 0
    val nodes = (0 until n).map(i =>
      graft.core.Dag.Node(s"c$i", Seq(s"c${(i + 1) % n}"), _ => null))
    Prop.throws(classOf[IllegalArgumentException]) { graft.core.Dag.run(nodes) }
  }

  property("random hyperplanes are deterministic in the seed") =
    forAll(Gen.choose(1, 16), Gen.choose(1, 8), Gen.choose(Long.MinValue, Long.MaxValue)) {
      (dim, k, seed) =>
        Similarity.randomPlanes(dim, k, seed) == Similarity.randomPlanes(dim, k, seed) &&
          Similarity.randomPlanes(dim, k, seed).length == k &&
          Similarity.randomPlanes(dim, k, seed).forall(_.length == dim)
    }

  property("rate-limit tier lookup is total") = forAll(Gen.alphaStr) { tier =>
    // unknown tiers fall back to the public quota in the Column expr; the
    // pure map carries the four reference tiers
    graft.operators.RateLimit.TierLimits.values.forall(_ > 0) &&
      graft.operators.RateLimit.TierLimits.size == 4
  }
}
