package graft.mr

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** A key whose `Ordering` (case-insensitive) disagrees with its
  * `equals`/`hashCode` (case-sensitive) — the shape the façade's contract
  * (`MapReduce.scala` scaladoc, first delta) forbids callers to use
  * without normalizing.
  */
final case class CiKey(s: String)
object CiKey {
  implicit val ord: Ordering[CiKey] = Ordering.by((k: CiKey) => k.s.toLowerCase)
}

/** Pins the documented Ordering↔equality contract delta as an executable
  * property instead of prose: the reference groups intermediate keys by
  * ORDERING-equality (`!(a<b) && !(b<a)`, MapReduceFramework.cpp:197),
  * the Spark façade by the key's `equals`/`hashCode`. For a key type
  * where the two disagree, the façade verifiably produces the
  * equals-grouping — and whenever the input actually contains keys that
  * are ordering-equal but not equals-equal, the divergence from the
  * reference's grouping is OBSERVABLE (more groups), never silent
  * misgrouping within a group.
  */
class OrderingContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ScalaCheck property: equals-grouping is produced; ordering-equality divergence is observable") {
    import spark.implicits._
    val gen = Gen.listOfN(30,
      Gen.zip(Gen.oneOf("a", "A", "b", "B", "c"), Gen.choose(-100, 100)))
    val prop = Prop.forAll(gen) { pairs =>
      val input = pairs.map { case (k, v) => (CiKey(k), v) }
      val facade = MapReduce.runLocal[CiKey, Int, CiKey, Int, String, Int](
        spark, input,
        map = (k, v) => Iterator((k, v)),
        reduce = (k, g) => Iterator((k.s, g.map(_._2).sum)),
        parallelism = 3).toMap
      // the façade's documented behavior: grouping by equals/hashCode
      val byEquals = input.groupBy(_._1.s).view.mapValues(_.map(_._2).sum).toMap
      // the reference's behavior for the same client: grouping by
      // ordering-equality classes
      val byOrdering = input.groupBy(_._1.s.toLowerCase)
      val hasDivergentKeys = byOrdering.values.exists(_.map(_._1).distinct.size > 1)
      facade == byEquals &&
        // with ordering-equal-but-unequal keys present, the delta shows up
        // as a strictly finer grouping — detectable by any caller
        (!hasDivergentKeys || facade.size > byOrdering.size)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
