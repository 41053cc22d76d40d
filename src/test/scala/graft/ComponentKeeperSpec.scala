package graft

import org.scalatest.funsuite.AnyFunSuite

/** q137 keeper contract: recompute the arg-max in plain Scala from
  * q70's components and q31's scores — the keeper must be each
  * component's highest-quality member (doc_id tiebreak), member counts
  * must match, and the rule must differ from min-id retention somewhere
  * on this corpus (otherwise the quality-aware rule is
  * indistinguishable from the default it exists to replace).
  */
class ComponentKeeperSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q137: keeper is the quality arg-max per component; differs from min-id") {
    val comps = SparkEntry.queries("q70_dedup_components")(spark, d)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component"))
    val quality = SparkEntry.queries("q31_quality_score")(spark, d)
      .select("doc_id", "quality").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality")).toMap

    val expected = comps.groupBy(_._2).map { case (comp, members) =>
      val ids = members.map(_._1)
      val keeper = ids.maxBy(id => (quality(id), -id))
      comp -> ((ids.length.toLong, keeper, quality(keeper)))
    }

    val out = SparkEntry.queries("q137_component_keeper")(spark, d)
      .collect()
      .map(r => r.getAs[Long]("component") ->
        ((r.getAs[Long]("n_members"), r.getAs[Long]("keeper_doc"),
          r.getAs[Double]("keeper_quality")))).toMap

    assert(out == expected,
      s"drift on ${out.keySet.filter(k => out(k) != expected.getOrElse(k, null)).take(5)}")
    val minIdKeepers = comps.groupBy(_._2).view.mapValues(_.map(_._1).min)
    assert(out.exists { case (comp, (_, keeper, _)) => keeper != minIdKeepers(comp) },
      "every keeper equals the min-id keeper — the quality rule is vacuous here")
  }
}
