package graft

import org.scalatest.funsuite.AnyFunSuite

/** q130 version-diff differential contract: every document's status
  * follows from the closed-form membership/revision predicates — a
  * plain-Scala reclassification must agree row-for-row, all four
  * classes must be non-empty on this corpus, and docs absent from both
  * snapshots must not appear at all.
  */
class VersionDiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q130: statuses match the closed-form predicates; all classes populated") {
    val ids = Tables.documents(spark, d)
      .select("doc_id").collect().map(_.getAs[Long]("doc_id"))

    val expected = ids.flatMap { id =>
      val inV1 = id % 7 != 0
      val inV2 = id % 13 != 0
      (inV1, inV2) match {
        case (false, false) => None
        case (false, true)  => Some(id -> "added")
        case (true, false)  => Some(id -> "removed")
        case (true, true)   => Some(id -> (if (id % 11 == 0) "changed" else "unchanged"))
      }
    }.toMap

    val out = SparkEntry.queries("q130_version_diff")(spark, d)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap

    assert(out == expected,
      s"drift on ${out.keySet.filter(k => out(k) != expected.getOrElse(k, "?")).take(5)}")
    Seq("added", "removed", "changed", "unchanged").foreach { st =>
      assert(out.values.exists(_ == st), s"class $st is empty — fixture degenerate")
    }
  }
}
