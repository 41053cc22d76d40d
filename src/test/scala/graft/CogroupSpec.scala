package graft

import org.scalatest.funsuite.AnyFunSuite

/** q188 contract — the typed cogroup semantics the SQL oracle can't
  * distinguish from a join: one function call per key with BOTH whole
  * groups, keys from EITHER input appear exactly once, and an absent
  * side arrives as an empty iterator (not a skipped key).
  */
class CogroupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("cogroup delivers whole groups per key, keys from either side, once each") {
    import spark.implicits._
    val left = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDS().groupByKey(_._1)
    val right = Seq((2L, "x"), (3L, "y"), (3L, "z")).toDS().groupByKey(_._1)
    val out = left.cogroup(right) { (k, ls, rs) =>
      // whole-group access: fold BOTH iterators in one call
      Iterator((k,
        ls.map(_._2).toSeq.sorted.mkString,
        rs.map(_._2).toSeq.sorted.mkString))
    }.collect().sortBy(_._1)
    assert(out.toSeq === Seq(
      (1L, "ab", ""), // right side absent -> empty iterator, key still emitted
      (2L, "c", "x"),
      (3L, "", "yz"))) // left side absent
  }

  test("q188: click-only, purchase-only, and mixed users all emit exactly once") {
    val rows = SparkEntry.queries("q188_cogroup_reconcile")(spark, TestSpark.Sf0001)
      .collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    assert(byUser.values.forall(_.length == 1), "a user emitted more than one row")
    // totality markers: purchase-only users carry the -1 sentinel
    val purchaseOnly = rows.filter(_.getAs[Long]("n_clicks") == 0L)
    assert(purchaseOnly.forall(_.getAs[Long]("purchases_after_first_click") == -1L))
    val clickUsers = rows.filter(_.getAs[Long]("n_clicks") > 0L)
    assert(clickUsers.nonEmpty)
    assert(clickUsers.forall(r =>
      r.getAs[Long]("purchases_after_first_click") <= r.getAs[Long]("n_purchases")),
      "counted more qualifying purchases than purchases")
  }
}
