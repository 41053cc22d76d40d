package graft

import org.scalatest.funsuite.AnyFunSuite

/** q325 purged walk-forward CV: the fold schedule's ORDERING guarantees,
  * asserted from the output itself — for every fold, observed train days
  * end strictly before the purge, the purge spans exactly the 2 days
  * before the test window, and test windows walk backward in disjoint
  * 5-day steps ending at the panel's last day for fold 1.
  */
class PurgedCvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q325: per-fold train < purge < test with a 2-day gap; fold-1 test ends at D") {
    val rows = SparkEntry.queries("q325_purged_cv_folds")(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    val dMax = Tables.events(spark, d)
      .selectExpr("CAST(datediff(max(CAST(ts AS DATE)), min(CAST(ts AS DATE))) AS LONG)")
      .head().getLong(0)
    for (k <- 1L to 3L) {
      val tsK = dMax - 5 * k + 1
      val (_, _, trMin, trMax) = rows((k, "train"))
      val (_, _, puMin, puMax) = rows((k, "purge"))
      val (_, _, teMin, teMax) = rows((k, "test"))
      assert(trMin == 0L && trMax <= tsK - 3,
        s"fold $k: train leaks past the purge boundary ($trMax vs ${tsK - 3})")
      assert(puMin >= tsK - 2 && puMax <= tsK - 1, s"fold $k: purge outside its 2 days")
      assert(teMin >= tsK && teMax <= tsK + 4, s"fold $k: test outside its 5 days")
      assert(trMax < puMin && puMax < teMin, s"fold $k: roles overlap or reorder")
    }
    // fold 1 tests the most recent window: its last observed test day is D
    assert(rows((1L, "test"))._4 == dMax, "fold-1 test window must end at the last day")
    // every fold observed events in all three roles at this fixture
    assert(rows.size == 9, s"expected 3 folds x 3 roles, got ${rows.keySet}")
  }
}
