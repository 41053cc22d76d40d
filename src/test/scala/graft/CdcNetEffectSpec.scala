package graft

import org.scalatest.funsuite.AnyFunSuite

/** q311 CDC net-effect differential: replay the op log SEQUENTIALLY per
  * key (a real state machine — INSERT upserts, UPDATE sets only if
  * present, DELETE removes), classify against the snapshot, and require
  * the query's closed-form fold (presence = lastInsert > lastDelete,
  * value = max-seq setter after the last delete) to aggregate to the
  * identical rollup. The sequential replay is the semantics; the query
  * is the distributed closed form — this spec is the proof they agree,
  * including the delete-then-reinsert collapse and the
  * update-after-delete no-op.
  */
class CdcNetEffectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q311 equals a sequential per-key op-log replay") {
    val snap = Tables.orders(spark, d)
      .selectExpr("o_orderkey AS k", "CAST(floor(o_totalprice * 100 + 0.5) AS LONG) AS base")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // (seq, op, key, cents) — mirrors the registered fixture exactly
    val ops = snap.toSeq.map { case (k, b) => (0L, 'I', k, b) } ++
      snap.toSeq.filter(_._1 % 10 == 0).map { case (k, b) => (1L, 'U', k, b + 100L) } ++
      snap.toSeq.filter(_._1 % 17 == 0).map { case (k, _) => (2L, 'D', k, 0L) } ++
      snap.toSeq.filter(_._1 % 13 == 0).map { case (k, b) => (3L, 'U', k, b + 200L) } ++
      snap.toSeq.filter(_._1 % 34 == 0).map { case (k, _) => (4L, 'I', k, 50L) } ++
      snap.toSeq.filter(_._1 % 23 == 0).map { case (k, _) => (5L, 'I', k + 1000000000L, 75L) }

    val finalState = ops.groupBy(_._3).map { case (k, kops) =>
      var present = false
      var value = 0L
      kops.sortBy(_._1).foreach {
        case (_, 'I', _, c) => present = true; value = c
        case (_, 'U', _, c) => if (present) value = c
        case (_, 'D', _, _) => present = false
        case other => sys.error(s"unknown op $other")
      }
      k -> (present, value)
    }

    val keys = snap.keySet ++ finalState.keySet
    val expected = keys.toSeq.map { k =>
      val before = snap.get(k)
      val after = finalState.get(k).filter(_._1).map(_._2)
      val action = (before, after) match {
        case (Some(_), None) => "deleted"
        case (None, _) => "inserted"
        case (Some(b), Some(a)) if b == a => "unchanged"
        case _ => "updated"
      }
      (action, after.getOrElse(0L) - before.getOrElse(0L))
    }.groupBy(_._1).map { case (a, rows) =>
      a -> ((rows.size.toLong, rows.map(_._2).sum))
    }

    val out = SparkEntry.queries("q311_cdc_net_effect")(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == expected)
    // every net class is populated — the fixture exercises all branches
    assert(out.keySet == Set("deleted", "inserted", "unchanged", "updated"))
    // the delete+reinsert collapse really happened: %34 keys survive
    val reinserted = snap.keys.filter(_ % 34 == 0)
    assert(reinserted.nonEmpty && reinserted.forall(k => finalState(k)._1))
  }
}
