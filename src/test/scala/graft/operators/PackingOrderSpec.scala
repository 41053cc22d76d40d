package graft.operators

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant coverage for the round-4 corpus-shaping operators: q95
  * next-fit-decreasing bin packing and q98 global training-order index.
  * The oracle already pins exact values; these specs pin the STRUCTURAL
  * contracts that must survive any refactor of the implementations.
  */
class PackingOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q95: no bin exceeds capacity unless a single document does") {
    val rows = SparkEntry.queries("q95_bin_packing")(spark, d)
      .select("shard", "bin_id", "n_tokens").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byBin = rows.groupBy(t => (t._1, t._2))
    byBin.foreach { case ((shard, bin), docs) =>
      val total = docs.map(_._3).sum
      assert(total <= 256L || docs.length == 1,
        s"bin $shard/$bin holds $total tokens over ${docs.length} docs")
    }
  }

  test("q95: bins are contiguous from 1 and closed bins could not fit the next doc") {
    val rows = SparkEntry.queries("q95_bin_packing")(spark, d)
      .select("shard", "rn", "bin_id", "n_tokens", "fill_after").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (shard, docs) =>
      val ordered = docs.sortBy(_._2)
      assert(ordered.head._3 === 1L, s"$shard first bin")
      ordered.sliding(2).foreach {
        case Array((_, _, b1, _, f1), (_, _, b2, t2, f2)) =>
          if (b2 == b1) assert(f2 === f1 + t2, s"$shard running fill")
          else {
            assert(b2 === b1 + 1, s"$shard bin ids skip")
            // next-fit honesty: the doc that opened a new bin did NOT fit
            assert(f1 + t2 > 256L, s"$shard closed a bin that still had room")
            assert(f2 === t2, s"$shard new-bin fill")
          }
        case _ => ()
      }
      // decreasing placement order: token counts never increase along rn
      ordered.sliding(2).foreach {
        case Array((_, _, _, t1, _), (_, _, _, t2, _)) => assert(t2 <= t1, s"$shard order")
        case _ => ()
      }
    }
  }

  test("q98: positions are exactly 1..n and ordered by the shuffle key") {
    val rows = SparkEntry.queries("q98_global_order")(spark, d)
      .select("pos", "h", "doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._1).sorted.toSeq === (1L to rows.length).toSeq)
    val inPosOrder = rows.sortBy(_._1).map(t => (t._2, t._3)).toSeq
    assert(inPosOrder === inPosOrder.sorted, "positions disagree with (h, doc_id) order")
  }

  test("q98: positions are invariant to the partition count (two-phase enumeration)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "11")
    val base = SparkEntry.queries("q98_global_order")(spark, d)
      .select("doc_id", "pos").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val alt = SparkEntry.queries("q98_global_order")(s2, d)
      .select("doc_id", "pos").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(base === alt)
  }
}
