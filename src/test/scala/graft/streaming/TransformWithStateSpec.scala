package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import org.scalatest.funsuite.AnyFunSuite

/** q189 contract — the `transformWithState` machinery across REAL
  * micro-batch boundaries (the registered file-source run usually lands
  * in one batch):
  *   (a) named ValueState persists per key between batches — batch 2's
  *       emission continues batch 1's totals, not a reset;
  *   (b) only keys present in a batch emit in that batch (Update mode);
  *   (c) cent-exact accumulation: the final totals equal the exact sums
  *       regardless of batch split.
  */
class TransformWithStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("state persists across micro-batches and totals stay cent-exact") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sq = s.sqlContext
    import s.implicits._
    val input = MemoryStream[(Long, Double)]
    val out = input.toDS()
      .groupByKey(_._1)
      .transformWithState(new RunningTotals(),
        TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "n", "sum_value")
    val name = "tws_" + java.util.UUID.randomUUID().toString.take(8)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      input.addData((1L, 0.10), (1L, 0.20), (2L, 5.00))
      q.processAllAvailable()
      val b1 = s.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(b1 === Set((1L, 2L, 0.30), (2L, 1L, 5.00)),
        s"batch-1 totals wrong: $b1") // 0.1+0.2 must be exactly 0.30, not 0.30000000000000004
      // batch 2: key 1 continues from persisted state; key 3 is new;
      // key 2 is absent and must NOT re-emit
      input.addData((1L, 0.05), (3L, 7.00))
      q.processAllAvailable()
      val all = s.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(all.contains((1L, 3L, 0.35)), s"state did not persist across batches: $all")
      assert(all.contains((3L, 1L, 7.00)))
      assert(all.count(_._1 == 2L) === 1, "absent key re-emitted in batch 2")
    } finally q.stop()
  }
}
