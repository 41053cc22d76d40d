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

  test("q251: ListState stays top-k across batches — old entries evicted, not appended") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sq = s.sqlContext
    import s.implicits._
    val input = MemoryStream[(Long, Long, Long)] // (user, tsMicros, event_id)
    val out = input.toDS()
      .groupByKey(_._1)
      .transformWithState(new RecentPurchases(),
        TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "n_purch", "last3")
    val name = "twsl_" + java.util.UUID.randomUUID().toString.take(8)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      // batch 1: two purchases → list holds both, newest first
      input.addData((1L, 100L, 11L), (1L, 200L, 12L))
      q.processAllAvailable()
      val b1 = s.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(b1 === Set((1L, 2L, "12,11")), s"batch-1 list wrong: $b1")
      // batch 2: two MORE purchases, one newer, one older than everything —
      // the top-3 window slides: 14 (ts 400) and 12, 11 survive; ts-50 never enters
      input.addData((1L, 400L, 14L), (1L, 50L, 10L))
      q.processAllAvailable()
      val last = s.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .maxBy(_._2)
      assert(last === ((1L, 4L, "14,12,11")),
        s"cross-batch truncation wrong (append-only state would show 4 ids): $last")
      // batch 3: a newer purchase evicts the OLDEST stored entry (11)
      input.addData((1L, 500L, 15L))
      q.processAllAvailable()
      val fin = s.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .maxBy(_._2)
      assert(fin === ((1L, 5L, "15,14,12")), s"eviction across batches wrong: $fin")
    } finally q.stop()
  }

  test("q223: MapState entries persist per type and keys() sees the whole map") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sq = s.sqlContext
    import s.implicits._
    val input = MemoryStream[(Long, String, Double)]
    val out = input.toDS()
      .groupByKey(_._1)
      .transformWithState(new TypeTotals(),
        TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "event_type", "n", "cents", "n_types")
    val name = "twsm_" + java.util.UUID.randomUUID().toString.take(8)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      input.addData((1L, "view", 0.10), (1L, "view", 0.20), (1L, "click", 5.00))
      q.processAllAvailable()
      val b1 = s.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      assert(b1 === Set((1L, "view", 2L, 30L, 2L), (1L, "click", 1L, 500L, 2L)),
        s"batch-1 map state wrong: $b1")
      // batch 2: "view" continues from its OWN entry, "click" untouched
      // (must not emit), a new type grows the map — n_types sees all 3
      input.addData((1L, "view", 0.05), (1L, "purchase", 7.00))
      q.processAllAvailable()
      val all = s.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(all.contains((1L, "view", 3L, 35L, 3L)),
        s"per-type entry did not persist across batches: ${all.toSet}")
      assert(all.contains((1L, "purchase", 1L, 700L, 3L)))
      assert(all.count(t => t._2 == "click") === 1,
        "untouched map entry re-emitted in batch 2")
    } finally q.stop()
  }
}
