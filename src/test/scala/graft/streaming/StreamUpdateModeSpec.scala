package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q259 contract — the distinguishing update-mode behavior the one-batch
  * registered run can't show:
  *   (a) a batch emits ONLY the groups it changed — an untouched group
  *       stays silent (the property that makes update mode usable as a
  *       key-value upsert feed);
  *   (b) a touched group re-emits its NEW running total, not a delta;
  *   (c) contrast: the same query in complete mode re-emits EVERY group
  *       every batch (why complete can't scale past toy state).
  */
class StreamUpdateModeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def runMode(mode: String): (MemoryStream[(String, Double)],
      org.apache.spark.sql.streaming.StreamingQuery, String) = {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, Double)]
    val agg = input.toDS().toDF("k", "v")
      .groupBy("k")
      .agg(count(lit(1)).as("n"), graft.Q.dsum2(col("v")).as("sv"))
    val name = s"upd_${mode}_" + java.util.UUID.randomUUID().toString.take(8)
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    (input, q, name)
  }

  private def sinceRows(name: String, skip: Int): Seq[(String, Long, Double)] =
    spark.table(name).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .drop(skip)

  test("q259: update mode emits only changed groups; complete replays all") {
    val (inU, qU, nameU) = runMode("update")
    val (inC, qC, nameC) = runMode("complete")
    try {
      inU.addData(("a", 1.0), ("a", 2.0), ("b", 5.0))
      inC.addData(("a", 1.0), ("a", 2.0), ("b", 5.0))
      qU.processAllAvailable()
      qC.processAllAvailable()
      val u1 = sinceRows(nameU, 0)
      assert(u1.toSet === Set(("a", 2L, 3.0), ("b", 1L, 5.0)),
        s"update batch-1 wrong: $u1")
      val c1 = sinceRows(nameC, 0)
      assert(c1.toSet === Set(("a", 2L, 3.0), ("b", 1L, 5.0)))

      // batch 2 touches only "a"
      inU.addData(("a", 4.0))
      inC.addData(("a", 4.0))
      qU.processAllAvailable()
      qC.processAllAvailable()
      val u2 = sinceRows(nameU, u1.length)
      assert(u2 === Seq(("a", 3L, 7.0)),
        s"update mode must emit exactly the one changed group's new total: $u2")
      // complete mode: the sink is REPLACED with the full result —
      // untouched "b" is present again after a batch that never saw it
      val c2 = spark.table(nameC).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(c2 === Set(("a", 3L, 7.0), ("b", 1L, 5.0)),
        s"complete-mode full replay wrong: $c2")
    } finally {
      qU.stop(); qC.stop()
    }
  }
}
