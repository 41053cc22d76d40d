package graft.streaming

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** q191 contract — the state-store reader exposes EXACTLY the open
  * windows: state and the append-mode emitted set are disjoint and
  * together reconstruct the full batch GROUP BY. Plus the metadata
  * listing names the operator the store belongs to.
  */
class StateReaderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def keyed(rows: Array[org.apache.spark.sql.Row]) =
    rows.map { r =>
      (r.getAs[java.sql.Timestamp]("wstart"), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("sum_value"))
    }.toMap

  test("q191: state ∪ q61-emitted = batch GROUP BY, disjoint") {
    val state = keyed(SparkEntry.queries("q191_state_store_read")(spark, TestSpark.Sf0001)
      .select("wstart", "event_type", "n", "sum_value").collect())
    val emitted = keyed(SparkEntry.queries("q61_stream_tumbling_append")(spark, TestSpark.Sf0001)
      .collect())
    val full = keyed(SparkEntry.queries("q34_tumbling_window")(spark, TestSpark.Sf0001)
      .collect())
    assert(state.nonEmpty, "no open windows in state — the watermark closed everything")
    assert(state.keySet.intersect(emitted.keySet).isEmpty,
      "a window is both emitted (closed) and still in state (open)")
    assert(state ++ emitted === full,
      "state + emitted does not reconstruct the full batch aggregation")
  }

  test("q191: state-metadata lists the aggregation's stateStoreSave operator") {
    import org.apache.spark.sql.functions.col
    // run the registered query to materialize a checkpoint this session,
    // then list the newest scratch checkpoint it left behind
    SparkEntry.queries("q191_state_store_read")(spark, TestSpark.Sf0001).collect()
    val scratchRoot = new java.io.File(
      graft.sources.Sources.scratchLeaf(TestSpark.Sf0001, "x")).getParentFile
    val chk = Option(scratchRoot.listFiles()).toSeq.flatten
      .filter(_.getName.startsWith("state_read_chk_"))
      .maxBy(_.lastModified)
    val meta = spark.read.format("state-metadata").load(chk.getAbsolutePath)
      .where(col("operatorName") === "stateStoreSave").collect()
    assert(meta.length == 1, "metadata should list exactly one stateful operator")
    assert(meta.head.getAs[Int]("numPartitions") == 4,
      "state partition count should match the scoped stream-partitions conf")
  }

  test("q202: join checkpoint lists the four symmetric-hash-join stores") {
    import org.apache.spark.sql.functions.col
    SparkEntry.queries("q202_join_state_read")(spark, TestSpark.Sf0001).collect()
    val scratchRoot = new java.io.File(
      graft.sources.Sources.scratchLeaf(TestSpark.Sf0001, "x")).getParentFile
    val chk = Option(scratchRoot.listFiles()).toSeq.flatten
      .filter(_.getName.startsWith("join_state_chk_"))
      .maxBy(_.lastModified)
    val stores = spark.read.format("state-metadata").load(chk.getAbsolutePath)
      .where(col("operatorName") === "symmetricHashJoin")
      .collect().map(_.getAs[String]("stateStoreName")).sorted
    assert(stores.toSeq === Seq(
      "left-keyToNumValues", "left-keyWithIndexToValue",
      "right-keyToNumValues", "right-keyWithIndexToValue"),
      s"unexpected join store layout: ${stores.toSeq}")
  }

  test("q199: tws metadata declares the named state variable; state read = batch agg") {
    import org.apache.spark.sql.functions.col
    val state = SparkEntry.queries("q199_tws_state_read")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = SparkEntry.queries("q189_transform_with_state")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(state === want, "cold state read diverged from the drained stream's answer")
    val scratchRoot = new java.io.File(
      graft.sources.Sources.scratchLeaf(TestSpark.Sf0001, "x")).getParentFile
    val chk = Option(scratchRoot.listFiles()).toSeq.flatten
      .filter(_.getName.startsWith("tws_read_chk_"))
      .maxBy(_.lastModified)
    val props = spark.read.format("state-metadata").load(chk.getAbsolutePath)
      .where(col("operatorName") === "transformWithStateExec")
      .head().getAs[String]("operatorProperties")
    assert(props.contains("\"stateName\":\"totals\"") &&
      props.contains("\"stateVariableType\":\"ValueState\""),
      s"metadata does not declare the named state variable: $props")
  }
}
