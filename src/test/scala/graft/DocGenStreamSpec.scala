package graft

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The STREAMING contract of the docgen connector (q166's source,
  * [[graft.sources.docgen.DocGenMicroBatchStream]]):
  *
  *  - a `Trigger.AvailableNow` drain really is MULTI-batch: admission
  *    control (`rowsPerBatch`) bounds each trigger, so 1000 rows at 250
  *    rows/batch must execute ≥ 4 batches (a source that ignores its
  *    read limit and swallows the backlog in one batch would pass any
  *    result-only check — this pins the mechanism);
  *  - the drained stream is row-for-row equal to the BATCH read of the
  *    same options (offset ranges `[start, end)` tile the row space with
  *    no gap, overlap, or duplicate — the exactly-once tiling contract);
  *  - offsets round-trip through JSON (checkpoint serialization).
  */
class DocGenStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def drain(rows: Long, perBatch: Long, name: String) = {
    val q = spark.readStream.format("graft.sources.docgen")
      .option("rows", rows.toString).option("slices", "4")
      .option("rowsPerBatch", perBatch.toString)
      .load()
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  test("AvailableNow drain is multi-batch under admission control") {
    val q = drain(1000, 250, "docgen_stream_spec_mb")
    // 1000 rows at ≤250/batch: at least 4 data batches ran.
    val lastBatch = Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
    assert(lastBatch >= 3, s"expected >= 4 batches, last batchId was $lastBatch")
    assert(spark.table("docgen_stream_spec_mb").count() == 1000L)
  }

  test("streamed rows equal the batch read of the same options") {
    drain(1000, 300, "docgen_stream_spec_eq")
    val streamed = spark.table("docgen_stream_spec_eq")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val batch = spark.read.format("graft.sources.docgen")
      .option("rows", "1000").option("slices", "4").load()
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(streamed.length == 1000)
    assert(streamed.sameElements(batch))
  }

  test("offsets round-trip through checkpoint JSON") {
    val s = new graft.sources.docgen.DocGenMicroBatchStream(
      100, 4, 10, Array("id"))
    val off = s.latestOffset(s.initialOffset(),
      org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(10))
    assert(off.json() == "10")
    assert(s.deserializeOffset(off.json()) == graft.sources.docgen.DocGenOffset(10))
    // Clamp at the end of the generated range.
    val end = s.latestOffset(graft.sources.docgen.DocGenOffset(95),
      org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(10))
    assert(end == graft.sources.docgen.DocGenOffset(100))
  }
}
