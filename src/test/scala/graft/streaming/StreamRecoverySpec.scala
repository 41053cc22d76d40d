package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** END-TO-END RESTART RECOVERY: a streaming query is stopped mid-drain
  * and restarted from its checkpoint — the final sink contents must be
  * exactly-once regardless of where the stop landed. This is the
  * contract the whole streaming stack composes for: replayable source
  * offsets (DocGenStreamSpec), atomic per-batch sink commits (the file
  * sink's transaction log), and checkpointed offset tracking. A lost
  * batch shows up as missing rows; a replayed-but-not-deduplicated
  * batch as duplicates; both fail the exact count + content compare
  * against the batch read.
  */
class StreamRecoverySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("restart from checkpoint is exactly-once into the file sink") {
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val out = java.nio.file.Files.createTempDirectory(s"graft_rec_out_$tag").toString
    val chk = java.nio.file.Files.createTempDirectory(s"graft_rec_chk_$tag").toString
    def start() = spark.readStream.format("graft.sources.docgen")
      .option("rows", "1000").option("slices", "4")
      .option("rowsPerBatch", "100") // 10 data batches — the stop lands mid-drain
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start()

    // run 1: stop as soon as at least one batch committed (wherever the
    // stop lands, recovery must still be exactly-once)
    val q1 = start()
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (Option(q1.lastProgress).isEmpty && q1.isActive
      && System.nanoTime() < deadline) Thread.sleep(50)
    q1.stop()
    q1.awaitTermination()

    // run 2: same checkpoint + sink — drain the rest
    val q2 = start()
    q2.awaitTermination()

    val got = spark.read.parquet(out)
    val expected = spark.read.format("graft.sources.docgen")
      .option("rows", "1000").option("slices", "4").load()
    assert(got.count() === 1000L,
      s"restart lost or replayed rows: ${got.count()} != 1000")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "sink contents diverged from the batch read after recovery")
  }
}
