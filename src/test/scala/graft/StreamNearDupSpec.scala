package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q342 in-stream near-dedup — the claims beyond the DuckDB oracle
  * (which already gates the single-batch run against batch q23
  * restricted to the horizon):
  *   - the row-local signature path is IDENTICAL to the batch LSH
  *     relation (same grams, same minhashes, same band keys);
  *   - a multi-batch staged run finds the same verified pairs as the
  *     single-batch run, including pairs whose two documents arrive in
  *     DIFFERENT micro-batches (cross-batch candidate detection);
  *   - band-key state is EVICTED as the watermark advances (entries
  *     older than wm − horizon are gone from the final state store),
  *     so state holds a horizon's worth of band rows, not the stream.
  */
class StreamNearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001
  private val D = queries.Dedup

  private val Horizon = 128L
  private val ClockOffset = 1000L
  // staged micro-batch id ranges (ascending, so event time never runs
  // backwards across batches — the watermark contract)
  private val Bounds = Seq(126L, 251L, 441L)

  private def rm(x: java.io.File): Unit = {
    Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
  }

  test("q342: row-local band rows equal the batch bandRows relation") {
    val docs = Tables.documents(spark, d)
    val rowLocal = D.rowLocalBands(docs)
      .select(col("doc_id"), col("n"), col("bk")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val batch = D.bandRows(
      graft.functions.TextFns.wordGrams(docs, 3))
      .select(col("doc_id"), col("n"), col("bk")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(rowLocal.length == batch.length && rowLocal.sameElements(batch),
      "zero-shuffle signature path diverged from the batch LSH relation")
  }

  /** Stages documents into one parquet file per id range, mtime-ordered
    * so FileStreamSource processes them as successive micro-batches.
    */
  private def stageFiles(): String = {
    val stage = new java.io.File(
      sys.props("java.io.tmpdir"), s"neardup_stage_${java.util.UUID.randomUUID().toString.take(8)}")
    stage.mkdirs()
    val docs = Tables.documents(spark, d)
    val ranges = (Seq(0L) ++ Bounds).zip(Bounds ++ Seq(Long.MaxValue))
    ranges.zipWithIndex.foreach { case ((lo, hi), i) =>
      val tmp = new java.io.File(stage, s"build_$i")
      docs.where(col("doc_id") >= lo && col("doc_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(stage, f"batch_$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1000000L + i * 60000L)
      rm(tmp)
    }
    stage.getAbsolutePath
  }

  private def multiBatchRun(): (String, String, org.apache.spark.sql.SparkSession) = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stage = stageFiles()
    val name = "neardup_mb_" + java.util.UUID.randomUUID().toString.take(8)
    val chk = new java.io.File(sys.props("java.io.tmpdir"), s"${name}_chk").getAbsolutePath
    val schema = spark.read.parquet(s"$d/documents.parquet").schema
    D.runNearDupStream(s,
      s.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(stage),
      name, chk)
    (name, chk, s)
  }

  test("q342: multi-batch run matches single-batch pairs, with cross-batch detections") {
    val (name, _, s) = multiBatchRun()
    val multi = D.verifyStreamCandidates(s, d, s.table(name)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    val single = SparkEntry.queries("q342_stream_neardup")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    assert(multi.nonEmpty && multi.sameElements(single),
      s"multi-batch pairs diverged: ${multi.toSeq} vs ${single.toSeq}")
    def batchOf(id: Long): Int = Bounds.count(_ <= id)
    assert(multi.exists(p => batchOf(p._1) != batchOf(p._2)),
      "no verified pair spans two micro-batches — cross-batch detection untested")
  }

  test("q342: band-key state is watermark-evicted, not stream-accumulated") {
    val (_, chk, s) = multiBatchRun()
    val st = s.read.format("statestore").option("stateVarName", "seen").load(chk)
      .select(col("user_map_key.value").as("doc_id"),
        col("user_map_value._1").as("ts_sec"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val totalBandRows = D.rowLocalBands(Tables.documents(spark, d)).count()
    assert(st.nonEmpty && st.length < totalBandRows,
      s"no eviction: ${st.length} state entries vs $totalBandRows band rows")
    // watermark at the FINAL batch's start = (last id of batch 3 +
    // clock offset) − horizon; every entry older than wm − horizon must
    // have been evicted by then (on input for re-touched keys, by the
    // event-time cleanup timer for silent ones)
    val wmAtLastBatch = (Bounds.last - 1 + ClockOffset) - Horizon
    val threshold = wmAtLastBatch - Horizon
    val stale = st.filter(_._2 < threshold)
    assert(stale.isEmpty,
      s"stale band-state entries survived past wm − horizon: ${stale.take(5).toSeq}")
  }
}
