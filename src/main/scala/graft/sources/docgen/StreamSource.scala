package graft.sources.docgen

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{
  CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit,
  ReadMaxRows, SupportsTriggerAvailableNow}

/** Stream position = count of rows already emitted. A single
  * monotonically-increasing Long is the whole checkpoint state, so offset
  * JSON is just the number — the same shape Kafka uses per partition and
  * the rate source uses globally.
  */
case class DocGenOffset(index: Long) extends Offset {
  override def json(): String = index.toString
}

/** The STREAMING read path of the docgen connector — the micro-batch twin
  * of [[DocGenScan]]'s batch path, sharing the same closed-form generator
  * ([[DocGen]]) and the same partition/reader classes, so batch and
  * streaming reads of the same options are row-for-row identical (the
  * Kafka-connector discipline: one table, `BATCH_READ` +
  * `MICRO_BATCH_READ`, two `Scan` modes).
  *
  * What this exercises that q154's batch path cannot:
  *
  *   - **Replayable offsets**: a batch is the half-open row range
  *     `[start, end)`; `planInputPartitions(start, end)` regenerates
  *     exactly those rows on ANY retry (the exactly-once contract —
  *     generation is pure, so re-execution after failure emits identical
  *     data, which the driver's hash oracle then proves end-to-end).
  *   - **Admission control** ([[SupportsTriggerAvailableNow]] extends
  *     `SupportsAdmissionControl`): `latestOffset(start, limit)` advances
  *     by at most `rowsPerBatch` rows per trigger — the
  *     `maxOffsetsPerTrigger` production knob that keeps a backlogged
  *     source from swallowing the whole backlog in one giant batch.
  *   - **Trigger.AvailableNow drain**: the wrapper drains the fixed
  *     `rows` target in ceil(rows / rowsPerBatch) bounded batches and
  *     terminates — bounded-recovery semantics on an unbounded-source
  *     API (`DocGenStreamSpec` pins the multi-batch execution).
  *
  * Within a batch the range splits into `slices` even chunks exactly as
  * the batch scan does — parallelism inside each micro-batch is planned
  * by the source.
  */
class DocGenMicroBatchStream(
    rows: Long,
    slices: Int,
    rowsPerBatch: Long,
    cols: Array[String])
    extends MicroBatchStream
    with SupportsTriggerAvailableNow {

  override def initialOffset(): Offset = DocGenOffset(0L)

  override def deserializeOffset(json: String): Offset =
    DocGenOffset(json.trim.toLong)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)

  /** Unlimited-variant entry point: admission-controlled sources route
    * through `latestOffset(start, limit)` instead (the Kafka connector's
    * exact contract for this method).
    */
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  /** Admission control, the Kafka connector's semantics: ReadMaxRows
    * caps the advance, ReadAllAvailable drains to the end in ONE step
    * (not one default-sized batch), and a CompositeReadLimit is honored
    * by its most restrictive row cap.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[DocGenOffset].index
    def step(l: ReadLimit): Long = l match {
      case m: ReadMaxRows                => math.max(1L, m.maxRows())
      case _: ReadAllAvailable           => rows - from
      case c: CompositeReadLimit         =>
        val steps = c.getReadLimits.map(step)
        if (steps.isEmpty) rowsPerBatch else steps.min
      case _                             => rowsPerBatch
    }
    DocGenOffset(math.min(rows, from + math.max(1L, step(limit))))
  }

  override def reportLatestOffset(): Offset = DocGenOffset(rows)

  /** The generator's end is a fixed `rows` already — nothing to snapshot
    * beyond what `latestOffset` honors batch by batch.
    */
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[DocGenOffset].index
    val hi = end.asInstanceOf[DocGenOffset].index
    val n = hi - lo
    (0 until slices).map { i =>
      DocGenPartition(lo + i * n / slices, lo + (i + 1) * n / slices, cols)
    }.filter(p => p.end > p.start).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DocGenReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
