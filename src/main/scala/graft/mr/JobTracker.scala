package graft.mr

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Reference job-state phases (`/root/reference/MapReduceFramework.h:8`). */
object Stage extends Enumeration {
  val UNDEFINED, MAP, SHUFFLE, REDUCE = Value
}

/** Observable job progress, mirroring the reference's
  * `JobState { stage_t stage; float percentage; }`
  * (`/root/reference/MapReduceFramework.h:8-13`).
  */
final case class JobState(stage: Stage.Value, percentage: Float)

/** Progress adapter: maps Spark's N-stage DAG onto the reference's
  * MAP → SHUFFLE → REDUCE phase model and exposes a lock-free, monotonic
  * `getJobState` exactly like the reference's packed 64-bit atomic
  * (`/root/reference/MapReduceFramework.cpp:36-41,87-114`).
  *
  * Mapping: Spark stages that produce shuffle output ("map stages" in DAG
  * terms) report as MAP while their tasks run; the transition between a
  * completed shuffle-map stage and the first task of the next stage is
  * SHUFFLE; the final result stage reports as REDUCE. Progress within a
  * phase is completedTasks / totalTasks of the stages in that phase.
  *
  * State is packed into one 64-bit long — stage in the top 2 bits,
  * completed in bits 31..61, total in bits 0..30, the reference's exact
  * layout (`MapReduceFramework.cpp:36-41`) — and published monotonically
  * with a CAS loop, so observed progress never regresses even under
  * concurrent listener events (`MapReduceFramework.cpp:94-99`).
  */
final class JobTracker extends SparkListener {
  private val packed = new AtomicLong(0L)

  private def pack(stage: Int, done: Long, total: Long): Long =
    (stage.toLong << 62) |
      ((done & 0x7FFFFFFFL) << 31) |
      (total & 0x7FFFFFFFL)

  /** Monotonic publication: only advance stage, or progress within a stage. */
  private def publish(stage: Int, done: Long, total: Long): Unit = {
    var updated = false
    while (!updated) {
      val cur = packed.get()
      val curStage = (cur >>> 62).toInt
      val curDone = (cur >>> 31) & 0x7FFFFFFFL
      val advance = stage > curStage || (stage == curStage && done >= curDone)
      if (!advance) return
      updated = packed.compareAndSet(cur, pack(stage, done, total))
    }
  }

  // stageId -> (isShuffleMapStage, numTasks, completed)
  private val stages = scala.collection.concurrent.TrieMap.empty[Int, (Boolean, Int, Int)]

  override def onStageSubmitted(ev: SparkListenerStageSubmitted): Unit = {
    // A stage with shuffle-dependency output is a "map" stage; the result
    // stage (no shuffle write) is the "reduce" stage. Spark exposes this
    // indirectly: result stages have no shuffle dep in their details, but
    // the listener API doesn't say directly — we approximate: the stage
    // with the highest id in a job is its result stage.
    val info = ev.stageInfo
    stages.put(info.stageId, (true, info.numTasks, 0))
    publish(Stage.MAP.id, totalDone(), totalTasks())
  }

  override def onTaskEnd(ev: SparkListenerTaskEnd): Unit = {
    stages.updateWith(ev.stageId) {
      case Some((m, n, c)) => Some((m, n, c + 1))
      case None            => Some((true, 1, 1))
    }
    val maxStage = stages.keys.max
    val isResultStage = ev.stageId == maxStage && stages.size > 1
    val phase = if (isResultStage) Stage.REDUCE.id else Stage.MAP.id
    publish(phase, totalDone(), totalTasks())
  }

  override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
    // A completed non-final stage means its shuffle files are written:
    // the job is at least in SHUFFLE until the next stage's tasks start.
    if (stages.size > 1 && ev.stageInfo.stageId != stages.keys.max)
      publish(Stage.SHUFFLE.id, totalDone(), totalTasks())
  }

  private def totalDone(): Long = stages.values.map(_._3.toLong).sum
  private def totalTasks(): Long = stages.values.map(_._2.toLong).sum

  /** Lock-free read of the packed word — `getJobState`
    * (`MapReduceFramework.cpp:312-324`): one atomic load, then unpack.
    * percentage = 100·done/total, 0 when total = 0
    * (`MapReduceFramework.cpp:103-114`).
    */
  def getJobState: JobState = {
    val word = packed.get()
    val stage = (word >>> 62).toInt
    val done = (word >>> 31) & 0x7FFFFFFFL
    val total = word & 0x7FFFFFFFL
    val pct = if (total == 0) 0f else 100f * done.toFloat / total.toFloat
    JobState(Stage(stage), math.min(100f, pct))
  }

  /** Force terminal state (REDUCE, 100%) — called when the action returns,
    * the analogue of `waitForJob` observing completion.
    */
  def markDone(): Unit = publish(Stage.REDUCE.id, 1, 1)
}

object JobTracker {
  /** Attach a tracker to the session for the duration of `body`. */
  def tracked[T](spark: SparkSession)(body: => T): (T, JobTracker) = {
    val tracker = new JobTracker
    spark.sparkContext.addSparkListener(tracker)
    try {
      val r = body
      tracker.markDone()
      (r, tracker)
    } finally spark.sparkContext.removeSparkListener(tracker)
  }
}
