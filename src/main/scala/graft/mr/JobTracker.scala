package graft.mr

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.Success
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerStageSubmitted, SparkListenerTaskEnd}
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
  * Phase classification is by SHUFFLE DEPENDENCY, not stage position:
  * a Spark stage that writes shuffle output (running `ShuffleMapTask`s)
  * is MAP work; a result stage (running `ResultTask`s) is REDUCE work.
  * The public signal is `SparkListenerTaskEnd.taskType` (the
  * `StageInfo.shuffleDepId` field says the same thing at submission time
  * but is `private[spark]`), so a stage's kind is pinned by its first
  * task-end event; until then it counts toward MAP — the job's opening
  * phase in the reference (`cpp:127-129`). A shuffle-free single-stage
  * job therefore reports REDUCE from its first completed task — the
  * reference's degenerate case where map output goes straight to reduce.
  *
  * Percentage is WITHIN the current phase with per-phase totals, matching
  * the reference exactly (`MapReduceFramework.cpp:312-324`; totals at
  * `cpp:128,162-167,217`): MAP = successful map-stage tasks over total
  * map-stage tasks; REDUCE = successful result-stage tasks over total
  * result-stage tasks. The SHUFFLE phase (between the last map task and
  * the first result task) reports completed map stages over total — by
  * then 100%, i.e. "shuffle files fully written, awaiting reduce"; Spark
  * exposes no merge progress because the distributed shuffle has no
  * single merging thread (`cpp:159-218` is thread-0-only by design).
  *
  * Only `ev.reason == Success` task completions count, and a task index
  * that succeeds twice (speculative/retried attempts) counts once — so
  * `done` can never exceed `total` (the reference increments exactly once
  * per item, `cpp:144-145,237-238`).
  *
  * Multi-job actions: a tracked ACTION can launch several Spark jobs —
  * broadcast exchanges (and the AQE/DPP subqueries built on them) run
  * their own collect jobs whose ResultTasks would otherwise register a
  * result stage before the main query's map stages and flip the phase to
  * REDUCE early (reference semantics: MAP until all map items are done,
  * `MapReduceFramework.cpp:127-129`). Those jobs announce themselves in
  * the public job properties on `SparkListenerJobStart`: the broadcast
  * collect's RDD operation scope is named "BroadcastExchange"
  * (`spark.rdd.scope`; Spark versions that still set a job description
  * use "broadcast exchange (runId …)" — both signals are recognized, and
  * the live one is pinned in `JobTrackerSpec`). The tracker marks every
  * stage of such a job
  * AUXILIARY and excludes it from phase math entirely — broadcast prep
  * moves no data items, so it has no analogue in the reference's
  * item-count progress; counting it would distort both the phase and the
  * denominators.
  *
  * State is packed into one 64-bit long — stage in the top 2 bits,
  * completed in bits 31..61, total in bits 0..30, the reference's exact
  * layout (`MapReduceFramework.cpp:36-41`) — and published monotonically
  * with a CAS loop, so observed progress never regresses even under
  * concurrent listener events (`MapReduceFramework.cpp:94-99`).
  */
final class JobTracker extends SparkListener {
  private val packed = new AtomicLong(0L)

  /** Once `markDone()` fires, late async listener events must not regress
    * the terminal state — the reference's waitForJob → getJobState ==
    * (REDUCE, 100%) contract holds unconditionally after the action
    * returns.
    */
  @volatile private var terminal = false

  private def pack(stage: Int, done: Long, total: Long): Long =
    (stage.toLong << 62) |
      ((done & 0x7FFFFFFFL) << 31) |
      (total & 0x7FFFFFFFL)

  /** Monotonic publication: only advance stage, or percentage within a
    * stage. The within-stage comparison is on the PERCENTAGE, not the raw
    * `done` counter — per-phase totals can grow while an action runs
    * (AQE submits stages as it re-plans), and a larger denominator with a
    * barely-larger numerator would otherwise make the observed progress
    * regress, violating the reference's invariant (`cpp:94-99`).
    */
  private def publish(stage: Int, done: Long, total: Long): Unit = {
    def pct(d: Long, t: Long): Float = if (t == 0) 0f else d.toFloat / t.toFloat
    var updated = false
    while (!updated) {
      if (terminal) return
      val cur = packed.get()
      val curStage = (cur >>> 62).toInt
      val curDone = (cur >>> 31) & 0x7FFFFFFFL
      val curTotal = cur & 0x7FFFFFFFL
      val advance = stage > curStage ||
        (stage == curStage && pct(done, total) >= pct(curDone, curTotal))
      if (!advance) return
      updated = packed.compareAndSet(cur, pack(stage, done, total))
    }
  }

  /** Per-stage record. `doneIdx` holds the indices of tasks that ended
    * with Success (a set, so a retried attempt of the same index is
    * counted once); `completed` marks the whole stage finished. `kind`
    * starts Unknown and is pinned by the first task-end's taskType.
    */
  private final class Rec(val total: Int) {
    @volatile var kind: Int = Rec.Unknown
    @volatile var aux = false
    val doneIdx = scala.collection.concurrent.TrieMap.empty[Int, Unit]
    @volatile var completed = false
    def done: Int = if (completed) total else math.min(doneIdx.size, total)
  }
  private object Rec { val Unknown = 0; val Map = 1; val Result = 2 }

  private val stages = scala.collection.concurrent.TrieMap.empty[Int, Rec]

  private def phaseTotals(): (Long, Long, Long, Long, Int, Int) = {
    var mapDone = 0L; var mapTotal = 0L; var resDone = 0L; var resTotal = 0L
    var mapStagesDone = 0; var mapStages = 0
    stages.values.foreach { r =>
      if (r.aux) () // broadcast-exchange bookkeeping: no data items moved
      else if (r.kind != Rec.Result) { // Unknown counts as the opening MAP phase
        mapDone += r.done; mapTotal += r.total
        mapStages += 1; if (r.completed) mapStagesDone += 1
      } else { resDone += r.done; resTotal += r.total }
    }
    (mapDone, mapTotal, resDone, resTotal, mapStagesDone, mapStages)
  }

  /** Recompute the phase + within-phase progress and publish. */
  private def publishCurrent(): Unit = {
    val (mapDone, mapTotal, resDone, resTotal, mapStagesDone, mapStages) = phaseTotals()
    if (resTotal > 0)
      // a result stage exists: its tasks are the REDUCE denominator
      // (#groups in the reference, `cpp:217,224`)
      publish(Stage.REDUCE.id, resDone, resTotal)
    else if (mapStages > 0 && mapStagesDone == mapStages)
      // all known map stages done, no result stage yet: the shuffle gap
      publish(Stage.SHUFFLE.id, mapStagesDone.toLong, mapStages.toLong)
    else if (mapStages > 0)
      publish(Stage.MAP.id, mapDone, mapTotal)
  }

  /** Pre-register the stages of a broadcast-exchange job as auxiliary.
    * Only such jobs are handled here — normal jobs' stages materialize at
    * submission so that not-yet-running downstream stages don't inflate
    * the phase denominators.
    */
  override def onJobStart(ev: SparkListenerJobStart): Unit = {
    def prop(k: String): String = Option(ev.properties)
      .flatMap(p => Option(p.getProperty(k))).getOrElse("")
    val isBroadcast =
      prop("spark.rdd.scope").contains("\"name\":\"BroadcastExchange\"") ||
        prop("spark.job.description").startsWith("broadcast exchange")
    if (isBroadcast) {
      // Only NEW stages become aux: a broadcast job's stageInfos also
      // lists shared ancestor stages (e.g. an already-materialized
      // shuffle-map stage the AQE broadcast reads) that belong to the
      // main query's MAP accounting — a putIfAbsent loser predates this
      // job and keeps its counted status.
      ev.stageInfos.foreach { info =>
        val fresh = new Rec(info.numTasks)
        fresh.aux = true
        stages.putIfAbsent(info.stageId, fresh)
      }
    }
  }

  override def onStageSubmitted(ev: SparkListenerStageSubmitted): Unit = {
    val info = ev.stageInfo
    stages.putIfAbsent(info.stageId, new Rec(info.numTasks))
    publishCurrent()
  }

  override def onTaskEnd(ev: SparkListenerTaskEnd): Unit = {
    stages.get(ev.stageId).foreach { r =>
      if (r.kind == Rec.Unknown)
        r.kind = if (ev.taskType.contains("ShuffleMap")) Rec.Map else Rec.Result
      if (ev.reason == Success)
        // negative sentinel for a (defensive) null taskInfo, so it can
        // never collide with — and swallow — a real task index
        r.doneIdx.putIfAbsent(
          Option(ev.taskInfo).map(_.index).getOrElse(-1 - r.doneIdx.size), ())
    }
    publishCurrent()
  }

  override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
    // a stage that completed without a failure reason ran all its tasks
    if (ev.stageInfo.failureReason.isEmpty)
      stages.get(ev.stageInfo.stageId).foreach(_.completed = true)
    publishCurrent()
  }

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

  /** Force the terminal state (REDUCE, 100%) unconditionally — called when
    * the action returns, the analogue of `waitForJob` observing
    * completion. Bypasses the monotonic guard (a straggling listener
    * event must not undo it; `terminal` blocks all later publishes).
    */
  def markDone(): Unit = {
    terminal = true
    packed.set(pack(Stage.REDUCE.id, 1, 1))
  }
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
