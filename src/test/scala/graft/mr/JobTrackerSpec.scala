package graft.mr

import org.apache.spark.{Success, TaskKilled}
import org.apache.spark.scheduler.{SparkListenerStageCompleted, SparkListenerStageSubmitted, SparkListenerTaskEnd, StageInfo, TaskInfo, TaskLocality}
import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Progress/JobState semantics from the reference
  * (`/root/reference/MapReduceFramework.cpp:87-114,312-324`): monotonic
  * stage and percentage, per-phase totals, terminal REDUCE/100%,
  * zero-state before any work. Synthetic listener events drive the
  * phase machine deterministically; real-job cases cover the live
  * listener path.
  */
class JobTrackerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // --- synthetic listener events -----------------------------------------
  private def stageInfo(id: Int, numTasks: Int): StageInfo =
    new StageInfo(id, 0, s"stage$id", numTasks, Seq.empty, Seq.empty, "",
      null, Seq.empty, None, 0, false, 0)

  private def submit(t: JobTracker, si: StageInfo): Unit =
    t.onStageSubmitted(SparkListenerStageSubmitted(si, null))

  private def taskEnd(t: JobTracker, stageId: Int, index: Int,
      taskType: String = "ResultTask",
      reason: org.apache.spark.TaskEndReason = Success): Unit = {
    val ti = new TaskInfo(index.toLong, index, 0, index, 0L, "exec", "host",
      TaskLocality.ANY, false)
    t.onTaskEnd(SparkListenerTaskEnd(stageId, 0, taskType, reason, ti, null, null))
  }

  private def complete(t: JobTracker, si: StageInfo): Unit =
    t.onStageCompleted(SparkListenerStageCompleted(si))

  // -----------------------------------------------------------------------

  test("fresh tracker reports UNDEFINED 0% (total=0 ⇒ 0, cpp:103-114)") {
    val t = new JobTracker
    assert(t.getJobState === JobState(Stage.UNDEFINED, 0f))
  }

  test("single-stage (shuffle-free) job reports REDUCE from its first task, no markDone needed") {
    val t = new JobTracker
    submit(t, stageInfo(0, 4))
    // before any task ends the stage kind is unknown → the job's opening
    // MAP phase (cpp:127-129)
    assert(t.getJobState === JobState(Stage.MAP, 0f))
    taskEnd(t, 0, 0) // ResultTask pins the stage as REDUCE work
    assert(t.getJobState === JobState(Stage.REDUCE, 25f))
    taskEnd(t, 0, 1)
    assert(t.getJobState === JobState(Stage.REDUCE, 50f))
    taskEnd(t, 0, 2); taskEnd(t, 0, 3)
    assert(t.getJobState === JobState(Stage.REDUCE, 100f))
  }

  test("two-stage job: MAP % over map tasks, SHUFFLE gap, REDUCE % over result tasks (cpp:312-324)") {
    val t = new JobTracker
    val mapStage = stageInfo(0, 4)
    submit(t, mapStage)
    assert(t.getJobState === JobState(Stage.MAP, 0f))
    taskEnd(t, 0, 0, taskType = "ShuffleMapTask")
    assert(t.getJobState === JobState(Stage.MAP, 25f)) // within-phase: 1/4
    taskEnd(t, 0, 1, taskType = "ShuffleMapTask")
    taskEnd(t, 0, 2, taskType = "ShuffleMapTask")
    taskEnd(t, 0, 3, taskType = "ShuffleMapTask")
    assert(t.getJobState === JobState(Stage.MAP, 100f))
    complete(t, mapStage) // shuffle files written, no result stage running yet
    assert(t.getJobState.stage === Stage.SHUFFLE)
    submit(t, stageInfo(1, 2))
    taskEnd(t, 1, 0) // first ResultTask: REDUCE with its own denominator (#groups)
    assert(t.getJobState === JobState(Stage.REDUCE, 50f))
    taskEnd(t, 1, 1)
    assert(t.getJobState === JobState(Stage.REDUCE, 100f))
  }

  test("failed and duplicate task attempts don't inflate progress") {
    val t = new JobTracker
    submit(t, stageInfo(0, 4))
    taskEnd(t, 0, 0, taskType = "ShuffleMapTask",
      reason = TaskKilled("speculative", Seq.empty, Seq.empty, Seq.empty))
    assert(t.getJobState === JobState(Stage.MAP, 0f)) // killed attempt: not counted
    taskEnd(t, 0, 1, taskType = "ShuffleMapTask")
    taskEnd(t, 0, 1, taskType = "ShuffleMapTask") // SAME index succeeds twice (retry)
    assert(t.getJobState === JobState(Stage.MAP, 25f)) // counted once
  }

  test("markDone is terminal: straggling listener events cannot regress it") {
    val t = new JobTracker
    submit(t, stageInfo(0, 4))
    taskEnd(t, 0, 0, taskType = "ShuffleMapTask")
    t.markDone()
    assert(t.getJobState === JobState(Stage.REDUCE, 100f))
    // late async events after the action returned (the listener bus is
    // async; tracked() removes the listener without draining it)
    taskEnd(t, 0, 1, taskType = "ShuffleMapTask")
    submit(t, stageInfo(1, 8))
    taskEnd(t, 1, 0)
    assert(t.getJobState === JobState(Stage.REDUCE, 100f))
  }

  test("tracked job ends in terminal REDUCE/100% and observes progress monotonically") {
    import spark.implicits._
    val (result, tracker) = JobTracker.tracked(spark) {
      spark.createDataset(1 to 10000)
        .map(i => (i % 7, i.toLong)).groupByKey(_._1)
        .mapGroups((k, it) => (k, it.map(_._2).sum)).collect()
    }
    assert(result.length === 7)
    assert(tracker.getJobState === JobState(Stage.REDUCE, 100f))
  }

  test("real shuffle-free job reaches REDUCE through the live listener (no markDone)") {
    import spark.implicits._
    val t = new JobTracker
    spark.sparkContext.addSparkListener(t)
    try {
      spark.createDataset(1 to 1000).map(_ + 1).collect()
      // listener bus is async: poll briefly for the events to land
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (t.getJobState.stage != Stage.REDUCE && System.nanoTime() < deadline)
        Thread.sleep(20)
      assert(t.getJobState.stage === Stage.REDUCE)
      assert(t.getJobState.percentage === 100f)
    } finally spark.sparkContext.removeSparkListener(t)
  }

  test("broadcast-join action: aux collect job doesn't flip the phase to REDUCE early") {
    // Round-2 delta, now closed: a broadcast exchange runs its own collect
    // job whose ResultTasks used to register REDUCE before the main
    // query's map stages ever ran. Its stages are announced by the
    // "broadcast exchange" job description and excluded from phase math.
    val t = new JobTracker
    val props = new java.util.Properties()
    // the Spark-4 signal: the collect job's RDD scope is the exchange node
    props.setProperty("spark.rdd.scope", """{"id":"0","name":"BroadcastExchange"}""")
    val bcStage = stageInfo(0, 2)
    t.onJobStart(org.apache.spark.scheduler.SparkListenerJobStart(
      0, 0L, Seq(bcStage), props))
    submit(t, bcStage)
    taskEnd(t, 0, 0); taskEnd(t, 0, 1) // ResultTasks of the broadcast collect
    complete(t, bcStage)
    assert(t.getJobState.stage === Stage.UNDEFINED,
      "broadcast collect alone must not publish a phase")
    // main query: map stage first — the action reports MAP, not REDUCE
    val mapStage = stageInfo(1, 4)
    submit(t, mapStage)
    taskEnd(t, 1, 0, taskType = "ShuffleMapTask")
    taskEnd(t, 1, 1, taskType = "ShuffleMapTask")
    assert(t.getJobState === JobState(Stage.MAP, 50f))
    taskEnd(t, 1, 2, taskType = "ShuffleMapTask")
    taskEnd(t, 1, 3, taskType = "ShuffleMapTask")
    complete(t, mapStage)
    assert(t.getJobState.stage === Stage.SHUFFLE)
    // REDUCE only in the final (result) stage — reference cpp:127-129
    submit(t, stageInfo(2, 2))
    taskEnd(t, 2, 0)
    assert(t.getJobState === JobState(Stage.REDUCE, 50f))
    taskEnd(t, 2, 1)
    assert(t.getJobState === JobState(Stage.REDUCE, 100f))
  }

  test("live signal: broadcast-exchange jobs announce themselves in the job properties") {
    // The aux classification keys on the broadcast collect job's RDD
    // scope name — pin the public signal so a Spark upgrade that renames
    // it fails loudly here rather than silently regressing the tracker.
    import org.apache.spark.scheduler.SparkListenerJobStart
    import org.apache.spark.sql.functions.{broadcast, col}
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val probe = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(ev: SparkListenerJobStart): Unit =
        Option(ev.properties)
          .flatMap(p => Option(p.getProperty("spark.rdd.scope")))
          .foreach(seen.add)
    }
    spark.sparkContext.addSparkListener(probe)
    try {
      val big = spark.range(10000).withColumn("k", col("id") % 100)
      val small = spark.range(100).withColumn("k", col("id"))
      big.join(broadcast(small), "k").groupBy("k").count().collect()
      def hit = seen.toArray.exists(_.toString.contains("\"name\":\"BroadcastExchange\""))
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (!hit && System.nanoTime() < deadline) Thread.sleep(20)
      assert(hit,
        s"no BroadcastExchange job scope observed: ${seen.toArray.mkString(", ")}")
    } finally spark.sparkContext.removeSparkListener(probe)
  }

  test("AQE late broadcast job: a COMPLETED ancestor stage keeps its counted status") {
    // AQE re-optimization corner (round-4 carry-forward): after a map
    // stage finishes, AQE may switch the join strategy and spawn a late
    // broadcast-exchange collect job whose stageInfos list the ALREADY
    // COMPLETED shuffle-map ancestor (shared lineage) next to the new
    // collect stage. The ancestor predates the broadcast job, so
    // putIfAbsent must lose and the ancestor keeps its MAP accounting;
    // only the genuinely new collect stage becomes aux.
    val t = new JobTracker
    val mapStage = stageInfo(0, 4)
    submit(t, mapStage)
    (0 until 4).foreach(taskEnd(t, 0, _, taskType = "ShuffleMapTask"))
    complete(t, mapStage)
    assert(t.getJobState.stage === Stage.SHUFFLE)

    // the late AQE broadcast job references ancestor 0 + fresh collect 1
    val props = new java.util.Properties()
    props.setProperty("spark.rdd.scope", """{"id":"7","name":"BroadcastExchange"}""")
    val collectStage = stageInfo(1, 1)
    t.onJobStart(org.apache.spark.scheduler.SparkListenerJobStart(
      1, 0L, Seq(stageInfo(0, 4), collectStage), props))
    submit(t, collectStage)
    taskEnd(t, 1, 0) // the collect's ResultTask
    complete(t, collectStage)
    // aux: the collect must not flip the phase to REDUCE mid-shuffle
    assert(t.getJobState.stage === Stage.SHUFFLE,
      "late broadcast collect flipped the phase")

    // the real result stage: its denominator must be ITS task count (2),
    // not polluted by the aux collect's ResultTask (which would make 1/3
    // or 2/3 here)
    submit(t, stageInfo(2, 2))
    taskEnd(t, 2, 0)
    assert(t.getJobState === JobState(Stage.REDUCE, 50f),
      "REDUCE denominator polluted by the aux collect stage")
    taskEnd(t, 2, 1)
    assert(t.getJobState === JobState(Stage.REDUCE, 100f))
  }

  test("AQE late broadcast job: a still-RUNNING ancestor keeps its MAP denominator") {
    // Same corner with the ancestor mid-flight: if the broadcast job's
    // putIfAbsent could steal the ancestor into aux, the MAP phase would
    // lose its 4-task denominator and progress would freeze at 50%.
    val t = new JobTracker
    submit(t, stageInfo(0, 4))
    taskEnd(t, 0, 0, taskType = "ShuffleMapTask")
    taskEnd(t, 0, 1, taskType = "ShuffleMapTask")
    assert(t.getJobState === JobState(Stage.MAP, 50f))

    val props = new java.util.Properties()
    props.setProperty("spark.rdd.scope", """{"id":"9","name":"BroadcastExchange"}""")
    t.onJobStart(org.apache.spark.scheduler.SparkListenerJobStart(
      2, 0L, Seq(stageInfo(0, 4), stageInfo(3, 1)), props))

    // ancestor still counted: 3/4, not stuck at 2/4 (or divided by zero)
    taskEnd(t, 0, 2, taskType = "ShuffleMapTask")
    assert(t.getJobState === JobState(Stage.MAP, 75f),
      "running ancestor lost its MAP denominator to the aux marking")
    taskEnd(t, 0, 3, taskType = "ShuffleMapTask")
    assert(t.getJobState === JobState(Stage.MAP, 100f))
  }

  test("publication is monotonic under out-of-order updates (cpp:94-99)") {
    val t = new JobTracker
    t.markDone() // REDUCE 100%
    val before = t.getJobState
    t.markDone()
    assert(t.getJobState === before)
    assert(t.getJobState.stage === Stage.REDUCE)
  }

  test("percentage never exceeds 100") {
    val t = new JobTracker
    t.markDone()
    assert(t.getJobState.percentage <= 100f)
  }
}
