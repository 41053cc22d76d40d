package graft.mr

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

/** Typed MapReduce façade with the reference's client contract.
  *
  * The reference (`/root/reference/MapReduceClient.h:59,64`) defines a job as:
  * a user `map(k1, v1)` that emits 0..n intermediate `(k2, v2)` pairs
  * (`emit2`), a framework shuffle that groups all intermediate pairs by key,
  * and a user `reduce` that receives one complete key-group and emits 0..n
  * output `(k3, v3)` pairs (`emit3`). Input and output are unordered bags
  * (`MapReduceFramework.cpp:133,368-369`).
  *
  * Spark-first re-expression: `flatMap → groupByKey → flatMapGroups`. The
  * reference's per-thread sort + barrier + single-threaded k-way merge
  * (`MapReduceFramework.cpp:148-221`) is exactly what Spark's distributed
  * shuffle does natively — map-side sort/spill, stage boundary, merge on the
  * reduce side — so none of it is rebuilt here; the shuffle IS the barrier.
  *
  * Semantic deltas vs the reference, by design (SURVEY.md §7):
  *  - The reference groups keys by ordering-equality (`!(a<b) && !(b<a)`,
  *    `MapReduceFramework.cpp:197`); Spark groups by the key's
  *    `equals`/`hashCode` through its encoder. Callers must use key types
  *    whose equality is consistent with their ordering (true for all
  *    primitives, strings, and well-behaved case classes).
  *  - Value order within a group is unspecified — same as the reference,
  *    whose per-thread `std::sort` is unstable and compares keys only
  *    (`MapReduceFramework.cpp:150-154`). Reducers must be order-insensitive.
  *  - Keys/values cross executor boundaries, so they need `Encoder`s — the
  *    one obligation with no counterpart in the reference's shared-memory
  *    pointer passing.
  */
object MapReduce {

  /** Run one MapReduce job over a typed dataset of (K1, V1) pairs.
    *
    * Mirrors `startMapReduceJob` + `waitForJob` semantics lazily: the
    * returned Dataset is the job handle; any action runs the job.
    */
  def run[K1, V1, K2, V2, K3, V3](
      input: Dataset[(K1, V1)],
      map: (K1, V1) => IterableOnce[(K2, V2)],
      reduce: (K2, Iterator[(K2, V2)]) => IterableOnce[(K3, V3)])(
      implicit e2: Encoder[(K2, V2)], ek: Encoder[K2], e3: Encoder[(K3, V3)])
      : Dataset[(K3, V3)] = {
    input
      .flatMap { case (k1, v1) => map(k1, v1) }          // MAP (emit2 = iterator)
      .groupByKey(_._1)                                   // SORT+SHUFFLE (distributed)
      .flatMapGroups((k2, it) => reduce(k2, it))          // REDUCE (emit3 = iterator)
  }

  /** Run a MapReduce job with a COMBINER (Dean & Ghemawat, OSDI 2004,
    * §4.3): when reduce is an associative-commutative fold, partial
    * reduction runs map-side BEFORE the shuffle, so the wire carries one
    * record per (task, key) instead of one per emission — the single
    * biggest scale lever for aggregation-shaped jobs. The reference has
    * no combiner (its shuffle is in-memory, `MapReduceFramework.cpp:159-218`);
    * on a distributed engine it's essential. Spark's `reduceGroups`
    * compiles to a partial+final aggregate pair.
    */
  def runCombine[K1, V1, K2, V2](
      input: Dataset[(K1, V1)],
      map: (K1, V1) => IterableOnce[(K2, V2)],
      combine: (V2, V2) => V2)(
      implicit e2: Encoder[(K2, V2)], ek: Encoder[K2]): Dataset[(K2, V2)] = {
    input
      .flatMap { case (k1, v1) => map(k1, v1) }
      .groupByKey(_._1)
      .reduceGroups((a, b) => (a._1, combine(a._2, b._2)))
      .map { case (k, (_, v)) => (k, v) }
  }

  /** Convenience for in-memory inputs, mirroring the reference's
    * `InputVec` + `multiThreadLevel` signature: parallelism is capped at
    * `min(parallelism, input.size)` exactly like `MapReduceFramework.cpp:264`,
    * and empty input short-circuits to an empty result with no job at all
    * (`MapReduceFramework.cpp:256-261`).
    */
  def runLocal[K1, V1, K2, V2, K3, V3](
      spark: SparkSession,
      input: Seq[(K1, V1)],
      map: (K1, V1) => IterableOnce[(K2, V2)],
      reduce: (K2, Iterator[(K2, V2)]) => IterableOnce[(K3, V3)],
      parallelism: Int = 0)(
      implicit e1: Encoder[(K1, V1)], e2: Encoder[(K2, V2)], ek: Encoder[K2],
      e3: Encoder[(K3, V3)]): Seq[(K3, V3)] = {
    if (input.isEmpty) return Seq.empty  // empty-input fast path (cpp:256-261)
    val defaultPar = spark.sparkContext.defaultParallelism
    val slices = math.max(1, math.min(
      if (parallelism > 0) parallelism else defaultPar, input.size))
    val ds = spark.createDataset(input).repartition(slices)
    run(ds, map, reduce).collect().toSeq
  }
}
