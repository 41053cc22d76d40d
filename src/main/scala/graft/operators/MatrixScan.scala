package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DISTRIBUTED LINEAR-RECURRENCE SCAN over the matrix monoid — the
  * order-sensitive generalization of [[PrefixScan]] (q153 scans scalar
  * addition; this scans an arbitrary LINEAR recurrence, which scalar
  * prefix sums cannot express because each row's state depends on the
  * previous row's state, not just a running total).
  *
  * Any k-th-order linear recurrence s_t = f(s_{t-1}, …, s_{t-k}, x_t)
  * is one matrix-vector step s̃_t = T(x_t) · s̃_{t-1} in homogeneous
  * coordinates, and matrix multiplication is ASSOCIATIVE — so the
  * classic two-phase distributed scan applies (Blelloch '90; the same
  * shape as q153): (1) range-repartition by (series, position) so each
  * partition holds a contiguous slice in order; (2) one light job
  * reduces each partition to its PRODUCT of transition matrices —
  * O(partitions × series) driver state, never O(rows); (3) the driver
  * exclusive-scans those products per series, broadcasts each
  * partition's entry state, and a second pass steps through rows
  * locally. A `sum() OVER (ORDER BY …)` window can't do this (no
  * window function composes state), and the naive alternative — a
  * single task per series — is the q98-class sequential bottleneck
  * this operator exists to kill: a billion-row series scans in
  * O(rows/partitions) wall-clock with two passes.
  *
  * The registered instance (q255) is the integer case, chosen so the
  * answer is EXACT in both engines (no cross-engine float-association
  * drift, unlike a smoothing recurrence): the per-day ORDER-SENSITIVE
  * SERIES FINGERPRINT h_t = (a1·h_{t-1} + a2·h_{t-2} + x_t) mod p over
  * each event_type's daily cent totals — the cross-row chain checksum
  * (q32 fingerprints bytes WITHIN a document; this chains state ACROSS
  * rows), the audit primitive that detects any reorder, insertion,
  * drop, or edit anywhere in a series prefix. Same machinery serves
  * PRNG fast-forward (LCG jump-ahead), Fibonacci-lagged hashes, and —
  * with real-valued matrices — Holt/EWMA smoothing (q176/q180's family
  * done scalably). Oracle: a DuckDB recursive CTE stepping the same
  * recurrence one day per iteration per series (q95's parallel-shard
  * discipline); integer mod arithmetic makes the match bit-exact.
  *
  * Reference parity note: the reference's reduce phase
  * (MapReduceFramework.cpp:223-239) hands each key's rows to a
  * sequential whole-group UDF — this operator is the scalable
  * re-expression of exactly that shape for linear state.
  */
object MatrixScan {

  /** Modulus (2^31 − 1, prime) and recurrence coefficients: every
    * intermediate product stays under 2^63 (a·h ≤ (p−1)² ≈ 4.6e18), so
    * plain BIGINT arithmetic is exact in Spark, Scala, and DuckDB.
    */
  private[graft] val P = 2147483647L
  private[graft] val A1 = 1103515245L
  private[graft] val A2 = 12345L
  private[graft] val ScanParts = 8

  /** Bounds pinned cached runs at one across bench reps / spec calls. */
  private val scanPin = new CachePin

  /** 3×3 identity (row-major). */
  private[graft] val ID: Array[Long] = Array(1L, 0L, 0L, 0L, 1L, 0L, 0L, 0L, 1L)

  /** Homogeneous transition for one observation x:
    * (h, hp, 1) → (a1·h + a2·hp + x, h, 1), all mod p.
    */
  private[graft] def tMat(x: Long): Array[Long] =
    Array(A1, A2, x % P, 1L, 0L, 0L, 0L, 0L, 1L)

  /** (a · b) mod p, row-major 3×3. Per-term mod keeps the accumulator
    * under 2^63: acc + (p−1)² < 2^63.
    */
  private[graft] def mulMod(a: Array[Long], b: Array[Long]): Array[Long] = {
    val r = new Array[Long](9)
    var i = 0
    while (i < 3) {
      var j = 0
      while (j < 3) {
        var acc = 0L
        var k = 0
        while (k < 3) {
          acc = (acc + a(i * 3 + k) * b(k * 3 + j)) % P
          k += 1
        }
        r(i * 3 + j) = acc
        j += 1
      }
      i += 1
    }
    r
  }

  /** The two-phase scan at an explicit partition count (the spec runs
    * parts = 1 as the sequential control and asserts exact equality).
    */
  private[graft] def fingerprintScan(s: SparkSession, d: String, parts: Int)
      : DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("centsum"))
      .select(col("event_type"), col("day"),
        pmod(col("centsum"), lit(P)).as("x"))
    val sorted = daily
      .repartitionByRange(parts, col("event_type"), col("day"))
      .sortWithinPartitions("event_type", "day")
      .as[(String, java.sql.Timestamp, Long)]
    val rdd = sorted.rdd
    // two jobs read this RDD (partition products, then the rescan);
    // caching prevents recomputing the shuffle. The lazily-returned
    // DataFrame means this function can't unpersist after use, so the
    // pin bounds pinned storage at ONE run across repeated calls
    // (bench reps, MatrixScanSpec's five collectScan invocations).
    scanPin.pin(rdd)
    // pass 1: per (partition, series) product of transitions — newest
    // row's matrix on the LEFT (s_n = T_n · … · T_1 · s_0)
    val partMats = rdd.mapPartitionsWithIndex { (i, it) =>
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Array[Long]]
      it.foreach { case (k, _, x) =>
        m.update(k, mulMod(tMat(x), m.getOrElse(k, ID)))
      }
      m.iterator.map { case (k, mat) => (i, k, mat) }
    }.collect()
    // driver: exclusive prefix products per series across partitions in
    // index order — O(partitions × series) state, the q153 contract
    val init = scala.collection.mutable.Map.empty[(Int, String), (Long, Long)]
    partMats.groupBy(_._2).foreach { case (k, arr) =>
      var acc = ID
      arr.sortBy(_._1).foreach { case (i, _, mat) =>
        // entry state before partition i: acc · (0, 0, 1)^T = acc's
        // third column = (h, hp)
        init.update((i, k), (acc(2), acc(5)))
        acc = mulMod(mat, acc)
      }
    }
    val bc = s.sparkContext.broadcast(init.toMap)
    // pass 2: local stepping from the broadcast entry state — one
    // mat-vec per row, no further shuffle
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var curKey: String = null
      var h = 0L
      var hp = 0L
      it.map { case (k, day, x) =>
        if (k != curKey) {
          curKey = k
          val (h0, hp0) = bc.value.getOrElse((i, k), (0L, 0L))
          h = h0
          hp = hp0
        }
        val nh = (A1 * h + A2 * hp + x) % P
        hp = h
        h = nh
        (k, day, x, h)
      }
    }
    s.createDataset(out).toDF("event_type", "day", "x", "fingerprint")
  }

  val recurrenceScan = Q(
    "q255_recurrence_scan",
    (s, d) => fingerprintScan(s, d, ScanParts),
    Some(s"""WITH RECURSIVE daily AS (
               SELECT event_type, date_trunc('day', ts) AS day,
                      ((CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                        % $P) + $P) % $P AS x
               FROM events GROUP BY 1, 2),
             d AS (SELECT event_type, day, x,
                          row_number() OVER (PARTITION BY event_type
                                             ORDER BY day) AS rn
                   FROM daily),
             rec AS (
               SELECT event_type, rn, day, x,
                      x % $P AS h, CAST(0 AS BIGINT) AS hp
               FROM d WHERE rn = 1
               UNION ALL
               SELECT d.event_type, d.rn, d.day, d.x,
                      ($A1 * rec.h + $A2 * rec.hp + d.x) % $P,
                      rec.h
               FROM rec JOIN d ON d.event_type = rec.event_type
                              AND d.rn = rec.rn + 1)
             SELECT event_type, day, x, h AS fingerprint FROM rec""")
  )

  val all: Seq[Q] = Seq(recurrenceScan)
}
