package graft.operators

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.rdd.RDD

/** At-most-one pinned RDD per scan family.
  *
  * The two-phase scans (q255's [[MatrixScan.fingerprintScan]], q269/
  * q271's `Profiling.cumScan2`) must cache their shuffled run because
  * TWO jobs read it (the partition-summary pass, then the rescan) and
  * the rescan is lazily materialized by the caller — so the function
  * itself cannot unpersist before returning. Left unconditional, every
  * bench rep and every spec invocation pins another copy for the
  * session lifetime (the ADVICE-flagged leak). A `CachePin` bounds
  * that: caching a NEW scan RDD unpersists the previously pinned one,
  * so steady-state storage is exactly one daily-rollup-sized run per
  * scan family, regardless of how many times the query re-runs.
  * Unpersisting a run whose caller never materialized it merely costs
  * a recompute if it ever is — correctness is unaffected.
  */
private[graft] final class CachePin {
  private val ref = new AtomicReference[RDD[_]]()

  /** Cache `rdd` and release the previously pinned run (if any). */
  def pin(rdd: RDD[_]): Unit = {
    rdd.cache()
    val prev = ref.getAndSet(rdd)
    if (prev != null && (prev ne rdd)) prev.unpersist(blocking = false)
  }
}
