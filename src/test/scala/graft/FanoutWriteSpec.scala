package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q273 contract — the fan-out economics the read-back oracle can't see:
  * with the shared prefix persisted and materialized by the first sink,
  * a second consumer's executed plan reads `InMemoryTableScan` — the
  * second artifact never re-scans the parquet source. Plus hygiene: the
  * registered query really does unpersist (no storage-leak residue).
  */
class FanoutWriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q273: second consumer reads the cache, not the source; unpersist is real") {
    val base = Tables.documents(spark, d)
      .select(col("doc_id"), col("n_chars"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      base.count() // materialize (the role of the first sink's write)
      val second = base.where(col("doc_id") % 2 === 0)
      second.collect()
      val plan = second.queryExecution.executedPlan.toString
      // the InMemoryRelation node textually embeds its build plan
      // (including the original FileScan), so the gate is the presence
      // of the cache READ at the top, not the absence of the string
      assert(plan.contains("InMemoryTableScan"),
        s"second consumer re-planned a source scan:\n${plan.take(1200)}")
    } finally {
      base.unpersist()
      ()
    }

    // hygiene: after the registered query runs, no cached relation from
    // it remains pinned
    val before = spark.sparkContext.getPersistentRDDs.keySet
    queries.Sampling.fanoutWrite.fn(spark, d).collect()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"q273 leaked cached RDDs: ${(after -- before)}")
  }
}
