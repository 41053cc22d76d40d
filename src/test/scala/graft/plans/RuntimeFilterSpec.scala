package graft.plans

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime BLOOM-FILTER join pruning — the 100 TB shuffle-join defense the
  * engine leans on when neither side broadcasts: Spark builds a bloom
  * filter from the selective (filtered) build side at runtime and pushes a
  * `might_contain` predicate into the probe side's scan stage, so most of
  * the big side's rows die before the shuffle instead of after it.
  *
  * The feature only arms above size thresholds (a 10 GB probe side by
  * default — correct at scale, unreachable in a test corpus), so this spec
  * lowers the application-side threshold on an isolated session and then
  * asserts BOTH halves of the contract: the filter is actually in the
  * executed plan, and it changes no rows. This is configuration the
  * production deployment relies on as-is; no query code changes.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private val d = TestSpark.Sf0001

  test("bloom runtime filter lands on the probe side of a selective shuffle join") {
    val s = TestSpark.spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")

    def query(sess: org.apache.spark.sql.SparkSession) =
      Tables.lineitem(sess, d)
        .join(Tables.orders(sess, d).where(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("l_quantity").as("qty"), count(lit(1)).as("n"))

    val q = query(s)
    val rows = q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), s"no bloom filter injected: ${p.take(3000)}")

    // the filter is a pure pruning optimization: bit-identical results
    val baseline = query(TestSpark.spark).collect()
    assert(rows.map(_.toString).sorted.toSeq === baseline.map(_.toString).sorted.toSeq)
  }
}
