package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Partitioning-invariance for the TIE-SENSITIVE operators added in
  * round 10 — the aggregates whose naive forms are nondeterministic
  * under Spark's partial-aggregation merge order (mode without the
  * deterministic flag, max_by on a tying key, row_number over a
  * non-total order, a weighted-median boundary inside a tie group).
  * Each query's registered form claims a canonical answer; this spec
  * executes it under three hostile physical layouts — a single
  * partition (one merge path), 17 hash partitions (many merge paths),
  * and a reversed-sort layout (adversarial intra-partition order) —
  * and demands byte-identical results. The oracle can't see this
  * (Verify runs one layout); partitioning-independence is exactly the
  * property a 1000-executor deployment relies on.
  */
class DeterminismSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  /** Canonical rows of a result, sorted for comparison. */
  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Run the registered query under a hostile physical layout: the
    * split size controls how the SCAN partitions (which rows share a
    * map-side partial), the shuffle width controls how many merge
    * streams the final aggregate combines — together they vary every
    * merge path the operator has.
    */
  private def runUnder(name: String, shuffleParts: Int, maxPartBytes: String): Seq[String] = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", shuffleParts.toString)
    s.conf.set("spark.sql.files.maxPartitionBytes", maxPartBytes)
    s.conf.set("spark.sql.files.openCostInBytes", "0")
    canon(SparkEntry.queries(name)(s, d))
  }

  private def underLayouts(name: String): Seq[Seq[String]] = Seq(
    runUnder(name, 1, "1g"),     // one split, one merge stream
    runUnder(name, 17, "64k"),   // many tiny splits, many merge streams
    canon(SparkEntry.queries(name)(spark, d)) // default layout
  )

  for (q <- Seq("q217_mode", "q222_argmax", "q229_consistent_sample",
      "q230_weighted_median", "q236_intersect_all")) {
    test(s"$q: identical result under 1, 17, and planner-chosen partitions") {
      val rs = underLayouts(q)
      assert(rs(0) == rs(1) && rs(1) == rs(2),
        s"$q result depends on physical layout")
    }
  }

  test("q217: mode ties really exist in the fixture (the flag is load-bearing)") {
    // at least one group must have >1 value sharing the max count —
    // otherwise the determinism claim is vacuous
    import org.apache.spark.sql.functions._
    val c = Tables.lineitem(spark, d)
      .groupBy("l_returnflag", "l_quantity").count()
    val ties = c.groupBy("l_returnflag")
      .agg(max(col("count")).as("mx"), count(lit(1)).as("nv"))
      .join(c, "l_returnflag")
      .where(col("count") === col("mx"))
      .groupBy("l_returnflag").count()
      .where(col("count") > 1)
    assert(ties.count() > 0, "no mode ties at sf0.001 — fixture drift, pick a coarser value")
  }
}
