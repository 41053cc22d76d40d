package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver (BENCH_r{N}.json).
  *
  * Each query is fully materialized through a `noop`-format write — unlike
  * `count()`, which lets Catalyst prune the projection and under-measures
  * scan-heavy queries. Per-query time is the MEDIAN of
  * SPARK_GRAFT_BENCH_REPS (default 3) full passes over the suite —
  * driver-side contention on this box shows ±50% single-run variance
  * (BASELINE.md), and a median over interleaved passes is robust to a
  * one-off stall landing on one query. Passes are interleaved (pass 1 runs
  * every query, then pass 2, ...) rather than back-to-back per query, so
  * repeated runs don't ride one query's hot file/page cache. Queries run
  * in name order after an untimed warmup so JVM/codegen startup doesn't
  * land on an arbitrary first query.
  *
  * Iteration helpers: SPARK_GRAFT_BENCH_ONLY=q23_...,q24_... restricts the
  * suite; SPARK_GRAFT_BENCH_REPS=1 gives the old single-pass behavior.
  */
object Bench {
  def main(args: Array[String]): Unit = ErrorContract.guard {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").map(_.trim).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()

    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // a typo'd SPARK_GRAFT_BENCH_ONLY must fail loudly, not print a
    // plausible-looking zero-total benchmark
    require(names.nonEmpty,
      s"no queries selected (SPARK_GRAFT_BENCH_ONLY=${only.map(_.mkString(","))})")
    // untimed warmup: JVM + codegen + parquet footer caches
    try materialize(names.head) catch { case _: Throwable => () }

    val samples = Array.fill(reps) {
      names.map { name =>
        val t0 = System.nanoTime()
        try materialize(name)
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
        (System.nanoTime() - t0) / 1e9
      }
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val results = names.zipWithIndex.map { case (name, i) =>
      name -> median(samples.toSeq.map(_(i)))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
