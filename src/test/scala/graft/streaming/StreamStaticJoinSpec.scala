package graft.streaming

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** q138 cross-path contract: the stream-static enrichment must produce
  * exactly the rows of the BATCH join over the same data — here checked
  * against q128 (the salted batch join of the identical dim), so three
  * independent executions of one join semantics (streaming unsalted,
  * batch salted, DuckDB oracle) all agree.
  */
class StreamStaticJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q138: streaming enrichment ≡ batch salted join, row for row") {
    def rows(q: String): Set[(Long, String, Long)] =
      SparkEntry.queries(q)(spark, d).collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
          r.getAs[Long]("type_count"))).toSet

    val streamed = rows("q138_stream_static_join")
    val batch = rows("q128_salted_join")
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"paths disagree: only-stream=${(streamed -- batch).take(3)} " +
        s"only-batch=${(batch -- streamed).take(3)}")
  }
}
