package graft.operators

import graft.{SparkEntry, Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** q127 padding-waste differential contract: recompute the histogram
  * from raw text with plain Scala (independent token count, bucket
  * arithmetic, waste division) and require exact agreement; pin the
  * conservation identity (Σ real_tokens = corpus token count,
  * Σ n_docs = corpus size) and the bucket floor (empty docs occupy one
  * 64-token alignment unit, never a zero bucket).
  */
class PaddingWasteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q127: histogram matches a plain-Scala recomputation and conserves mass") {
    val lens = Tables.documents(spark, d)
      .select("text").collect()
      .map(_.getAs[String]("text").split(" ", -1).count(_.nonEmpty).toLong)

    val expected = lens.groupBy(n => math.max(64L, (n + 63L) / 64L * 64L))
      .map { case (bucket, ns) =>
        val real = ns.sum; val padded = bucket * ns.length
        bucket -> ((ns.length.toLong, real, padded,
          (padded - real).toDouble / padded))
      }

    val out = SparkEntry.queries("q127_padding_waste")(spark, d)
      .collect()
      .map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("real_tokens"),
          r.getAs[Long]("padded_tokens"), r.getAs[Double]("waste")))).toMap

    assert(out == expected, s"drift: ${out.keySet ++ expected.keySet}")
    assert(out.values.map(_._1).sum == lens.length.toLong)
    assert(out.values.map(_._2).sum == lens.sum)
    assert(out.keys.forall(b => b >= 64 && b % 64 == 0))
  }
}
