package graft

import org.scalatest.funsuite.AnyFunSuite

/** q132 RAG-chunking contract: a plain-Scala re-chunking must agree
  * row-for-row (window count, anchored last start, fingerprints), and
  * the structural invariants must hold — full token coverage with no
  * gaps, every chunk full-width when the doc allows it, and multi-chunk
  * docs overlapping by exactly C − S tokens except possibly at the
  * anchored tail.
  */
class RagChunkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001
  private val C = 64; private val S = 48

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q132: chunks match a plain-Scala re-chunking; coverage and overlap hold") {
    val docs = Tables.documents(spark, d)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" ", -1))

    val expected = docs.flatMap { case (id, ws) =>
      val n = ws.length
      val ks = if (n <= C) 0 to 0 else 0 to ((n - C + S - 1) / S)
      ks.map { k =>
        val st = math.min(k * S, math.max(n - C, 0))
        val ln = math.min(C, n)
        (id, k.toLong) -> ((st + 1L, ln.toLong, md5hex(ws.slice(st, st + ln).mkString(" "))))
      }
    }.toMap

    val out = SparkEntry.queries("q132_rag_chunks")(spark, d)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id")) ->
        ((r.getAs[Long]("start_tok"), r.getAs[Long]("n_tok"), r.getAs[String]("fp")))).toMap

    assert(out == expected,
      s"drift on ${out.keySet.filter(k => out(k) != expected.getOrElse(k, null)).take(5)}")

    docs.foreach { case (id, ws) =>
      val chunks = out.collect { case ((`id`, k), (st, ln, _)) => (k, st, ln) }.toSeq.sortBy(_._1)
      val covered = chunks.flatMap { case (_, st, ln) => st until (st + ln) }.toSet
      assert(covered == (1L to ws.length.toLong).toSet, s"doc $id coverage gap")
      chunks.sliding(2).foreach {
        case Seq((_, st1, ln1), (_, st2, _)) =>
          val overlap = st1 + ln1 - st2
          assert(overlap >= C - S, s"doc $id: consecutive chunks overlap only $overlap")
        case _ =>
      }
    }
  }
}
