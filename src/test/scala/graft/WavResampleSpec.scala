package graft

import org.scalatest.funsuite.AnyFunSuite

/** q145 resample contract: the codec chain (encode 8 kHz → decode →
  * decimate → re-encode 4 kHz → decode) must agree EXACTLY with a direct
  * plain-Scala decimation of the closed-form waveform — the two encode/
  * decode trips must be transparent; and every output is exactly half its
  * q108 input length (even-length inputs by construction, no tail drop).
  */
class WavResampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q145 equals direct decimation of the closed-form waveform") {
    val out = SparkEntry.queries("q145_wav_resample")(spark, d).collect().map { r =>
      r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_samples"), r.getAs[Long]("sum_s"), r.getAs[String]("sample_fp")))
    }.toMap

    val in = SparkEntry.queries("q108_wav_audio")(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_samples")).toMap
    assert(out.keySet == in.keySet)

    val md = java.security.MessageDigest.getInstance("MD5")
    out.foreach { case (id, (n, sum, fp)) =>
      assert(n * 2 == in(id), s"doc $id: not exactly half the input length")
      val src = graft.queries.Multimodal.wavSamples(id)
      val half = Array.tabulate(src.length / 2) { i =>
        ((src(2 * i) + src(2 * i + 1) + 2000) / 2 - 1000).toShort
      }
      assert(sum == half.map(_.toLong).sum, s"doc $id: sum drifted")
      md.reset()
      val efp = md.digest(half.mkString(",").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(fp == efp, s"doc $id: codec chain not transparent")
    }
  }
}
