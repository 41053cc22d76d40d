package graft

import org.scalatest.funsuite.AnyFunSuite

/** q167 (audio VAD segmentation) against an independent plain-Scala
  * replay: recompute frame energies straight from the closed-form
  * waveform (NO codec, no Spark) and re-derive the voiced runs with a
  * simple linear scan — the query's codec round-trip, window islands, and
  * aggregation must land on exactly the same per-doc summary.
  */
class VadSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def replay(id: Long): (Long, Long, Long, Long, String) = {
    val samples = graft.queries.Multimodal.vadSamples(id)
    val nFrames = samples.length / 80
    val energies = Array.tabulate(nFrames) { f =>
      (f * 80 until (f + 1) * 80).map(i => math.abs(samples(i).toLong)).sum
    }
    val voiced = energies.map(_ >= 4000L)
    // linear scan for maximal voiced runs
    val segs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var f = 0
    while (f < nFrames) {
      if (voiced(f)) {
        val start = f
        while (f < nFrames && voiced(f)) f += 1
        segs += ((start, f - 1))
      } else f += 1
    }
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(segs.map { case (s, e) => s"$s-$e" }.mkString(",").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (nFrames.toLong, segs.map(s => s._2 - s._1 + 1L).sum,
      segs.length.toLong, segs.map(s => s._2 - s._1 + 1L).maxOption.getOrElse(0L), fp)
  }

  test("q167 matches a plain-Scala no-codec replay per doc") {
    val rows = graft.queries.Multimodal.vadSegments
      .fn(spark, TestSpark.Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (nf, vf, ns, longest, fp) = replay(id)
      assert(r.getAs[Long]("n_frames") == nf, s"doc $id n_frames")
      assert(r.getAs[Long]("voiced_frames") == vf, s"doc $id voiced_frames")
      assert(r.getAs[Long]("n_segments") == ns, s"doc $id n_segments")
      assert(r.getAs[Long]("longest_seg") == longest, s"doc $id longest_seg")
      assert(r.getAs[String]("seg_fp") == fp, s"doc $id seg_fp")
    }
  }

  test("the gate plants both voiced and quiet frames (the signal is real)") {
    // Segmentation only means something if docs actually alternate: every
    // doc must contain at least one voiced and one quiet frame.
    val rows = graft.queries.Multimodal.vadSegments
      .fn(spark, TestSpark.Sf0001).collect()
    rows.foreach { r =>
      val nf = r.getAs[Long]("n_frames")
      val vf = r.getAs[Long]("voiced_frames")
      assert(vf > 0 && vf < nf,
        s"doc ${r.getAs[Long]("doc_id")}: $vf of $nf frames voiced — gate degenerate")
      assert(r.getAs[Long]("n_segments") >= 2, "runs should fragment")
    }
  }
}
