package graft

import org.scalatest.funsuite.AnyFunSuite

/** q103 JPEG lossy-codec tolerance band.
  *
  * A JPEG decode's exact pixels are implementation-defined (the standard
  * bounds IDCT error, it does not fix it), so q103 has no hash oracle —
  * this spec IS its correctness contract beyond the driver's rows-only
  * check. Each clause pins one failure mode a hash would have caught on
  * a lossless codec:
  *   - dims exact            → stride/orientation bugs
  *   - tight error band      → color-space or quality-parameter bugs
  *   - real compression      → "encoder" that passes bytes through
  *   - in-JVM determinism    → stateful codec reuse across partitions
  * The band (MAE ≤ 4, PSNR ≥ 30 dB) is deliberately loose vs the
  * observed JDK values so a conformant decoder swap doesn't flap the
  * suite, while a wrong-colorspace decode (MAE ≈ tens) still fails.
  */
class JpegCodecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // the raw-feature view (mae/psnr/sums): the registered query projects
  // it to oracle-hashable audit booleans, this spec bands the values
  private def run() =
    queries.Multimodal.jpegFeatures(spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getDouble(8), r.getDouble(9)))
      .sortBy(_._1)

  test("q103: one row per document, dims match the closed form exactly") {
    val rows = run()
    val expected = spark.read
      .parquet(s"${TestSpark.Sf0001}/documents.parquet").count()
    assert(rows.length == expected, "total contract: one feature row per doc")
    rows.foreach { case (id, w, h, _, raw, _, _, _, _, _) =>
      val (ew, eh) = queries.Multimodal.jpegDims(id)
      assert(w == ew && h == eh, s"doc $id dims ($w,$h) != closed form ($ew,$eh)")
      assert(raw == 3L * ew * eh, s"doc $id raw_bytes wrong")
    }
  }

  test("q103: decoded pixels stay within the lossy tolerance band") {
    run().foreach { case (id, _, _, _, _, _, _, _, mae, psnr) =>
      assert(mae <= 4.0, s"doc $id MAE $mae exceeds band (codec or colorspace bug)")
      assert(psnr >= 30.0, s"doc $id PSNR $psnr below band")
    }
  }

  test("q103: compression is real and channel sums are near the closed form") {
    run().foreach { case (id, w, h, jpegBytes, raw, sr, sg, sb, _, _) =>
      assert(jpegBytes > 0 && jpegBytes < raw,
        s"doc $id jpeg_bytes=$jpegBytes not compressed below raw=$raw")
      // closed-form channel sums; decoded sums may drift by at most
      // MAE-band × pixels per channel
      var er = 0L; var eg = 0L; var eb = 0L
      var y = 0
      while (y < h.toInt) {
        var x = 0
        while (x < w.toInt) {
          val (r, g, b) = queries.Multimodal.jpegPixel(id, x, y)
          er += r; eg += g; eb += b
          x += 1
        }
        y += 1
      }
      val slack = 4L * w * h
      assert(math.abs(sr - er) <= slack, s"doc $id sum_r off by ${sr - er}")
      assert(math.abs(sg - eg) <= slack, s"doc $id sum_g off by ${sg - eg}")
      assert(math.abs(sb - eb) <= slack, s"doc $id sum_b off by ${sb - eb}")
    }
  }

  test("q103: same-JVM determinism — two runs produce identical features") {
    assert(run().toSeq == run().toSeq,
      "JPEG pipeline is not deterministic within one JVM")
  }

  test("q103: the registered audit projection is all-true and matches the feature view") {
    val rows = SparkEntry.queries("q103_jpeg_decode")(spark, TestSpark.Sf0001).collect()
    assert(rows.length == run().length, "one audit row per feature row")
    rows.foreach { r =>
      (4 to 9).foreach(i => assert(r.getBoolean(i),
        s"doc ${r.getLong(0)} audit column $i is FALSE — codec left the band"))
    }
  }

  /** The MAE/PSNR band is deliberately loose (a conformant decoder swap
    * must not flap the suite) — loose enough to hide a SILENT drift of
    * the JDK's own codec within one JDK version. This pin makes that
    * loud: the md5 of every decode-derived feature row is pinned PER
    * JDK VERSION; on a pinned JDK any pixel change fails, on an
    * unpinned JDK the test cancels with the observed hash to add (the
    * band tests above still guard conformance there).
    */
  test("q103: pinned per-JDK pixel hash — silent codec drift is loud") {
    val pinned = Map(
      "17.0.20" -> "b6e4e5ce138b0c06e0d8be1f3fe1d74a"
    )
    val repr = run().map { case (id, w, h, jb, raw, sr, sg, sb, mae, psnr) =>
      s"$id,$w,$h,$jb,$raw,$sr,$sg,$sb,$mae,$psnr"
    }.mkString("\n")
    val hash = java.security.MessageDigest.getInstance("MD5")
      .digest(repr.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val jdk = sys.props("java.version")
    pinned.get(jdk) match {
      case Some(exp) => assert(hash == exp,
        s"decoded-feature hash drifted on pinned JDK $jdk: observed $hash")
      case None => cancel(s"no pinned hash for JDK $jdk — observed $hash; add it to the pin table")
    }
  }
}
