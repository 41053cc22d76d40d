package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sixth batch of dedicated invariant specs for generic-gates-only
  * queries: combiner ≡ plain reduce, ORC round-trip totality on real
  * ORC files, frame-sample stride/byte accounting, PNG decode
  * determinism + closed-form dims, stratified-sample rank completeness
  * with a binding cap, positional-index replay, binary-file ingest ≡
  * in-flight pipeline, temperature-mix quota law with real
  * downweighting, and the LSH near-dup radius-1 / single-mask claims.
  */
class GenericCoverage6Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, d)

  test("q59: the map-side combiner changes no row of the plain whole-group reduce") {
    val combined = run("q59_mr_wordcount_combine").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted
    val plain = run("q20_mr_wordcount").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted
    assert(combined.nonEmpty && combined.sameElements(plain),
      "combiner result diverged from the whole-group reduce")
  }

  test("q65: the round trip equals the parquet source and really wrote ORC files") {
    val back = run("q65_orc_roundtrip").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getString(4)))
      .sortBy(_._1)
    val src = Tables.documents(spark, d)
      .select("doc_id", "lang", "source", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getString(4)))
      .sortBy(_._1)
    assert(back.sameElements(src), "ORC round trip lost or changed a row")
    val dir = new java.io.File(graft.sources.Sources.scratchLeaf(d, "roundtrip_orc"))
    assert(dir.isDirectory && dir.listFiles().exists(_.getName.endsWith(".orc")),
      "no .orc files on disk — the round trip did not exercise the ORC writer")
  }

  test("q75: frames stride by 4, stay 16-byte sized, and their sums re-add the payload bytes") {
    val rows = run("q75_frame_sample").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byDoc = rows.groupBy(_._1)
    val texts = Tables.documents(spark, d).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8")).toMap
    byDoc.foreach { case (id, fs) =>
      val idx = fs.map(_._2).sorted
      assert(idx.head == 0 && idx.sliding(2).forall {
        case Array(a, b) => b - a == 4; case _ => true
      }, s"doc $id frame indices not a stride-4 ramp: ${idx.toSeq}")
      fs.foreach { case (_, fi, nb, fsum) =>
        assert(nb >= 1 && nb <= 16, s"doc $id frame $fi has $nb bytes")
        val bytes = texts(id)
        val start = fi.toInt * 16
        val expected = bytes.slice(start, math.min(start + 16, bytes.length))
          .map(b => (b & 0xff).toLong).sum
        assert(fsum == expected, s"doc $id frame $fi sum $fsum != recomputed $expected")
      }
    }
    assert(byDoc.nonEmpty && byDoc.values.exists(_.length > 1),
      "no document produced multiple sampled frames")
  }

  test("q77: dims follow the closed form, channel sums are bounded, two runs identical") {
    val a = run("q77_png_decode").collect().map(_.toString).sorted.toSeq
    val b = run("q77_png_decode").collect().map(_.toString).sorted.toSeq
    assert(a == b, "PNG pipeline not deterministic in one JVM")
    run("q77_png_decode").collect().foreach { r =>
      val (id, w, h) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(w == 16 + (id % 3) * 8 && h == 8 + (id % 2) * 8, s"doc $id dims off")
      Seq(3, 4, 5).foreach(i =>
        assert(r.getLong(i) >= 0 && r.getLong(i) <= 255L * w * h, s"doc $id channel sum out of range"))
      assert(r.getString(6).length == 32, "px_fp is not a 32-hex md5")
    }
  }

  test("q80: per-language ranks are the complete 1..min(50, n) ramp and the cap binds somewhere") {
    val rows = run("q80_stratified_sample").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val langN = Tables.documents(spark, d).groupBy("lang").count()
      .collect().map(r => Option(r.getString(0)).getOrElse("NULL") -> r.getLong(1)).toMap
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val want = math.min(50L, langN(Option(lang).getOrElse("NULL")))
      assert(rs.map(_._3).sorted.toSeq == (1L to want),
        s"$lang ranks are not the complete 1..$want ramp")
    }
    assert(rows.map(_._1).distinct.length == rows.length, "a doc sampled twice")
    assert(langN.values.exists(_ > 50), "no language exceeds the cap — subsampling untested")
  }

  test("q84: postings are ascending 1-based token positions that replay from the text") {
    val rows = run("q84_positional_index").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, pos, tf) =>
      val ps = pos.split(",").map(_.toLong)
      assert(ps.length == tf.toInt, "tf != posting length")
      assert(ps.sliding(2).forall { case Array(a, b) => a < b; case _ => true },
        "positions not strictly ascending")
    }
    // replay one nontrivial document's postings in plain Scala
    val (docId, text) = Tables.documents(spark, d).select("doc_id", "text")
      .where(length(col("text")) > 50).head() match {
      case r => (r.getLong(0), r.getString(1))
    }
    val expected = text.split(" ").zipWithIndex
      .filter(_._1.nonEmpty)
      .groupBy(_._1)
      .map { case (w, hits) => w -> hits.map(_._2 + 1).mkString(",") }
    val got = rows.filter(_._2 == docId).map(r => r._1 -> r._3).toMap
    assert(got == expected, s"doc $docId postings diverge from a plain-Scala replay")
  }

  test("q87: the file round trip is byte-identical to the in-flight PNG pipeline") {
    val files = run("q87_binary_files").collect().map(_.toString).sorted.toSeq
    val inflight = run("q77_png_decode").collect().map(_.toString).sorted.toSeq
    assert(files == inflight, "binaryFile ingest changed a decoded feature")
  }

  test("q94: quotas are floor(sqrt(n))*3, counts saturate at min(quota, n), big langs downweighted") {
    val rows = run("q94_temperature_mix").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byLang = rows.groupBy(_._2)
    byLang.foreach { case (lang, rs) =>
      val (nL, quota) = (rs.head._3, rs.head._4)
      assert(quota == math.floor(math.sqrt(nL.toDouble)).toLong * 3, s"$lang quota law broken")
      assert(rs.length == math.min(quota, nL), s"$lang sampled ${rs.length} != min(quota, n)")
      assert(rs.forall(_._5 <= quota))
    }
    assert(byLang.exists { case (_, rs) => rs.head._4 < rs.head._3 },
      "no language is actually subsampled — the temperature is dead here")
    // sqrt mixing must LOWER the biggest language's share vs the corpus
    val corpus = byLang.map { case (l, rs) => l -> rs.head._3 }
    val big = corpus.maxBy(_._2)._1
    val corpusShare = corpus(big).toDouble / corpus.values.sum
    val sampleShare = byLang(big).length.toDouble / rows.length
    assert(sampleShare < corpusShare,
      f"biggest language share rose: corpus $corpusShare%.3f -> sample $sampleShare%.3f")
  }

  test("q96: pairs are unique (single-mask claim), bucket-Hamming <= 1, and a flip probe fired") {
    val pairs = run("q96_embed_lsh_neardup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.nonEmpty)
    val keys = pairs.map(p => (p._1, p._2))
    assert(keys.length == keys.distinct.length,
      "duplicate pair — the Hamming<=1 single-mask argument failed")
    val buckets = queries.Similarity.vectors(spark, d)
      .withColumn("bucket", queries.Similarity.bucketCol(10))
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val hams = pairs.map { case (a, b, _) =>
      java.lang.Integer.bitCount(buckets(a) ^ buckets(b))
    }
    assert(hams.forall(_ <= 1), "a pair's buckets differ in more than one bit")
    assert(hams.contains(1),
      "every pair is same-bucket — the radius-1 flip probes are dead here")
    assert(pairs.forall(_._3 >= queries.Similarity.NearDupThreshold))
  }
}
