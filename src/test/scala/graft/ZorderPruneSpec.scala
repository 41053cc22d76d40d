package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

/** q169 contract — the z-order layout must actually BUY file skipping at
  * read time, not just compute envelopes (q91):
  *   (a) economics: the 2-dim range predicate reads a STRICT subset of
  *       the files written (the whole point of ZORDER);
  *   (b) correctness independence: the pruned scan equals a full filter
  *       over the source table row-for-row (the stats sidecar can only
  *       skip non-matching files, never change the answer);
  *   (c) the counterfactual: lexicographically sorted by (user_id, vbin),
  *       the SECOND dimension's predicate prunes nothing by itself — the
  *       same sidecar+prune path over a lexicographic layout reads at
  *       least as many files as the z-ordered one.
  */
class ZorderPruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private lazy val (allZ, selZ, scanZ) = sources.Sources.zorderPruned(spark, d)

  test("q169: files-read is a strict subset of files-written") {
    assert(selZ.toSet.subsetOf(allZ.toSet))
    assert(selZ.nonEmpty, "predicate rectangle matched no file — fixture drift")
    assert(selZ.size < allZ.size,
      s"no skipping: read ${selZ.size} of ${allZ.size} files")
  }

  test("q169: pruned scan equals the unpruned filter row-for-row") {
    val expected = Tables.events(spark, d)
      .select(col("event_id"), col("user_id"),
        org.apache.spark.sql.functions.floor(col("value")).cast("long").as("vbin"),
        col("value"))
      .where(col("user_id").between(sources.Sources.ZPredU._1, sources.Sources.ZPredU._2)
        && col("vbin").between(sources.Sources.ZPredV._1, sources.Sources.ZPredV._2))
    assert(scanZ.count() === expected.count())
    assert(scanZ.exceptAll(expected).isEmpty && expected.exceptAll(scanZ).isEmpty)
  }

  /** A predicate on the SECOND dimension only — where lexicographic
    * clustering is useless (every file spans ~the full vbin range) and
    * z-ordering keeps both dimensions bounded per file.
    */
  private def vbinOnlyFraction(files: Seq[String]): Double = {
    import org.apache.spark.sql.functions.{input_file_name, max, min}
    val envs = spark.read.parquet(files: _*)
      .groupBy(input_file_name().as("p"))
      .agg(min("vbin").as("mn"), max("vbin").as("mx"))
      .collect()
    envs.count(r => !(r.getAs[Long]("mx") < sources.Sources.ZPredV._1
      || r.getAs[Long]("mn") > sources.Sources.ZPredV._2)).toDouble / envs.length
  }

  test("q183: bloom sidecar prunes the point lookup where envelopes cannot") {
    val (all, envSel, bloomSel, scan) = sources.Sources.bloomPointLookup(spark, d)
    // the envelope prune is structurally blind to an event_id point
    // lookup on this layout — it keeps every file
    assert(envSel.size === all.size, "fixture drift: envelopes pruned an event_id lookup")
    // the bloom prune must do strictly better than the envelope prune
    assert(bloomSel.toSet.subsetOf(all.toSet))
    assert(bloomSel.nonEmpty, "blooms dropped the needle files — false negative")
    assert(bloomSel.size < envSel.size,
      s"bloom bought nothing: ${bloomSel.size} of ${envSel.size} files")
    // correctness is residual-filter exact regardless of pruning
    val expected = Tables.events(spark, d)
      .select(col("event_id"), col("user_id"),
        org.apache.spark.sql.functions.floor(col("value")).cast("long").as("vbin"),
        col("value"))
      .where(col("event_id").isin(sources.Sources.BloomNeedles: _*))
    assert(scan.count() === expected.count())
    assert(scan.exceptAll(expected).isEmpty && expected.exceptAll(scan).isEmpty)
  }

  test("q169: the second dimension prunes under z-order, not under lexicographic") {
    val (allLex, _, _) = sources.Sources.zorderPruned(spark, d,
      tag = "zorder_store_lex",
      clusterBy = _.repartitionByRange(sources.Sources.ZPruneFiles,
        col("user_id"), col("vbin")).sortWithinPartitions("user_id", "vbin"))
    assert(allLex.size > 1, "lexicographic store produced one file — no contest")
    val zFrac = vbinOnlyFraction(allZ)
    val lexFrac = vbinOnlyFraction(allLex)
    assert(zFrac < lexFrac,
      s"vbin-only predicate: z-order reads $zFrac of files, lexicographic $lexFrac — " +
        "the layout bought nothing on the second dimension")
  }
}
