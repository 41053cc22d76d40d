package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q162 quarantine contract: detection is by PARSE OUTCOME, and it must
  * catch exactly the corrupted rows — no clean row quarantined, no
  * corrupt row passed — with mass conservation across the route split.
  * Verified against a row-level replay of the staging predicate (the
  * aggregate oracle can't see row routing; this spec can).
  */
class QuarantineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q162 routes exactly the corrupt rows and conserves mass") {
    val evs = Tables.events(spark, d)
      .select(col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("k")))

    val expected = evs.toSeq
      .map { case (id, tpe, k) =>
        (if (id % 13 == 0) "quarantine" else "ok", tpe, k)
      }
      .groupBy(t => (t._1, t._2))
      .map { case ((kind, tpe), rows) =>
        (kind, tpe) -> ((rows.length.toLong,
          if (kind == "ok") rows.map(_._3).sum else -1L))
      }

    val got = SparkEntry.queries("q162_quarantine")(spark, d).collect()
      .map(r => (r.getAs[String]("kind"), r.getAs[String]("event_type")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("sum_k"))))
      .toMap

    assert(got == expected.toMap)
    val quarantined = got.collect { case ((k, _), (n, _)) if k == "quarantine" => n }.sum
    val passed = got.collect { case ((k, _), (n, _)) if k == "ok" => n }.sum
    assert(quarantined > 0, "fixture corrupts nothing — vacuous test")
    assert(quarantined + passed == evs.length.toLong, "route split loses rows")
  }

  /** The q171 CSV twin: same routing contract at file-ingest level, plus
    * the DLQ property the aggregate can't see — every quarantined row
    * carries its VERBATIM input line (replayable), and parse-outcome
    * routing matches the dirt predicate row-for-row.
    */
  test("q171 CSV: parse-outcome routing matches the dirt predicate; DLQ is verbatim") {
    SparkEntry.queries("q171_csv_quarantine")(spark, d).collect() // commit the stage
    val stage = sources.Sources.scratchLeaf(d, "csv_quarantine_stage")
    val rows = spark.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "event_id BIGINT, event_type STRING, k BIGINT, _corrupt_record STRING"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(stage)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("event_id")
      val corrupt = r.getAs[String]("_corrupt_record")
      if (id % 13 == 0) {
        assert(corrupt != null, s"poisoned row $id passed the parser")
        assert(corrupt.startsWith(s"$id,") && corrupt.endsWith("x"),
          s"DLQ payload for $id is not the verbatim line: $corrupt")
        assert(r.isNullAt(r.fieldIndex("k")), s"poisoned k parsed for $id")
      } else {
        assert(corrupt == null, s"clean row $id was quarantined")
        assert(!r.isNullAt(r.fieldIndex("k")), s"clean k dropped for $id")
      }
    }
  }
}
