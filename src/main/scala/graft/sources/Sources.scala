package graft.sources

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File-format connectors beyond parquet (SURVEY.md §2c): CSV and JSON
  * read/write, demonstrated as lossless round-trips of the `documents`
  * table verified against the parquet original by the DuckDB oracle.
  *
  * Scale note: both writers partition by Spark's task parallelism (one
  * file per partition — no driver funnel); both readers take an explicit
  * schema, so no inference pass over the data at 100 TB.
  */
object Sources {

  private def roundTrip(s: SparkSession, d: String, format: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "lang", "source", "n_chars", "text")
    // absolute, cwd-independent scratch path (the driver may launch the
    // JVM from anywhere; tmpdir is writable on any host)
    val out = sys.props("java.io.tmpdir").stripSuffix("/") +
      s"/graft_roundtrip_$format/" + java.lang.Integer.toHexString(d.hashCode)
    val w = docs.write.mode(SaveMode.Overwrite)
    val r = s.read.schema(docs.schema)
    format match {
      case "csv" =>
        // header for self-description; quote-all so free text survives
        w.option("header", "true").option("quoteAll", "true").csv(out)
        r.option("header", "true").csv(out)
      case "json" =>
        w.json(out)
        r.json(out)
    }
  }

  /** q44 — CSV write + read round-trip equals the parquet source. */
  val csvRoundTrip = Q(
    "q44_csv_roundtrip",
    (s, d) => roundTrip(s, d, "csv"),
    Some("SELECT doc_id, lang, source, n_chars, text FROM documents")
  )

  /** q45 — JSON (lines) write + read round-trip equals the parquet source. */
  val jsonRoundTrip = Q(
    "q45_json_roundtrip",
    (s, d) => roundTrip(s, d, "json"),
    Some("SELECT doc_id, lang, source, n_chars, text FROM documents")
  )

  val all: Seq[Q] = Seq(csvRoundTrip, jsonRoundTrip)
}
