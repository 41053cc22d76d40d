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

  /** Scratch root for write-then-read round-trips. On a real cluster every
    * executor must read back what every other executor wrote, so a SHARED
    * filesystem (HDFS/S3 URI or shared mount) via SPARK_GRAFT_SCRATCH takes
    * precedence; the local tmpdir fallback is only correct in local[*].
    * The leaf directory is unique per JVM (pid + UUID) so two concurrent
    * runs on the same sf dir can never race each other's
    * SaveMode.Overwrite, and a shutdown hook removes local scratch.
    */
  private lazy val jvmScratch: String = {
    val root = sys.env.getOrElse("SPARK_GRAFT_SCRATCH", sys.props("java.io.tmpdir"))
      .stripSuffix("/")
    val path = root +
      s"/graft_scratch_${ProcessHandle.current().pid()}_" +
      java.util.UUID.randomUUID().toString.take(8)
    if (!path.contains("://")) { // remote URIs: cluster retention policy
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(new java.io.File(path))
      }
    }
    path
  }

  /** Key the leaf by the sf dir too: the returned read is LAZY, so two
    * scale factors round-tripped in one JVM must not share an output path
    * (the second write would silently replace what the first one reads).
    */
  private def leaf(d: String, name: String): String =
    s"$jvmScratch/${name}_" + java.lang.Integer.toHexString(d.hashCode)

  /** Scratch path for other write-then-read operators (e.g. the q76
    * materialized ANN inverted file) — same shared-FS/keying/cleanup
    * contract as the round-trip queries above.
    */
  def scratchLeaf(d: String, name: String): String = leaf(d, name)

  private def roundTrip(s: SparkSession, d: String, format: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "lang", "source", "n_chars", "text")
    val out = leaf(d, s"roundtrip_$format")
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
      case "orc" =>
        // columnar like parquet: schema-carrying, so the explicit read
        // schema is a cross-check rather than a requirement
        w.orc(out)
        r.orc(out)
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

  /** q65 — ORC write + read round-trip equals the parquet source. */
  val orcRoundTrip = Q(
    "q65_orc_roundtrip",
    (s, d) => roundTrip(s, d, "orc"),
    Some("SELECT doc_id, lang, source, n_chars, text FROM documents")
  )

  /** q67 — Hive-style PARTITIONED write + partition-PRUNED read: the
    * documents table written `partitionBy("lang")`, read back with a
    * lang predicate. At 100 TB partition layout is the first line of
    * defense — the pruned read must touch only the matching directory
    * (PlanSpec asserts the predicate lands in PartitionFilters, not as a
    * post-scan filter).
    */
  val partitionPruned = Q(
    "q67_partition_pruned",
    (s, d) => {
      val out = leaf(d, "partitioned_docs")
      Tables.documents(s, d)
        .select("doc_id", "lang", "source", "n_chars", "text")
        .write.mode(SaveMode.Overwrite).partitionBy("lang").parquet(out)
      s.read.parquet(out)
        .where(col("lang") === "en")
        .select("doc_id", "lang", "source", "n_chars", "text")
    },
    Some("SELECT doc_id, lang, source, n_chars, text FROM documents WHERE lang = 'en'")
  )

  val all: Seq[Q] = Seq(csvRoundTrip, jsonRoundTrip, orcRoundTrip, partitionPruned)
}
