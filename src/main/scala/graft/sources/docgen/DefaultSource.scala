package graft.sources.docgen

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A full DataSourceV2 BATCH source — the one rung of Spark's extension
  * ladder the engine had not yet exercised (custom Expression: q20 etc.;
  * optimizer Rule: q60; custom LogicalPlan + Strategy + SparkPlan: q147;
  * custom SOURCE with its own pushdown: here).
  *
  * `graft.sources.docgen` synthesizes a deterministic document-metadata
  * table in closed form (every column a pure integer function of `id`, so
  * the whole table is re-expressible as a DuckDB `range()` scan — the
  * oracle needs no files). What makes it a SOURCE rather than a
  * `spark.range` wrapper is the connector surface it implements, the same
  * one every external system connector (JDBC, Kafka, Iceberg, a feature
  * store) hangs off:
  *
  *   - [[TableProvider]] / [[SupportsRead]] / BATCH_READ capability —
  *     discovery via `spark.read.format("graft.sources.docgen")`
  *     (`DataSource.lookupDataSource` resolves the package name to this
  *     `DefaultSource` class);
  *   - `SupportsPushDownRequiredColumns` — column pruning reaches the
  *     generator: unselected columns are never even computed (the DSv2
  *     contract behind "a scan that reads all columns for a 2-column
  *     projection is wrong");
  *   - `SupportsPushDownFilters` — `id` range predicates narrow the
  *     generated range BEFORE partition planning, so filtered reads plan
  *     proportionally fewer/smaller partitions (the 100 TB point of
  *     pushdown: the I/O never happens). Accepted filters are REMOVED
  *     from Spark's post-scan filter list — the source must honor them
  *     exactly, which `DocGenSourceSpec` proves differentially;
  *   - `planInputPartitions` — the range splits into `slices` even
  *     chunks, one [[PartitionReader]] each: distributed parallelism is
  *     planned by the source, not inherited from a parent RDD.
  *
  * Everything after `build()` is immutable and serializable; each reader
  * is a pure counter, so the source also demonstrates the zero-state
  * re-read discipline (retries/speculation re-run a partition with no
  * side effects).
  */
object DocGen {
  val Langs: Array[String] = Array("en", "de", "fr", "es", "it")

  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("tokens", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false)))

  /** Closed-form column generators — mirrored verbatim in q154's oracle. */
  def lang(id: Long): UTF8String = UTF8String.fromString(Langs((id % 5).toInt))
  def tokens(id: Long): Long = (id * 2654435761L) % 997L
  def score(id: Long): Double = (id * 31L % 1000L).toDouble / 1000.0
}

class DefaultSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DocGen.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new DocGenTable(
      properties.getOrDefault("rows", "100000").toLong,
      properties.getOrDefault("slices", "8").toInt,
      properties.getOrDefault("rowsPerBatch", "25000").toLong)
}

class DocGenTable(rows: Long, slices: Int, rowsPerBatch: Long)
    extends Table with SupportsRead {
  override def name(): String = s"docgen(rows=$rows)"
  override def schema(): StructType = DocGen.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocGenScanBuilder(rows, slices, rowsPerBatch)
}

class DocGenScanBuilder(rows: Long, slices: Int, rowsPerBatch: Long)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = rows
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = DocGen.Schema

  private def long(v: Any): Option[Long] = v match {
    case n: Long => Some(n)
    case n: Int  => Some(n.toLong)
    case _       => None
  }

  /** Accept `id` range/equality filters by narrowing [lo, hi); everything
    * else stays a Spark-side post-scan filter.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val rest = filters.filter {
      case GreaterThanOrEqual("id", v) if long(v).isDefined =>
        lo = math.max(lo, long(v).get); false
      case GreaterThan("id", v) if long(v).isDefined =>
        lo = math.max(lo, long(v).get + 1); false
      case LessThan("id", v) if long(v).isDefined =>
        hi = math.min(hi, long(v).get); false
      case LessThanOrEqual("id", v) if long(v).isDefined =>
        hi = math.min(hi, long(v).get + 1); false
      case EqualTo("id", v) if long(v).isDefined =>
        lo = math.max(lo, long(v).get); hi = math.min(hi, long(v).get + 1); false
      case _ => true
    }
    accepted = filters.diff(rest)
    rest
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new DocGenScan(lo, math.max(lo, hi), slices, rowsPerBatch, required)
}

class DocGenScan(lo: Long, hi: Long, slices: Int, rowsPerBatch: Long, schema: StructType)
    extends Scan with Batch {

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  /** Streaming read mode — same generator, micro-batch offsets; see
    * [[DocGenMicroBatchStream]]. Spark runs no filter pushdown on
    * micro-batch scans today, so `lo` must still be 0 here; if pushdown
    * ever reaches the streaming path, the accepted filters would already
    * be gone from the post-scan plan and rows [0, lo) would silently
    * leak — so the invariant is ENFORCED, not documented.
    */
  override def toMicroBatchStream(
      checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(lo == 0L,
      s"DocGen streaming scan with pushed lower bound lo=$lo: filter pushdown " +
        "reached the micro-batch path; wire lo into DocGenMicroBatchStream first")
    new DocGenMicroBatchStream(hi, slices, rowsPerBatch, schema.fieldNames)
  }

  /** Surfaces the narrowed range + pruned columns in the executed plan —
    * what PlanSpec gates on.
    */
  override def description(): String =
    s"DocGenScan range=[$lo,$hi) cols=[${schema.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    (0 until slices).map { i =>
      DocGenPartition(
        lo + i * n / slices,
        lo + (i + 1) * n / slices,
        schema.fieldNames)
    }.filter(p => p.end > p.start).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DocGenReaderFactory
}

case class DocGenPartition(start: Long, end: Long, cols: Array[String])
    extends InputPartition

class DocGenReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[DocGenPartition]
    new PartitionReader[InternalRow] {
      private var id = part.start - 1
      override def next(): Boolean = { id += 1; id < part.end }
      override def get(): InternalRow =
        new GenericInternalRow(part.cols.map[Any] {
          case "id"     => id
          case "lang"   => DocGen.lang(id)
          case "tokens" => DocGen.tokens(id)
          case "score"  => DocGen.score(id)
        })
      override def close(): Unit = ()
    }
  }
}
