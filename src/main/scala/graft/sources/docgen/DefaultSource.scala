package graft.sources.docgen

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection, SortOrder, Transform, aggregate}
import org.apache.spark.sql.connector.read.{HasPartitionKey, _}
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
  *     planned by the source, not inherited from a parent RDD;
  *   - `SupportsPushDownLimit` / `SupportsPushDownTopN` — LIMIT and
  *     ORDER-BY-id-LIMIT narrow the planned range to answer-sized
  *     (q243): "head the table" never scans the table;
  *   - `SupportsPushDownAggregates` (complete) — ungrouped COUNT /
  *     MIN(id) / MAX(id) / SUM(id) answered in closed form from range
  *     metadata by a one-row [[DocGenAggScan]] (q242) — the parquet-
  *     footer-count class of optimization, as a connector contract.
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
      properties.getOrDefault("rowsPerBatch", "25000").toLong,
      properties.getOrDefault("partitionBy", "") == "lang")
}

class DocGenTable(rows: Long, slices: Int, rowsPerBatch: Long, byLang: Boolean)
    extends Table with SupportsRead {
  override def name(): String = s"docgen(rows=$rows)"
  override def schema(): StructType = DocGen.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocGenScanBuilder(rows, slices, rowsPerBatch, byLang)
}

class DocGenScanBuilder(rows: Long, slices: Int, rowsPerBatch: Long, byLang: Boolean = false)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit
    with SupportsPushDownTopN
    with SupportsPushDownAggregates {

  private var lo = 0L
  private var hi = rows
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = DocGen.Schema
  private var partiallyPushed = false
  private var aggTags: Option[Array[String]] = None

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

  /** LIMIT pushdown: LIMIT n over an ordered generator is satisfiable by
    * the FIRST n rows of the (already filter-narrowed) range, so the
    * range shrinks to [lo, lo+n) before partition planning — at 100 TB,
    * "show me a few rows" stops costing a table scan. Fully pushed
    * (`isPartiallyPushed = false`): Spark drops its own Limit, so the
    * contract is exact-row-count, which the range arithmetic guarantees.
    */
  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, lo + limit)
    partiallyPushed = false
    true
  }

  /** Top-N pushdown (ORDER BY id ASC|DESC LIMIT n): the generator emits
    * ids in ascending order, so the top-N rows are exactly the first
    * (ASC) or last (DESC) n of the range — the scan narrows to that
    * window and generates n rows instead of the table. Reported
    * PARTIALLY pushed: the n survivors may span several planned
    * partitions (and DESC rows still come out ascending), so Spark keeps
    * its Sort+Limit — now over n rows, not the corpus. Row generation,
    * not the final sort, is the 100 TB cost being deleted.
    */
  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean = {
    val onId = orders.length == 1 && (orders(0).expression() match {
      case f: NamedReference => f.fieldNames.toSeq == Seq("id")
      case _                 => false
    })
    if (!onId) false
    else {
      if (orders(0).direction() == SortDirection.ASCENDING) hi = math.min(hi, lo + limit)
      else lo = math.max(lo, hi - limit)
      partiallyPushed = true
      true
    }
  }

  override def isPartiallyPushed(): Boolean = partiallyPushed

  /** Aggregate pushdown: ungrouped COUNT / MIN(id) / MAX(id) / SUM(id)
    * are answerable in CLOSED FORM from the narrowed range bounds — the
    * connector-side equivalent of a parquet footer count or a manifest's
    * min/max, where "aggregate the table" costs O(1) metadata instead of
    * a scan. Complete pushdown (the scan emits the final one-row
    * answer), so the plan has NO aggregate work left above the scan;
    * Spark requires complete-pushdown scans to be single-partition,
    * which [[DocGenAggScan]] plans.
    */
  private def isId(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case f: NamedReference => f.fieldNames.toSeq == Seq("id")
      case _                 => false
    }

  private def aggTag(f: aggregate.AggregateFunc): Option[String] = f match {
    case _: aggregate.CountStar                          => Some("count_star")
    case c: aggregate.Count if !c.isDistinct && isId(c.column) => Some("count_star")
    case m: aggregate.Min if isId(m.column)              => Some("min_id")
    case m: aggregate.Max if isId(m.column)              => Some("max_id")
    case s: aggregate.Sum if !s.isDistinct && isId(s.column) => Some("sum_id")
    case _                                               => None
  }

  override def supportCompletePushDown(agg: aggregate.Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.forall(aggTag(_).isDefined)

  override def pushAggregation(agg: aggregate.Aggregation): Boolean =
    supportCompletePushDown(agg) && {
      aggTags = Some(agg.aggregateExpressions.map(f => aggTag(f).get))
      true
    }

  override def build(): Scan = aggTags match {
    case Some(tags)      => new DocGenAggScan(lo, math.max(lo, hi), tags)
    case None if byLang  => new DocGenLangScan(lo, math.max(lo, hi), required)
    case None            => new DocGenScan(lo, math.max(lo, hi), slices, rowsPerBatch, required)
  }
}

/** Lang-partitioned scan (`.option("partitionBy", "lang")`): one planned
  * partition per language (ids ≡ i mod 5), each carrying its key via
  * [[HasPartitionKey]], with the layout REPORTED to Catalyst as
  * `KeyGroupedPartitioning(identity(lang))` through
  * [[SupportsReportPartitioning]]. Under
  * `spark.sql.sources.v2.bucketing.enabled`, Spark's planner treats the
  * scan output as already clustered by `lang`: aggregations on lang run
  * both phases in the scan stage with NO shuffle, and two such scans
  * joined on lang-prefixed keys co-partition into a storage-partitioned
  * join with NO exchange on either side — the Iceberg/Delta "layout as
  * metadata" contract (q244/q245), the difference between re-shuffling
  * 100 TB per query and never shuffling it at all.
  */
class DocGenLangScan(lo: Long, hi: Long, schema: StructType)
    extends Scan with Batch with SupportsReportPartitioning {

  private def langParts: Array[DocGenLangPartition] =
    (0 until DocGen.Langs.length).map { i =>
      // first id >= lo with id % 5 == i
      val start = lo + ((i - lo) % 5 + 5) % 5
      DocGenLangPartition(i, start, hi, schema.fieldNames)
    }.filter(p => p.start < p.end).toArray

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def outputPartitioning(): org.apache.spark.sql.connector.read.partitioning.Partitioning =
    new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
      Array(org.apache.spark.sql.connector.expressions.Expressions.identity("lang")),
      langParts.length)
  override def description(): String =
    s"DocGenLangScan range=[$lo,$hi) cols=[${schema.fieldNames.mkString(",")}] keyGrouped=lang"
  override def planInputPartitions(): Array[InputPartition] = langParts.toArray
  override def createReaderFactory(): PartitionReaderFactory = new DocGenLangReaderFactory
}

case class DocGenLangPartition(langIdx: Int, start: Long, end: Long, cols: Array[String])
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](DocGen.lang(langIdx.toLong)))
}

class DocGenLangReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[DocGenLangPartition]
    new PartitionReader[InternalRow] {
      private var id = part.start - 5
      override def next(): Boolean = { id += 5; id < part.end }
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

/** One-partition, one-row scan serving a completely-pushed aggregation
  * from the range bounds — no document row is ever generated. SUM uses
  * the arithmetic-series closed form (exact in Long for the generator's
  * ranges; id sums overflow 64 bits only past ~4.3e9 rows, far above the
  * `rows` option's intended use). Empty range → SQL semantics: COUNT 0,
  * MIN/MAX/SUM null.
  */
class DocGenAggScan(lo: Long, hi: Long, tags: Array[String]) extends Scan with Batch {
  override def readSchema(): StructType = StructType(tags.zipWithIndex.map {
    case (t, i) => StructField(s"${t}_$i", LongType, nullable = t != "count_star")
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"DocGenAggScan range=[$lo,$hi) agg=[${tags.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(DocGenAggPartition(lo, hi, tags))
  override def createReaderFactory(): PartitionReaderFactory = new DocGenAggReaderFactory
}

case class DocGenAggPartition(lo: Long, hi: Long, tags: Array[String])
    extends InputPartition

class DocGenAggReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[DocGenAggPartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val first = !emitted; emitted = true; first }
      override def get(): InternalRow = {
        val n = part.hi - part.lo
        new GenericInternalRow(part.tags.map[Any] {
          case "count_star" => n
          case "min_id"     => if (n > 0) part.lo else null
          case "max_id"     => if (n > 0) part.hi - 1 else null
          case "sum_id"     => if (n > 0) (part.lo + part.hi - 1) * n / 2 else null
        })
      }
      override def close(): Unit = ()
    }
  }
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
