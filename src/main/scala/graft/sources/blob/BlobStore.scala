package graft.sources.blob

import java.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A full DataSourceV2 BATCH SINK + source — the write half of the
  * connector surface q154's `docgen` source deliberately left out
  * (docgen is a generator, so it only reads). `graft.sources.blob` is a
  * minimal but protocol-complete table store that exercises the exact
  * machinery every production V2 sink (Iceberg, Delta, a feature store)
  * implements:
  *
  *   - [[SupportsWrite]] + `BATCH_WRITE`/`TRUNCATE` capabilities —
  *     `df.write.format("graft.sources.blob").mode(...)` resolves here;
  *   - the STAGED-COMMIT protocol: every [[DataWriter]] (one per task)
  *     streams rows to a uniquely-named file under `_staged/`, its
  *     `commit()` returns a [[BlobCommitMessage]] naming the file, and
  *     only the DRIVER's [[BatchWrite.commit]] — which runs once, after
  *     every task succeeded — moves staged files into `data/` and
  *     publishes the MANIFEST. Readers resolve the manifest, never the
  *     directory listing, so a half-written job (task retry, speculation,
  *     executor loss) is invisible by construction: uncommitted staged
  *     files and orphaned data files alike are simply never referenced
  *     (`BlobStoreSpec` plants both and proves reads ignore them);
  *   - task-level `abort()` deletes the staged file (idempotent — a
  *     retry stages a NEW uuid, so the retry and the zombie first
  *     attempt can never collide);
  *   - `SupportsTruncate` — `mode("overwrite")` publishes a manifest of
  *     only the new files; append unions the previous manifest.
  *
  * Storage format is deliberately simple (TSV with hex-encoded strings —
  * delimiter/newline-proof), because the OPERATOR under test is the
  * commit protocol, not the encoding; long/double/string columns cover
  * the engine's table shapes. The manifest is written last, to a temp
  * name then renamed — the same publish-last discipline every manifest
  * format relies on. Executor writers reach storage through the Hadoop
  * FileSystem API (shared-FS contract, like the [[graft.sources.Sources]]
  * scratch root); schema rides `_schema.json` so reads need no
  * inference pass.
  */
object BlobStore {
  val StagedDir = "_staged"
  val DataDir = "data"
  val ManifestFile = "_manifest"
  val SchemaFile = "_schema.json"

  private[blob] def fs(p: Path): FileSystem =
    p.getFileSystem(new org.apache.hadoop.conf.Configuration())

  def hex(b: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(b.length * 2)
    b.foreach(x => sb.append(f"${x & 0xff}%02x"))
    sb.toString
  }

  def unhex(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(s.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    out
  }

  /** Manifest = one committed data-file name per line (publish order),
    * plus `#epoch:<id>` marker lines recording committed streaming
    * epochs — markers and their files land in ONE atomic manifest
    * replace, which is what makes streaming re-commits idempotent.
    */
  def readManifest(root: String): Seq[String] =
    readManifestRaw(root).filterNot(_.startsWith("#"))

  def readManifestRaw(root: String): Seq[String] = {
    val mf = new Path(root, ManifestFile)
    val f = fs(mf)
    if (!f.exists(mf)) Seq.empty
    else {
      val in = f.open(mf)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    }
  }

  /** Shared publish step: move the named staged files into `data/`,
    * persist the schema, and atomically replace the manifest with
    * `lines` (FileContext overwriting rename — `FileSystem.rename`
    * silently refuses existing destinations).
    */
  private[blob] def publish(root: String, schema: StructType,
      names: Seq[String], lines: Seq[String]): Unit = {
    val f = fs(new Path(root))
    val dataDir = new Path(root, DataDir)
    f.mkdirs(dataDir)
    names.foreach { n =>
      val src = new Path(s"$root/$StagedDir/$n")
      val dst = new Path(dataDir, n)
      // rename returns false (no exception) when src is missing or dst
      // exists; publishing a manifest line for an unmoved file would
      // break every subsequent read of the partition, so fail the
      // commit here instead.
      if (!f.rename(src, dst))
        throw new java.io.IOException(
          s"blob publish: rename $src -> $dst failed (missing staged file or existing destination)")
    }
    writeString(new Path(root, SchemaFile), schema.json)
    val tmp = new Path(root, ManifestFile + ".tmp")
    writeString(tmp, lines.mkString("\n"))
    org.apache.hadoop.fs.FileContext.getFileContext(tmp.toUri, f.getConf)
      .rename(tmp, new Path(root, ManifestFile),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private[blob] def readSchema(root: String): Option[StructType] = {
    val sf = new Path(root, SchemaFile)
    val f = fs(sf)
    if (!f.exists(sf)) None
    else {
      val in = f.open(sf)
      try Some(DataType.fromJson(
        scala.io.Source.fromInputStream(in, "UTF-8").mkString).asInstanceOf[StructType])
      finally in.close()
    }
  }

  private[blob] def writeString(p: Path, s: String): Unit = {
    val out = fs(p).create(p, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }
}

class DefaultSource extends TableProvider {
  // writes hand the DataFrame's schema straight to getTable; reads
  // without a user schema fall back to the store's _schema.json
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BlobStore.readSchema(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        s"graft.sources.blob: no ${BlobStore.SchemaFile} under ${options.get("path")} — " +
          "read of an uncommitted store, or missing path option"))

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new BlobTable(properties.get("path"), schema)
}

class BlobTable(root: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  require(root != null, "graft.sources.blob requires a path option")

  override def name(): String = s"blob($root)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new BlobScan(root, tableSchema)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new BlobWriteBuilder(root, info.schema())
}

// ---------------------------------------------------------------- write

class BlobWriteBuilder(root: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new BlobBatchWrite(root, schema, doTruncate)
    override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      new BlobStreamingWrite(root, schema)
  }
}

case class BlobCommitMessage(stagedName: String, rows: Long)
    extends WriterCommitMessage

class BlobBatchWrite(root: String, schema: StructType, truncate: Boolean)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new BlobWriterFactory(root, schema)

  /** Driver-side publish: runs once, only after every task committed.
    * Moves exactly the staged files the commit messages name — a zombie
    * attempt's staged file is NOT in any message and stays unpublished —
    * then writes schema and finally the manifest (temp + rename: readers
    * see the old complete manifest or the new one, never a torn file).
    *
    * Concurrency contract: ONE writer job at a time per store root.
    * Append-mode commit is a read-modify-write of the manifest, so two
    * concurrent appends (or a batch append racing the streaming sink)
    * could lose each other's manifest lines regardless of how staged
    * files are cleaned up. Single-writer is the store invariant (the
    * same one Delta enforces with a commit-log lock); under it, the
    * per-name staged cleanup below is exact, and a crashed job's
    * orphans are swept by the next truncate-mode rewrite.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val f = BlobStore.fs(new Path(root))
    val names = messages.collect { case m: BlobCommitMessage => m.stagedName }
    val prior = if (truncate) Seq.empty else BlobStore.readManifestRaw(root)
    BlobStore.publish(root, schema, names.toSeq, prior ++ names.sorted)
    // truncate: files the new manifest no longer references are dead;
    // remove them (the q168 vacuum move, inline because truncate IS the
    // retention decision here)
    if (truncate) {
      val live = names.toSet
      val dataDir = new Path(root, BlobStore.DataDir)
      Option(f.listStatus(dataDir)).getOrElse(Array.empty).foreach { st =>
        if (!live.contains(st.getPath.getName)) f.delete(st.getPath, false)
      }
    }
    // publish() moved every named staged file; only zombie task attempts
    // (committed task retried after a speculative duplicate) can leave
    // residue. Remove the staged dir only if it is now empty — never
    // blow away files another in-flight job may have staged.
    val stagedDir = new Path(root, BlobStore.StagedDir)
    val residue = Option(if (f.exists(stagedDir)) f.listStatus(stagedDir) else null)
      .getOrElse(Array.empty)
    if (residue.isEmpty) f.delete(stagedDir, false)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val f = BlobStore.fs(new Path(root))
    messages.collect { case m: BlobCommitMessage => m.stagedName }.foreach { n =>
      f.delete(new Path(s"$root/${BlobStore.StagedDir}/$n"), false)
    }
  }
}

class BlobWriterFactory(root: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new BlobDataWriter(root, schema, partitionId, taskId)
}

/** The STREAMING half of the sink: same staged files, same per-task
  * writers — the delta is the commit contract. `commit(epochId, ...)`
  * can be REPLAYED: a recovered query re-runs an epoch whose commit may
  * or may not have landed, so the publish records an `#epoch:<id>`
  * marker in the SAME atomic manifest replace as the epoch's files, and
  * a re-commit of a recorded epoch discards its (duplicate) staged
  * files instead of publishing them — end-to-end exactly-once on top of
  * the source's replayable offsets (q166's contract). This is the
  * micro-batch `StreamingWrite` path every production streaming sink
  * (Kafka exactly-once, Delta streaming) implements.
  */
class BlobStreamingWrite(root: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    new BlobStreamingWriterFactory(root, schema)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val marker = s"#epoch:$epochId"
    val names = messages.collect { case m: BlobCommitMessage => m.stagedName }
    val raw = BlobStore.readManifestRaw(root)
    if (raw.contains(marker)) {
      // replayed epoch: its files are already published — the staged
      // re-writes are duplicates, drop them
      val f = BlobStore.fs(new Path(root))
      names.foreach(n =>
        f.delete(new Path(s"$root/${BlobStore.StagedDir}/$n"), false))
    } else {
      BlobStore.publish(root, schema, names.toSeq,
        raw ++ names.sorted :+ marker)
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val f = BlobStore.fs(new Path(root))
    messages.collect { case m: BlobCommitMessage => m.stagedName }.foreach { n =>
      f.delete(new Path(s"$root/${BlobStore.StagedDir}/$n"), false)
    }
  }
}

class BlobStreamingWriterFactory(root: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new BlobDataWriter(root, schema, partitionId, taskId)
}

/** One per task attempt: streams rows to a uuid-unique staged file, so
  * retries/speculative attempts never collide; only `commit()`'s message
  * can get this file published.
  */
class BlobDataWriter(root: String, schema: StructType, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val name =
    f"part-$partitionId%05d-$taskId-${java.util.UUID.randomUUID.toString.take(8)}.tsv"
  private val staged = new Path(s"$root/${BlobStore.StagedDir}/$name")
  private lazy val out = {
    val f = BlobStore.fs(staged)
    f.mkdirs(staged.getParent)
    new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      f.create(staged, true), "UTF-8"))
  }
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    val sb = new java.lang.StringBuilder()
    schema.fields.zipWithIndex.foreach { case (fld, i) =>
      if (i > 0) sb.append('\t')
      if (row.isNullAt(i)) sb.append("\\N")
      else fld.dataType match {
        case LongType   => sb.append(row.getLong(i))
        case DoubleType => sb.append(row.getDouble(i))
        case StringType => sb.append(BlobStore.hex(row.getUTF8String(i).getBytes))
        case dt => throw new UnsupportedOperationException(
          s"graft.sources.blob: unsupported type ${dt.sql}")
      }
    }
    sb.append('\n')
    out.write(sb.toString)
    rows += 1L
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    BlobCommitMessage(name, rows)
  }

  override def abort(): Unit = {
    out.close()
    BlobStore.fs(staged).delete(staged, false)
  }

  override def close(): Unit = ()
}

// ----------------------------------------------------------------- read

class BlobScan(root: String, schema: StructType) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String = s"BlobScan($root)"

  /** One partition per committed file — manifest-resolved, never a
    * directory listing (staged/orphaned files are invisible).
    */
  override def planInputPartitions(): Array[InputPartition] =
    BlobStore.readManifest(root)
      .map(n => BlobPartition(s"$root/${BlobStore.DataDir}/$n"): InputPartition)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new BlobReaderFactory(schema)
}

case class BlobPartition(file: String) extends InputPartition

class BlobReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val file = p.asInstanceOf[BlobPartition].file
    new PartitionReader[InternalRow] {
      private val path = new Path(file)
      private val in = BlobStore.fs(path).open(path)
      private val lines =
        scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      private var current: InternalRow = _

      override def next(): Boolean =
        if (!lines.hasNext) false
        else {
          // limit -1: keep trailing empty cells — an empty string in the
          // last column hex-encodes to "" and the line ends in a tab,
          // which the default split would drop.
          val cells = lines.next().split("\t", -1)
          val vals = schema.fields.zipWithIndex.map { case (fld, i) =>
            val c = cells(i)
            if (c == "\\N") null
            else fld.dataType match {
              case LongType   => java.lang.Long.valueOf(c)
              case DoubleType => java.lang.Double.valueOf(c)
              case StringType => UTF8String.fromBytes(BlobStore.unhex(c))
              case dt => throw new UnsupportedOperationException(dt.sql)
            }
          }
          current = new GenericInternalRow(vals.asInstanceOf[Array[Any]])
          true
        }

      override def get(): InternalRow = current
      override def close(): Unit = in.close()
    }
  }
}
