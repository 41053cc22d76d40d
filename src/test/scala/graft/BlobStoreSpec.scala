package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

/** q174 staged-commit sink contract — the failure paths the round-trip
  * oracle can't see:
  *   (a) readers resolve the MANIFEST, so a staged file (uncommitted
  *       task) and an orphaned data file (zombie attempt, crashed job)
  *       are both invisible;
  *   (b) task abort deletes the staged file;
  *   (c) append unions the prior manifest, truncate replaces it and
  *       vacuums dead files;
  *   (d) the round trip is row-exact, nulls included.
  */
class BlobStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_blob_$tag").toString + "/store"

  private def docs =
    Tables.documents(spark, d).select(col("doc_id"), col("lang"), col("text"))

  test("q174: round trip is row-exact") {
    val root = freshRoot("rt")
    docs.write.format("graft.sources.blob").option("path", root)
      .mode("overwrite").save()
    val back = spark.read.format("graft.sources.blob").option("path", root).load()
    assert(back.count() === docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("q174: staged and orphaned files are invisible to readers") {
    val root = freshRoot("ghost")
    docs.write.format("graft.sources.blob").option("path", root)
      .mode("overwrite").save()
    val n = spark.read.format("graft.sources.blob").option("path", root).load().count()
    // plant a zombie staged file and an unreferenced data file
    val staged = new java.io.File(s"$root/${sources.blob.BlobStore.StagedDir}")
    staged.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(staged.toString, "rogue.tsv"), "999999\t" +
        sources.blob.BlobStore.hex("xx".getBytes) + "\t" +
        sources.blob.BlobStore.hex("boo".getBytes) + "\n")
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$root/${sources.blob.BlobStore.DataDir}", "orphan.tsv"),
      "888888\t" + sources.blob.BlobStore.hex("yy".getBytes) + "\t" +
        sources.blob.BlobStore.hex("hoo".getBytes) + "\n")
    val after = spark.read.format("graft.sources.blob").option("path", root).load()
    assert(after.count() === n, "a file no manifest references changed the read")
    assert(after.where(col("doc_id").isin(999999L, 888888L)).count() === 0L)
  }

  test("q174: task abort removes the staged file") {
    val root = freshRoot("abort")
    val schema = docs.schema
    val w = new sources.blob.BlobDataWriter(root, schema, 0, 0L)
    w.write(org.apache.spark.sql.catalyst.InternalRow(
      1L, org.apache.spark.unsafe.types.UTF8String.fromString("en"),
      org.apache.spark.unsafe.types.UTF8String.fromString("hello")))
    w.abort()
    val staged = new java.io.File(s"$root/${sources.blob.BlobStore.StagedDir}")
    val left = Option(staged.listFiles()).map(_.length).getOrElse(0)
    assert(left === 0, s"abort left $left staged file(s)")
  }

  test("q175: epoch re-commit is idempotent; multi-epoch manifests accumulate") {
    val root = freshRoot("epoch")
    val schema = docs.schema
    def stageOne(task: Long): sources.blob.BlobCommitMessage = {
      val w = new sources.blob.BlobDataWriter(root, schema, 0, task)
      w.write(org.apache.spark.sql.catalyst.InternalRow(
        task, org.apache.spark.unsafe.types.UTF8String.fromString("en"),
        org.apache.spark.unsafe.types.UTF8String.fromString("row")))
      w.commit().asInstanceOf[sources.blob.BlobCommitMessage]
    }
    val sw = new sources.blob.BlobStreamingWrite(root, schema)
    sw.commit(0L, Array(stageOne(1L)))
    sw.commit(1L, Array(stageOne(2L)))
    val after2 = sources.blob.BlobStore.readManifest(root)
    assert(after2.size === 2, s"two epochs must publish two files: $after2")
    // crash-recovery replay: epoch 1 re-runs with a NEW staged duplicate
    sw.commit(1L, Array(stageOne(3L)))
    val afterReplay = sources.blob.BlobStore.readManifest(root)
    assert(afterReplay === after2, "replayed epoch changed the manifest")
    val staged = new java.io.File(s"$root/${sources.blob.BlobStore.StagedDir}")
    val left = Option(staged.listFiles()).map(_.count(!_.getName.startsWith("."))).getOrElse(0)
    assert(left === 0, s"replay left $left duplicate staged file(s)")
    // the two committed rows are both readable
    val n = spark.read.format("graft.sources.blob").option("path", root).load().count()
    assert(n === 2L)
  }

  test("q174: empty string in the LAST column survives the round trip") {
    // "" hex-encodes to "" so the line ends in a tab; a limit-dropping
    // split loses that cell and the read throws. Distinct from NULL
    // (\N) — both must come back exactly.
    val root = freshRoot("empty")
    import spark.implicits._
    val tricky = Seq(
      (1L, "en", ""),           // empty string in last column
      (2L, "", ""),             // empty in middle AND last
      (3L, "de", null: String), // null stays null, not ""
      (4L, "fr", "text")
    ).toDF("doc_id", "lang", "text")
    tricky.write.format("graft.sources.blob").option("path", root)
      .mode("overwrite").save()
    val back = spark.read.format("graft.sources.blob").option("path", root).load()
    assert(back.count() === 4L)
    assert(back.exceptAll(tricky).isEmpty && tricky.exceptAll(back).isEmpty)
    val r1 = back.where(col("doc_id") === 1L).head()
    assert(r1.getAs[String]("text") === "", "empty string came back as something else")
    val r3 = back.where(col("doc_id") === 3L).head()
    assert(r3.isNullAt(r3.fieldIndex("text")), "null came back as non-null")
  }

  test("q174: append unions the manifest; truncate replaces it and vacuums") {
    val root = freshRoot("modes")
    val part = docs.limit(100)
    part.write.format("graft.sources.blob").option("path", root)
      .mode("overwrite").save()
    val n1 = spark.read.format("graft.sources.blob").option("path", root).load().count()
    part.write.format("graft.sources.blob").option("path", root)
      .mode("append").save()
    val n2 = spark.read.format("graft.sources.blob").option("path", root).load().count()
    assert(n2 === 2 * n1, "append did not union the prior manifest")
    part.write.format("graft.sources.blob").option("path", root)
      .mode("overwrite").save()
    val n3 = spark.read.format("graft.sources.blob").option("path", root).load().count()
    assert(n3 === n1, "truncate did not replace the manifest")
    // dead-file vacuum: data dir holds exactly the manifest's files
    val manifest = sources.blob.BlobStore.readManifest(root).toSet
    val onDisk = new java.io.File(s"$root/${sources.blob.BlobStore.DataDir}")
      .listFiles().map(_.getName)
      .filterNot(_.startsWith(".")) // Hadoop local-FS .crc sidecars ride their data file
      .toSet
    assert(onDisk === manifest,
      s"truncate left dead files: ${(onDisk -- manifest).take(3)}")
  }
}
