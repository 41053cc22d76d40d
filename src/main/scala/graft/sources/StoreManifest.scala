package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.{FileSystem, Path}

/** Generation-versioned store manifest with an ATOMIC, optimistically
  * concurrent commit — the metadata layer under the ANN store lifecycle
  * (q341/q343/q345/q346/q348 float store, q349-q351 PQ code store).
  *
  * Round-16 verdict closed three gaps with one mechanism here:
  *   1. the vacuum's manifest prune was an in-place `SaveMode.Overwrite`
  *      of the manifest dir — a delete-then-write window in which a
  *      concurrent reader saw a missing or partial manifest;
  *   2. version numbers were fixed constants and nothing detected a
  *      second writer (two concurrent committers would both publish the
  *      same version);
  *   3. the lifecycle file ops went through `java.io.File`, so an
  *      object-store scratch root (`SPARK_GRAFT_SCRATCH=s3a://...`, a
  *      mode Sources.scala supports) couldn't run them.
  *
  * Layout under `<root>/manifest/`:
  *   - `snap_<uuid>/`   — a COMPLETE snapshot of the manifest rows
  *                        (version, cell, path) as one `rows.tsv` leaf
  *                        plus a `_SUCCESS` completeness marker, fully
  *                        on disk before anything points at it;
  *   - `commit_<G>`     — the generation-G commit marker; its content
  *                        names the snapshot dir that IS generation G.
  *
  * Snapshot I/O is DIRECT FileSystem byte I/O, never a Spark job
  * (optimization r17, guide §5 "the driver should do almost no data
  * work" applied to metadata): the manifest is bounded driver-side
  * metadata (≤ versions × cells × paths rows), and the previous
  * parquet round-trip scheduled a full Spark job — scan planning,
  * task launch, collect — for every resolve. The serving loops
  * (q346/q348/q353) resolve the head once per micro-batch and every
  * lifecycle stage commits through here, so each resolve/commit was
  * one to two cluster jobs of pure overhead. A metadata layer at
  * 100 TB behaves the same way (Iceberg/Delta read manifests with
  * plain file I/O, not table scans).
  *
  * Readers resolve the head by listing the markers (bounded metadata),
  * taking the highest G whose snapshot resolves, and reading that one
  * snapshot. Every manifest mutation — the build's v1-3 publish, the
  * compaction's v4 append, the vacuum's retention prune — writes a NEW
  * snapshot dir and then publishes it with ONE marker create. The commit
  * point is the atomic appearance of `commit_<G>` in the namespace: a
  * reader sees the old complete snapshot or the new complete snapshot,
  * never a torn one (the Iceberg/Delta metadata-pointer discipline).
  *
  * Multi-writer safety is an optimistic CAS on the marker name: the
  * marker is created with overwrite=false (atomic-exclusive on HDFS;
  * exists-checked on the local FS with a read-back arbitration closing
  * the residual window — the content carries the creator's unique
  * snapshot name, so whichever attempt's token is in the file won), and
  * a loser deletes its orphan snapshot and retries against the NEW head,
  * recomputing its update — so two racing `appendVersion` committers
  * publish exactly one v(n+1) and one v(n+2), never two v(n+1)s
  * (`ManifestCasSpec` races them and pins it).
  *
  * Every commit retires generations ≤ G-2: the immediately-previous
  * generation is kept as a grace window so a reader that listed the
  * markers a moment before the flip still resolves a complete snapshot.
  * All I/O goes through the Hadoop FileSystem of the root's scheme —
  * local paths and object-store URIs take the same code path.
  */
object StoreManifest {

  /** One manifest row: (version, cell, live dir path). */
  type Rows = Seq[(Long, Long, String)]

  private[graft] def hfs(s: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Scheme-less string for local paths (keeps the manifest's path
    * strings byte-identical to the writer-side `$root/...` strings the
    * store handles carry); full URI for remote schemes.
    */
  private[graft] def pathStr(p: Path): String = {
    val u = p.toUri
    if (u.getScheme == null || u.getScheme == "file") u.getPath else p.toString
  }

  private def manifestDir(root: String): String = s"$root/manifest"

  /** Committed generations, ascending — each marker's G plus the
    * snapshot dir its content names. Unresolvable entries (a marker
    * whose content is mid-write, or whose snapshot is gone) are skipped:
    * the head is the highest generation that RESOLVES, which is what
    * makes a reader immune to a commit in flight.
    */
  private[graft] def gens(s: SparkSession, root: String): Seq[(Long, String)] = {
    val fs = hfs(s, root)
    val dir = new Path(manifestDir(root))
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("commit_"))
      .flatMap { st =>
        val g = st.getPath.getName.stripPrefix("commit_").toLong
        // filter BEFORE constructing the Path: a marker read mid-write
        // (created, content not yet flushed) yields an empty leaf, and
        // Path("") throws — the torn window this resolve must absorb
        readSmall(fs, st.getPath).map(_.trim).filter(_.nonEmpty).flatMap { leaf =>
          val snap = new Path(dir, leaf)
          if (fs.exists(new Path(snap, "_SUCCESS"))) Some(g -> pathStr(snap))
          else None
        }
      }.sortBy(_._1)
  }

  private def readSmall(fs: FileSystem, p: Path): Option[String] =
    try {
      val in = fs.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val b = new Array[Byte](256)
        var n = in.read(b)
        while (n > 0) { buf.write(b, 0, n); n = in.read(b) }
        Some(new String(buf.toByteArray, "UTF-8"))
      } finally in.close()
    } catch { case _: java.io.IOException => None }

  /** The head snapshot's rows — ONE bounded direct read of one small
    * file (≤ versions × cells × paths metadata rows), or empty when no
    * generation has committed. No Spark job is scheduled.
    */
  def readRows(s: SparkSession, root: String): Rows =
    gens(s, root).lastOption match {
      case None => Seq.empty
      case Some((_, snap)) =>
        try readSnapshot(hfs(s, root), new Path(snap))
        catch { case _: IllegalStateException =>
          // gens() → readSnapshot is not atomic: two rapid successive
          // commits can retire the generation this reader just resolved
          // (retireGens keeps newGen−1), so a missing rows.tsv here can
          // be a benign reclaim race, not corruption (ADVICE r17).
          // Re-resolve the head ONCE and retry; a snapshot still
          // unreadable then is a real error and throws.
          gens(s, root).lastOption match {
            case None => Seq.empty
            case Some((_, snap2)) => readSnapshot(hfs(s, root), new Path(snap2))
          }
        }
    }

  /** Parse one snapshot dir's `rows.tsv` (version \t cell \t path per
    * line). A resolvable generation always has the file — `_SUCCESS`
    * lands after it — so a missing/unreadable leaf here is a real
    * error, not a torn commit to absorb.
    */
  private def readSnapshot(fs: FileSystem, snap: Path): Rows = {
    val txt = readSmall(fs, new Path(snap, "rows.tsv")).getOrElse(
      throw new IllegalStateException(s"unreadable manifest snapshot $snap"))
    txt.split("\n").iterator.map(_.trim).filter(_.nonEmpty).map { line =>
      val f = line.split("\t", 3)
      (f(0).toLong, f(1).toLong, f(2))
    }.toSeq
  }

  /** Write `rows` as a complete snapshot dir: the `rows.tsv` leaf fully
    * on disk FIRST, then the `_SUCCESS` completeness marker the head
    * resolve requires — so a generation can never resolve to a
    * half-written snapshot.
    */
  private def writeSnapshot(fs: FileSystem, snap: Path, rows: Rows): Unit = {
    // rows.tsv has no escaping: a path carrying the field or record
    // separator would corrupt the snapshot SILENTLY at the next read
    // (ADVICE r17). Paths are internally generated today — reject the
    // latent class loudly at write time rather than parse garbage later.
    rows.foreach { case (_, _, p) =>
      require(!p.contains('\t') && !p.contains('\n') && !p.contains('\r'),
        s"manifest path contains a tsv separator character: $p")
    }
    fs.mkdirs(snap)
    val out = fs.create(new Path(snap, "rows.tsv"), true)
    try {
      val sb = new StringBuilder
      rows.foreach { case (v, c, p) => sb.append(v).append('\t').append(c)
        .append('\t').append(p).append('\n') }
      out.write(sb.toString.getBytes("UTF-8"))
    } finally out.close()
    fs.create(new Path(snap, "_SUCCESS"), true).close()
  }

  /** The head as (max version, per-cell live dirs of that version) in
    * one snapshot read — the per-micro-batch resolve of the live
    * serving loops (q346/q348).
    */
  def headVersion(s: SparkSession, root: String): (Long, Map[Long, Seq[String]]) = {
    val rows = readRows(s, root)
    require(rows.nonEmpty, s"no committed manifest generation under $root")
    val v = rows.map(_._1).max
    (v, rows.filter(_._1 == v).groupBy(_._2)
      .map { case (j, ps) => j -> ps.map(_._3).sorted.toSeq })
  }

  /** Resolve one pinned version through the head snapshot. */
  def asOf(s: SparkSession, root: String, v: Long): Map[Long, Seq[String]] =
    readRows(s, root).filter(_._1 == v).groupBy(_._2)
      .map { case (j, ps) => j -> ps.map(_._3).sorted.toSeq }

  /** Optimistic atomic commit: write `update(headRows)` as a fresh
    * snapshot, publish it with one exclusive marker create, retire
    * generations ≤ G-2. On a lost race the orphan snapshot is deleted
    * and the WHOLE update recomputes against the new head. Returns
    * (generation, committed rows).
    */
  def commit(s: SparkSession, root: String, reclaimAgeMs: Long = 60000L)(
      update: Rows => Rows): (Long, Rows) = {
    val fs = hfs(s, root)
    val dir = new Path(manifestDir(root))
    var attempt = 0
    while (attempt < 20) {
      attempt += 1
      val headG = gens(s, root).lastOption.map(_._1).getOrElse(0L)
      // Reclaim TORN markers above the resolvable head: a snapshot is
      // fully on disk before its marker is created, so a marker that
      // doesn't resolve means its committer crashed mid-content-write —
      // left in place it would block the CAS at that generation forever.
      // Reclaim only markers older than `reclaimAgeMs` (a live committer
      // closes its marker within milliseconds of creating it; the age
      // grace makes deleting a mid-write marker — and the read-race of
      // its just-finished twin — practically impossible) and re-check
      // resolvability at delete time.
      if (fs.exists(dir)) {
        val now = System.currentTimeMillis()
        fs.listStatus(dir)
          .filter(st => st.isFile && st.getPath.getName.startsWith("commit_"))
          .filter(_.getPath.getName.stripPrefix("commit_").toLong > headG)
          .filter(now - _.getModificationTime >= reclaimAgeMs)
          .foreach { st =>
            val resolvable = readSmall(fs, st.getPath).map(_.trim).exists(leaf =>
              leaf.nonEmpty && fs.exists(new Path(new Path(dir, leaf), "_SUCCESS")))
            if (!resolvable) { fs.delete(st.getPath, false); () }
          }
      }
      val cur = readRows(s, root)
      val next = update(cur)
      val leaf = s"snap_${java.util.UUID.randomUUID().toString.take(8)}"
      val snap = new Path(dir, leaf)
      writeSnapshot(fs, snap, next)
      val marker = new Path(dir, s"commit_${headG + 1}")
      val won =
        try {
          val out = fs.create(marker, false) // atomic-exclusive create
          try out.write(s"$leaf\n".getBytes("UTF-8")) finally out.close()
          // read-back arbitration: on a filesystem whose exclusive
          // create is exists-checked rather than atomic, two racers can
          // both reach here — the token in the file names ONE winner
          readSmall(fs, marker).map(_.trim).contains(leaf)
        } catch { case _: java.io.IOException => false }
      if (won) {
        retireGens(fs, dir, headG + 1)
        return (headG + 1, next)
      }
      fs.delete(snap, true) // lost the CAS: drop the orphan, recompute
    }
    throw new IllegalStateException(
      s"manifest commit on $root lost ${attempt} consecutive races — aborting")
  }

  /** Append the next version's rows computed AGAINST the head version
    * number (the CAS recomputes both on a lost race): two racing
    * committers get distinct versions, in commit order. Returns the
    * committed version.
    */
  def appendVersion(s: SparkSession, root: String,
      reclaimAgeMs: Long = 60000L)(rowsFor: Long => Rows): Long = {
    var out = 0L
    commit(s, root, reclaimAgeMs) { cur =>
      val nv = (if (cur.isEmpty) 0L else cur.map(_._1).max) + 1
      out = nv
      cur ++ rowsFor(nv)
    }
    out
  }

  /** Retire generations ≤ newGen-2 (markers + snapshots): the previous
    * generation stays as the grace window for a reader that listed just
    * before the flip.
    */
  private def retireGens(fs: FileSystem, dir: Path, newGen: Long): Unit =
    fs.listStatus(dir)
      .filter(st => st.isFile && st.getPath.getName.startsWith("commit_"))
      .filter(_.getPath.getName.stripPrefix("commit_").toLong <= newGen - 2)
      .foreach { st =>
        readSmall(fs, st.getPath).map(_.trim).filter(_.nonEmpty)
          .foreach(leaf => fs.delete(new Path(dir, leaf), true))
        fs.delete(st.getPath, false)
        ()
      }
}
