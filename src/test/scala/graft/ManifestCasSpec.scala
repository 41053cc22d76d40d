package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.StoreManifest

/** The StoreManifest commit protocol (round-16 verdict tasks 1+3) — the
  * concurrency contracts no registered query can express:
  *   - optimistic CAS: two committers racing `appendVersion` on one
  *     store publish exactly one v(n+1) and one v(n+2) — never two
  *     copies of the same version — and the loser's recomputed update
  *     lands on top of the winner's;
  *   - atomic head: a reader mid-race always resolves a COMPLETE
  *     snapshot (some committed generation), never a torn or missing
  *     manifest;
  *   - torn-commit tolerance: a marker whose snapshot never landed (a
  *     crashed committer) is skipped — the head is the newest gen that
  *     RESOLVES;
  *   - generation retirement keeps a one-generation grace window.
  */
class ManifestCasSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private def freshRoot(): String = {
    val root = graft.sources.Sources.scratchLeaf(
      d, s"cas_${java.util.UUID.randomUUID().toString.take(8)}")
    StoreManifest.hfs(spark, root)
      .mkdirs(new org.apache.hadoop.fs.Path(root))
    root
  }

  test("two racing appendVersion committers publish distinct consecutive versions") {
    val root = freshRoot()
    StoreManifest.commit(spark, root)(_ => Seq((1L, 0L, s"$root/a/cell=0")))
    val out = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val ts = (0 until 2).map { i =>
      new Thread(() =>
        try {
          barrier.await()
          out.add(StoreManifest.appendVersion(spark, root)(nv =>
            Seq((nv, 0L, s"$root/w$i/cell=0"))))
          ()
        } catch { case t: Throwable => errs.add(t); () })
    }
    ts.foreach(_.start()); ts.foreach(_.join(120000))
    import scala.jdk.CollectionConverters._
    assert(errs.isEmpty, s"committer failed: ${errs.asScala.headOption}")
    assert(out.asScala.toSet == Set(2L, 3L),
      s"racing committers published versions ${out.asScala.toSeq.sorted} — " +
        "expected exactly one v2 and one v3")
    // the head snapshot carries BOTH updates: the loser recomputed
    // against the winner's head, nothing was lost or duplicated
    val rows = StoreManifest.readRows(spark, root)
    assert(rows.map(_._1).toSet == Set(1L, 2L, 3L))
    assert(rows.count(_._1 == 2L) == 1 && rows.count(_._1 == 3L) == 1)
    assert(rows.filter(_._1 >= 2L).map(_._3).toSet
      == Set(s"$root/w0/cell=0", s"$root/w1/cell=0"))
  }

  test("a reader hammering the head mid-race never sees a torn or missing manifest") {
    val root = freshRoot()
    StoreManifest.commit(spark, root)(_ => Seq((1L, 0L, s"$root/a/cell=0")))
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val readerErrs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val reads = new java.util.concurrent.atomic.AtomicLong(0)
    val reader = new Thread(() =>
      while (!stop.get()) {
        try {
          val rows = StoreManifest.readRows(spark, root)
          // every resolved snapshot is complete: a contiguous version
          // prefix 1..maxV, one row per version in this fixture
          assert(rows.nonEmpty, "resolved an empty manifest mid-commit")
          val vs = rows.map(_._1).sorted
          assert(vs == (1L to vs.max), s"torn snapshot: versions $vs")
          reads.incrementAndGet(); ()
        } catch { case t: Throwable => readerErrs.add(t); () }
      })
    reader.start()
    (2 to 6).foreach { _ =>
      StoreManifest.appendVersion(spark, root)(nv => Seq((nv, 0L, s"$root/v$nv/cell=0")))
    }
    stop.set(true); reader.join(60000)
    import scala.jdk.CollectionConverters._
    assert(readerErrs.isEmpty,
      s"reader observed a torn manifest: ${readerErrs.asScala.headOption}")
    assert(reads.get() > 0, "hammer never completed a read")
    assert(StoreManifest.readRows(spark, root).map(_._1).max == 6L)
  }

  test("a marker without its snapshot (crashed committer) is skipped by the head resolve") {
    val root = freshRoot()
    StoreManifest.commit(spark, root)(_ => Seq((1L, 0L, s"$root/a/cell=0")))
    val fs = StoreManifest.hfs(spark, root)
    val orphan = new org.apache.hadoop.fs.Path(s"$root/manifest/commit_99")
    val out = fs.create(orphan, false)
    out.write("snap_never_landed\n".getBytes("UTF-8")); out.close()
    assert(StoreManifest.readRows(spark, root).map(_._1).toSet == Set(1L),
      "head resolve trusted a marker whose snapshot never committed")
    // a subsequent commit still works (it CASes against gen 100)
    val v = StoreManifest.appendVersion(spark, root)(nv => Seq((nv, 0L, s"$root/b/cell=0")))
    assert(v == 2L)
    assert(StoreManifest.readRows(spark, root).map(_._1).toSet == Set(1L, 2L))
  }

  test("a torn marker AT the CAS target is reclaimed past the age grace (self-healing)") {
    val root = freshRoot()
    StoreManifest.commit(spark, root)(_ => Seq((1L, 0L, s"$root/a/cell=0")))
    val fs = StoreManifest.hfs(spark, root)
    // a committer that crashed between marker create and content write
    // left a torn commit_2 exactly where the next CAS must land
    val torn = new org.apache.hadoop.fs.Path(s"$root/manifest/commit_2")
    fs.create(torn, false).close()
    val v = StoreManifest.appendVersion(spark, root, reclaimAgeMs = 0L)(nv =>
      Seq((nv, 0L, s"$root/b/cell=0")))
    assert(v == 2L, "commit did not reclaim the torn marker blocking its target")
    assert(StoreManifest.readRows(spark, root).map(_._1).toSet == Set(1L, 2L))
  }

  test("commits retire generations two behind the head and keep a grace window") {
    val root = freshRoot()
    (1 to 4).foreach { v =>
      StoreManifest.commit(spark, root)(cur => cur ++ Seq((v.toLong, 0L, s"$root/v$v/cell=0")))
    }
    val gs = StoreManifest.gens(spark, root).map(_._1)
    assert(gs == Seq(3L, 4L), s"expected head + one grace generation, got $gs")
  }
}
