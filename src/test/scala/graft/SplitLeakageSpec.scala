package graft

import org.scalatest.funsuite.AnyFunSuite

/** q125 split-leakage differential contract: recompute the shingle
  * fingerprint (min word-trigram md5) and the q79 split assignment with
  * plain Scala (java MessageDigest — no Spark, no DuckDB) and require
  * the flagged group set to match exactly. Pins the audit's two
  * load-bearing functions: the hash-bucket split formula and the
  * near-dup fingerprint, plus the non-empty guarantee on this corpus
  * (near-dups DO span the split here — an always-empty audit proves
  * nothing).
  */
class SplitLeakageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def split(id: Long): String = {
    val b = java.lang.Long.parseLong(md5hex(s"split|$id").substring(0, 15), 16) % 100
    if (b < 90) "train" else if (b < 95) "val" else "test"
  }

  test("q125: leaked groups match a plain-Scala fingerprint + split recomputation") {
    val docs = Tables.documents(spark, d)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))

    val sfp = docs.flatMap { case (id, t) =>
      val ws = t.split(" ", -1)
      if (ws.length < 3) None
      else Some(id -> (0 to ws.length - 3).map(i => md5hex(ws.slice(i, i + 3).mkString(" "))).min)
    }
    val expected = sfp.groupBy(_._2).flatMap { case (fp, members) =>
      val ids = members.map(_._1)
      val train = ids.filter(split(_) == "train")
      val eval = ids.filterNot(split(_) == "train")
      if (train.nonEmpty && eval.nonEmpty)
        Some(fp -> ((train.length.toLong, eval.length.toLong, train.min, eval.min)))
      else None
    }

    val out = SparkEntry.queries("q125_split_leakage")(spark, d)
      .collect()
      .map(r => r.getAs[String]("sfp") ->
        ((r.getAs[Long]("n_train"), r.getAs[Long]("n_eval"),
          r.getAs[Long]("first_train"), r.getAs[Long]("first_eval")))).toMap

    assert(out.nonEmpty, "audit is empty — fixture lost its cross-split near-dups")
    assert(out == expected,
      s"drift: only-in-query=${(out.keySet -- expected.keySet).take(3)} " +
        s"only-in-scala=${(expected.keySet -- out.keySet).take(3)}")
  }
}
