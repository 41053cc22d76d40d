package graft

import org.scalatest.funsuite.AnyFunSuite

/** q123 URL canonicalization differential contract: rebuild every
  * canonical URL with java.net.URI (an independent parser — no regexes
  * shared with the query) plus the same normalization policy, and
  * require exact agreement; then check the group columns (keeper =
  * min doc_id, n_same = group size) against a plain groupBy. Also pins
  * the property the operator exists for: the three raw spellings of one
  * page collapse (strictly fewer canonical URLs than raw URLs).
  */
class UrlCanonSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private def canonical(raw: String): String = {
    val u = java.net.URI.create(raw)
    val scheme = u.getScheme.toLowerCase
    var host = u.getHost.toLowerCase.stripPrefix("www.")
    val port = u.getPort
    val hostPort =
      if (port == -1 || port == 80 || port == 443) host else s"$host:$port"
    val path = u.getPath.stripSuffix("/")
    val query = Option(u.getQuery).map(_.split("&").filterNot(_.startsWith("utm_")))
      .filter(_.nonEmpty).map(_.mkString("?", "&", "")).getOrElse("")
    s"$scheme://$hostPort$path$query"
  }

  test("q123: canon matches java.net.URI policy; groups are exact; spellings collapse") {
    val rows = SparkEntry.queries("q123_url_canon")(spark, d)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("url"),
        r.getAs[String]("canon"), r.getAs[Long]("canon_keeper"), r.getAs[Long]("n_same")))
    assert(rows.nonEmpty)

    rows.foreach { case (id, url, canon, _, _) =>
      assert(canon == canonical(url), s"doc $id: $canon != ${canonical(url)} for $url")
    }
    rows.groupBy(_._3).foreach { case (canon, grp) =>
      val ids = grp.map(_._1)
      assert(grp.forall(_._4 == ids.min), s"$canon keeper drift")
      assert(grp.forall(_._5 == ids.length.toLong), s"$canon n_same drift")
    }
    assert(rows.map(_._3).distinct.length < rows.length,
      "no URL spelling collapsed — fixture lost its duplicate spellings")
  }
}
