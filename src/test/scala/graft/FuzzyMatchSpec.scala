package graft

import org.scalatest.funsuite.AnyFunSuite

/** q144 SymSpell contracts:
  *   - COMPLETENESS differential — on the real corpus vocabulary, the
  *     deletion-neighborhood join finds exactly the same best match as a
  *     brute-force all-pairs levenshtein scan (plain Scala, no Spark, no
  *     SQL) for every query;
  *   - edit-class fixture — a handcrafted vocabulary exercising each
  *     distance-1 class (exact, insert, delete, substitute), the
  *     frequency tiebreak, and the distance-2 miss the join must NOT
  *     surface.
  */
class FuzzyMatchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j =>
      if (i == 0) j else if (j == 0) i else 0))
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("q144 equals a brute-force all-pairs scan on the corpus vocabulary") {
    val vocab = Tables.documents(spark, d)
      .selectExpr("explode(split(text, ' ')) w").where("w <> ''")
      .groupBy("w").count()
      .collect().map(r => r.getAs[String]("w") -> r.getAs[Long]("count")).toMap
    val queries = vocab.keys.filter(_.length >= 5)
      .map(w => w.substring(0, w.length / 2 - 1) + w.substring(w.length / 2)).toSet

    val expected = queries.flatMap { q =>
      val hits = vocab.toSeq.map { case (w, c) => (lev(q, w).toLong, -c, w) }
        .filter(_._1 <= 1)
      if (hits.isEmpty) None else Some(q -> hits.min)
    }.toMap

    val out = SparkEntry.queries("q144_fuzzy_match")(spark, d).collect().map { r =>
      r.getAs[String]("query") ->
        ((r.getAs[Long]("distance"), -r.getAs[Long]("term_cnt"), r.getAs[String]("term")))
    }.toMap
    assert(out == expected, "deletion-neighborhood join diverged from brute force")
    assert(out.nonEmpty)
  }

  test("q144 core: every edit class on a handcrafted vocabulary") {
    import spark.implicits._
    val vocab = Seq(
      ("banana", 50L), ("bananas", 10L), // insert-class neighbor of 'banana'
      ("panana", 5L),                    // substitute-class neighbor
      ("anana", 2L),                     // delete-class neighbor
      ("cherry", 7L), ("chxrry", 3L),
      ("kiwi", 9L)).toDF("w", "cnt")
    val qs = Seq(
      "banana",  // exact (dist 0) must beat all dist-1 neighbors
      "bananna", // one deletion from 'banana' (its extra 'n' drops)
      "cherr",   // dist 1 from 'cherry' (insert)
      "xherry",  // dist 1 from 'cherry' (substitute); dist 2 from chxrry
      "kiwixx"   // dist 2 from 'kiwi' — must be ABSENT
    ).toDF("query")
    val out = queries.TextAnalysis.symspellMatch(vocab, qs)
      .collect().map(r => r.getAs[String]("query") ->
        ((r.getAs[String]("term"), r.getAs[Long]("distance")))).toMap
    assert(out == Map(
      "banana" -> (("banana", 0L)),
      "bananna" -> (("banana", 1L)),
      "cherr" -> (("cherry", 1L)),
      "xherry" -> (("cherry", 1L))))
  }
}
