package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components via alternating LARGE-STAR / SMALL-STAR
  * contraction (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC 2014) — the scale-safe replacement for plain min-label
  * propagation, whose round count is O(component diameter): a 100 TB corpus
  * with one long near-dup chain would grind through thousands of rounds,
  * while star contraction halves tree heights every round and converges in
  * O(log n) rounds regardless of diameter.
  *
  * Each operation is one distributed join+groupBy round ("output of one job
  * is the input of the next" — the reference's multi-round idiom,
  * `/root/reference/MapReduceFramework.cpp:118-248` runs one such round per
  * job; SURVEY §2b):
  *
  *  - large-star: connect every neighbor LARGER than `u` to `u`'s minimum
  *    neighborhood member `m = min(Γ(u) ∪ {u})`.
  *  - small-star: orient edges toward the larger endpoint, then connect
  *    every smaller neighbor (and `u` itself) to the minimum.
  *
  * Both preserve connectivity; the fixed point is a star per component
  * rooted at its minimum id. Convergence is detected with ONE Spark action
  * per round: the round result is lazily `localCheckpoint`ed (lineage
  * truncation — without it the plan doubles per iteration) and the
  * signed-union diff count both materializes the checkpoint and compares
  * the edge set against the previous round — no second pass, no join back
  * to pre-round state. Non-convergence inside `maxRounds` is a LOUD error
  * (the reference's error contract: fail, never silently truncate) — but
  * unlike diameter-bounded propagation, `maxRounds` here is a true
  * pathology guard: 50 rounds covers any graph below ~2^50 nodes.
  */
object ConnectedComponents {

  /** `edges`: two long columns `a`, `b` (undirected; self-loops and
    * duplicates tolerated). Returns (labels, rounds): labels has one row
    * `(id, lbl)` per node that appears in `edges`, where `lbl` is the
    * smallest node id in its component; `rounds` is the number of
    * large-star+small-star rounds run (spec-asserted O(log n)).
    */
  def run(edges: DataFrame, maxRounds: Int = 50): (DataFrame, Int) = {
    def largeStar(e: DataFrame): DataFrame = {
      val s = e.union(e.select(col("b").as("a"), col("a").as("b")))
      val m = s.groupBy("a").agg(min("b").as("mn"))
        .select(col("a"), least(col("a"), col("mn")).as("m"))
      // b > a >= m, so the emitted (b, m) can never be a self-loop
      s.join(m, "a")
        .where(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val t = e.select(greatest(col("a"), col("b")).as("a"), least(col("a"), col("b")).as("b"))
        .where(col("a") =!= col("b"))
      val m = t.groupBy("a").agg(min("b").as("m"))
      t.join(m, "a")
        .select(col("b").as("a"), col("m").as("b"))
        .union(m.select(col("a"), col("m").as("b")))
        .where(col("a") =!= col("b"))
        .distinct()
    }

    // materialize the INPUT edge list exactly once — both the node set
    // and the contraction's working set derive from it, and the caller's
    // edge pipeline (q70 feeds a full MinHash-LSH run in here) must not
    // execute once per derivation
    val raw = edges.select(col("a"), col("b")).localCheckpoint(true)
    // every node mentioned in the input — including nodes whose only
    // edges are self-loops, which the contraction never sees but the
    // "one label per node that appears in edges" contract still covers
    val nodes = raw.select(col("a").as("id"))
      .union(raw.select(col("b").as("id")))
      .distinct()
    var cur = raw
      .select(greatest(col("a"), col("b")).as("a"), least(col("a"), col("b")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val next = smallStar(largeStar(cur)).localCheckpoint(false)
      // Signed-union set diff: both sides are distinct edge sets, so an
      // (a,b) group sums to 0 iff present in both. One action materializes
      // the lazy checkpoint AND decides convergence.
      val diff = next.withColumn("s", lit(1))
        .union(cur.withColumn("s", lit(-1)))
        .groupBy("a", "b").agg(sum("s").as("d"))
        .where(col("d") =!= 0)
        .count()
      cur = next
      rounds += 1
      converged = diff == 0
    }
    require(converged,
      s"connected components did not converge in $maxRounds star-contraction rounds")
    // Fixed point is a star forest: children appear only as `a`, roots
    // only as `b`. Joining the full node set back in labels isolated
    // (self-loop-only) nodes — and the roots themselves — with their
    // own id.
    val labels = nodes
      .join(cur, nodes("id") === cur("a"), "left")
      .select(col("id"), coalesce(col("b"), col("id")).as("lbl"))
    (labels, rounds)
  }
}
