package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed K-CORE decomposition by synchronous peeling: repeatedly
  * delete every node whose degree is below `k` (and its incident
  * edges), all at once per round, until the edge set is stable. The
  * survivors form the k-core — the standard graph-curation filter for
  * duplicate-cluster mining (a node in the 2-core of the near-dup
  * graph sits in a genuinely dense duplication neighborhood — template
  * farms, mirror sets — while isolated pairs peel away), spam/community
  * detection, and graph sparsification before expensive per-node work.
  *
  * Each round is two shuffles (degree aggregate on the current edge
  * set, then two semi-joins to drop edges with a dead endpoint) — the
  * reference's multi-round idiom (MapReduceFramework.cpp:118-248, one
  * job per round; SURVEY §2b), same loop discipline as
  * [[ConnectedComponents]]: per-round `localCheckpoint` truncates the
  * lineage (the plan would otherwise double per iteration), and the
  * ONE action that materializes it (the edge count) also decides
  * convergence — peeling is monotone, so "count unchanged" IS the
  * fixed point, no set diff needed.
  *
  * Round-complexity honesty (the caveat CC's star contraction exists
  * to avoid, and k-core has no star trick): synchronous peeling runs
  * one round per PEELING LAYER, which is O(1) on clique-like dup
  * clusters (this corpus: ≤ 3 rounds) but O(path length) on a chain —
  * a pathological 100 TB near-dup chain would need its length in
  * rounds. `maxRounds` makes that failure LOUD (the reference's error
  * contract, cpp:241-247); a deployment hitting it switches to an
  * h-index coreness iteration or pre-contracts chains with CC.
  */
object KCore {

  /** `edges`: two long columns `a`, `b` (undirected, one row per edge).
    * Returns (coreNodes, rounds): coreNodes has one row
    * `(doc_id, core_deg)` per surviving node with its degree INSIDE the
    * k-core subgraph.
    */
  def run(edges: DataFrame, k: Int, maxRounds: Int = 64): (DataFrame, Int) = {
    var cur = edges.select(col("a"), col("b")).localCheckpoint(true)
    var n = cur.count()
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val alive = cur.select(col("a").as("n")).unionAll(cur.select(col("b").as("n")))
        .groupBy("n").agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k)
        .select(col("n"))
      val next = cur
        .join(alive.select(col("n").as("a")), Seq("a"), "left_semi")
        .join(alive.select(col("n").as("b")), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        .localCheckpoint(false)
      val m = next.count() // materializes the checkpoint AND decides convergence
      converged = m == n
      cur = next
      n = m
      rounds += 1
    }
    require(converged,
      s"k-core peel did not converge in $maxRounds rounds (peeling depth pathology)")
    val coreNodes = cur.select(col("a").as("doc_id"))
      .unionAll(cur.select(col("b").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("core_deg"))
    (coreNodes, rounds)
  }
}
