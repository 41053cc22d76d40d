package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed MULTI-SOURCE BFS: minimum hop distance from a seed set
  * through an undirected edge list, capped at `maxHops`. The
  * decontamination shape connected components cannot express: q70
  * labels "same cluster as a benchmark doc" with no notion of HOW
  * FAR, but transitive near-duplication decays — one hop from a test
  * document is a paraphrase, four hops is usually boilerplate kinship
  * — so production contamination sweeps score by RADIUS (quarantine
  * ≤ 2 hops, audit ≤ 4) instead of nuking whole components. Distance
  * also isn't coreness (q294 measures density, not reach).
  *
  * Per round: the frontier joins the (doubled) adjacency list on the
  * source endpoint, dedups, and anti-joins everything already
  * visited — frontier-sized work, never corpus-sized. Same loop
  * discipline as [[ConnectedComponents]]/[[KCore]] (the reference's
  * multi-round idiom, MapReduceFramework.cpp:118-248): per-round
  * `localCheckpoint` truncates lineage, and the ONE action that
  * materializes the new frontier (its count) also decides
  * termination. Rounds are bounded by `maxHops` BY CONSTRUCTION —
  * the cap is the query's semantic radius, not a convergence gamble,
  * so unlike CC/k-core there is no non-termination pathology to make
  * loud: BFS on a 100 TB graph costs exactly `maxHops` frontier
  * joins, each shuffling only the wave.
  */
object BfsHops {

  /** `edges`: two long columns `a`, `b` (undirected, one row per
    * edge). `seeds`: one long column `doc_id`. Returns one row
    * `(doc_id, hops)` per node reachable within `maxHops` of any seed
    * — seeds themselves at 0, every other node at its MINIMUM hop
    * count (BFS invariant: a node is first reached at its shortest
    * distance, and the visited anti-join freezes that label).
    */
  def run(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    val adj = edges.select(col("a"), col("b"))
      .unionAll(edges.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint(true)
    var frontier = seeds.select(col("doc_id")).distinct().localCheckpoint(true)
    var visited = frontier.withColumn("hops", lit(0L))
    var h = 0
    var drained = frontier.count() == 0L
    while (!drained && h < maxHops) {
      h += 1
      val next = adj.join(frontier.withColumnRenamed("doc_id", "a"), Seq("a"))
        .select(col("b").as("doc_id")).distinct()
        .join(visited.select("doc_id"), Seq("doc_id"), "left_anti")
        .localCheckpoint(false)
      drained = next.count() == 0L // materializes the checkpoint + decides the loop
      if (!drained) {
        visited = visited.unionAll(next.withColumn("hops", lit(h.toLong)))
          .localCheckpoint(true)
        frontier = next
      }
    }
    visited
  }
}
