package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting via DEGREE-ORDERED edge orientation —
  * the third graph primitive (q70 components, q118 PageRank, this one
  * clustering structure): a triangle means two near-duplicate relations
  * share a third witness, i.e. a dedup cluster that is collapsing into a
  * clique rather than a chain.
  *
  * Algorithm (the standard 3-round MapReduce shape — in the reference's
  * terms: emit oriented edges, shuffle wedges by their endpoints, reduce
  * by closing each wedge; MapReduceFramework.cpp:118-248 would run it as
  * two chained jobs): orient every undirected edge from its lower
  * (degree, id) endpoint to the higher, enumerate wedges only at each
  * edge's SOURCE, and close a wedge (v, w) iff the oriented edge v→w
  * exists.
  *
  * Why orientation is the scale story: out-degree under (degree, id)
  * order is bounded by O(√m) for any graph, so a viral hub with millions
  * of near-dup neighbors (degree d) never enumerates its d² wedges — its
  * edges all point INTO it, and wedge fan-out happens only at low-degree
  * sources. Naive wedge enumeration at every node is quadratic in the
  * hub degree (the q83/q104 hot-bucket class); oriented, the same hub
  * contributes zero wedges. Both joins shuffle by bounded keys (node id,
  * then the (v, w) pair); nothing broadcasts, nothing windows.
  */
object Triangles {

  /** Per-node triangle participation over an undirected, deduplicated
    * edge list (columns `a`, `b`; a ≠ b, one row per edge in either
    * order). Returns every node of the graph with its triangle count,
    * zeros included — mass identity: sum(triangles) = 3 × |triangles|.
    */
  def counts(pairs: DataFrame): DataFrame = {
    val deg = pairs.select(col("a").as("id"))
      .unionAll(pairs.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val withDeg = pairs
      .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
    // orient low (deg, id) → high; carry the destination's order key so
    // wedge enumeration can sort its two legs consistently with the
    // orientation (the closing edge v→w then exists in exactly one form)
    val oriented = withDeg.select(
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
        struct(col("a").as("src"), col("b").as("dst"), col("db").as("ddeg")))
        .otherwise(struct(col("b").as("src"), col("a").as("dst"), col("da").as("ddeg")))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.ddeg").as("ddeg"))
    val tris = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e2.src") === col("e1.src") &&
          (struct(col("e1.ddeg"), col("e1.dst")) < struct(col("e2.ddeg"), col("e2.dst"))))
      .select(col("e1.src").as("apex"), col("e1.dst").as("v"), col("e2.dst").as("w"))
      .join(oriented.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
    val corners = tris.select(col("apex").as("id"))
      .unionAll(tris.select(col("v").as("id")))
      .unionAll(tris.select(col("w").as("id")))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
    deg.select("id").join(corners, Seq("id"), "left")
      .select(col("id"), coalesce(col("triangles"), lit(0L)).as("triangles"))
  }
}
