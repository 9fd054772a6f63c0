package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation.
  *
  * The dedup endgame: near-dup candidate pairs (MinHash-LSH bands, shingle
  * Jaccard, embedding-cosine — DedupPack d3/d5/d7/d8) are EDGES; the
  * canonical document of each duplicate cluster is the minimum doc id of the
  * component. The reference's analog is the upsert's one-key-at-a-time
  * collapse (`/root/reference/task.ts:267-349`); at corpus scale the
  * transitive closure must be computed in bulk.
  *
  * Algorithm: seed every node's label with its own id, then repeat
  *   label(v) ← min(label(v), min over neighbors u of label(u))
  * until a fixpoint. Each round is one shuffle (join edges with labels on
  * src + groupBy dst) — the hash-partitioning on node id is reused across
  * rounds. Rounds needed = graph diameter; duplicate clusters are
  * shallow (near-clique), so convergence is fast in practice. For
  * adversarially long path graphs the large-star/small-star variant
  * (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14)
  * drops rounds to O(log n) — same join/agg primitives, more of them per
  * round; the propagation loop below is the right trade for dedup-shaped
  * graphs.
  *
  * Scale mechanics: `localCheckpoint` truncates the lineage each round so
  * the plan does not grow with iterations (a 100-round plan would otherwise
  * blow up optimizer time and executor stacks); the convergence test is a
  * single `count` of changed labels, not a collect of the labels.
  */
object ConnectedComponents {

  /** @param nodes single-column DataFrame of node ids (column `id`)
    * @param edges two-column DataFrame of undirected edges (columns `src`, `dst`)
    * @return DataFrame (id, component) where component = min node id reachable
    */
  def run(nodes: DataFrame, edges: DataFrame, maxIter: Int = 50): DataFrame = {
    // Materialize the (typically expensive — a near-dup pair join) edge set
    // BEFORE mirroring it: union(e, swap(e)) would otherwise recompute the
    // pair join once per branch, and then once per round.
    val e0 = edges.select(col("src"), col("dst")).localCheckpoint()
    val und = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()

    var labels = nodes.select(col("id"), col("id").as("component")).localCheckpoint()
    // Per-node labels are non-increasing (min over a set containing self),
    // so the total label sum strictly decreases until the fixpoint — one
    // cheap scalar aggregate per round detects convergence, no join.
    var prevSum: java.math.BigDecimal = null
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // min label over each node's closed neighborhood
      val fromNeighbors = und
        .join(labels, und("src") === labels("id"))
        .select(col("dst").as("id"), col("component"))
      val propagated = labels.select(col("id"), col("component"))
        .union(fromNeighbors)
        .groupBy(col("id"))
        .agg(min(col("component")).as("component"))
      // pointer jumping (path halving): component ← label(component).
      // Chains collapse in O(log diameter) rounds instead of O(diameter).
      val byId = propagated.select(col("id").as("p_id"), col("component").as("p_comp"))
      val next = propagated
        .join(byId, propagated("component") === byId("p_id"), "left_outer")
        .select(col("id"), coalesce(col("p_comp"), col("component")).as("component"))
        .localCheckpoint()
      val curSum = next
        .agg(sum(col("component").cast("decimal(38,0)")).as("s"))
        .head().getDecimal(0)
      labels = next
      converged = prevSum != null && curSum.compareTo(prevSum) == 0
      prevSum = curSum
      iter += 1
    }
    labels
  }
}
