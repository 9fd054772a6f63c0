package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Damped PageRank over a weighted edge list, in exact integer 1e-9 units —
  * the arithmetic query g4 pins against its DuckDB oracle (damping 0.85 and
  * the per-edge split as explicit integer divisions, identical floor
  * semantics on any engine; reference behavior: rank-style scoring of the
  * trade-flow graph, cf. task.ts has no graph surface — this family is the
  * beyond-reference LLM-pipeline mandate).
  *
  * Two run modes, the same pattern [[KCore]] established:
  *   - [[iterate]]: fixed round count — deterministic, oracle-friendly; g4
  *     is this with 3 rounds.
  *   - [[converged]]: the production fixpoint — iterate until the L1 delta
  *     (in 1e-9 units) is <= `tolPpb`, localCheckpoint-ing each round so
  *     the plan stays constant-size (no lineage blowup) and bounding the
  *     loop with `maxRounds`. Two driver actions per round (the checkpoint
  *     materialization + the bounded delta aggregate over two checkpointed
  *     frames), the same budget as KCore.core — driver cost is O(rounds),
  *     never O(|V|).
  *
  * Input contract: `nodes` has one long column `node`; `edges` has columns
  * (`src`, `dst`, `w`, `outw`) with `outw` = Σw over the src (callers
  * aggregate once, like g4). Scale: each round is one shuffle join
  * (pr ⋈ edges on src — pr is nodes-sized, edges dominate) + one
  * contribution aggregate keyed by dst; nothing is ever collected.
  */
object PageRank {

  /** Exact integer teleport term: (1e9 * 0.15) / n, floored like g4. */
  def teleportPpb(nNodes: Long): Long = (1000000000L * 15L / 100L) / nNodes

  /** Uniform start vector: 1e9 / n per node, floored like g4. */
  def initial(nodes: DataFrame, nNodes: Long): DataFrame =
    nodes.withColumn("pr", lit(1000000000L / nNodes))

  /** One damped round: pr' = teleport + Σ_in ((pr*85 div 100) * w) div outw. */
  def step(nodes: DataFrame, edges: DataFrame, pr: DataFrame, tele: Long): DataFrame = {
    val contribs = pr
      .join(edges, pr("node") === edges("src"))
      .select(col("dst"), expr("(((pr * 85) div 100) * w) div outw").as("c"))
      .groupBy(col("dst"))
      .agg(sum(col("c")).as("in_sum"))
    nodes
      .join(contribs, nodes("node") === contribs("dst"), "left")
      .select(nodes("node"), (lit(tele) + coalesce(col("in_sum"), lit(0L))).as("pr"))
  }

  /** Fixed-round PageRank (g4's unrolled semantics, generalized). */
  def iterate(nodes: DataFrame, edges: DataFrame, nNodes: Long, rounds: Int): DataFrame = {
    val tele = teleportPpb(nNodes)
    (1 to rounds).foldLeft(initial(nodes, nNodes)) { (pr, _) =>
      step(nodes, edges, pr, tele)
    }
  }

  /** Fixpoint PageRank: iterate until the L1 delta (1e-9 units) <= tolPpb,
    * or `maxRounds`. Each round's vector is localCheckpoint-ed, so the plan
    * presented to each next round is a constant-size scan of materialized
    * partitions — the iteration count never widens the lineage.
    */
  def converged(
      nodes: DataFrame, edges: DataFrame, nNodes: Long,
      tolPpb: Long = 0L, maxRounds: Int = 50): DataFrame = {
    val tele = teleportPpb(nNodes)
    var pr = initial(nodes, nNodes).localCheckpoint()
    var i = 0
    var done = false
    while (!done && i < maxRounds) {
      val next = step(nodes, edges, pr, tele).localCheckpoint()
      val delta = next.as("n")
        .join(pr.as("p"), col("n.node") === col("p.node"))
        .agg(sum(abs(col("n.pr") - col("p.pr"))).as("d"))
        .head().getLong(0)
      pr = next
      done = delta <= tolPpb
      i += 1
    }
    pr
  }
}
