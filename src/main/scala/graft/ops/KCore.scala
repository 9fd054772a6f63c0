package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed k-core peeling over an undirected adjacency list.
  *
  * Input: `adj` with long columns (`a`, `b`) holding BOTH directions of every
  * undirected edge (so degree(x) = count of rows with a = x). Each round
  * removes every node whose degree within the surviving set is < k; the
  * fixpoint of that process is the graph's k-core (Matula–Beck peeling,
  * round-synchronous — the standard distributed formulation, same shape as
  * Pregel-style degree pruning).
  *
  * Scale: callers aggregate the raw data to `adj` FIRST (nodes × avg-degree
  * rows, never fact-table-sized), so each round is one semi-join pair + one
  * aggregate over the edge list. The semi-joins carry NO forced broadcast
  * hint: the alive set starts node-count-sized (possibly huge) and only
  * shrinks, so AQE's runtime stats pick broadcast exactly when it fits —
  * hinting would pin a 10⁹-node set into executor memory. `localCheckpoint`
  * after each fixpoint round keeps the plan constant-size (same discipline
  * as [[ConnectedComponents]]' contraction loop).
  *
  * Callers MUST pass a materialized `adj` (`localCheckpoint()` it after the
  * edge aggregation): the peel rounds re-read the adjacency once per round,
  * and an unmaterialized plan would re-run the upstream edge build each
  * time — measured as an ~80× slowdown on g8's fact-table-derived graph.
  */
object KCore {

  /** Nodes surviving `rounds` peel rounds (fixed-round variant — what a
    * bounded-iteration production job runs; deterministic, oracle-friendly).
    * Returns a single-column `a` DataFrame of surviving node ids.
    */
  def peel(adj: DataFrame, k: Int, rounds: Int): DataFrame = {
    val alive0 = adj.select(col("a")).distinct()
    (1 to rounds).foldLeft(alive0) { (alive, _) => peelOnce(adj, alive, k) }
  }

  /** The true k-core: peel to fixpoint (bounded by |V| rounds; in practice
    * O(peeling depth)). Each round's survivor set is localCheckpoint-ed so
    * the loop's plan does not grow.
    */
  def core(adj: DataFrame, k: Int, maxRounds: Int = 100): DataFrame = {
    var alive = adj.select(col("a")).distinct().localCheckpoint()
    var n = alive.count()
    var i = 0
    var stable = false
    while (!stable && i < maxRounds) {
      val next = peelOnce(adj, alive, k).localCheckpoint()
      val m = next.count()
      stable = m == n
      alive = next
      n = m
      i += 1
    }
    alive
  }

  private def peelOnce(adj: DataFrame, alive: DataFrame, k: Int): DataFrame =
    adj
      .join(alive, Seq("a"), "leftsemi")
      .join(alive.select(col("a").as("b")), Seq("b"), "leftsemi")
      .groupBy(col("a"))
      .agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= k)
      .select(col("a"))

  /** Degrees within the given node set (for reporting on the peeled graph). */
  def degreesWithin(adj: DataFrame, nodes: DataFrame): DataFrame =
    adj
      .join(nodes, Seq("a"), "leftsemi")
      .join(nodes.select(col("a").as("b")), Seq("b"), "leftsemi")
      .groupBy(col("a"))
      .agg(count(lit(1)).as("core_degree"))
}
