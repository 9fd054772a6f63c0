package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** d32_semdedup_capped's contract vs d29_semdedup_adaptive (the sf10-decade
  * skew fix, SCALING.md round-18 section):
  *
  *   1. On the committed corpora the two rungs emit IDENTICAL semantic-dup
  *      flags (the cap only prunes candidates, and at these scales nothing
  *      recall-relevant is pruned) while d32's candidate volume is never
  *      larger — measured 11.06M → 6.75M at sf1 for byte-identical output.
  *   2. The recall-preservation argument under a cap-EXCEEDING hot cell,
  *      proven constructively: plant a 200-copy exact-duplicate cluster
  *      (one cell holds 201 entries, 6× the C=32 cap). Every planted copy
  *      must still be flagged by BOTH rungs — the cluster's exemplar (its
  *      lowest id) survives any lowest-id cap by construction, which is
  *      exactly why the cap can kill the quadratic cell term without
  *      giving up SemDeDup's keep-lowest-exemplar semantics.
  */
class SemDedupCapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private def run(name: String, dir: String) =
    SparkEntry.queries(name)(spark, dir)
      .select("vec_id", "n_cand_prior", "is_sem_dup")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap

  test("cap changes no flags on the committed corpus, and never adds candidates") {
    val d29 = run("d29_semdedup_adaptive", sf)
    val d32 = run("d32_semdedup_capped", sf)
    assert(d29.keySet == d32.keySet)
    d29.foreach { case (id, (n29, f29)) =>
      val (n32, f32) = d32(id)
      assert(f32 == f29, s"vec $id: flag differs under the cap")
      assert(n32 <= n29, s"vec $id: cap INCREASED candidates ($n29 -> $n32)")
    }
  }

  test("a 200-copy hot cluster (6x the cap) keeps full recall on both rungs") {
    import spark.implicits._
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
    // clone the lowest-id vector 200 times under fresh high ids: one LSH
    // cell per table now holds >= 201 identical entries, far over C=32
    val seed = base.orderBy(col("vec_id")).limit(1)
      .select(col("embedding"), col("label")).head()
    val clones = (1 to 200).map(i =>
      (1000000L + i, seed.getSeq[Float](0), seed.getInt(1)))
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
    val dir = java.nio.file.Files.createTempDirectory("semdedup-cap").toString
    base.unionByName(clones).write.parquet(s"$dir/embeddings.parquet")

    val d29 = run("d29_semdedup_adaptive", dir)
    val d32 = run("d32_semdedup_capped", dir)
    val cloneIds = (1 to 200).map(i => 1000000L + i)
    cloneIds.foreach { id =>
      assert(d29(id)._2, s"d29 missed planted dup $id")
      assert(d32(id)._2, s"d32 missed planted dup $id — the cap broke exemplar recall")
    }
    // and the cap did real work: the hot cell's candidate volume shrank
    val tot29 = d29.values.map(_._1).sum
    val tot32 = d32.values.map(_._1).sum
    assert(tot32 < tot29,
      s"cap did not bind on a 201-entry cell (candidates $tot29 vs $tot32)")
    // flags agree on EVERY vector, not just the planted ones
    assert(d29.forall { case (id, (_, f)) => d32(id)._2 == f })
  }
}
